"""Hypothesis property tests for the pure-numpy raster kernels (SURVEY §5b).

These run off-Spark (the kernels are plain numpy by design) so hundreds of
randomized rasters cost milliseconds. Each property is a mathematical
invariant of the operator, not a golden value — the complement of the
fixed numpy-oracle tests in test_kernels.py.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from xrddatapipeline_spark.operators.kernels import (
    binary_closing,
    binary_dilation,
    binary_erosion,
    h_maxima,
    inpaint_masked,
    label_components,
    remove_small_objects,
)

masks = arrays(np.bool_, (12, 14), elements=st.booleans())


def _bfs_components(mask: np.ndarray) -> int:
    """Independent flood-fill component count (8-connected)."""
    seen = np.zeros_like(mask, dtype=bool)
    n = 0
    ys, xs = np.nonzero(mask)
    for sy, sx in zip(ys, xs):
        if seen[sy, sx]:
            continue
        n += 1
        stack = [(sy, sx)]
        seen[sy, sx] = True
        while stack:
            y, x = stack.pop()
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    ny, nx = y + dy, x + dx
                    if (0 <= ny < mask.shape[0] and 0 <= nx < mask.shape[1]
                            and mask[ny, nx] and not seen[ny, nx]):
                        seen[ny, nx] = True
                        stack.append((ny, nx))
    return n


@given(masks)
@settings(max_examples=120, deadline=None)
def test_label_count_matches_flood_fill(mask):
    labels = label_components(mask, connectivity=2)
    assert labels[~mask].sum() == 0  # background stays 0
    n_labels = len(np.unique(labels[mask])) if mask.any() else 0
    assert n_labels == _bfs_components(mask)
    # labels partition the mask: two 8-adjacent set pixels share a label
    ys, xs = np.nonzero(mask)
    for y, x in zip(ys, xs):
        patch = labels[max(0, y - 1):y + 2, max(0, x - 1):x + 2]
        vals = patch[patch > 0]
        assert (vals == labels[y, x]).all()


@given(masks)
@settings(max_examples=120, deadline=None)
def test_morphology_order_and_idempotence(mask):
    dil = binary_dilation(mask)
    ero = binary_erosion(mask)
    clo = binary_closing(mask)
    assert (mask <= dil).all()          # dilation is extensive
    assert (ero <= mask).all()          # erosion is anti-extensive
    assert (mask <= clo).all()          # closing is extensive
    assert (clo <= dil).all()           # closing = erode(dilate) <= dilate
    # closing is idempotent
    assert (binary_closing(clo) == clo).all()


@given(masks, st.integers(min_value=1, max_value=6))
@settings(max_examples=80, deadline=None)
def test_remove_small_objects_area_floor(mask, min_area):
    labels = label_components(mask, connectivity=2)
    kept = remove_small_objects(labels, min_area=min_area)
    # every surviving label's area clears the floor, and survivors are a
    # subset of the original labeling (no relabeling, no new pixels)
    surv, counts = np.unique(kept[kept > 0], return_counts=True)
    assert (counts >= min_area).all()
    assert ((kept == 0) | (kept == labels)).all()
    # dropped labels are exactly those under the floor
    orig, ocounts = np.unique(labels[labels > 0], return_counts=True)
    expect = set(orig[ocounts >= min_area])
    assert set(surv) == expect


imgs = arrays(
    np.float64, (10, 12),
    elements=st.floats(min_value=0.0, max_value=100.0, allow_nan=False),
)


@given(imgs, st.floats(min_value=0.5, max_value=20.0))
@settings(max_examples=60, deadline=None)
def test_h_maxima_flags_are_local_maxima(img, h):
    flags = h_maxima(img, h)
    # every flagged pixel belongs to a plateau at least h above the
    # highest point you must descend to to escape it; in particular it is
    # a weak local maximum of its 8-neighborhood
    ys, xs = np.nonzero(flags)
    for y, x in zip(ys, xs):
        patch = img[max(0, y - 1):y + 2, max(0, x - 1):x + 2]
        assert img[y, x] >= patch.max() - 1e-9


@given(imgs, masks.map(lambda m: m[:10, :12]))
@settings(max_examples=60, deadline=None)
def test_inpaint_preserves_good_pixels(img, bad):
    out = inpaint_masked(img, bad)
    good = ~bad
    np.testing.assert_array_equal(out[good], img[good])
    # a bad pixel with NO good pixel inside the kernel window becomes 0.0
    # (its raw intensity is invalid — that is why it is masked — and the
    # sparse/fused route never ships it; zero keeps the routes bit-equal)
    reachable = binary_dilation(good, radius=2) & bad
    np.testing.assert_array_equal(
        out[bad & ~reachable], np.zeros(int((bad & ~reachable).sum()))
    )
    # reachable bad pixels are convex combinations of good values
    if reachable.any():
        filled = out[reachable]
        assert filled.min() >= img[good].min() - 1e-9
        assert filled.max() <= img[good].max() + 1e-9
