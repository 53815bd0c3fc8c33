"""Pure-numpy raster kernels for the per-image ``applyInPandas`` layer.

These are the operators with no relational analog (SURVEY §2.8 M1-M8). The
reference uses scipy/skimage/astropy; this container has neither, so each
kernel is an independent pure-numpy implementation of the standard published
algorithm (documented per function). They are deliberately Spark-free so
they can be unit-tested off-cluster and reused inside Arrow-batched UDFs.

All functions take/return dense 2-D numpy arrays; the raster module
(operators/raster.py) converts between long-form pixel rows and rasters.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# M1 — connected-component labeling (8-connectivity)
# ---------------------------------------------------------------------------

def label_components(mask: np.ndarray, connectivity: int = 2) -> np.ndarray:
    """8-connected (connectivity=2) or 4-connected (1) labeling.

    Sparse union-find with vectorized pointer jumping: labels only the True
    pixels (outlier masks are a few % of the image), so cost scales with the
    masked-pixel count, not the image area. Labels are 1..n_components in
    first-pixel (row-major) order, 0 = background — matching the ordering
    convention of scipy.ndimage.label so downstream golden tables line up.
    """
    ys, xs = np.nonzero(mask)
    n = ys.size
    out = np.zeros(mask.shape, dtype=np.int32)
    if n == 0:
        return out
    h, w = mask.shape
    flat = ys.astype(np.int64) * w + xs
    order = np.argsort(flat)  # row-major order (np.nonzero already sorted, but be safe)
    flat = flat[order]
    parent = np.arange(n, dtype=np.int64)

    if connectivity == 2:
        offsets = (-w - 1, -w, -w + 1, -1)
    else:
        offsets = (-w, -1)

    def find_root(parent: np.ndarray) -> np.ndarray:
        root = parent.copy()
        while True:
            nxt = parent[root]
            if np.array_equal(nxt, root):
                return root
            root = nxt

    # union each pixel with its already-seen neighbors (vectorized lookup
    # of neighbor positions via searchsorted on the sorted flat indices)
    col = flat % w
    for off in offsets:
        nb = flat + off
        ok = np.ones(n, dtype=bool)
        if off in (-w - 1, -1):
            ok &= col > 0
        if off == -w + 1:
            ok &= col < w - 1
        nb_idx = np.searchsorted(flat, nb)
        nb_idx[nb_idx >= n] = n - 1
        ok &= flat[nb_idx] == nb
        a = np.nonzero(ok)[0]
        if a.size == 0:
            continue
        b = nb_idx[a]
        # iterative union: link root(a) -> root(b)
        for i, j in zip(a.tolist(), b.tolist()):
            ri, rj = i, j
            while parent[ri] != ri:
                parent[ri] = parent[parent[ri]]
                ri = parent[ri]
            while parent[rj] != rj:
                parent[rj] = parent[parent[rj]]
                rj = parent[rj]
            if ri != rj:
                if ri < rj:
                    parent[rj] = ri
                else:
                    parent[ri] = rj

    root = find_root(parent)
    # relabel roots to 1..k in row-major first-appearance order
    uniq, inv = np.unique(root, return_inverse=True)
    # uniq is sorted by index == row-major first pixel, so inv+1 is the label
    out[ys[order], xs[order]] = (inv + 1).astype(np.int32)
    return out


# ---------------------------------------------------------------------------
# M2/M4 — binary morphology via shifted boolean algebra
# ---------------------------------------------------------------------------

def _shift2d(a: np.ndarray, dy: int, dx: int, fill: bool = False) -> np.ndarray:
    out = np.full_like(a, fill)
    h, w = a.shape
    ys0, ys1 = max(dy, 0), min(h + dy, h)
    xs0, xs1 = max(dx, 0), min(w + dx, w)
    out[ys0:ys1, xs0:xs1] = a[ys0 - dy : ys1 - dy, xs0 - dx : xs1 - dx]
    return out


def binary_dilation(mask: np.ndarray, radius: int = 1) -> np.ndarray:
    """Square-structuring-element dilation (side 2*radius+1)."""
    out = mask.copy()
    for _ in range(radius):
        nxt = out.copy()
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy or dx:
                    nxt |= _shift2d(out, dy, dx)
        out = nxt
    return out


def binary_erosion(mask: np.ndarray, radius: int = 1) -> np.ndarray:
    out = mask.copy()
    for _ in range(radius):
        nxt = out.copy()
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy or dx:
                    nxt &= _shift2d(out, dy, dx, fill=True)
        out = nxt
    return out


def binary_closing(mask: np.ndarray, radius: int = 1) -> np.ndarray:
    """Dilation then erosion — fills holes smaller than the element
    (pipeline.py:191-205 uses a 3x3 closing)."""
    return binary_erosion(binary_dilation(mask, radius), radius)


def remove_small_objects(labels: np.ndarray, min_area: int) -> np.ndarray:
    """Zero out labels with pixel count < min_area (classification.py:343)."""
    if labels.max() == 0:
        return labels
    areas = np.bincount(labels.ravel())
    kill = areas < min_area
    kill[0] = False
    out = labels.copy()
    out[kill[labels]] = 0
    return out


# ---------------------------------------------------------------------------
# M7 — 3x3 gradient convolution projected on radial/azimuthal unit vectors
# ---------------------------------------------------------------------------

SOBEL_Y = np.array([[-1.0, -2.0, -1.0], [0.0, 0.0, 0.0], [1.0, 2.0, 1.0]]) / 8.0
SOBEL_X = SOBEL_Y.T


def conv3x3(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """Direct 3x3 correlation with zero padding (no scipy)."""
    out = np.zeros_like(img, dtype=np.float64)
    for ky in range(3):
        for kx in range(3):
            wgt = kernel[ky, kx]
            if wgt != 0.0:
                out += wgt * _shift2d_f(img, 1 - ky, 1 - kx)
    return out


def _shift2d_f(a: np.ndarray, dy: int, dx: int) -> np.ndarray:
    out = np.zeros_like(a, dtype=np.float64)
    h, w = a.shape
    ys0, ys1 = max(dy, 0), min(h + dy, h)
    xs0, xs1 = max(dx, 0), min(w + dx, w)
    out[ys0:ys1, xs0:xs1] = a[ys0 - dy : ys1 - dy, xs0 - dx : xs1 - dx]
    return out


def radial_azim_gradient(
    img: np.ndarray, center_y_px: float, center_x_px: float
) -> tuple[np.ndarray, np.ndarray]:
    """First derivative along the radial (r_hat) and tangential (phi_hat)
    directions from the beam center — the reference precomputes r_hat/phi_hat
    unit-vector maps (cache_creation.py:94-105) and projects Sobel-style
    gradients onto them (classification.py:46-63). Apply twice for second
    derivatives."""
    gy = conv3x3(img, SOBEL_Y)
    gx = conv3x3(img, SOBEL_X)
    ys, xs = np.mgrid[0 : img.shape[0], 0 : img.shape[1]]
    dy = ys + 0.5 - center_y_px
    dx = xs + 0.5 - center_x_px
    norm = np.hypot(dy, dx)
    norm[norm == 0] = 1.0
    r_y, r_x = dy / norm, dx / norm
    # phi_hat is r_hat rotated 90 degrees
    p_y, p_x = dx / norm, -dy / norm
    return gy * r_y + gx * r_x, gy * p_y + gx * p_x


# ---------------------------------------------------------------------------
# M8 — Gaussian-weighted inpainting of masked pixels
# ---------------------------------------------------------------------------

def gaussian_kernel2d(sigma: float = 1.0, radius: int = 2) -> np.ndarray:
    ax = np.arange(-radius, radius + 1, dtype=np.float64)
    g = np.exp(-(ax**2) / (2 * sigma**2))
    k = np.outer(g, g)
    return k / k.sum()


def inpaint_masked(img: np.ndarray, bad: np.ndarray, sigma: float = 1.0, radius: int = 2) -> np.ndarray:
    """Replace ``bad`` pixels by the Gaussian-weighted average of their good
    neighbors (normalized convolution — the standard formulation of
    astropy's interpolate_replace_nans, classification.py:88-92)."""
    k = gaussian_kernel2d(sigma, radius)
    vals = np.where(bad, 0.0, img.astype(np.float64))
    wgts = np.where(bad, 0.0, 1.0)
    num = np.zeros_like(vals)
    den = np.zeros_like(vals)
    for ky in range(k.shape[0]):
        for kx in range(k.shape[1]):
            w = k[ky, kx]
            num += w * _shift2d_f(vals, radius - ky, radius - kx)
            den += w * _shift2d_f(wgts, radius - ky, radius - kx)
    out = img.astype(np.float64).copy()
    fill = den > 0
    sel = bad & fill
    out[sel] = num[sel] / den[sel]
    return out


# ---------------------------------------------------------------------------
# M6 — h-maxima (regional maxima after h-reconstruction)
# ---------------------------------------------------------------------------

def h_maxima(img: np.ndarray, h: float, max_iter: int = 512) -> np.ndarray:
    """Morphological reconstruction-by-dilation of (img - h) under img,
    then regional-maxima flag — the standard definition (Soille, Morphological
    Image Analysis; skimage.morphology.h_maxima). Iterative 8-neighbor
    dilation to convergence."""
    marker = img.astype(np.float64) - h
    maskf = img.astype(np.float64)
    rec = marker.copy()
    for _ in range(max_iter):
        dil = rec.copy()
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy or dx:
                    np.maximum(dil, _shift2d_f(rec, dy, dx), out=dil)
        new = np.minimum(dil, maskf)
        if np.array_equal(new, rec):
            break
        rec = new
    # regional maxima of the reconstruction: pixels strictly above all
    # neighbors' reconstruction would miss plateaus; use the h-maxima
    # criterion img - rec >= ... standard: maxima where rec < img is false.
    resid = maskf - rec
    return resid >= h - 1e-9
