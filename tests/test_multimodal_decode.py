"""Real PNG decode in the multimodal path (+ deterministic-fake fallback)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
import pytest

from xrddatapipeline_spark.operators.multimodal import (
    _decode_png,
    _fake_decode,
    decode_features,
)


def make_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode (h, w) gray or (h, w, 3/4) color uint8 as a real PNG, using
    the given per-row filter (0 none, 1 sub, 2 up, 3 average, 4 paeth)."""
    if arr.ndim == 2:
        color, nch = 0, 1
        flat = arr[:, :, None]
    else:
        color = {3: 2, 4: 6}[arr.shape[2]]
        nch = arr.shape[2]
        flat = arr
    h, w = arr.shape[:2]
    stride = w * nch
    img = flat.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for r in range(h):
        raw.append(filter_type)
        prev = img[r - 1] if r else np.zeros(stride, dtype=np.int32)
        row = img[r]
        for i in range(stride):
            a = row[i - nch] if i >= nch else 0
            b = prev[i]
            c = prev[i - nch] if i >= nch else 0
            if filter_type == 0:
                pred = 0
            elif filter_type == 1:
                pred = a
            elif filter_type == 2:
                pred = b
            elif filter_type == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            raw.append((row[i] - pred) & 0xFF)

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", ["gray", "rgb", "rgba"])
def test_png_decode_all_filters(filter_type, channels):
    rng = np.random.default_rng(filter_type * 10 + len(channels))
    shape = {"gray": (13, 17), "rgb": (9, 11, 3), "rgba": (7, 5, 4)}[channels]
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    got = _decode_png(make_png(arr, filter_type))
    assert got is not None
    w, h, mean = got
    assert (w, h) == (shape[1], shape[0])
    np.testing.assert_allclose(mean, arr.mean() / 255.0, rtol=0, atol=1e-12)


def test_png_decode_rejects_non_png():
    assert _decode_png(b"not a png at all") is None
    assert _decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 4) is None
    # 16-bit depth unsupported -> defer to Pillow/fake, not crash
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + b"\x00" * 4
    )
    assert _decode_png(bad) is None


def test_decode_features_real_png_and_fallback(spark):
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 256, size=(21, 34), dtype=np.uint8)
    png = make_png(arr, 2)
    text = b"just some document text, definitely not an image"
    assets = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "media_type": ["image", "image"],
                "content": [png, text],
            }
        )
    )
    got = decode_features(assets).toPandas().set_index("doc_id")
    # real decode: exact dims + exact mean
    assert (got.loc[1, "width"], got.loc[1, "height"]) == (34, 21)
    assert got.loc[1, "n_frames"] == 1
    np.testing.assert_allclose(
        got.loc[1, "mean_val"], arr.mean() / 255.0, atol=1e-12
    )
    # non-media payload: deterministic fake
    fw, fh, fn, fm = _fake_decode(text, "image")
    assert (got.loc[2, "width"], got.loc[2, "height"]) == (fw, fh)
    np.testing.assert_allclose(got.loc[2, "mean_val"], fm, atol=1e-12)
