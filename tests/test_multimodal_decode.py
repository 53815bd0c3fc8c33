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


class _StubImage:
    """Minimal Pillow Image stand-in: np.asarray() sees ``arr``."""

    format = "PNG"

    def __init__(self, arr, mode, n_frames=1):
        self._arr = arr
        self.mode = mode
        self.n_frames = n_frames
        self.height, self.width = arr.shape[:2]

    def __array__(self, dtype=None, copy=None):
        a = np.asarray(self._arr)
        return a.astype(dtype) if dtype is not None else a

    def convert(self, mode):
        assert mode == "L"
        a = self._arr
        gray = a if a.ndim == 2 else a[..., :3].mean(axis=2)
        return _StubImage(gray.astype(np.uint8), "L")


def _with_stub_pil(monkeypatch, img):
    """Install a fake PIL whose Image.open always yields ``img``."""
    import sys
    import types

    pil = types.ModuleType("PIL")
    image_mod = types.ModuleType("PIL.Image")
    image_mod.open = lambda fp: img
    pil.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)


def test_pillow_fast_path_gated_to_pure_reader_modes(monkeypatch):
    """ADVICE r9 (medium): the Pillow-first raw-lanes path must only run
    for PNG variants the pure reader also supports (8-bit L/LA/RGB/RGBA,
    single frame); 16-bit / palette / APNG must fall through."""
    from xrddatapipeline_spark.operators.multimodal import _real_decode

    rng = np.random.default_rng(7)
    real = rng.integers(0, 256, size=(6, 8), dtype=np.uint8)
    payload = make_png(real, 2)

    # 1. Supported mode: fast path runs (result = stub array mean, which we
    #    deliberately make differ from the payload's true mean).
    fast = np.full((6, 8, 3), 200, dtype=np.uint8)
    _with_stub_pil(monkeypatch, _StubImage(fast, "RGB"))
    got = _real_decode(payload, "image")
    np.testing.assert_allclose(got[3], 200 / 255.0, atol=1e-12)

    # 2. Palette mode: fast path skipped -> pure reader decodes the real
    #    payload (stub mean would have been 200/255).
    _with_stub_pil(monkeypatch, _StubImage(fast, "P"))
    got = _real_decode(payload, "image")
    np.testing.assert_allclose(got[3], real.mean() / 255.0, atol=1e-12)
    assert got[:2] == (8, 6)

    # 3. APNG (n_frames > 1): fast path skipped even in a supported mode.
    _with_stub_pil(monkeypatch, _StubImage(fast, "RGB", n_frames=3))
    got = _real_decode(payload, "image")
    np.testing.assert_allclose(got[3], real.mean() / 255.0, atol=1e-12)

    # 4. 16-bit gray ("I;16"): pure reader rejects the 16-bit payload too,
    #    so the generic convert('L') Pillow path runs (8-bit result in
    #    [0,1], never a raw uint16/255 mean ~257).
    ihdr = struct.pack(">IIBBBBB", 8, 6, 16, 0, 0, 0, 0)
    deep = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + b"\x00" * 4
    )
    wide = np.full((6, 8), 40000, dtype=np.uint16)
    _with_stub_pil(monkeypatch, _StubImage(wide, "I;16", n_frames=2))
    got = _real_decode(deep, "image")
    w, h, n_frames, mean = got
    assert (w, h, n_frames) == (8, 6, 2)
    assert 0.0 <= mean <= 1.0  # convert('L') path, not raw/255
