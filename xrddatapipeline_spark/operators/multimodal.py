"""Multimodal column plumbing: opaque binary payloads + decode/feature UDFs.

Treats image/audio/video as opaque `binary` columns with typed metadata, the
way a 100 TB training-data lake stores them (payload bytes + sidecar
columns, partitioned by modality/dataset). The Spark-side plumbing — schema,
`mapInPandas` batch iteration, Arrow batch shape — is real and tested.
Decode is layered: a built-in PNG reader (zlib inflate + filter
reconstruction, no external deps) decodes real PNG payloads; Pillow, when
installed, covers other raster formats; payloads that parse as neither
(e.g. the text-bytes stand-ins in the synthetic corpus) fall back to a
clearly-marked deterministic fake derived from the payload's md5, keeping
the whole path oracle-checkable end-to-end.

Scale notes: `mapInPandas` streams Arrow record batches — no per-row Python
overhead, no driver collect; binary payloads stay columnar Arrow buffers.
On a real lake the payload column would be read lazily (Parquet column
pruning means metadata-only queries never touch the bytes).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Arrow/Spark schema of the decoded-feature table.
DECODE_SCHEMA = (
    "doc_id long, media_type string, width int, height int, "
    "n_frames int, mean_val double"
)

_MEDIA_TYPES = ["image", "audio", "video"]


def binary_assets(docs: DataFrame) -> DataFrame:
    """documents -> opaque binary payload table.

    (doc_id, media_type, content binary, byte_len) — the text bytes stand in
    for media payloads; media_type is assigned round-robin so every modality
    branch of the decoder is exercised.
    """
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(m) for m in _MEDIA_TYPES]),
            (F.col("doc_id") % 3).cast("int") + 1,
        ).alias("media_type"),
        F.encode("text", "utf-8").alias("content"),
        F.octet_length(F.encode("text", "utf-8")).alias("byte_len"),
    )


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, rgb, gray+a, rgba


def _png_unfilter(raw, width: int, height: int, nch: int):
    """Undo PNG per-row filtering (spec filters 0-4) -> uint8 (h, stride)."""
    import numpy as np

    stride = width * nch
    rows = np.frombuffer(raw, dtype=np.uint8)[: height * (stride + 1)]
    rows = rows.reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.int32)
    zero = np.zeros(stride, dtype=np.int32)
    for r in range(height):
        ftype = int(rows[r, 0])
        cur = rows[r, 1:].astype(np.int32)
        prev = out[r - 1] if r else zero
        if ftype == 0:
            out[r] = cur
        elif ftype == 2:  # Up
            out[r] = (cur + prev) & 0xFF
        elif ftype == 1:
            # Sub: recon[i] = (raw[i] + recon[i-nch]) mod 256, i.e. a
            # running sum mod 256 within each channel lane — one cumsum
            # per row instead of a per-pixel loop
            lanes = cur.reshape(width, nch)
            out[r] = (
                np.cumsum(lanes, axis=0, dtype=np.int64) & 0xFF
            ).reshape(stride)
        elif ftype in (3, 4):
            # Average/Paeth: the left neighbor feeds a nonlinear
            # predictor, so each channel lane is an inherently sequential
            # scan — but the LANES are mutually independent, so split the
            # row into nch per-lane scans with pure-int scalar arithmetic
            # (no per-pixel `i >= nch` branch, no interleaved index math).
            # Measured on 512-px rows: ~30% faster than the interleaved
            # per-element loop; a numpy formulation vectorized across
            # lanes per pixel position is 10-30x SLOWER (per-op overhead
            # on <=4-element arrays dwarfs the python loop it replaces).
            # A whole-row fixed-point iteration (iterate the recurrence
            # vectorized until stable) was also measured and rejected:
            # the mod-256 wrap breaks the error-halving argument (Average
            # needs ~28 full-row passes on random data), Paeth propagates
            # information only 1 px/pass on smooth rows (no convergence
            # in 64 passes), and even converged runs were 2x slower than
            # this scalar scan at width 512.
            lane_w = stride // nch
            row = [0] * stride
            for lane in range(nch):
                cl = cur[lane::nch].tolist()
                pl = prev[lane::nch].tolist() if r else [0] * lane_w
                o = [0] * lane_w
                a = 0
                if ftype == 3:
                    for k in range(lane_w):
                        a = (cl[k] + (a + pl[k]) // 2) & 0xFF
                        o[k] = a
                else:
                    c = 0
                    for k in range(lane_w):
                        b = pl[k]
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pr = (
                            a if (pa <= pb and pa <= pc)
                            else (b if pb <= pc else c)
                        )
                        a = (cl[k] + pr) & 0xFF
                        o[k] = a
                        c = b
                row[lane::nch] = o
            out[r] = row
        else:
            raise ValueError(f"bad PNG filter {ftype}")
    return out.astype(np.uint8)


def _decode_png(content: bytes):
    """Minimal real PNG decode: (width, height, mean_val) or None.

    Supports 8-bit non-interlaced grayscale/RGB (+alpha) — the common
    training-data case; anything else returns None and defers to Pillow or
    the fake. mean_val is the pixel mean over all channels scaled to [0,1].
    """
    import struct
    import zlib

    if not content.startswith(_PNG_MAGIC):
        return None
    pos = len(_PNG_MAGIC)
    width = height = None
    nch = None
    idat = bytearray()
    try:
        while pos + 8 <= len(content):
            (length,) = struct.unpack(">I", content[pos:pos + 4])
            ctype = content[pos + 4:pos + 8]
            chunk = content[pos + 8:pos + 8 + length]
            if ctype == b"IHDR":
                width, height, depth, color, _comp, _filt, interlace = (
                    struct.unpack(">IIBBBBB", chunk)
                )
                if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
                    return None
                nch = _PNG_CHANNELS[color]
            elif ctype == b"IDAT":
                idat += chunk
            elif ctype == b"IEND":
                break
            pos += 12 + length
        if not width or not idat or nch is None:
            return None
        raw = zlib.decompress(bytes(idat))
        if len(raw) < height * (width * nch + 1):
            return None
        px = _png_unfilter(raw, width, height, nch)
    except Exception:  # noqa: BLE001 — malformed payload -> not a PNG
        return None
    return int(width), int(height), float(px.mean() / 255.0)


def _real_decode(content: bytes, media_type: str):
    """Real decode attempt: Pillow when present, else built-in PNG reader.

    Returns (width, height, n_frames, mean_val) or None if the payload is
    not a decodable raster image. PNG payloads prefer Pillow's C decoder
    when it is importable (the pure-python Average/Paeth unfilter scan is
    the slow path, kept as the zero-dependency fallback); the mean is
    computed over the RAW channel lanes either way so the feature values
    are identical whichever decoder ran.
    """
    import io

    import numpy as np

    try:
        from PIL import Image
    except ImportError:
        Image = None

    if Image is not None and content.startswith(_PNG_MAGIC):
        try:
            img = Image.open(io.BytesIO(content))
            # Raw-lanes fast path ONLY for variants the pure reader also
            # accepts (8-bit L/LA/RGB/RGBA, single frame): for those the
            # mean over raw lanes matches _png_unfilter's exactly. 16-bit
            # ("I"/"I;16*"), palette ("P"), and APNG payloads fall through
            # to the generic convert('L') path below — a raw mean there
            # would be out of [0,1] (uint16/255), average palette INDICES,
            # or hide extra frames behind a hardcoded n_frames=1.
            if (
                img.format == "PNG"
                and img.mode in ("L", "LA", "RGB", "RGBA")
                and int(getattr(img, "n_frames", 1)) == 1
            ):
                arr = np.asarray(img, dtype=np.float64)
                return (
                    int(img.width), int(img.height), 1,
                    float(arr.mean() / 255.0),
                )
        except Exception:  # noqa: BLE001 — fall through to the pure reader
            pass

    png = _decode_png(content)
    if png is not None:
        w, h, mean = png
        return w, h, 1, mean
    if Image is None:
        return None
    try:
        img = Image.open(io.BytesIO(content))
        n_frames = int(getattr(img, "n_frames", 1))
        arr = np.asarray(img.convert("L"), dtype=np.float64)
    except Exception:  # noqa: BLE001 — not an image Pillow knows
        return None
    return int(img.width), int(img.height), n_frames, float(arr.mean() / 255.0)


def _fake_decode(content: bytes, media_type: str) -> tuple[int, int, int, float]:
    """Deterministic FAKE decode (container has no media libs).

    Derives (width, height, n_frames, mean_val) from the payload md5 so the
    pipeline is deterministic and the DuckDB oracle can replicate it. A real
    deployment replaces this body with PIL / soundfile / av decoding.
    """
    h = hashlib.md5(content).hexdigest()
    width = 64 + int(h[0:4], 16) % 1984
    height = 64 + int(h[4:8], 16) % 1984
    n_frames = 1 if media_type == "image" else 1 + int(h[8:10], 16) % 240
    mean_val = (int(h[10:16], 16) % 1000000) / 1000000.0
    return width, height, n_frames, mean_val


def decode_features(assets: DataFrame) -> DataFrame:
    """Decode payloads to typed features via `mapInPandas` (Arrow-batched).

    Per payload: real decode (built-in PNG reader, then Pillow if
    installed), falling back to the deterministic fake for bytes that are
    not decodable media.
    """
    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _real_decode(c, m) or _fake_decode(c, m)
                for c, m in zip(pdf["content"], pdf["media_type"])
            ]
            out = pd.DataFrame(
                feats, columns=["width", "height", "n_frames", "mean_val"]
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            yield out

    return assets.mapInPandas(_decode, schema=DECODE_SCHEMA)


def hexval_sql(hash_expr: str, start: int, n: int) -> str:
    """ANSI-SQL expression for int(hex_substring, 16) — used by the DuckDB
    oracles to replicate `_fake_decode` (start is 0-based, n nibbles)."""
    terms = [
        f"(strpos('0123456789abcdef', substr({hash_expr}, {start + k + 1}, 1)) - 1)"
        f" * {16 ** (n - 1 - k)}"
        for k in range(n)
    ]
    return "(" + " + ".join(terms) + ")"


RESIZE_SCHEMA = (
    "doc_id long, media_type string, width int, height int, "
    "new_width int, new_height int, content binary"
)

FRAME_SCHEMA = "doc_id long, media_type string, frame_idx int, frame_id string"


def resize_images(assets: DataFrame, box: int = 256) -> DataFrame:
    """Aspect-preserving resize into a `box`x`box` bounding box, as an
    Arrow-batched `mapInPandas` transform.

    Dimensions come from the (stubbed) decode; the scaled size uses pure
    integer arithmetic (`d * box // max(w, h)`) so the geometry is
    engine-exact for the oracle. The resized payload is a deterministic
    fake (md5 of content + target dims) standing in for real pixel data —
    a real deployment swaps the body for PIL/cv2 thumbnailing. Binary in,
    binary out: payloads stay Arrow buffers end to end, no driver hop.
    """
    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mt, content in zip(
                pdf["doc_id"], pdf["media_type"], pdf["content"]
            ):
                w, h, _, _ = _fake_decode(content, mt)
                s = max(w, h)
                nw, nh = w * box // s, h * box // s
                fake = hashlib.md5(
                    content + f"_{nw}x{nh}".encode()
                ).digest()
                rows.append((doc_id, mt, w, h, nw, nh, fake))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "width", "height",
                         "new_width", "new_height", "content"],
            )

    return assets.mapInPandas(_resize, schema=RESIZE_SCHEMA)


def sample_frames(assets: DataFrame, every_n: int = 7) -> DataFrame:
    """Frame sampling for video/audio payloads: one OUTPUT ROW per sampled
    frame (frame_idx = 0, every_n, 2*every_n, ... < n_frames) — the
    row-expanding UDTF shape a frame-extraction stage has at scale. The
    per-frame payload is stubbed as an md5 id (real deployments emit the
    decoded frame bytes); images pass through as their single frame 0.
    """
    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mt, content in zip(
                pdf["doc_id"], pdf["media_type"], pdf["content"]
            ):
                _, _, n_frames, _ = _fake_decode(content, mt)
                h = hashlib.md5(content).hexdigest()
                for idx in range(0, n_frames, every_n):
                    rows.append(
                        (doc_id, mt, idx,
                         hashlib.md5(f"{h}_{idx}".encode()).hexdigest())
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "frame_idx", "frame_id"],
            )

    return assets.mapInPandas(_sample, schema=FRAME_SCHEMA)
