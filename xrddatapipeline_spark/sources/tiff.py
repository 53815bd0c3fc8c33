"""TIFF detector-image source: minimal decoder + binaryFile -> pixel rows.

Role parity with the reference's image readers (`load_image`,
GSASII_imports.py:82-84; `GetTifData` GSASII_imports.py:1068-1399, which
sniffs ~20 detector pseudo-TIFF variants). This is an independent
implementation of the *public* baseline TIFF 6.0 structure (header, IFD
walk, strip assembly) for uncompressed grayscale images — the canonical
detector case (2880x2880 int32/float32). Exotic per-detector variants
raise cleanly; a real deployment drops `tifffile` into `_decode_one`.

Spark shape (SURVEY §1.4 / §2.1 S1-S2): `spark.read.format("binaryFile")`
(batch) or `readStream.format("binaryFile")` (streaming) carries
(path, content) rows; `decode_tiff_pixels` is a `mapInPandas` UDTF — one
binary row explodes to H*W pixel rows, Arrow-batched, executor-side. At
100 TB the decode parallelizes per file with no driver involvement, and
downstream column pruning means metadata-only queries never decode.
"""

from __future__ import annotations

import os
import re
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

#: dataset/sequence parse from filenames like `MA2b-00004.tif`
#: (pipeline_queue.py:41 regex semantics)
FILENAME_RE = re.compile(r"^(?P<name>.*?)[_\-](?P<number>\d{5})\.(?P<ext>\w+)$")

PIXEL_SCHEMA = (
    "dataset string, seq int, image_id string, y int, x int, intensity int"
)

# TIFF tag ids (TIFF 6.0 spec)
_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_STRIP_OFFSETS = 273
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_SAMPLE_FORMAT = 339

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
               11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d"}


def _read_tag_values(data: bytes, bo: str, vtype: int, count: int,
                     value_field: bytes) -> list:
    size = _TYPE_SIZES[vtype] * count
    raw = value_field[:size] if size <= 4 else None
    if raw is None:
        (offset,) = struct.unpack(bo + "I", value_field)
        raw = data[offset:offset + size]
    fmt = _TYPE_FMT.get(vtype)
    if fmt is None:
        return []
    return list(struct.unpack(f"{bo}{count}{fmt}", raw))


def read_tiff_gray(data: bytes) -> np.ndarray:
    """Decode an uncompressed grayscale baseline TIFF to a 2-D numpy array.

    Handles both byte orders, 8/16/32-bit unsigned/signed/float samples,
    and multi-strip layouts. Raises ValueError for compressed or
    multi-sample images (out of scope; see module docstring).
    """
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    (magic,) = struct.unpack(bo + "H", data[2:4])
    if magic != 42:
        raise ValueError("not a TIFF: bad magic")
    (ifd_off,) = struct.unpack(bo + "I", data[4:8])

    (n_tags,) = struct.unpack(bo + "H", data[ifd_off:ifd_off + 2])
    tags: dict[int, list] = {}
    for i in range(n_tags):
        ent = data[ifd_off + 2 + 12 * i: ifd_off + 2 + 12 * (i + 1)]
        tag, vtype, count = struct.unpack(bo + "HHI", ent[:8])
        tags[tag] = _read_tag_values(data, bo, vtype, count, ent[8:12])

    width = int(tags[_TAG_WIDTH][0])
    height = int(tags[_TAG_HEIGHT][0])
    bits = int(tags.get(_TAG_BITS, [1])[0])
    compression = int(tags.get(_TAG_COMPRESSION, [1])[0])
    if compression != 1:
        raise ValueError(f"unsupported TIFF compression {compression}")
    sample_fmt = int(tags.get(_TAG_SAMPLE_FORMAT, [1])[0])
    kind = {1: "u", 2: "i", 3: "f"}.get(sample_fmt)
    if kind is None:
        raise ValueError(f"unsupported TIFF sample format {sample_fmt}")
    dtype = np.dtype(f"{bo}{kind}{bits // 8}")

    offsets = tags[_TAG_STRIP_OFFSETS]
    counts = tags.get(
        _TAG_STRIP_COUNTS, [height * width * (bits // 8) - 0]
    )
    payload = b"".join(
        data[int(o): int(o) + int(c)] for o, c in zip(offsets, counts)
    )
    arr = np.frombuffer(payload, dtype=dtype, count=height * width)
    return arr.reshape(height, width)


def write_tiff_gray(path: str, image: np.ndarray) -> None:
    """Write a minimal little-endian uncompressed grayscale baseline TIFF
    (single strip). Supports uint8/16/32, int8/16/32, float32/64."""
    image = np.ascontiguousarray(image)
    kind_map = {"u": 1, "i": 2, "f": 3}
    sample_fmt = kind_map[image.dtype.kind]
    bits = image.dtype.itemsize * 8
    h, w = image.shape
    data = image.astype(image.dtype.newbyteorder("<")).tobytes()
    data_off = 8
    ifd_off = data_off + len(data)
    tags = [
        (_TAG_WIDTH, 4, 1, w),
        (_TAG_HEIGHT, 4, 1, h),
        (_TAG_BITS, 3, 1, bits),
        (_TAG_COMPRESSION, 3, 1, 1),
        (262, 3, 1, 1),  # photometric: BlackIsZero
        (_TAG_STRIP_OFFSETS, 4, 1, data_off),
        (277, 3, 1, 1),  # samples per pixel
        (_TAG_ROWS_PER_STRIP, 4, 1, h),
        (_TAG_STRIP_COUNTS, 4, 1, len(data)),
        (_TAG_SAMPLE_FORMAT, 3, 1, sample_fmt),
    ]
    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_off)
    out += data
    out += struct.pack("<H", len(tags))
    for tag, vtype, count, value in sorted(tags):
        out += struct.pack("<HHI", tag, vtype, count)
        out += struct.pack("<I", value)
    out += struct.pack("<I", 0)  # next-IFD pointer
    with open(path, "wb") as f:
        f.write(bytes(out))


def parse_image_filename(path: str) -> tuple[str, int]:
    """(dataset, seq) from the reference's `name[_-]NNNNN.ext` convention."""
    m = FILENAME_RE.match(os.path.basename(path))
    if not m:
        return os.path.splitext(os.path.basename(path))[0], 0
    return m.group("name"), int(m.group("number"))


def _decode_one(path: str, content: bytes) -> pd.DataFrame:
    dataset, seq = parse_image_filename(path)
    img = read_tiff_gray(content).astype(np.int32)
    h, w = img.shape
    ys, xs = np.mgrid[0:h, 0:w]
    return pd.DataFrame(
        {
            "dataset": dataset,
            "seq": np.int32(seq),
            "image_id": f"{dataset}-{seq:05d}",
            "y": ys.ravel().astype(np.int32),
            "x": xs.ravel().astype(np.int32),
            "intensity": img.ravel(),
        }
    )


def decode_tiff_pixels(binary_df: DataFrame) -> DataFrame:
    """UDTF-style decode: (path, content) -> H*W pixel rows per file."""
    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                yield _decode_one(path, bytes(content))

    return binary_df.select("path", "content").mapInPandas(
        _decode, schema=PIXEL_SCHEMA
    )


def read_tiff_images(
    spark: SparkSession, input_dir: str, glob: str = "*.tif*"
) -> DataFrame:
    """Batch TIFF source: directory -> pixels DataFrame (S1/S2/S8)."""
    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(input_dir)
    )
    return decode_tiff_pixels(binary)


def stream_tiff_images(
    spark: SparkSession, input_dir: str, glob: str = "*.tif*",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming TIFF source (T1): landing dir -> pixel-row stream."""
    binary = (
        spark.readStream.format("binaryFile")
        # streaming sources cannot infer schemas; binaryFile's is fixed
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", glob)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(input_dir)
    )
    return decode_tiff_pixels(binary)
