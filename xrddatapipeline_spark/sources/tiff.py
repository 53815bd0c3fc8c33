"""TIFF detector-image source: variant-sniffing decoder + binaryFile -> pixels.

Role parity with the reference's image readers (`load_image`,
GSASII_imports.py:82-84; `GetTifData` GSASII_imports.py:1068-1399, which
sniffs ~20 detector pseudo-TIFF variants). `read_detector_tiff` is an
independent implementation of that sniffing dispatch: a standard TIFF 6.0
IFD walk (the reference's sequential walk reads the same single-value tags)
followed by the per-detector (tag-presence, bit-depth, strip-offset,
image-size) decision tree — Pilatus/Pilatus3, GE/Dexela, CHESS, ImageJ,
gain maps, DND, APS Gold, PE/PE4k, MedOptics D1, MAR225/325, Rayonix,
11-ID-C, scanCCD, Eiger 1M and the fixed-size beamline formats. Baseline
strip-organized TIFF 6.0 files fall back to `read_tiff_gray`.

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
from pyspark.sql import functions as F

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
_TAG_PHOTOMETRIC = 262
_TAG_FILL_ORDER = 266
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


def _parse_ifd(data: bytes) -> tuple[str, dict[int, tuple[int, int, list]]]:
    """Byte order + first-IFD tag table: {tag: (type, count, values)}.

    For out-of-line values (size > 4 bytes) `values` holds the decoded
    payload; ASCII (type 2) values keep the raw *offset* in values[0] with
    the decoded bytes in values[1] so callers can mirror the reference's
    offset arithmetic (GSASII_imports.py:1139-1141, 1231-1233).
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
    tags: dict[int, tuple[int, int, list]] = {}
    for i in range(n_tags):
        ent = data[ifd_off + 2 + 12 * i: ifd_off + 2 + 12 * (i + 1)]
        tag, vtype, count = struct.unpack(bo + "HHI", ent[:8])
        if vtype == 2:
            size = count
            if size <= 4:
                off = ifd_off + 2 + 12 * i + 8
            else:
                (off,) = struct.unpack(bo + "I", ent[8:12])
            tags[tag] = (vtype, count, [off, data[off:off + count]])
        else:
            tags[tag] = (
                vtype, count,
                _read_tag_values(data, bo, vtype, count, ent[8:12]),
            )
    return bo, tags


def read_tiff_gray(data: bytes) -> np.ndarray:
    """Decode an uncompressed grayscale baseline TIFF to a 2-D numpy array.

    Handles both byte orders, 1-bit bilevel (BitsPerSample absent or 1 —
    the layout the reference's tifffile-written boolean mask sinks use;
    see docs/GuiliangJun25_tutorial_output/masks/*.tif) and 8/16/32-bit
    unsigned/signed/float samples, and multi-strip layouts. Raises
    ValueError for compressed or multi-sample images (out of scope; see
    module docstring).
    """
    bo, full = _parse_ifd(data)
    tags = {t: v[2] for t, v in full.items()}

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

    offsets = tags[_TAG_STRIP_OFFSETS]
    if bits == 1:
        # bilevel: rows are packed 8 pixels/byte, MSB first (TIFF
        # FillOrder 1, the only value we decode — LSB-first files would
        # otherwise come back silently bit-reversed), each row padded to
        # a whole byte.
        #
        # PhotometricInterpretation 0 (WhiteIsZero) is deliberately NOT
        # inverted (round 10): the reference reads mask TIFFs via
        # skimage.io.imread -> tifffile (GSASII_imports.py:82-88), which
        # returns the STORED samples uninverted, and the surviving golden
        # pair proves it end-to-end — the tutorial input
        # configs/insitu_mask.tif is photometric-0 and the reference's
        # maps/CeO2_coincell_d900-00000_predef.tif (written from the
        # read-back mask, cache_creation.py:239-268) is photometric-1
        # with the IDENTICAL bit payload (75,562 masked pixels; the
        # spec-inverted reading would mask 98% of the detector).
        # Photometric 0/1 on bilevel masks is display polarity; the
        # payload bit is the mask truth the pipeline consumes.
        fill_order = int(tags.get(_TAG_FILL_ORDER, [1])[0])
        if fill_order != 1:
            raise ValueError(f"unsupported TIFF fill order {fill_order}")
        row_bytes = (width + 7) // 8
        counts = tags.get(_TAG_STRIP_COUNTS)
        if counts is None:
            # the single-element default would zip against offsets[0]
            # only and silently decode bytes past the first strip —
            # reject loudly, like the fill-order check above
            if len(offsets) > 1:
                raise ValueError(
                    "TIFF StripByteCounts missing with "
                    f"{len(offsets)} strips — cannot infer strip sizes"
                )
            counts = [height * row_bytes]
        payload = b"".join(
            data[int(o): int(o) + int(c)] for o, c in zip(offsets, counts)
        )
        packed = np.frombuffer(
            payload, dtype=np.uint8, count=height * row_bytes
        ).reshape(height, row_bytes)
        return np.unpackbits(packed, axis=1)[:, :width].astype(bool)

    dtype = np.dtype(f"{bo}{kind}{bits // 8}")
    counts = tags.get(_TAG_STRIP_COUNTS)
    if counts is None:
        if len(offsets) > 1:
            raise ValueError(
                "TIFF StripByteCounts missing with "
                f"{len(offsets)} strips — cannot infer strip sizes"
            )
        counts = [height * width * (bits // 8)]
    payload = b"".join(
        data[int(o): int(o) + int(c)] for o, c in zip(offsets, counts)
    )
    arr = np.frombuffer(payload, dtype=dtype, count=height * width)
    return arr.reshape(height, width)


def _raw(data: bytes, offset: int, dtype: str, npix: int) -> np.ndarray:
    """Raw pixel payload at a fixed byte offset (the pseudo-TIFF pattern)."""
    dt = np.dtype(dtype)
    need = offset + npix * dt.itemsize
    if len(data) < need:
        raise ValueError(
            f"truncated detector TIFF: need {need} bytes, have {len(data)}"
        )
    return np.frombuffer(data, dtype=dt, count=npix, offset=offset)


def _is_self_described_baseline(
    ifd: dict[int, tuple[int, int, list]], npix: int, bits: int
) -> bool:
    if _TAG_SAMPLE_FORMAT not in ifd or _TAG_STRIP_COUNTS not in ifd:
        return False
    counts = ifd[_TAG_STRIP_COUNTS][2]
    return bool(counts) and sum(int(c) for c in counts) == npix * (bits // 8)


def read_detector_tiff(
    data: bytes, metadata: dict | None = None
) -> tuple[str, dict, np.ndarray]:
    """Sniff + decode a detector pseudo-TIFF; (tif_type, header, image).

    Independent reimplementation of the reference's `GetTifData` decision
    tree (GSASII_imports.py:1068-1399): dispatch on tag presence
    (34710 MAR / 272 Model / 270 Description / 262 Photometric), bit depth
    (tag 258), strip offset (tag 273) and image size, each branch reading a
    raw pixel payload at a detector-specific offset/dtype. Returns the image
    as int32 shaped (height, width) plus the header dict the reference
    builds (pixelSize um, center mm, wavelength A, distance mm, PolaVal,
    det2theta) with the same defaulting rules. `metadata` is the parsed
    `.metadata` sidecar (sources/controls.py); its `dataType` selects the
    PE float32-vs-int32 payload and its pixel sizes back-fill `pixelSize`.
    Raises ValueError for formats outside the reference's table.
    """
    meta = metadata or {}
    data_type = int(meta.get("dataType", 5))
    bo, ifd = _parse_ifd(data)

    def tagv(tag: int, idx: int = 0):
        return ifd[tag][2][idx]

    sizexy = [int(tagv(_TAG_WIDTH)), int(tagv(_TAG_HEIGHT))]
    nx, ny = sizexy
    npix = nx * ny
    bits = int(tagv(_TAG_BITS)) if _TAG_BITS in ifd else 0
    strip0 = int(tagv(_TAG_STRIP_OFFSETS)) if _TAG_STRIP_OFFSETS in ifd else -1
    # tag 273/279 with count>1 marks a multislice (CheMin-style) file
    n_slice = ifd[_TAG_STRIP_OFFSETS][1] if _TAG_STRIP_OFFSETS in ifd else 1

    tif_type = None
    image = None
    pixy = None
    center = [None, None]
    wavelength = distance = polarization = None

    if 34710 in ifd:
        # MAR CCD: 4096-byte frame header then uint16 pixels. The reference
        # delegates to ReadMarCCDFrame for header metadata; the pixel
        # payload layout is the same as MAR225/325 below.
        tif_type = "MARCCD"
        pixy = [158.0, 158.0]
        image = _raw(data, 4096, bo + "u2", npix).astype(np.int32)
    elif n_slice > 1:
        # CheMin multislice: PIL-decoded, x10 scaled, flipped (reference
        # GSASII_imports.py:1188-1208). PIL is optional in this container.
        try:
            from PIL import Image as Im
        except ImportError as e:
            raise ValueError("multislice TIFF needs Pillow") from e
        import io

        tif_type = "CheMin"
        pixy = [40.0, 40.0]
        image = (
            np.flipud(np.array(Im.open(io.BytesIO(data)))).astype(np.int32)
            * 10
        )
        distance = 18.0
        center = [pixy[0] * sizexy[0] / 2000.0, 0.0]
        wavelength = 1.78892
    elif 272 in ifd:  # Model tag
        model = bytes(ifd[272][2][1])
        if b"PILATUS" in model:
            tif_type = "Pilatus"
            pixy = [172.0, 172.0]
            image = _raw(data, 4096, bo + "i4", npix).astype(np.int32)
        elif bits == 16:
            if sizexy in ([3888, 3072], [3072, 3888]):
                tif_type = "Dexela"
                pixy = [74.8, 74.8]
            else:
                tif_type = "GE"
                pixy = [200.0, 200.0]
            image = _raw(data, 8, bo + "u2", npix).astype(np.int32)
        elif bits == 32:
            tif_type = "CHESS"
            pixy = [200.0, 200.0]
            image = _raw(data, 8, bo + "u4", npix).astype(np.int32)
    elif 270 in ifd:  # ImageDescription tag
        desc_off = int(ifd[270][2][0])
        desc = data[desc_off:strip0] if strip0 > desc_off else bytes(
            ifd[270][2][1]
        )
        if b"Pilatus3" in desc:
            tif_type = "Pilatus3"
            pixy = [172.0, 172.0]
            image = _raw(data, strip0, bo + "i4", npix).astype(np.int32)
        elif b"ImageJ" in desc:
            tif_type = "ImageJ"
            if bits == 32:
                pixy = [200.0, 200.0]
                image = _raw(data, strip0, bo + "i4", npix).astype(np.int32)
            elif bits == 16:
                pixy = [109.92, 109.92]  # LCLS ImageJ files
                image = _raw(data, strip0, bo + "u2", npix).astype(np.int32)
        else:  # gain map (APS 11-ID-C): float32 x1000
            tif_type = "Gain map"
            pixy = [200.0, 200.0]
            image = (
                _raw(data, strip0, bo + "f4", npix) * 1000
            ).astype(np.int32)
    elif 262 in ifd and int(tagv(262)) > 4:
        tif_type = "DND"
        pixy = [158.0, 158.0]
        image = _raw(data, 512, bo + "u2", npix).astype(np.int32)
    elif _is_self_described_baseline(ifd, npix, bits):
        # The remaining branches dispatch on image size alone. A file whose
        # IFD carries a consistent SampleFormat + StripByteCounts is a real
        # strip-organized TIFF (e.g. our own `write_tiff_gray` output) —
        # route it to the baseline reader rather than guessing a detector
        # payload by size.
        raise ValueError("self-described baseline TIFF")
    elif sizexy == [1536, 1536]:
        tif_type = "APS Gold"
        pixy = [150.0, 150.0]
        image = _raw(data, 64, bo + "u2", npix).astype(np.int32)
    elif sizexy in ([2048, 2048], [1024, 1024], [3072, 3072]):
        if strip0 == 8:
            if bits == 32:
                tif_type = "PE"
                pixy = [200.0, 200.0]
                dt = "f4" if data_type == 5 else "i4"
                image = _raw(data, 8, bo + dt, npix).astype(np.int32)
            elif bits == 16:
                tif_type = "MedOptics D1"
                pixy = [46.9, 46.9]
                image = _raw(data, 8, bo + "u2", npix).astype(np.int32)
        elif strip0 == 4096:
            if sizexy[0] == 3072:
                tif_type, pixy = "MAR225", [73.0, 73.0]
            else:
                tif_type, pixy = "MAR325", [158.0, 158.0]
            image = _raw(data, 4096, bo + "u2", npix).astype(np.int32)
        elif strip0 == 512:
            tif_type = "11-ID-C"
            pixy = [200.0, 200.0]
            image = _raw(data, 512, bo + "u2", npix).astype(np.int32)
    elif sizexy == [4096, 4096]:
        if strip0 == 8:
            if bits == 16:
                tif_type = "scanCCD"
                pixy = [9.0, 9.0]
                image = _raw(data, 8, bo + "u2", npix).astype(np.int32)
            elif bits == 32:
                tif_type = "PE4k"
                pixy = [100.0, 100.0]
                image = (
                    _raw(data, 8, bo + "f4", npix) / 2.0**4
                ).astype(np.int32)
        elif strip0 == 4096:
            tif_type = "Rayonix"
            pixy = [73.242, 73.242]
            image = _raw(data, 4096, bo + "u2", npix).astype(np.int32)
    elif sizexy == [391, 380]:
        tif_type = "pixium"
        pixy = [109.92, 109.92]
        image = _raw(data, 8, bo + "i2", npix).astype(np.int32)
    elif sizexy == [380, 391]:
        tif_type = "pixium-8"
        pixy = [109.92, 109.92]
        image = _raw(data, 110, "u1", npix).astype(np.int32)
    elif sizexy == [825, 830]:
        tif_type = "anonymous-8"
        pixy = [109.92, 109.92]
        image = _raw(data, 8, "u1", npix).astype(np.int32)
    elif sizexy == [1800, 1800]:
        tif_type = "anonymous-1800"
        pixy = [109.92, 109.92]
        image = _raw(data, 110, "u1", npix).astype(np.int32)
    elif sizexy == [2880, 2880]:
        tif_type = "APS-2880"
        pixy = [150.0, 150.0]
        image = _raw(data, 8, bo + "f4", npix).astype(np.int32)
    elif sizexy == [3070, 1102]:
        tif_type = "Eiger 1M"
        pixy = [75.0, 75.0]
        image = _raw(data, 8, bo + "u4", npix).astype(np.int32)
    elif sizexy == [1024, 402]:
        tif_type = "anonymous-1024x402"
        pixy = [56.0, 56.0]
        image = _raw(data, 8, bo + "u2", npix).astype(np.int32)

    if image is None or image.size != npix:
        raise ValueError("not a known detector tiff file")
    image = image.reshape(sizexy[1], sizexy[0])

    # reference defaulting rules (GSASII_imports.py:1383-1398)
    if not center[0]:
        center = [pixy[0] * sizexy[0] / 2000.0, pixy[1] * sizexy[1] / 2000.0]
    wavelength = float(meta.get("wavelength", wavelength or 0.10))
    distance = float(meta.get("distance", distance or 100.0))
    polarization = float(meta.get("polarization", polarization or 0.99))
    if "detectorxpixelsize" in meta and "detectorypixelsize" in meta:
        if pixy is None:
            pixy = [
                float(meta["detectorxpixelsize"]),
                float(meta["detectorypixelsize"]),
            ]
    header = {
        "tifType": tif_type,
        "pixelSize": pixy,
        "wavelength": wavelength,
        "distance": distance,
        "setdist": distance,
        "center": center,
        "size": sizexy,
        "PolaVal": [polarization, False],
        "samplechangerpos": float(meta.get("samplechangercoordinate", 0.0)),
        "det2theta": 0.0,
    }
    return tif_type, header, image


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


def decode_image(content: bytes, metadata: dict | None = None) -> np.ndarray:
    """Decode any supported TIFF to int32: detector sniff, then baseline.

    Mirrors the reference's load order (`GetTifData` first, generic reader
    as fallback): the pseudo-TIFF variants carry raw payloads at magic
    offsets that a strip-based reader would mis-assemble, so the detector
    dispatch must win when it recognizes the file.
    """
    try:
        _, _, img = read_detector_tiff(content, metadata)
        return img
    except (ValueError, KeyError):
        return read_tiff_gray(content).astype(np.int32)


def _decode_one(path: str, content: bytes) -> pd.DataFrame:
    dataset, seq = parse_image_filename(path)
    img = decode_image(content)
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
    skip_names: "set[str] | None" = None,
) -> DataFrame:
    """Streaming TIFF source (T1): landing dir -> pixel-row stream.

    ``skip_names`` (T4 clear-queue manifest) drops those file basenames
    BEFORE the decode UDTF — a cleared file costs a filtered row, not a
    decoded image."""
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
    if skip_names:
        binary = binary.where(
            ~F.element_at(F.split("path", "/"), -1).isin(sorted(skip_names))
        )
    return decode_tiff_pixels(binary)
