"""Driver-side control-file parsers: .imctrl, .poni, .immask.

Role parity: LoadControls (GSASII_imports.py:170-230), LoadControlsPONI +
poni_to_gsasii (GSASII_imports.py:234-330, itself derived from pyFAI's
public `geometry.fit2d.convert_to_Fit2d`), readMasks
(GSASII_imports.py:334-359; mask_widget.py:42-57). These are plain-Python
config parsers that run on the driver (SURVEY §2.1 S5-S7) — no cluster
dependency; their output feeds the broadcast controls record and the
`masks` dimension table.

Independent implementation notes: values are parsed with
`ast.literal_eval` (the formats serialize Python literals), never `eval`.
The PONI->detector-frame conversion implements the published pyFAI Fit2D
convention (cos_tilt = cos(rot1)cos(rot2), tilt-plane rotation from
rot1/rot2, direct distance = L/cos(tilt)) plus the reference's GSAS-II
axis fix-ups (negated tilt, 360-tpr-90 rotation origin).
"""

from __future__ import annotations

import ast
import math
from typing import Any

from xrddatapipeline_spark.calib.geometry import ImageControls

_IMCTRL_STRINGS = {"type", "calibrant", "binType", "SampleShape", "color"}
_IMCTRL_FLOATS = {"rotation"}


def parse_imctrl(text: str) -> dict[str, Any]:
    """Parse `.imctrl` key:value lines with the reference's type dispatch
    (strings / floats / literal lists-dicts; `center` accepts both comma
    and space separated forms)."""
    out: dict[str, Any] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#") or ":" not in line:
            continue
        key, val = line.split(":", 1)
        key, val = key.strip(), val.strip()
        if key in _IMCTRL_STRINGS:
            out[key] = val
        elif key in _IMCTRL_FLOATS:
            out[key] = float(val)
        elif key == "center":
            if "," in val:
                out[key] = list(ast.literal_eval(val))
            else:
                vals = val.strip("[] ").split()
                out[key] = [float(vals[0]), float(vals[1])]
        else:
            try:
                out[key] = ast.literal_eval(val)
            except (ValueError, SyntaxError):
                out[key] = val
    return out


def imctrl_to_controls(d: dict[str, Any], **overrides: Any) -> ImageControls:
    """Build an ImageControls from a parsed .imctrl dict (defaults per
    read_image, GSASII_imports.py:88-166)."""
    center = d.get("center", [0.0, 0.0])
    iotth = tuple(d.get("IOtth", (1.0, 12.7)))
    lraz = tuple(d.get("LRazimuth", (0.0, 360.0)))
    pixel = d.get("pixelSize", [150.0, 150.0])
    size = d.get("size", [256, 256])
    kwargs: dict[str, Any] = dict(
        wavelength=float(d.get("wavelength", 0.24087)),
        distance=float(d.get("distance", 85.0)),
        center_x=float(center[0]),
        center_y=float(center[1]),
        tilt=float(d.get("tilt", 0.0)),
        rotation=float(d.get("rotation", 0.0)),
        azmth_off=float(d.get("azmthOff", 0.0)),
        det_depth=float(d.get("DetDepth", 0.0)),
        det2theta=float(d.get("det2theta", 0.0)),
        pixel_size_x=float(pixel[0]),
        pixel_size_y=float(pixel[1]),
        size_x=int(size[0]),
        size_y=int(size[1]),
        iotth=(float(iotth[0]), float(iotth[1])),
        lr_azimuth=(float(lraz[0]), float(lraz[1])),
        out_channels=int(d.get("outChannels", 2500)),
        pola_val=float(d.get("PolaVal", [0.99])[0])
        if isinstance(d.get("PolaVal"), (list, tuple))
        else float(d.get("PolaVal", 0.99)),
    )
    kwargs.update(overrides)
    extra = {k: v for k, v in d.items() if k not in kwargs}
    controls = ImageControls(**kwargs, extra=extra)
    if "num_chans_om" not in overrides:
        # the reference derives the ring-channel count from the detector
        # span of the IOtth window (cache_creation.py:324-333) rather than
        # reading it from config; an explicit numChans key still wins
        from xrddatapipeline_spark.calib.geometry import derive_num_chans

        if "numChans" in d:
            controls.num_chans_om = int(d["numChans"])
        else:
            try:
                controls.num_chans_om = derive_num_chans(controls)
            except (ValueError, ZeroDivisionError):
                pass  # keep the dataclass default for degenerate geometry
    return controls


def parse_poni(text: str) -> dict[str, Any]:
    """Parse a pyFAI `.poni` file and convert to the detector-frame record
    (distance mm / center mm / tilt deg / rotation deg / wavelength A)."""
    raw: dict[str, Any] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#") or ":" not in line:
            continue
        key, val = line.split(":", 1)
        key, val = key.strip(), val.strip()
        if key == "Detector_config":
            raw[key] = ast.literal_eval(val)
        else:
            try:
                raw[key] = float(val)
            except ValueError:
                raw[key] = val
    return poni_to_detector_frame(raw)


def poni_to_detector_frame(raw: dict[str, Any]) -> dict[str, Any]:
    """pyFAI PONI geometry -> detector-frame scalars (public Fit2D
    convention conversion + GSAS-II axis fix-ups; see module docstring)."""
    rot1, rot2 = raw.get("Rot1", 0.0), raw.get("Rot2", 0.0)
    dist_m, poni1, poni2 = raw["Distance"], raw["Poni1"], raw["Poni2"]
    cos_tilt = math.cos(rot1) * math.cos(rot2)
    sin_tilt = math.sqrt(max(0.0, 1.0 - cos_tilt * cos_tilt))
    tan_tilt = sin_tilt / cos_tilt
    if sin_tilt == 0.0:
        cos_tpr, sin_tpr = 1.0, 0.0
    else:
        cos_tpr = max(-1.0, min(1.0, -math.cos(rot2) * math.sin(rot1) / sin_tilt))
        sin_tpr = math.sin(rot2) / sin_tilt
    direct_dist = 1.0e3 * dist_m / cos_tilt
    tilt = math.degrees(math.acos(cos_tilt))
    tpr = math.degrees(math.acos(cos_tpr))
    if sin_tpr < 0:
        tpr = -tpr
    center_x = (poni2 + dist_m * tan_tilt * cos_tpr) * 1000.0
    if abs(tilt) < 1e-5:
        center_y = poni1 * 1000.0
    else:
        center_y = (poni1 + dist_m * tan_tilt * sin_tpr) * 1000.0
    # GSAS-II frame fix-ups (axis origin differs by 90 deg, tilt sign flips)
    tilt = -tilt
    tpr = 360.0 - tpr
    if tpr > 360.0:
        tpr -= 360.0
    tpr -= 90.0
    if tpr < 0.0:
        tpr += 360.0
    out: dict[str, Any] = {
        "distance": direct_dist,
        "tilt": tilt,
        "rotation": tpr,
        "center": [center_x, center_y],
        "wavelength": raw.get("Wavelength", 0.0) * 1e10,
    }
    det = raw.get("Detector_config") or {}
    if "pixel1" in det:
        out["pixelSize"] = [det["pixel2"] * 1e6, det["pixel1"] * 1e6]
    if "max_shape" in det and det["max_shape"]:
        out["size"] = [det["max_shape"][1], det["max_shape"][0]]
    return out


def parse_metadata_sidecar(text: str) -> dict[str, Any]:
    """Parse a TIFF `.metadata` sidecar (S3, GSASII_imports.py:1086-1114):
    `key=value` lines carrying wavelength / distance / polarization /
    pixel-size scalars; unknown keys kept as strings."""
    out: dict[str, Any] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        key, val = line.split("=", 1)
        key, val = key.strip(), val.strip()
        try:
            out[key] = float(val)
        except ValueError:
            out[key] = val
    return out


_MASK_KEYS = ("Points", "Rings", "Arcs", "Polygons", "Frames", "Thresholds",
              "Xlines", "Ylines")


def parse_immask(text: str) -> dict[str, Any]:
    """Parse a `.immask` geometric-mask file into the masks record:
    Points [x_mm, y_mm, diameter_mm]; Rings [tth_center, tth_width];
    Arcs [tth_center, [azim0, azim1], tth_width]; Polygons / Frames
    vertex lists in mm; Thresholds [[lo, hi], [lo, hi]]; X/Ylines pixel
    indices (serialization per mask_widget.py:1821-1933)."""
    masks: dict[str, Any] = {k: [] for k in _MASK_KEYS}
    masks["Thresholds"] = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#") or ":" not in line:
            continue
        key, val = line.split(":", 1)
        key = key.strip()
        if key in _MASK_KEYS:
            masks[key] = ast.literal_eval(val.strip())
    for key in ("Points", "Rings", "Arcs", "Polygons"):
        masks[key] = [m for m in masks.get(key, []) if len(m)]
    return masks


def write_immask(masks: dict[str, Any], path: str) -> str:
    """Serialize a masks record back to `.immask` (K8 authoring sink,
    mask_widget.py:1821-1933 format: one `Key:literal` line per kind)."""
    with open(path, "w") as f:
        for key in _MASK_KEYS:
            val = masks.get(key)
            if val:
                f.write(f"{key}:{val!r}\n")
    return path
