"""Geometric mask rasterization as Catalyst predicate columns (F4-F9, M9).

The reference rasterizes geometric mask objects (spots/rings/arcs/polygons/
frames/thresholds/lines — mask_widget.py:1694-1812, MakeMaskMap
GSASII_imports.py:363-424, polymask.for) into dense boolean rasters, in
512-1024 px blocks to fit its Fortran kernel. Here each object becomes a
boolean *expression* over the calib-joined pixel table — whole-stage
codegen'd, no UDF, no blocking (partitioning subsumes it, SURVEY §4):

- spot  [x, y, d] mm        -> (x_mm-X)^2 + (y_mm-Y)^2 < (d/2)^2
  (strict <, matching np.ma.masked_less in MakeMaskMap
  GSASII_imports.py:412 — exact-boundary pixels stay UNmasked)
- ring  [tth, w]            -> |tth - c| <= w/2
- arc   [tth, [a0,a1], w]   -> ring ∧ circular-azimuth membership (P15)
- polygon [[x,y]...] mm     -> even-odd crossing number, expressed as a
  fold (`aggregate`) over the edge array — the polymask.for algorithm as
  a single Catalyst expression
- frame                     -> NOT inside the frame polygon
- thresholds [[lo,hi],...]  -> intensity outside [lo, hi]
- x/ylines                  -> y == k / x == k

A pixel's mm coordinates use the +0.5 center convention shared with the
calib builder.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from xrddatapipeline_spark.calib.geometry import ImageControls


def pixel_mm(c: ImageControls) -> tuple[Column, Column]:
    """(x_mm, y_mm) of pixel centers (mask_widget.py:24-30 scale)."""
    x_mm = (F.col("x") + 0.5) * (c.pixel_size_x / 1000.0)
    y_mm = (F.col("y") + 0.5) * (c.pixel_size_y / 1000.0)
    return x_mm, y_mm


def in_circular_range(azim: Column, a0: float, a1: float) -> Column:
    """Circular azimuth membership with wraparound (modulo_range,
    classification.py:40-43 / P15)."""
    if a0 <= a1:
        return (azim >= a0) & (azim <= a1)
    return (azim >= a0) | (azim <= a1)


def point_in_polygon(x: Column, y: Column, vertices: list[list[float]]) -> Column:
    """Even-odd crossing-number point-in-polygon as a Catalyst fold.

    Equivalent semantics to polymask.for:1-46, expressed as
    `aggregate(edges, 0, crossing-count) % 2 == 1` over a literal edge
    array — stays in whole-stage codegen, no Python."""
    edges = []
    n = len(vertices)
    for i in range(n):
        x1, y1 = vertices[i]
        x2, y2 = vertices[(i + 1) % n]
        edges.append(
            F.struct(
                F.lit(float(x1)).alias("x1"), F.lit(float(y1)).alias("y1"),
                F.lit(float(x2)).alias("x2"), F.lit(float(y2)).alias("y2"),
            )
        )
    edge_arr = F.array(*edges)
    crossings = F.aggregate(
        edge_arr,
        F.lit(0),
        lambda acc, e: acc
        + F.when(
            ((e["y1"] > y) != (e["y2"] > y))
            & (
                x
                < (e["x2"] - e["x1"]) * (y - e["y1"]) / (e["y2"] - e["y1"])
                + e["x1"]
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return crossings % 2 == 1


def geometric_mask_predicate(masks: dict[str, Any], c: ImageControls) -> Column:
    """OR-composition of every geometric mask object into one boolean
    column over a calib-joined pixel row (needs tth, azim, intensity,
    x, y). Mirrors the reference's mask OR-composition (pipeline.py:149-165)."""
    x_mm, y_mm = pixel_mm(c)
    preds: list[Column] = []
    for spot in masks.get("Points", []):
        sx, sy, d = float(spot[0]), float(spot[1]), float(spot[2])
        preds.append(
            (x_mm - sx) ** 2 + (y_mm - sy) ** 2 < (d / 2.0) ** 2
        )
    for ring in masks.get("Rings", []):
        ct, w = float(ring[0]), float(ring[1])
        preds.append(F.abs(F.col("tth") - ct) <= w / 2.0)
    for arc in masks.get("Arcs", []):
        ct, (a0, a1), w = float(arc[0]), arc[1], float(arc[2])
        preds.append(
            (F.abs(F.col("tth") - ct) <= w / 2.0)
            & in_circular_range(F.col("azim"), float(a0), float(a1))
        )
    for poly in masks.get("Polygons", []):
        preds.append(point_in_polygon(x_mm, y_mm, poly))
    for frame in [masks["Frames"]] if masks.get("Frames") else []:
        preds.append(~point_in_polygon(x_mm, y_mm, frame))
    thresholds = masks.get("Thresholds") or []
    if len(thresholds) >= 2 and thresholds[1]:
        lo, hi = thresholds[1]
        preds.append((F.col("intensity") < lo) | (F.col("intensity") > hi))
    for yy in masks.get("Xlines", []):  # Xlines mask whole rows
        preds.append(F.col("y") == int(yy))
    for xx in masks.get("Ylines", []):
        preds.append(F.col("x") == int(xx))
    if not preds:
        return F.lit(False)
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return out


def masks_table_rows(masks: dict[str, Any]) -> list[tuple[str, list[float]]]:
    """Flatten the masks record to typed rows (kind, params) for the
    `masks` dimension table (SURVEY §1.4)."""
    rows: list[tuple[str, list[float]]] = []
    for spot in masks.get("Points", []):
        rows.append(("point", [float(v) for v in spot]))
    for ring in masks.get("Rings", []):
        rows.append(("ring", [float(v) for v in ring]))
    for arc in masks.get("Arcs", []):
        ct, (a0, a1), w = arc
        rows.append(("arc", [float(ct), float(a0), float(a1), float(w)]))
    for poly in masks.get("Polygons", []):
        rows.append(("polygon", [float(v) for pt in poly for v in pt]))
    if masks.get("Frames"):
        rows.append(("frame", [float(v) for pt in masks["Frames"] for v in pt]))
    thresholds = masks.get("Thresholds") or []
    if len(thresholds) >= 2 and thresholds[1]:
        rows.append(("threshold", [float(v) for v in thresholds[1]]))
    for yy in masks.get("Xlines", []):
        rows.append(("xline", [float(yy)]))
    for xx in masks.get("Ylines", []):
        rows.append(("yline", [float(xx)]))
    return rows
