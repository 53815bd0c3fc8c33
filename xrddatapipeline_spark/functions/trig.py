"""Degree-domain trig and diffraction unit conversions as Column expressions.

Reference parity (SURVEY §2.3 P1/P2/P3):
- degree trig family ``npsind/npcosd/...`` — GSASII_imports.py:27-73
- ``tth_to_q`` / ``q_to_tth`` / ``tth_to_d`` — corrections_and_maps.py:40-49
- Q map from 2theta — corrections_and_maps.py:65-66

These are pure Catalyst expressions (whole-stage-codegen friendly); nothing
here leaves the JVM at execution time.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

FOURPI = 4.0 * math.pi


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def sind(c: Column | str) -> Column:
    return F.sin(F.radians(_col(c)))


def cosd(c: Column | str) -> Column:
    return F.cos(F.radians(_col(c)))


def tand(c: Column | str) -> Column:
    return F.tan(F.radians(_col(c)))


def asind(c: Column | str) -> Column:
    return F.degrees(F.asin(_col(c)))


def acosd(c: Column | str) -> Column:
    return F.degrees(F.acos(_col(c)))


def atand(c: Column | str) -> Column:
    return F.degrees(F.atan(_col(c)))


def atan2d(y: Column | str, x: Column | str) -> Column:
    return F.degrees(F.atan2(_col(y), _col(x)))


def tth_to_q(tth: Column | str, wavelength: float) -> Column:
    """Q = 4*pi*sin(2theta/2)/lambda  (corrections_and_maps.py:40-41)."""
    return F.lit(FOURPI / wavelength) * F.sin(F.radians(_col(tth) / 2.0))


def q_to_tth(q: Column | str, wavelength: float) -> Column:
    """2theta = 2*asin(Q*lambda/(4*pi))  (corrections_and_maps.py:44-45)."""
    return 2.0 * F.degrees(F.asin(_col(q) * F.lit(wavelength / FOURPI)))


def tth_to_d(tth: Column | str, wavelength: float) -> Column:
    """d = lambda / (2*sin(2theta/2))  (corrections_and_maps.py:48-49)."""
    return F.lit(wavelength / 2.0) / F.sin(F.radians(_col(tth) / 2.0))
