"""Detector geometry: per-pixel 2theta / azimuth / Q / distance / polarization.

Role parity: Make2ThetaAzimuthMap + GetTthAzmG2 + Polarization in the
reference (GSASII_imports.py:515-554, 1023-1046, 558-579; SURVEY §2.3
P8-P11). The math here is an independent formulation of standard
flat-detector powder-diffraction geometry (as published in the pyFAI and
GSAS-II papers), NOT a port:

- A pixel sits at p = (dx, dy, 0) mm in the detector frame, measured from
  the beam center (point of normal incidence at zero tilt).
- The detector is tilted by ``tilt`` degrees about an in-plane axis at
  ``rotation`` degrees; lab position r = D*z_hat + R @ p with
  R = Rz(rotation) @ Rx(tilt) @ Rz(-rotation).
- 2theta = atan2(hypot(X, Y), Z); azimuth = atan2(Y, X) + azmthOff (mod
  360); G = |r|^2 / D^2 (the dist_sq solid-angle/obliquity factor, applied
  as G**1.5 by the integrator, pipeline.py:63); Q = 4 pi sin(theta)/lambda.
- Kahn polarization factor with polarization fraction P.

Pixel centers are sampled at +0.5 px (GSASII_imports.py:528 convention).

Two implementations kept in lockstep and cross-checked by tests:
``compute_maps_numpy`` (driver-side oracle + fixture generator) and the
Spark column expressions in ``cache.py`` (the engine path).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np


@dataclass
class ImageControls:
    """Flat calibration record (reference .imctrl semantics, GSASII_imports.py:88-166)."""

    wavelength: float = 0.24087  # Angstrom
    # 85 mm puts IOtth_hi=12.7 deg at the edge of a 38.4 mm detector
    # (256 px x 150 um) — geometrically consistent defaults
    distance: float = 85.0  # mm sample-detector along beam
    center_x: float = 19.2  # mm beam center on detector
    center_y: float = 19.2
    tilt: float = 0.0  # deg
    rotation: float = 0.0  # deg, azimuth of tilt axis
    azmth_off: float = 0.0  # deg added to azimuth
    pixel_size_x: float = 150.0  # micron
    pixel_size_y: float = 150.0
    size_x: int = 256  # pixels
    size_y: int = 256
    iotth: tuple[float, float] = (1.0, 12.7)  # integration 2theta range, deg
    lr_azimuth: tuple[float, float] = (0.0, 360.0)
    out_channels: int = 250  # integration bins
    num_chans_om: int = 100  # outlier-mask ring count
    pola_val: float = 0.99
    esd_mul: float = 3.0
    dataset: str = "synthetic"
    extra: dict = field(default_factory=dict)

    @property
    def q_range(self) -> tuple[float, float]:
        lo = 4 * math.pi * math.sin(math.radians(self.iotth[0] / 2)) / self.wavelength
        hi = 4 * math.pi * math.sin(math.radians(self.iotth[1] / 2)) / self.wavelength
        return lo, hi

    def q_band_edges(self, n_bands: int = 100) -> np.ndarray:
        lo, hi = self.q_range
        return np.linspace(lo, hi, n_bands + 1)


def rotation_matrix(tilt_deg: float, rotation_deg: float) -> np.ndarray:
    """R = Rz(rot) @ Rx(tilt) @ Rz(-rot): tilt about an in-plane axis at
    azimuth ``rotation``. Returns a 3x3 float64 matrix of plain scalars so
    the Spark path can inline its entries as literals."""
    t = math.radians(tilt_deg)
    r = math.radians(rotation_deg)
    ct, st = math.cos(t), math.sin(t)
    cr, sr = math.cos(r), math.sin(r)
    rz = np.array([[cr, -sr, 0.0], [sr, cr, 0.0], [0.0, 0.0, 1.0]])
    rx = np.array([[1.0, 0.0, 0.0], [0.0, ct, -st], [0.0, st, ct]])
    rzi = rz.T
    return rz @ rx @ rzi


def compute_maps_numpy(c: ImageControls) -> dict[str, np.ndarray]:
    """Dense (size_y, size_x) maps: tth, azim, q, dist_sq (G), pol.

    The numpy oracle for the Spark calib builder and the generator used by
    the synthetic image fixtures.
    """
    px_mm_x = c.pixel_size_x / 1000.0
    px_mm_y = c.pixel_size_y / 1000.0
    ys, xs = np.mgrid[0 : c.size_y, 0 : c.size_x]
    dx = (xs + 0.5) * px_mm_x - c.center_x
    dy = (ys + 0.5) * px_mm_y - c.center_y
    rmat = rotation_matrix(c.tilt, c.rotation)
    lab_x = rmat[0, 0] * dx + rmat[0, 1] * dy
    lab_y = rmat[1, 0] * dx + rmat[1, 1] * dy
    lab_z = rmat[2, 0] * dx + rmat[2, 1] * dy + c.distance
    rho = np.hypot(lab_x, lab_y)
    tth = np.degrees(np.arctan2(rho, lab_z))
    azim = np.mod(np.degrees(np.arctan2(lab_y, lab_x)) + c.azmth_off, 360.0)
    q = 4.0 * np.pi * np.sin(np.radians(tth / 2.0)) / c.wavelength
    dist_sq = (lab_x**2 + lab_y**2 + lab_z**2) / (c.distance**2)
    pol = _polarization_numpy(azim, tth, c.pola_val)
    return {"tth": tth, "azim": azim, "q": q, "dist_sq": dist_sq, "pol": pol}


def _polarization_numpy(azim_deg: np.ndarray, tth_deg: np.ndarray, p: float) -> np.ndarray:
    """Kahn polarization factor (GSASII_imports.py:558-579 semantics)."""
    a = np.radians(azim_deg)
    t = np.radians(tth_deg)
    ca2, sa2 = np.cos(a) ** 2, np.sin(a) ** 2
    return ((1.0 - p) * ca2 + p * sa2) * np.cos(t) ** 2 + (1.0 - p) * sa2 + p * ca2


def tth_bin_index_numpy(tth: np.ndarray, lo: float, hi: float, n: int) -> np.ndarray:
    """Mirror of functions.binning.tth_bin_index (clamp-to-0 semantics)."""
    width = (hi - lo) / n
    idx = (np.floor((tth - lo) / width) + 1).astype(np.int64)
    idx[(tth < lo) | (tth >= hi)] = 0
    return idx
