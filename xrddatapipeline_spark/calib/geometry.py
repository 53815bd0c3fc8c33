"""Detector geometry: per-pixel 2theta / azimuth / Q / distance / polarization.

Formula parity with the reference's map builders (Make2ThetaAzimuthMap,
GSASII_imports.py:515-554; GetTthAzmG2 :1027-1046 for coplanar detectors;
GetTthAzmG :974-1019 for detector 2theta != 0; peneCorr :1063-1065;
Polarization :556-579; SURVEY §2.3 P8-P11):

- A pixel sits at p = (dx, dy, 0) mm in the detector frame measured from
  the beam center; pixel centers sampled at +0.5 px (GSASII_imports.py:528).
- The beam meets the tilted detector plane at distance
  ``dist = D / cos(tilt)`` along the beam axis (D = ``distance``).
- Coplanar branch (det2theta == 0, GetTthAzmG2): the out-of-plane drop of
  a pixel under (tilt, rotation) is ``dz = sin(tilt) * (dx sin(rot) -
  dy cos(rot))``; the transverse radius is ``sqrt(dx^2 + dy^2 - dz^2)``
  and ``2theta = atan(radius / (dist - dz + dzp))`` with ``dzp`` the
  detector-penetration term ``DetDepth * (1 - cos(2theta0)) * dist^2 /
  1000`` evaluated at the uncorrected angle. Azimuth is measured in the
  detector plane: ``atan2(dy, dx) + azmthOff (mod 360)``.
- Swung-detector branch (det2theta != 0, GetTthAzmG): lab vector
  v = M @ p + dist * z_hat with M = Rz(rot) @ Rx(tilt) @ Rz(rot)^T, the
  penetration term added to v_z, then the detector-arm rotation w =
  Ry(det2theta)^T @ v; 2theta = acos(w_z / |w|), azimuth from (w_y, w_x).
- Geometric correction (both branches): G = ((dx - x0x)^2 + (dy - x0y)^2
  + D^2) / D^2 with x0 = D tan(tilt) at azimuth ``rotation`` — the
  1/cos^2(2theta) obliquity factor generalized to tilt, applied as G**1.5
  by the integrator (pipeline.py:63).
- Q = 4 pi sin(theta) / lambda; Kahn polarization factor evaluated at
  azimuth - 90 deg (Make2ThetaAzimuthMap:553).

Two implementations kept in lockstep and cross-checked by tests at 1e-12:
``compute_maps_numpy`` (driver-side oracle + fixture generator) and the
Spark column expressions in ``cache.py`` (the engine path); tests also pin
both against an independently-coded transcription of the reference
formulas over tilted / DetDepth / det2theta configs.
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
    det_depth: float = 0.0  # detector penetration coefficient (DetDepth)
    det2theta: float = 0.0  # detector-arm 2theta swing, deg
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


def penetration_shift(tth_deg: np.ndarray, dep: float, dist: float):
    """Detector-penetration depth correction dzp (peneCorr,
    GSASII_imports.py:1063-1065): dep * (1 - cos(2theta)) * dist^2 / 1000."""
    return dep * (1.0 - np.cos(np.radians(tth_deg))) * dist**2 / 1000.0


def _maps_coplanar_numpy(dx, dy, c: ImageControls):
    """(tth, azim) for det2theta == 0 (GetTthAzmG2 parity, :1027-1046)."""
    t, r = math.radians(c.tilt), math.radians(c.rotation)
    dist = c.distance / math.cos(t)
    dz = math.sin(t) * (dx * math.sin(r) - dy * math.cos(r))
    rad = np.sqrt(np.maximum(dx * dx + dy * dy - dz * dz, 0.0))
    tth0 = np.degrees(np.arctan(rad / (dist - dz)))
    dzp = penetration_shift(tth0, c.det_depth, dist)
    tth = np.degrees(np.arctan2(rad, dist - dz + dzp))
    azim = np.mod(np.degrees(np.arctan2(dy, dx)) + c.azmth_off, 360.0)
    return tth, azim


def _maps_det2theta_numpy(dx, dy, c: ImageControls):
    """(tth, azim) for det2theta != 0 (GetTthAzmG parity, :974-1019)."""
    t = math.radians(c.tilt)
    dist = c.distance / math.cos(t)
    m = rotation_matrix(c.tilt, c.rotation)
    vx = m[0, 0] * dx + m[0, 1] * dy
    vy = m[1, 0] * dx + m[1, 1] * dy
    vz = m[2, 0] * dx + m[2, 1] * dy + dist
    if c.det_depth:
        norm0 = np.sqrt(vx * vx + vy * vy + vz * vz)
        tth0 = np.degrees(np.arccos(vz / norm0))
        vz = vz + penetration_shift(tth0, c.det_depth, dist)
    d = math.radians(c.det2theta)
    cd, sd = math.cos(d), math.sin(d)
    wx = cd * vx - sd * vz
    wy = vy
    wz = sd * vx + cd * vz
    norm = np.sqrt(wx * wx + wy * wy + wz * wz)
    tth = np.degrees(np.arccos(wz / norm))
    azim = np.mod(np.degrees(np.arctan2(wy, wx)) + c.azmth_off, 360.0)
    return tth, azim


def compute_maps_numpy(c: ImageControls) -> dict[str, np.ndarray]:
    """Dense (size_y, size_x) maps: tth, azim, q, dist_sq (G), pol.

    The numpy oracle for the Spark calib builder and the generator used by
    the synthetic image fixtures. Branches exactly as the reference does
    (Make2ThetaAzimuthMap:544-551): GetTthAzmG when det2theta != 0, else
    GetTthAzmG2.
    """
    px_mm_x = c.pixel_size_x / 1000.0
    px_mm_y = c.pixel_size_y / 1000.0
    ys, xs = np.mgrid[0 : c.size_y, 0 : c.size_x]
    dx = (xs + 0.5) * px_mm_x - c.center_x
    dy = (ys + 0.5) * px_mm_y - c.center_y
    if c.det2theta:
        tth, azim = _maps_det2theta_numpy(dx, dy, c)
    else:
        tth, azim = _maps_coplanar_numpy(dx, dy, c)
    q = 4.0 * np.pi * np.sin(np.radians(tth / 2.0)) / c.wavelength
    # geometric correction: obliquity about the tilt-displaced pole
    # (GetTthAzmG2:1041-1045 — same expression in both reference branches)
    t, r = math.radians(c.tilt), math.radians(c.rotation)
    x0 = c.distance * math.tan(t)
    x0x, x0y = x0 * math.cos(r), x0 * math.sin(r)
    dist_sq = ((dx - x0x) ** 2 + (dy - x0y) ** 2 + c.distance**2) / (
        c.distance**2
    )
    pol = _polarization_numpy(azim - 90.0, tth, c.pola_val)
    return {"tth": tth, "azim": azim, "q": q, "dist_sq": dist_sq, "pol": pol}


def _polarization_numpy(azm_deg: np.ndarray, tth_deg: np.ndarray, p: float) -> np.ndarray:
    """Kahn polarization factor (Polarization, GSASII_imports.py:556-579).

    ``azm_deg`` is the angle the reference passes — the map builder calls
    this with azimuth - 90 deg (Make2ThetaAzimuthMap:553).
    """
    a = np.radians(azm_deg)
    t = np.radians(tth_deg)
    ca2, sa2 = np.cos(a) ** 2, np.sin(a) ** 2
    return ((1.0 - p) * ca2 + p * sa2) * np.cos(t) ** 2 + (1.0 - p) * sa2 + p * ca2


def conic_params(tth_deg: float, dxy: float, dist: float, cent, tilt_deg: float,
                 phi_deg: float):
    """Ellipse/hyperbola parameters of the constant-2theta conic on the
    detector (Dandelin-sphere construction, GetEllipse2,
    GSASII_imports.py:856-935): returns (center, phi, [minor, major]) with
    the minor radius negative for the hyperbola branch."""
    stth = math.sin(math.radians(tth_deg))
    cosb = math.cos(math.radians(tilt_deg))
    sinb = math.sin(math.radians(tilt_deg))
    tanb = math.tan(math.radians(tilt_deg))
    tbm = math.tan(math.radians((tth_deg - tilt_deg) / 2.0))
    tbp = math.tan(math.radians((tth_deg + tilt_deg) / 2.0))
    d = dist + dxy
    radii = [0.0, 0.0]
    if tth_deg + abs(tilt_deg) < 90.0:  # ellipse
        fplus = d * tanb * stth / (cosb + stth)
        fminus = d * tanb * stth / (cosb - stth)
        vplus = d * (tanb + (1 + tbm) / (1 - tbm)) * stth / (cosb + stth)
        vminus = d * (tanb + (1 - tbp) / (1 + tbp)) * stth / (cosb - stth)
        radii[0] = math.sqrt((vplus + vminus) ** 2 - (fplus + fminus) ** 2) / 2.0
        radii[1] = (vplus + vminus) / 2.0
        zdis = (fplus - fminus) / 2.0
    else:  # hyperbola
        f = d * abs(tanb) * stth / (cosb + stth)
        v = d * (abs(tanb) + math.tan(math.radians(tth_deg - abs(tilt_deg))))
        delt = d * stth * (1.0 + stth * cosb) / (abs(sinb) * cosb * (stth + cosb))
        eps = (v - f) / (delt - v)
        radii[0] = -eps * (delt - f) / math.sqrt(eps**2 - 1.0)
        radii[1] = eps * (delt - f) / (eps**2 - 1.0)
        zdis = f + radii[1] * eps if tilt_deg > 0 else -f
    phi_r = math.radians(phi_deg)
    elcent = [
        cent[0] + zdis * math.sin(phi_r),
        cent[1] - zdis * math.cos(phi_r),
    ]
    return elcent, phi_deg, radii


def detector_xy(dsp: float, azm_deg: float, c: ImageControls):
    """Detector (x, y) mm of the point at d-spacing ``dsp`` and azimuth
    ``azm`` (GetDetectorXY2 parity, GSASII_imports.py:798-854): conic
    parameters from the Dandelin construction (with penetration shift),
    then the polar radius of the conic at the requested azimuth."""
    tth = 2.0 * math.degrees(math.asin(c.wavelength / (2.0 * dsp)))
    dxy = float(penetration_shift(np.float64(tth), c.det_depth, c.distance))
    cent = (c.center_x, c.center_y)
    _, _, radii = conic_params(tth, dxy, c.distance, cent, c.tilt, c.rotation)
    phi = c.rotation - 90.0  # rotation of the conic's major axis
    dist = c.distance
    stth = math.sin(math.radians(tth))
    cosb = math.cos(math.radians(c.tilt))
    azm = math.radians(azm_deg)
    phi_r = math.radians(phi)
    if radii[0] > 0.0:  # ellipse
        tanb = math.tan(math.radians(c.tilt))
        fplus = dist * tanb * stth / (cosb + stth)
        fminus = dist * tanb * stth / (cosb - stth)
        zdis = (fplus - fminus) / 2.0
        rsqplus = radii[0] ** 2 + radii[1] ** 2
        rsqminus = radii[0] ** 2 - radii[1] ** 2
        big_r = rsqminus * math.cos(2.0 * azm - 2.0 * phi_r) + rsqplus
        big_q = (
            math.sqrt(2.0) * radii[0] * radii[1]
            * math.sqrt(big_r - 2.0 * zdis**2 * math.sin(azm - phi_r) ** 2)
        )
        big_p = 2.0 * radii[0] ** 2 * zdis * math.cos(azm - phi_r)
        radius = (big_p + big_q) / big_r
        xy = [radius * math.cos(azm) + cent[0], radius * math.sin(azm) + cent[1]]
    else:  # hyperbola
        sinb = abs(math.sin(math.radians(c.tilt)))
        tanb = abs(math.tan(math.radians(c.tilt)))
        f = dist * tanb * stth / (cosb + stth)
        v = dist * (tanb + math.tan(math.radians(tth - abs(c.tilt))))
        delt = dist * stth * (1 + stth * cosb) / (sinb * cosb * (stth + cosb))
        ecc = (v - f) / (delt - v)
        big_r = radii[1] * (ecc**2 - 1) / (1 - ecc * math.cos(azm))
        if c.tilt > 0.0:
            offset = 2.0 * radii[1] * ecc + f
            ux, uy = -big_r * math.cos(azm) - offset, -big_r * math.sin(azm)
        else:
            offset = -f
            ux, uy = -big_r * math.cos(azm) - offset, big_r * math.sin(azm)
        xy = [
            -(ux * math.cos(phi_r) + uy * math.sin(phi_r)) + cent[0],
            -(ux * math.sin(phi_r) - uy * math.cos(phi_r)) + cent[1],
        ]
    if c.det2theta:
        xy[0] += dist * math.tan(
            math.radians(
                c.det2theta + c.tilt * math.sin(math.radians(c.rotation))
            )
        )
    return xy


def derive_num_chans(c: ImageControls) -> int:
    """Ring-channel count from the detector span of the IOtth window
    (cache_creation.py:324-333): the pixel distance between the azm=0
    intersections of the low and high 2theta conics, halved."""
    lo, hi = c.iotth
    dsp0 = c.wavelength / (2.0 * math.sin(math.radians(lo / 2.0)))
    dsp1 = c.wavelength / (2.0 * math.sin(math.radians(hi / 2.0)))
    x0 = detector_xy(dsp0, 0.0, c)[0]
    x1 = detector_xy(dsp1, 0.0, c)[0]
    if x0 == 0.0 and x1 == 0.0:
        raise ValueError("IOtth conics do not intersect the detector")
    return int(1000.0 * (x1 - x0) / c.pixel_size_x) // 2


def tth_bin_index_numpy(tth: np.ndarray, lo: float, hi: float, n: int) -> np.ndarray:
    """Mirror of functions.binning.tth_bin_index (clamp-to-0 semantics)."""
    width = (hi - lo) / n
    idx = (np.floor((tth - lo) / width) + 1).astype(np.int64)
    idx[(tth < lo) | (tth >= hi)] = 0
    return idx
