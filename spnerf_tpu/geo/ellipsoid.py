"""WGS-84 ellipsoid conversions between geodetic (lat, lon, alt) and ECEF (x, y, z).

Matches the formulas of the reference implementation
(/root/reference/modules/utils.py:80-122) so that ray origins / DSM altitudes agree
bit-for-bit at float64. The functions are dtype- and backend-generic: pass ``xp=numpy``
(default, float64 host path used by the ray caster) or ``xp=jax.numpy`` for a jittable
on-device version.
"""

import numpy as np

# WGS-84 parameters
WGS84_A = 6378137.0  # semi-major axis [m]
WGS84_B = 6356752.314245  # semi-minor axis [m]
WGS84_E2 = 1.0 - (WGS84_B**2 / WGS84_A**2)  # first eccentricity squared


def geodetic_to_ecef(lat, lon, alt, xp=np):
    """Geodetic (degrees, degrees, meters) -> ECEF (meters).

    Reference semantics: /root/reference/modules/utils.py:80-100.
    """
    lat_rad = xp.radians(lat)
    lon_rad = xp.radians(lon)
    sin_lat = xp.sin(lat_rad)
    n = WGS84_A / xp.sqrt(1.0 - WGS84_E2 * sin_lat**2)
    x = (n + alt) * xp.cos(lat_rad) * xp.cos(lon_rad)
    y = (n + alt) * xp.cos(lat_rad) * xp.sin(lon_rad)
    z = ((WGS84_B**2 / WGS84_A**2) * n + alt) * sin_lat
    return x, y, z


def ecef_to_latlon(x, y, z, xp=np):
    """ECEF (meters) -> geodetic (lat deg, lon deg, alt m), closed form (Bowring).

    Reference semantics: /root/reference/modules/utils.py:103-122 (the "custom"
    non-iterative conversion used for the DSM pipeline). Accuracy is sub-millimeter
    for near-surface points, which is what the predicted point clouds are.
    """
    a = WGS84_A
    e = 8.1819190842622e-2
    asq = a**2
    esq = e**2
    b = np.sqrt(asq * (1.0 - esq))
    bsq = b**2
    ep = np.sqrt((asq - bsq) / bsq)
    p = xp.sqrt(x**2 + y**2)
    th = xp.arctan2(a * z, b * p)
    lon = xp.arctan2(y, x)
    lat = xp.arctan2(z + ep**2 * b * xp.sin(th) ** 3, p - esq * a * xp.cos(th) ** 3)
    n = a / xp.sqrt(1.0 - esq * xp.sin(lat) ** 2)
    alt = p / xp.cos(lat) - n
    return xp.degrees(lat), xp.degrees(lon), alt
