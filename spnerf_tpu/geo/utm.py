"""Geodetic -> UTM projection (WGS-84), self-contained (no pyproj / utm deps).

Implements the transverse Mercator projection with the Karney/Krueger series to sixth
order in the third flattening n, which agrees with PROJ's etmerc to well below a
millimeter — far tighter than the 0.5 m DSM grid the outputs feed
(/root/reference/datasets/satellite_scene.py:521-551 uses pyproj's `+proj=utm`).

Backend-generic: pass ``xp=numpy`` (default, float64) or ``xp=jax.numpy``.
"""

import numpy as np

K0 = 0.9996
FALSE_EASTING = 500000.0
FALSE_NORTHING_SOUTH = 10000000.0

_A = 6378137.0
_F = 1.0 / 298.257223563
_N = _F / (2.0 - _F)
_E = np.sqrt(_F * (2.0 - _F))

# Rectifying radius A = a/(1+n) * (1 + n^2/4 + n^4/64 + n^6/256)
_RECT_A = _A / (1.0 + _N) * (1.0 + _N**2 / 4.0 + _N**4 / 64.0 + _N**6 / 256.0)

# Karney (2011) forward series coefficients alpha_j to order n^6.
_ALPHA = (
    _N / 2.0 - 2.0 / 3.0 * _N**2 + 5.0 / 16.0 * _N**3 + 41.0 / 180.0 * _N**4
    - 127.0 / 288.0 * _N**5 + 7891.0 / 37800.0 * _N**6,
    13.0 / 48.0 * _N**2 - 3.0 / 5.0 * _N**3 + 557.0 / 1440.0 * _N**4
    + 281.0 / 630.0 * _N**5 - 1983433.0 / 1935360.0 * _N**6,
    61.0 / 240.0 * _N**3 - 103.0 / 140.0 * _N**4 + 15061.0 / 26880.0 * _N**5
    + 167603.0 / 181440.0 * _N**6,
    49561.0 / 161280.0 * _N**4 - 179.0 / 168.0 * _N**5
    + 6601661.0 / 7257600.0 * _N**6,
    34729.0 / 80640.0 * _N**5 - 3418889.0 / 1995840.0 * _N**6,
    212378941.0 / 319334400.0 * _N**6,
)

# Inverse series coefficients beta_j (used for round-trip tests).
_BETA = (
    _N / 2.0 - 2.0 / 3.0 * _N**2 + 37.0 / 96.0 * _N**3 - 1.0 / 360.0 * _N**4
    - 81.0 / 512.0 * _N**5 + 96199.0 / 604800.0 * _N**6,
    1.0 / 48.0 * _N**2 + 1.0 / 15.0 * _N**3 - 437.0 / 1440.0 * _N**4
    + 46.0 / 105.0 * _N**5 - 1118711.0 / 3870720.0 * _N**6,
    17.0 / 480.0 * _N**3 - 37.0 / 840.0 * _N**4 - 209.0 / 4480.0 * _N**5
    + 5569.0 / 90720.0 * _N**6,
    4397.0 / 161280.0 * _N**4 - 11.0 / 504.0 * _N**5 - 830251.0 / 7257600.0 * _N**6,
    4583.0 / 161280.0 * _N**5 - 108847.0 / 3991680.0 * _N**6,
    20648693.0 / 638668800.0 * _N**6,
)

_ZONE_LETTERS = "CDEFGHJKLMNPQRSTUVWX"


def utm_zone(lat, lon):
    """UTM zone number + latitude band letter for a scalar lat/lon (degrees).

    Includes the Norway/Svalbard zone exceptions, like the `utm` package the
    reference relies on (/root/reference/modules/utils.py:133-134).
    """
    lat = float(lat)
    lon = float(lon)
    zone = int((lon + 180.0) // 6.0) + 1
    if 56.0 <= lat < 64.0 and 3.0 <= lon < 12.0:
        zone = 32
    if 72.0 <= lat <= 84.0 and lon >= 0.0:
        if lon < 9.0:
            zone = 31
        elif lon < 21.0:
            zone = 33
        elif lon < 33.0:
            zone = 35
        elif lon < 42.0:
            zone = 37
    zone = min(max(zone, 1), 60)
    if -80.0 <= lat <= 84.0:
        letter = _ZONE_LETTERS[min(int((lat + 80.0) // 8.0), len(_ZONE_LETTERS) - 1)]
    else:
        letter = "Z"
    return zone, letter


def utm_epsg(zone, northern):
    """EPSG code of WGS84 / UTM for a zone (32600+zone north, 32700+zone south)."""
    return (32600 if northern else 32700) + int(zone)


def _tm_forward(lat, lon, lon0, xp=np):
    """Core transverse Mercator: geodetic (deg) -> (easting offset, northing) meters."""
    phi = xp.radians(lat)
    lam = xp.radians(lon - lon0)
    sin_phi = xp.sin(phi)
    # conformal latitude
    t = xp.sinh(xp.arctanh(sin_phi) - _E * xp.arctanh(_E * sin_phi))
    xi = xp.arctan2(t, xp.cos(lam))
    eta = xp.arcsinh(xp.sin(lam) / xp.sqrt(t**2 + xp.cos(lam) ** 2))
    xi_s = xi
    eta_s = eta
    for j, a_j in enumerate(_ALPHA, start=1):
        xi_s = xi_s + a_j * xp.sin(2.0 * j * xi) * xp.cosh(2.0 * j * eta)
        eta_s = eta_s + a_j * xp.cos(2.0 * j * xi) * xp.sinh(2.0 * j * eta)
    return K0 * _RECT_A * eta_s, K0 * _RECT_A * xi_s


def _tm_inverse(x, y, lon0, xp=np):
    """Inverse transverse Mercator: (easting offset, northing) m -> geodetic (deg)."""
    xi = y / (K0 * _RECT_A)
    eta = x / (K0 * _RECT_A)
    xi_p = xi
    eta_p = eta
    for j, b_j in enumerate(_BETA, start=1):
        xi_p = xi_p - b_j * xp.sin(2.0 * j * xi) * xp.cosh(2.0 * j * eta)
        eta_p = eta_p - b_j * xp.cos(2.0 * j * xi) * xp.sinh(2.0 * j * eta)
    # conformal latitude chi, with tau' = tan(chi)
    tau_prime = xp.sin(xi_p) / xp.sqrt(xp.sinh(eta_p) ** 2 + xp.cos(xi_p) ** 2)
    # Newton solve for tau = tan(phi) such that conformal(tau) = tau' (Karney 2011)
    e2 = _E**2
    tau = tau_prime / (1.0 - e2)
    for _ in range(5):
        sigma = xp.sinh(_E * xp.arctanh(_E * tau / xp.sqrt(1.0 + tau**2)))
        f = tau * xp.sqrt(1.0 + sigma**2) - sigma * xp.sqrt(1.0 + tau**2) - tau_prime
        df = (
            (xp.sqrt(1.0 + sigma**2) * xp.sqrt(1.0 + tau**2) - sigma * tau)
            * (1.0 - e2)
            * xp.sqrt(1.0 + tau**2)
            / (1.0 + (1.0 - e2) * tau**2)
        )
        tau = tau - f / df
    phi = xp.arctan(tau)
    lam = xp.arctan2(xp.sinh(eta_p), xp.cos(xi_p))
    return xp.degrees(phi), xp.degrees(lam) + lon0


def latlon_to_utm(lats, lons, zone=None, northern=None, xp=np):
    """Lat/lon arrays (degrees) -> (eastings, norths) in the UTM zone of the first
    point, mirroring `utils.utm_from_latlon` (/root/reference/modules/utils.py:125-139)
    which picks the zone from element 0.

    Returns (easts, norths, zone, northern).
    """
    lat0 = float(np.asarray(lats).ravel()[0])
    lon0deg = float(np.asarray(lons).ravel()[0])
    if zone is None:
        zone, letter = utm_zone(lat0, lon0deg)
    if northern is None:
        northern = lat0 >= 0.0
    central_meridian = (zone - 1) * 6.0 - 180.0 + 3.0
    x, y = _tm_forward(lats, lons, central_meridian, xp=xp)
    easts = x + FALSE_EASTING
    norths = y + (0.0 if northern else FALSE_NORTHING_SOUTH)
    return easts, norths, zone, northern


def utm_to_latlon(easts, norths, zone, northern, xp=np):
    """Inverse of :func:`latlon_to_utm` (for round-trip validation and MicMac
    UTM-point conversion, cf. /root/reference/modules/utm_to_geocentric.py:10-29)."""
    central_meridian = (zone - 1) * 6.0 - 180.0 + 3.0
    x = easts - FALSE_EASTING
    y = norths - (0.0 if northern else FALSE_NORTHING_SOUTH)
    return _tm_inverse(x, y, central_meridian, xp=xp)
