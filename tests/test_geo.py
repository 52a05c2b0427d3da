"""Geometry core tests: ellipsoid round-trips, UTM, RPC projection/localization.

These pin the most correctness-sensitive math (SURVEY.md section 7 stage 1) against
independent checks: round-trip identities, the bundled DFC2019_269 RPCs, and the
lidar ROI bounds of the bundled ground truth.
"""

import json
import os

import numpy as np
import pytest

from spnerf_tpu.geo import (
    RPCModel,
    ecef_to_latlon,
    geodetic_to_ecef,
    latlon_to_utm,
    utm_epsg,
    utm_zone,
)
from spnerf_tpu.geo.utm import utm_to_latlon


def test_geodetic_ecef_roundtrip(rng):
    lats = rng.uniform(-85, 85, size=1000)
    lons = rng.uniform(-180, 180, size=1000)
    alts = rng.uniform(-100, 9000, size=1000)
    x, y, z = geodetic_to_ecef(lats, lons, alts)
    lat2, lon2, alt2 = ecef_to_latlon(x, y, z)
    np.testing.assert_allclose(lat2, lats, atol=1e-9)
    np.testing.assert_allclose(lon2, lons, atol=1e-9)
    np.testing.assert_allclose(alt2, alts, atol=1e-5)


def test_ecef_magnitude():
    # equator, prime meridian, sea level -> (a, 0, 0)
    x, y, z = geodetic_to_ecef(0.0, 0.0, 0.0)
    np.testing.assert_allclose([x, y, z], [6378137.0, 0.0, 0.0], atol=1e-6)
    # north pole, sea level -> (0, 0, b)
    x, y, z = geodetic_to_ecef(90.0, 0.0, 0.0)
    np.testing.assert_allclose(z, 6356752.314245, atol=1e-6)


def test_utm_zone_letter():
    assert utm_zone(30.33, -81.67) == (17, "R")  # Jacksonville
    assert utm_zone(48.85, 2.35) == (31, "U")  # Paris
    assert utm_zone(60.0, 5.0) == (32, "V")  # Norway exception
    assert utm_epsg(17, True) == 32617
    assert utm_epsg(17, False) == 32717


def test_utm_roundtrip(rng):
    lats = rng.uniform(25, 55, size=500)
    lons = rng.uniform(-84.0, -80.0, size=500)  # keep same zone (17)
    easts, norths, zone, northern = latlon_to_utm(lats, lons)
    assert zone == 17 and northern
    lat2, lon2 = utm_to_latlon(easts, norths, zone, northern)
    np.testing.assert_allclose(lat2, lats, atol=1e-9)
    np.testing.assert_allclose(lon2, lons, atol=1e-9)


def test_utm_known_point(dfc269_root):
    # The lidar ROI of JAX_269 is a 512 px x 0.5 m window anchored at
    # (438638.996, 3353400.0) UTM 17N (Truth/JAX_269_DSM.txt). The AOI center from
    # the image JSON must project inside that window.
    roi = np.loadtxt(os.path.join(dfc269_root, "Truth", "JAX_269_DSM.txt"))
    with open(os.path.join(dfc269_root, "JSON", "JAX_269_006_RGB.json")) as f:
        d = json.load(f)
    lon_c, lat_c = d["geojson"]["center"][:2]
    easts, norths, zone, northern = latlon_to_utm(np.array([lat_c]), np.array([lon_c]))
    assert zone == 17 and northern
    xoff, yoff, size_px, res = roi[0], roi[1], roi[2], roi[3]
    assert xoff - 50 < easts[0] < xoff + size_px * res + 50
    assert yoff - 50 < norths[0] < yoff + size_px * res + 50


@pytest.fixture(scope="module")
def rpc269(dfc269_json_dir):
    with open(os.path.join(dfc269_json_dir, "JAX_269_006_RGB.json")) as f:
        d = json.load(f)
    return RPCModel.from_dict(d["rpc"]), d


def test_rpc_localization_inverts_projection(rpc269, rng):
    rpc, d = rpc269
    h, w = d["height"], d["width"]
    cols = rng.uniform(0, w - 1, size=2000)
    rows = rng.uniform(0, h - 1, size=2000)
    alts = rng.uniform(d["min_alt"], d["max_alt"], size=2000)
    lons, lats = rpc.localization(cols, rows, alts)
    cols2, rows2 = rpc.projection(lons, lats, alts)
    np.testing.assert_allclose(cols2, cols, atol=1e-6)
    np.testing.assert_allclose(rows2, rows, atol=1e-6)
    # localized points stay in the RPC validity neighborhood
    assert np.all(np.abs(lats - rpc.lat_offset) < 2 * rpc.lat_scale)
    assert np.all(np.abs(lons - rpc.lon_offset) < 2 * rpc.lon_scale)


def test_rpc_projection_center(rpc269):
    rpc, d = rpc269
    # the RPC offset point should project near the image center offsets
    col, row = rpc.projection(rpc.lon_offset, rpc.lat_offset, rpc.alt_offset)
    assert abs(col - rpc.col_offset) < rpc.col_scale * 0.2
    assert abs(row - rpc.row_offset) < rpc.row_scale * 0.2


def test_rpc_rescale(rpc269, rng):
    rpc, d = rpc269
    rpc_half = rpc.rescaled(0.5)
    cols = rng.uniform(0, d["width"] - 1, size=100)
    rows = rng.uniform(0, d["height"] - 1, size=100)
    alts = np.full(100, 0.5 * (d["min_alt"] + d["max_alt"]))
    lons, lats = rpc.localization(cols, rows, alts)
    lons_h, lats_h = rpc_half.localization(cols / 2.0, rows / 2.0, alts)
    np.testing.assert_allclose(lons_h, lons, atol=1e-9)
    np.testing.assert_allclose(lats_h, lats, atol=1e-9)
