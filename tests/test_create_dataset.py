"""Dataset-creation pipeline tests: RPC00B tag roundtrip through GeoTIFF,
AOI cropping with RPC offset fixup, JSON metadata generation, splits,
and the MicMac helpers."""

import json
import os

import numpy as np
import pytest

from spnerf_tpu.data import micmac
from spnerf_tpu.data.create_dataset import (
    create_dataset_from_dfc2019,
    create_satellite_dataset,
    create_train_test_splits,
    crop_geotiff_to_lonlat_aoi,
    image_lonlat_aoi,
    read_roi_lonlat,
    rpc_from_geotiff,
    rpc_to_geotiff_tag,
    _T_RPC,
)
from spnerf_tpu.geo import RPCModel
from spnerf_tpu.io import read_geotiff, write_geotiff


@pytest.fixture(scope="module")
def bundled_rpc(dfc269_json_dir):
    with open(os.path.join(dfc269_json_dir, "JAX_269_006_RGB.json")) as f:
        d = json.load(f)
    return RPCModel.from_dict(d["rpc"]), d


def test_rpc_geotiff_tag_roundtrip(tmp_path, bundled_rpc, rng):
    rpc, meta = bundled_rpc
    img = (rng.uniform(0, 255, size=(40, 50, 3))).astype(np.uint8)
    path = str(tmp_path / "img.tif")
    write_geotiff(path, img, extra_double_tags={_T_RPC: rpc_to_geotiff_tag(rpc)})
    rpc2 = rpc_from_geotiff(path)
    assert rpc2.row_offset == rpc.row_offset
    np.testing.assert_array_equal(rpc2.row_num, rpc.row_num)
    np.testing.assert_array_equal(rpc2.col_den, rpc.col_den)
    # model behaves identically
    lons, lats = rpc.localization(np.array([10.0]), np.array([20.0]),
                                  np.array([30.0]))
    lons2, lats2 = rpc2.localization(np.array([10.0]), np.array([20.0]),
                                     np.array([30.0]))
    np.testing.assert_allclose(lons2, lons)
    np.testing.assert_allclose(lats2, lats)


@pytest.fixture(scope="module")
def synth_raw_dataset(tmp_path_factory, dfc269_root, bundled_rpc):
    """A raw-DFC2019-layout dataset: RGB tifs carrying RPC tags + Truth DSM."""
    rpc, meta = bundled_rpc
    root = tmp_path_factory.mktemp("rawdfc")
    rng = np.random.default_rng(3)
    (root / "RGB" / "JAX_269").mkdir(parents=True)
    (root / "Truth").mkdir()
    for suffix in ("_DSM.tif", "_DSM.txt"):
        src = os.path.join(dfc269_root, "Truth", "JAX_269" + suffix)
        dst = root / "Truth" / ("JAX_269" + suffix)
        dst.write_bytes(open(src, "rb").read())
    for i in range(4):
        img = rng.uniform(0, 255, size=(300, 320, 3)).astype(np.uint8)
        write_geotiff(str(root / "RGB" / "JAX_269" / f"JAX_269_{i:03d}_RGB.tif"),
                      img,
                      extra_double_tags={_T_RPC: rpc_to_geotiff_tag(rpc)})
    return str(root)


def test_read_roi_lonlat(synth_raw_dataset):
    poly = read_roi_lonlat("JAX_269", synth_raw_dataset)
    assert poly.shape == (4, 2)
    # Jacksonville: lon ~ -81.7, lat ~ 30.3
    assert np.all((poly[:, 0] > -82) & (poly[:, 0] < -81))
    assert np.all((poly[:, 1] > 30) & (poly[:, 1] < 31))


def test_crop_and_metadata_pipeline(tmp_path, synth_raw_dataset):
    out, img_dir, json_dir = create_satellite_dataset(
        "JAX_269", synth_raw_dataset, str(tmp_path / "out"), crop_aoi=True,
        ba=False, splits=True, seed=0,
    )
    jsons = sorted(f for f in os.listdir(json_dir) if f.endswith(".json"))
    assert len(jsons) == 4
    with open(os.path.join(json_dir, jsons[0])) as f:
        d = json.load(f)
    for key in ("img", "height", "width", "sun_elevation", "sun_azimuth",
                "geojson", "min_alt", "max_alt", "rpc"):
        assert key in d, key
    # rpc dict is loader-compatible
    rpc = RPCModel.from_dict(d["rpc"])
    assert d["min_alt"] < d["max_alt"]
    assert "center" in d["geojson"]
    # splits exist and partition the json set
    train = open(os.path.join(json_dir, "train.txt")).read().split()
    test = open(os.path.join(json_dir, "test.txt")).read().split()
    assert set(train) | set(test) == set(jsons)
    assert not set(train) & set(test)
    # cropped images exist and are smaller than the originals
    arr, prof = read_geotiff(os.path.join(img_dir, d["img"]))
    assert arr.shape[0] <= 300 and arr.shape[1] <= 320


def test_splits_seeded():
    ids = [f"im{i}.json" for i in range(10)]
    a = create_train_test_splits(ids, seed=5)
    b = create_train_test_splits(ids, seed=5)
    assert a == b
    assert len(a[1]) == max(2, int(0.15 * 10))


def test_micmac_utm_to_geocentric_roundtrip(rng):
    from spnerf_tpu.geo import ecef_to_latlon, latlon_to_utm

    lats = rng.uniform(30.2, 30.4, 50)
    lons = rng.uniform(-81.8, -81.6, 50)
    alts = rng.uniform(-20, 100, 50)
    e, n, zone, northern = latlon_to_utm(lats, lons)
    ecef = micmac.utm_to_geocentric(np.stack([e, n, alts], -1), zone, northern)
    lat2, lon2, alt2 = ecef_to_latlon(ecef[:, 0], ecef[:, 1], ecef[:, 2])
    np.testing.assert_allclose(lat2, lats, atol=1e-8)
    np.testing.assert_allclose(lon2, lons, atol=1e-8)
    np.testing.assert_allclose(alt2, alts, atol=1e-4)


def test_micmac_convert_3dpts_file(tmp_path):
    pts = np.array([[438700.0, 3353500.0, 10.0], [438800.0, 3353600.0, 20.0]])
    in_path = str(tmp_path / "X_3DPts.txt")
    np.savetxt(in_path, pts)
    out = micmac.convert_3dpts_file(in_path, aoi_id="JAX_269")
    assert out.endswith("_3DPts_ecef.txt")
    ecef = np.loadtxt(out)
    assert ecef.shape == (2, 3)
    # ECEF magnitude ~ earth radius
    np.testing.assert_allclose(np.linalg.norm(ecef, axis=1), 6.37e6, rtol=0.01)


def test_micmac_convert_tiff(tmp_path, dfc269_root):
    src = os.path.join(dfc269_root, "RGB", "JAX_269", "JAX_269_006_RGB.tif")
    out = str(tmp_path / "re.tif")
    micmac.convert_tiff(src, out)
    a, _ = read_geotiff(src)
    b, _ = read_geotiff(out)
    np.testing.assert_array_equal(a, b)
