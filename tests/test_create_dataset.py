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


def test_sun_angles_from_gdal_metadata_tag(tmp_path, bundled_rpc, rng):
    """NITF_USE00A_* items in the GeoTIFF's GDAL-metadata XML tag are read
    (the reference reads the same store via rasterio .tags())."""
    from spnerf_tpu.data.create_dataset import (
        _T_GDAL_METADATA,
        sun_angles_from_image_metadata,
    )

    rpc, _ = bundled_rpc
    xml = ('<GDALMetadata>\n'
           '  <Item name="NITF_IID2">18DEC15 WV03 IMG</Item>\n'
           '  <Item name="NITF_USE00A_SUN_EL">+32.4</Item>\n'
           '  <Item name="NITF_USE00A_SUN_AZ">+158.3</Item>\n'
           '  <Item name="NITF_STDIDC_ACQUISITION_DATE">20151218</Item>\n'
           '</GDALMetadata>')
    img = rng.uniform(0, 255, size=(20, 22, 3)).astype(np.uint8)
    path = str(tmp_path / "img.tif")
    write_geotiff(path, img,
                  extra_double_tags={_T_RPC: rpc_to_geotiff_tag(rpc)},
                  extra_ascii_tags={_T_GDAL_METADATA: xml})
    el, az, date = sun_angles_from_image_metadata(path)
    assert (el, az, date) == (32.4, 158.3, "20151218")


def test_sun_angles_from_msi_use00a_tre(tmp_path, bundled_rpc, rng):
    """A USE00A TRE in an MSI sidecar NITF supplies the angles when the
    GeoTIFF itself carries none (reference create_DFC2019_dataset_auto.py
    :137-147 with the MSI path redirected to a local dir)."""
    from spnerf_tpu.data.create_dataset import sun_angles_from_image_metadata

    rpc, _ = bundled_rpc
    img = rng.uniform(0, 255, size=(20, 22, 3)).astype(np.uint8)
    rgb = str(tmp_path / "JAX_269_007_RGB.tif")
    write_geotiff(rgb, img, extra_double_tags={_T_RPC: rpc_to_geotiff_tag(rpc)})

    # minimal NITF: header junk + USE00A TRE (107 bytes; SUN_EL/SUN_AZ are
    # the trailing two 5-char fields per STDI-0002)
    tre = b"0" * 97 + b"+41.2" + b"137.9"
    assert len(tre) == 107
    ntf = tmp_path / "JAX_269_007_RGB.NTF"
    ntf.write_bytes(b"NITF02.10" + b"\x00" * 32 + b"USE00A" + b"00107" + tre)

    el, az, date = sun_angles_from_image_metadata(rgb, msi_dir=str(tmp_path))
    assert (el, az) == (41.2, 137.9)
    # and zeros when no source exists at all (reference fallback)
    el0, az0, _ = sun_angles_from_image_metadata(rgb)
    assert (el0, az0) == (0.0, 0.0)


def test_ba_outputs_consumed_and_keypoints_emitted(tmp_path,
                                                   synth_raw_dataset):
    """With a ba_files/ tree in place (as run_ba would leave), dataset
    creation consumes adjusted RPCs and replicates keypoints into the JSONs
    (reference create_DFC2019_dataset_auto.py:155-172)."""
    out_root = tmp_path / "out" / "JAX_269"
    params_dir = out_root / "ba_files" / "ba_params"
    params_dir.mkdir(parents=True)
    names = [f"JAX_269_{i:03d}_RGB.tif" for i in range(4)]
    np.save(params_dir / "pts_ind.npy", np.array([0, 1, 2, 0]))
    np.save(params_dir / "cam_ind.npy", np.array([0, 0, 1, 2]))
    np.save(params_dir / "pts2d.npy",
            np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0], [7.0, 8.0]]))
    np.save(params_dir / "pts3d.npy", np.zeros((3, 3)))
    with open(params_dir / "geotiff_paths.txt", "w") as f:
        f.write("\n".join(f"/x/{n}" for n in names) + "\n")

    out, img_dir, json_dir = create_satellite_dataset(
        "JAX_269", synth_raw_dataset, str(tmp_path / "out"), crop_aoi=False,
        ba=True, splits=False, seed=0,
    )
    with open(os.path.join(json_dir, "JAX_269_000_RGB.json")) as f:
        d = json.load(f)
    assert d["keypoints"]["2d_coordinates"] == [[1.0, 2.0], [3.0, 4.0]]
    assert d["keypoints"]["pts3d_indices"] == [0, 1]
    assert os.path.exists(os.path.join(json_dir, "pts3d.npy"))


def test_run_ba_invoked_when_package_present(tmp_path, synth_raw_dataset,
                                             monkeypatch):
    """--ba drives the sat-bundleadjust pipeline when importable: verified
    with a stub bundle_adjust package implementing the reference's API
    surface (pipeline.run, ba_params arrays, loader.save_list_of_paths)."""
    import sys
    import types

    calls = {}

    class FakeParams:
        pts_ind = np.array([0])
        cam_ind = np.array([0])
        pts2d = np.array([[9.0, 9.0]])
        pts3d_ba = np.zeros((1, 3))
        cam_prev_indices = [0]

    class FakePipeline:
        def __init__(self, ba_input, tracks_config=None, extra_ba_config=None):
            calls["in_dir"] = ba_input["in_dir"]
            calls["tracks"] = tracks_config
            calls["extra"] = extra_ba_config
            self.out_dir = ba_input["out_dir"]
            self.ba_params = FakeParams()
            self.global_transform = 0.0
            self.images = ba_input["images"]

        def run(self):
            calls["ran"] = True
            rpc_dir = os.path.join(self.out_dir, "rpcs_adj")
            os.makedirs(rpc_dir, exist_ok=True)

    ba_mod = types.ModuleType("bundle_adjust")
    ba_mod.loader = types.SimpleNamespace(
        save_list_of_paths=lambda path, lst: open(path, "w").write(
            "\n".join(lst) + "\n"))
    pipe_mod = types.ModuleType("bundle_adjust.ba_pipeline")
    pipe_mod.BundleAdjustmentPipeline = FakePipeline
    cam_mod = types.ModuleType("bundle_adjust.cam_utils")
    cam_mod.SatelliteImage = lambda fn, rpc: types.SimpleNamespace(
        geotiff_path=fn, rpc=rpc)
    rpcm_mod = types.ModuleType("rpcm")
    rpcm_mod.rpc_from_geotiff = lambda p: {"path": p}
    for name, mod in (("bundle_adjust", ba_mod),
                      ("bundle_adjust.ba_pipeline", pipe_mod),
                      ("bundle_adjust.cam_utils", cam_mod),
                      ("rpcm", rpcm_mod)):
        monkeypatch.setitem(sys.modules, name, mod)

    out, img_dir, json_dir = create_satellite_dataset(
        "JAX_269", synth_raw_dataset, str(tmp_path / "out"), crop_aoi=False,
        ba=True, splits=False, seed=0,
    )
    assert calls["ran"]
    assert calls["extra"] == {"cam_model": "rpc"}
    assert calls["tracks"]["FT_sift_matching"] == "epipolar_based"
    params_dir = os.path.join(out, "ba_files", "ba_params")
    assert os.path.exists(os.path.join(params_dir, "pts2d.npy"))
    assert os.path.exists(os.path.join(params_dir, "geotiff_paths.txt"))
    assert os.path.exists(os.path.join(out, "ba_files", "bundle_adjust.log"))
    # the fake BA produced keypoints for image 0, replicated into its JSON
    with open(os.path.join(json_dir, "JAX_269_000_RGB.json")) as f:
        d = json.load(f)
    assert d["keypoints"]["2d_coordinates"] == [[9.0, 9.0]]


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
