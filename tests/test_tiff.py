"""GeoTIFF I/O tests: write->read round-trips and reading the bundled DFC2019 files."""

import os

import numpy as np

from spnerf_tpu.io import read_geotiff, read_tiff, write_geotiff


def test_roundtrip_float32(tmp_path, rng):
    arr = rng.normal(size=(37, 53)).astype(np.float32)
    transform = (438638.996411, 0.5, 3353656.0, -0.5)
    path = str(tmp_path / "f32.tif")
    write_geotiff(path, arr, transform=transform, epsg=32617, nodata=float("nan"))
    out, profile = read_geotiff(path)
    np.testing.assert_array_equal(out, arr)
    assert profile["epsg"] == 32617
    np.testing.assert_allclose(profile["transform"], transform, rtol=0, atol=1e-9)
    assert np.isnan(profile["nodata"])


def test_roundtrip_rgb_uint8(tmp_path, rng):
    arr = rng.integers(0, 255, size=(21, 19, 3), dtype=np.uint8)
    path = str(tmp_path / "rgb.tif")
    write_geotiff(path, arr)
    out, profile = read_geotiff(path)
    np.testing.assert_array_equal(out, arr)
    assert profile["count"] == 3


def test_roundtrip_int32(tmp_path):
    arr = (np.arange(12, dtype=np.int32) - 6).reshape(3, 4)
    path = str(tmp_path / "i32.tif")
    write_geotiff(path, arr, nodata=65)
    out, profile = read_geotiff(path)
    np.testing.assert_array_equal(out, arr)
    assert profile["nodata"] == 65


def test_read_bundled_rasters(dfc269_root):
    rgb = read_tiff(os.path.join(dfc269_root, "RGB", "JAX_269", "JAX_269_006_RGB.tif"))
    assert rgb.shape == (813, 793, 3) and rgb.dtype == np.uint8
    cls = read_tiff(os.path.join(dfc269_root, "Semantic", "JAX_269_CLS.tif"))
    assert cls.shape == (512, 512)
    assert set(np.unique(cls)) <= {2, 5, 6, 9, 17, 65}
    dsm, profile = read_geotiff(os.path.join(dfc269_root, "Truth", "JAX_269_DSM.tif"))
    assert dsm.shape == (512, 512) and dsm.dtype == np.float32
    assert -40 < np.nanmin(dsm) and np.nanmax(dsm) < 10
