"""The `python -m spnerf_tpu.tools` helper CLI (reference standalone scripts:
utm_to_geocentric.py, convert2MicMac.py, cal_rmse_depth.py, visualization/)."""

import json
import os

import numpy as np
import pytest

from spnerf_tpu.io import read_geotiff
from spnerf_tpu.tools import main

# the bundled lidar ROI (Truth/JAX_269_DSM.txt): xoff, yoff(south), 512, 0.5
ROI_XOFF, ROI_YOFF, ROI_SIZE, ROI_RES = 438638.996411, 3353399.999928, 512, 0.5


def test_utm_to_geocentric_roundtrip(tmp_path):
    """--file_dir converts every *_3DPts.txt; ECEF output round-trips back to
    the input UTM coordinates to sub-mm (reference utm_to_geocentric.py)."""
    rng = np.random.default_rng(0)
    pts = np.stack([ROI_XOFF + rng.uniform(0, 256, 50),
                    ROI_YOFF + rng.uniform(0, 256, 50),
                    rng.uniform(-20.0, 80.0, 50)], axis=-1)
    np.savetxt(tmp_path / "JAX_269_006_RGB_3DPts.txt", pts)
    main(["utm-to-geocentric", "--file_dir", str(tmp_path),
          "--aoi_id", "JAX_269"])
    out = np.loadtxt(tmp_path / "JAX_269_006_RGB_3DPts_ecef.txt")

    from spnerf_tpu.geo import ecef_to_latlon, latlon_to_utm

    lat, lon, alt = ecef_to_latlon(out[:, 0], out[:, 1], out[:, 2])
    e, n, zone, northern = latlon_to_utm(lat, lon)
    assert zone == 17 and northern
    np.testing.assert_allclose(e, pts[:, 0], atol=1e-3)
    np.testing.assert_allclose(n, pts[:, 1], atol=1e-3)
    np.testing.assert_allclose(alt, pts[:, 2], atol=1e-3)


def test_cal_rmse_depth_cli(tmp_path, dfc269_root, capsys):
    """Points sampled AT the lidar DSM's own cell centers score a small MAE
    against it (the radius-1 splat averages 3x3 neighborhoods, so the error
    is local altitude variation, not zero) with high coverage."""
    gt_dir = os.path.join(dfc269_root, "Truth")
    gt, _ = read_geotiff(os.path.join(gt_dir, "JAX_269_DSM.tif"))
    gt = np.asarray(gt, np.float64)
    ii, jj = np.meshgrid(np.arange(0, ROI_SIZE, 2), np.arange(0, ROI_SIZE, 2),
                         indexing="ij")
    ii, jj = ii.ravel(), jj.ravel()
    east = ROI_XOFF + (jj + 0.5) * ROI_RES
    north = ROI_YOFF + ROI_SIZE * ROI_RES - (ii + 0.5) * ROI_RES
    alt = gt[ii, jj]

    from spnerf_tpu.data.micmac import utm_to_geocentric

    ecef = utm_to_geocentric(np.stack([east, north, alt], -1), 17, True)
    pts_path = tmp_path / "pts_ecef.txt"
    np.savetxt(pts_path, ecef)
    main(["cal-rmse-depth", "--pts3d_ecef", str(pts_path),
          "--gt_dir", gt_dir, "--aoi_id", "JAX_269",
          "--out_dir", str(tmp_path)])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["coverage"] > 0.95
    assert 0 <= stats["mae"] < 2.0  # 3x3-splat smoothing error only
    assert stats["rmse"] >= stats["mae"]
    assert os.path.exists(tmp_path / "JAX_269_depth_dsm.tif")


def test_viz_and_convert_tiff_cli(tmp_path, dfc269_root):
    dsm_tif = os.path.join(dfc269_root, "Truth", "JAX_269_DSM.tif")
    png = tmp_path / "dsm.png"
    main(["viz-dsm", dsm_tif, str(png)])
    assert png.stat().st_size > 1000

    main(["convert-tiff", dsm_tif, "--out_dir", str(tmp_path / "conv")])
    arr0, _ = read_geotiff(dsm_tif)
    arr1, _ = read_geotiff(str(tmp_path / "conv" / "JAX_269_DSM.tif"))
    np.testing.assert_array_equal(np.asarray(arr0), np.asarray(arr1))


def test_viz_depth_in_cli(tmp_path, dfc269_root):
    """Sparse input-depth visualization over the bundled RGB image."""
    img_path = os.path.join(dfc269_root, "RGB", "JAX_269",
                            "JAX_269_006_RGB.tif")
    rng = np.random.default_rng(1)
    n = 200
    pts2d = np.stack([rng.integers(0, 800, n), rng.integers(0, 790, n)], -1)
    pts3d = np.stack([ROI_XOFF + rng.uniform(0, 256, n),
                      ROI_YOFF + rng.uniform(0, 256, n),
                      rng.uniform(-20.0, 80.0, n)], axis=-1)
    np.savetxt(tmp_path / "p2.txt", pts2d, fmt="%d")
    np.savetxt(tmp_path / "p3.txt", pts3d)
    prefix = str(tmp_path / "viz")
    main(["viz-depth-in", "--pts2d", str(tmp_path / "p2.txt"),
          "--pts3d", str(tmp_path / "p3.txt"), "--image", img_path,
          "--out_prefix", prefix])
    for suffix in ("raw", "overlay", "side_by_side"):
        assert os.path.getsize(f"{prefix}_{suffix}.png") > 1000


def test_render_from_checkpoint(tmp_path, dfc269_root, capsys):
    """`tools render` restores a checkpoint and writes the full validation
    image contract offline — beyond the reference, whose eval.py:317-334 can
    only score images saved during training validation. A fresh --out_dir
    gets logs/{train,val}/{rgb,dsm,depth,...} and the printed JSON carries
    finite metrics at the restored step."""
    from spnerf_tpu.cli.train import main as train_main

    proj = tmp_path / "proj"
    (proj / "dataset").mkdir(parents=True)
    os.symlink(dfc269_root, proj / "dataset" / "DFC2019_269")
    train_main([
        "--aoi_id", "JAX_269", "--model", "sp-nerf", "--exp_name", "rdr",
        "--no_timestamp_exp_name", "--project_dir", str(proj),
        "--img_downscale", "8", "--batch_size", "64", "--n_samples", "4",
        "--fc_units", "32", "--fc_layers", "2", "--chunk", "2048",
        "--log_every", "10", "--check_val_every_n_epoch", "100",
        "--save_every_n_epochs", "100", "--data_axis", "1",
        "--max_train_steps", "20", "--sem", "--num_sem_classes", "3",
        "--dense_ss",
    ])
    run_dir = proj / "output" / "rdr"
    out_dir = tmp_path / "rendered"
    capsys.readouterr()
    # --step best resolves through the orbax val_psnr ranking (here the only
    # saved step, 20); also exercises the string step parser
    main(["render", "--run_dir", str(run_dir), "--out_dir", str(out_dir),
          "--chunk", "4096", "--step", "best"])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    metrics = json.loads(line)
    assert metrics["step"] == 20
    assert np.isfinite(metrics["psnr"]) and np.isfinite(metrics["ssim"])
    # full output contract in the redirected dir (val view = held-out 023)
    epoch = metrics["epoch_number"]
    for kind in ("rgb", "gt_rgb", "depth", "dsm", "sun", "albedo", "sky",
                 "semantic"):
        p = out_dir / "val" / kind / f"JAX_269_023_RGB_epoch{epoch}.tif"
        assert p.exists(), p

    # cross-resolution render: the ds8-trained model renders ds16 rays (the
    # field is resolution-independent; scene.loc normalization is recorded
    # per dataset, not per downscale)
    out16 = tmp_path / "rendered16"
    main(["render", "--run_dir", str(run_dir), "--out_dir", str(out16),
          "--chunk", "4096", "--img_downscale", "16", "--n_samples", "8"])
    m16 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(m16["psnr"]) and np.isfinite(m16["mae"])
    from spnerf_tpu.io import read_geotiff as _rg
    half = _rg(str(out16 / "val" / "rgb" / f"JAX_269_023_RGB_epoch{epoch}.tif"))[0]
    full = _rg(str(out_dir / "val" / "rgb" / f"JAX_269_023_RGB_epoch{epoch}.tif"))[0]
    assert half.shape[0] * 2 - full.shape[0] in (0, 1, -1)


def test_summarize_runs(tmp_path, capsys):
    """`tools summarize-runs` tabulates throughput + newest per-view val
    metrics from logs/metrics.jsonl (run bookkeeping beyond the reference)."""
    logs = tmp_path / "runA" / "logs"
    logs.mkdir(parents=True)
    (logs / "opts.json").write_text(json.dumps({"encoding": "hash"}))
    recs = [
        {"step": 38, "split": "train", "psnr": 18.0, "rays_per_sec": 400.0},
        {"step": 76, "split": "train", "psnr": 20.0, "rays_per_sec": 6000.0},
        {"step": 76, "split": "val_JAX_269_023_RGB", "psnr": 19.0,
         "ssim": 0.50, "mae": 2.5},
        {"step": 114, "split": "train", "psnr": 21.0, "rays_per_sec": 6100.0},
        {"step": 114, "split": "val_JAX_269_023_RGB", "psnr": 20.1,
         "ssim": 0.55, "mae": 1.5},
        {"step": 114, "split": "val", "psnr": 20.1, "ssim": 0.55, "mae": 1.5},
        # multi-AOI frame copy (".fN" suffix) and a short id with <2 '_' parts:
        # the table label keeps the frame suffix / falls back to the full name
        {"step": 114, "split": "val_JAX_269_011_RGB.f1", "psnr": 19.9,
         "ssim": 0.52, "mae": 1.7},
        {"step": 114, "split": "val_short", "psnr": 18.5,
         "ssim": 0.40, "mae": 3.0},
    ]
    (logs / "metrics.jsonl").write_text(
        "\n".join(json.dumps(r) for r in recs))
    # scan the PARENT dir; --json output
    main(["summarize-runs", str(tmp_path), "--json"])
    rows = json.loads(capsys.readouterr().out.strip())
    assert len(rows) == 1 and rows[0]["run"] == "runA"
    assert rows[0]["steps"] == 114
    assert rows[0]["rays_per_sec"] == 6000  # median skips the compile window
    view = rows[0]["views"]["JAX_269_023_RGB"]
    assert view == {"psnr": 20.1, "ssim": 0.55, "mae": 1.5}  # newest wins
    # human-readable table on a direct run dir
    main(["summarize-runs", str(tmp_path / "runA")])
    out = capsys.readouterr().out
    assert "runA" in out and "hash" in out and "20.1" in out
    assert "011.f1:" in out   # frame suffix preserved, not collapsed to "011"
    assert "short:" in out    # <2 '_' parts falls back to the full view name
