"""End-to-end smoke train on the bundled DFC2019_269 scene (SURVEY.md §4):
a few hundred steps on CPU must improve PSNR, and the DSM/MAE pipeline must
produce a finite altitude error against the bundled lidar truth."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spnerf_tpu.config import LossConfig, ModelConfig, RenderConfig
from spnerf_tpu.data import load_scene
from spnerf_tpu.train.loop import Trainer, scene_to_device_arrays


@pytest.fixture(scope="module")
def bundled_scene(dfc269_root):
    return load_scene(
        os.path.join(dfc269_root, "JSON"),
        os.path.join(dfc269_root, "RGB/JAX_269"),
        os.path.join(dfc269_root, "Depth"),
        os.path.join(dfc269_root, "Semantic"),
        "JAX_269", img_downscale=4.0, sem=True, num_sem_classes=3,
        dense_ss=True, verbose=False,
    )


@pytest.mark.slow
def test_smoke_train_improves_psnr_and_mae(bundled_scene, tmp_path):
    scene = bundled_scene
    mc = ModelConfig(mapping=True, sem=True, num_sem_classes=3, fc_units=64,
                     fc_layers=4, skips=(2,))
    rc = RenderConfig(n_samples=8, solar_correction=True, sem=True,
                      compute_dtype="float32")
    lc = LossConfig(sc_lambda=0.05, sem=True, ss_lambda=0.04)
    tr = Trainer(mc, rc, lc, lr=5e-4, steps_per_epoch=len(scene) // 256,
                 max_steps=1000)
    state = tr.init_state(jax.random.PRNGKey(0))
    data = {k: jnp.asarray(v)
            for k, v in scene_to_device_arrays(scene).items()}
    run = tr.build_train_scan(256, 20)
    state, ld = run(state, data, jax.random.PRNGKey(1))
    psnr_first = float(ld["psnr"])
    for _ in range(4):
        state, ld = run(state, data, jax.random.PRNGKey(1))
        jax.block_until_ready(ld["loss"])
    psnr_last = float(ld["psnr"])
    # the first window already learns a lot; the remaining 80 steps must
    # still improve measurably
    assert psnr_last > psnr_first + 1.0, (psnr_first, psnr_last)
    assert psnr_last > 19.0, psnr_last

    # render the test view, extract a DSM, and score against the lidar truth
    rec = scene.val_images[-1]
    sample = scene.load_val_image(rec, with_sem=True)
    render = tr.build_render_fn(chunk=8192)
    out = render(jax.device_get(state.params), sample["rays"], 0,
                 sample.get("sems"))
    from spnerf_tpu.evaluation.dsm import dsm_from_latlonalt
    from spnerf_tpu.evaluation.mae import compute_mae_and_save_dsm_diff

    depth = np.asarray(out["depth_coarse"])
    lats, lons, alts = scene.latlonalt_from_depth(sample["rays"], depth)
    dsm_path = str(tmp_path / "pred_dsm.tif")
    dsm_from_latlonalt(lats, lons, alts, dsm_path=dsm_path)
    gt_dir = os.path.join("/root/reference/Dataset/DFC2019_269", "Truth")
    mae = compute_mae_and_save_dsm_diff(dsm_path, rec.img_id, "JAX_269",
                                        gt_dir, str(tmp_path), 0, save=False)
    assert np.isfinite(mae) and 0 < mae < 15.0  # meters, loose smoke bound
