"""Synthetic flagship configs + batches shared by bench.py, the driver entry
points (__graft_entry__), and `tools warm-cache`.

The bench program is defined ONCE here (`bench_setup`) so that warming the
persistent XLA compilation cache (`tools warm-cache`) compiles the exact HLO
that `bench.py` later times — a fresh container's first bench drops from
~7 min of remote compiles to under a minute after a warm.
"""

import os

import numpy as np


def flagship_configs(n_samples=64, fc_units=512):
    """Full flagship sp-nerf configuration (64 coarse samples, depth-guided
    resampling, solar correction, semantic head — the BASELINE.md config)."""
    from ..config import LossConfig, ModelConfig, RenderConfig

    mc = ModelConfig(mapping=True, sem=True, num_sem_classes=3,
                     fc_units=fc_units, fc_layers=8, skips=(4,))
    rc = RenderConfig(n_samples=n_samples, guidedsample=True,
                      solar_correction=True, sem=True, compute_dtype="bfloat16",
                      use_pallas=os.environ.get("SPNERF_USE_PALLAS") == "1")
    lc = LossConfig(sc_lambda=0.1, depth=True, ds_lambda=1.0, stdscale=1.0,
                    sem=True, ss_lambda=1.0)
    return mc, rc, lc


def fake_batch(rng, n):
    """Device-shaped synthetic scene rows (11-col rays + supervision)."""
    o = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    sun = rng.normal(size=(n, 3)).astype(np.float32)
    sun /= np.linalg.norm(sun, axis=-1, keepdims=True)
    rays = np.concatenate(
        [o, d, np.zeros((n, 1), np.float32), np.full((n, 1), 1.5, np.float32),
         sun], axis=-1)
    return {
        "rays": rays,
        "rgbs": rng.uniform(size=(n, 3)).astype(np.float32),
        "ids": np.zeros(n, np.int32),
        "depths": np.stack([np.full(n, 0.7, np.float32),
                            rng.uniform(size=n).astype(np.float32)], axis=-1),
        "valid_depth": (rng.uniform(size=n) > 0.5).astype(np.float32),
        "depth_std": np.full(n, 0.05, np.float32),
        "sems": rng.integers(0, 3, size=n).astype(np.int32),
    }


def bench_setup(batch_size=1024, n_inner=100, n_rays=65536):
    """Build the exact (trainer, state, data, run) bench.py times: the full
    flagship training step scanned n_inner times per dispatch over a
    device-resident synthetic scene. Any change here changes the benchmark."""
    import jax

    from ..train.loop import Trainer

    mc, rc, lc = flagship_configs()
    tr = Trainer(mc, rc, lc, lr=5e-4, steps_per_epoch=1000, max_steps=30000)
    state = tr.init_state(jax.random.PRNGKey(0))
    data = {k: jax.numpy.asarray(v)
            for k, v in fake_batch(np.random.default_rng(0), n_rays).items()}
    run = tr.build_train_scan(batch_size, n_inner)
    return tr, state, data, run
