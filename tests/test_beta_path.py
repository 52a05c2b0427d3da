"""Beta/uncertainty (SatNerf) path: transient embedding, beta head through the
renderer, warmup switch semantics, and a short training run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spnerf_tpu.config import LossConfig, ModelConfig, RenderConfig
from spnerf_tpu.train.loop import Trainer


def _data(rng, n=512):
    o = rng.normal(size=(n, 3)).astype(np.float32) * 0.05
    d = np.tile(np.array([[0.1, 0.2, -0.97]], np.float32), (n, 1))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate([o, d, np.zeros((n, 1), np.float32),
                           np.full((n, 1), 1.2, np.float32), d], -1)
    return {
        "rays": jnp.asarray(rays),
        "rgbs": jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32)),
        "ids": jnp.asarray(rng.integers(0, 3, n).astype(np.int32)),
        "depths": jnp.zeros((n, 2), jnp.float32),
        "valid_depth": jnp.zeros(n, jnp.float32),
        "depth_std": jnp.zeros(n, jnp.float32),
        "sems": jnp.full((n,), -100, jnp.int32),
    }


@pytest.mark.slow
def test_beta_training_and_warmup(rng):
    mc = ModelConfig(mapping=True, beta=True, fc_units=32, fc_layers=2,
                     skips=(), t_embedding_dims=4)
    rc = RenderConfig(n_samples=6, beta=True, compute_dtype="float32")
    lc = LossConfig(beta=True)
    tr = Trainer(mc, rc, lc, lr=1e-3, steps_per_epoch=10, max_steps=200,
                 t_vocab=30)
    state = tr.init_state(jax.random.PRNGKey(0))
    assert "t" in state.params  # transient embedding table
    data = _data(rng)
    step = tr.build_train_step(64)

    # warmup: before 2 epochs (20 steps) the beta-free SNerf loss is used
    state, ld_warm = step(state, data, jax.random.PRNGKey(1))
    assert float(ld_warm["coarse_logbeta"]) == 0.0  # beta terms inactive
    for _ in range(25):
        state, ld = step(state, data, jax.random.PRNGKey(1))
        jax.block_until_ready(ld["loss"])
    # past warmup: beta loss terms are live
    assert float(ld["coarse_logbeta"]) != 0.0
    assert np.isfinite(float(ld["loss"]))


def test_beta_render_outputs(rng):
    mc = ModelConfig(mapping=True, beta=True, fc_units=32, fc_layers=2,
                     skips=(), t_embedding_dims=4)
    rc = RenderConfig(n_samples=6, beta=True, compute_dtype="float32")
    tr = Trainer(mc, rc, LossConfig(beta=True), lr=1e-3, steps_per_epoch=10,
                 max_steps=100)
    state = tr.init_state(jax.random.PRNGKey(0))
    render = tr.build_render_fn(chunk=2048)
    data = _data(rng, 256)
    out = render(jax.device_get(state.params), np.asarray(data["rays"]), t=2)
    assert "beta_coarse" in out
    # lean eval contract: beta is weight-composited on device (R, 1)
    assert out["beta_coarse"].shape == (256, 1)
    assert np.all(out["beta_coarse"] >= 0)
