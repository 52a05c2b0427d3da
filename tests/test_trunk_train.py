"""Fused trunk fwd+bwd (custom VJP) vs flax autodiff, and the full train step
with the fused path enabled (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spnerf_tpu.config import LossConfig, ModelConfig, RenderConfig
from spnerf_tpu.models import init_spnerf
from spnerf_tpu.ops.pallas.trunk_train import make_fused_train_field


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(mapping=True, sem=True, num_sem_classes=3, fc_units=128,
                      fc_layers=8, skips=(4,))
    model, params = init_spnerf(jax.random.PRNGKey(0), cfg)
    return cfg, model, params


def test_fused_trunk_grads_match_flax(setup, rng):
    cfg, model, params = setup
    n = 300  # not a tile multiple
    xyz = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.3)
    sun = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    sems = jnp.asarray(rng.integers(0, 3, size=(n,)).astype(np.int32))
    fused = make_fused_train_field(cfg, compute_dtype_name="float32",
                                   interpret=True)

    def loss(apply_fn, p):
        out = apply_fn(p)
        return (jnp.mean(out["rgb"] ** 2) + jnp.mean(out["sigma"])
                + jnp.mean(out["sem_logits"] ** 2) + jnp.mean(out["sun_v"]))

    p = params["params"]
    vf, gf = jax.value_and_grad(
        lambda pp: loss(lambda q: fused(q, xyz, sun, None, sems), pp))(p)
    vr, gr = jax.value_and_grad(
        lambda pp: loss(
            lambda q: model.apply({"params": q}, xyz, sun, None, sems), pp))(p)
    np.testing.assert_allclose(float(vf), float(vr), rtol=1e-6)
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_flatten_with_path(gf)[0],
        jax.tree_util.tree_flatten_with_path(gr)[0],
    ):
        scale = np.abs(np.asarray(b)).max() + 1e-12
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5 * max(scale, 1.0),
            err_msg=jax.tree_util.keystr(ka))


def test_train_step_with_fused_trunk(rng):
    from spnerf_tpu.train.loop import Trainer

    mc = ModelConfig(mapping=True, sem=False, fc_units=64, fc_layers=8,
                     skips=(4,))
    rc = RenderConfig(n_samples=6, compute_dtype="float32", use_pallas=True)
    tr = Trainer(mc, rc, LossConfig(), lr=1e-3, steps_per_epoch=50,
                 max_steps=500)
    assert tr._fused_train_apply is not None
    state = tr.init_state(jax.random.PRNGKey(0))
    n = 512
    o = rng.normal(size=(n, 3)).astype(np.float32) * 0.05
    d = np.tile(np.array([[0.1, 0.2, -0.97]], np.float32), (n, 1))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate([o, d, np.zeros((n, 1), np.float32),
                           np.full((n, 1), 1.2, np.float32), d], -1)
    data = {
        "rays": jnp.asarray(rays),
        "rgbs": jnp.asarray(np.tile([[0.3, 0.6, 0.2]], (n, 1)).astype(np.float32)),
        "ids": jnp.zeros(n, jnp.int32),
        "depths": jnp.zeros((n, 2), jnp.float32),
        "valid_depth": jnp.zeros(n, jnp.float32),
        "depth_std": jnp.zeros(n, jnp.float32),
        "sems": jnp.full((n,), -100, jnp.int32),
    }
    step = tr.build_train_step(128)
    state, ld0 = step(state, data, jax.random.PRNGKey(1))
    first = float(ld0["loss"])
    for _ in range(25):
        state, ld = step(state, data, jax.random.PRNGKey(1))
        jax.block_until_ready(ld["loss"])
    assert float(ld["loss"]) < first * 0.7
