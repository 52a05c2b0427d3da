"""Proposal-sampler tests: density weights, CDF gathers, interlevel loss
semantics, and the full hash+proposal training configuration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spnerf_tpu.config import LossConfig, ModelConfig, RenderConfig
from spnerf_tpu.ops.proposal import (
    _cum_weight_at,
    density_weights,
    interlevel_loss,
    resample_from_weights,
)
from spnerf_tpu.train.loop import Trainer


def test_density_weights_match_composite(rng):
    from spnerf_tpu.ops import composite

    r, s = 8, 16
    z = jnp.sort(jnp.asarray(rng.uniform(0, 1.5, (r, s)), jnp.float32), -1)
    sig = jnp.asarray(rng.uniform(0, 8, (r, s)), jnp.float32)
    w = density_weights(sig, z)
    field = {"sigma": sig, "rgb": jnp.zeros((r, s, 3)),
             "sun_v": jnp.zeros((r, s, 1)), "sky": jnp.zeros((r, s, 3))}
    ref = composite(field, z)["weights"]
    np.testing.assert_allclose(np.asarray(w), np.asarray(ref), atol=1e-6)


def test_cum_weight_at_endpoints():
    edges = jnp.array([[0.0, 1.0, 2.0, 3.0]])
    w = jnp.array([[0.2, 0.5, 0.3]])
    q = jnp.array([[0.0, 0.5, 1.0, 2.5, 3.0, 5.0, -1.0]])
    out = np.asarray(_cum_weight_at(edges, w, q))[0]
    np.testing.assert_allclose(out, [0.0, 0.1, 0.2, 0.85, 1.0, 1.0, 0.0],
                               atol=1e-6)


def test_interlevel_loss_zero_when_bounded(rng):
    """If the proposal histogram equals the main histogram, the loss is 0."""
    r, s = 4, 32
    z = jnp.sort(jnp.asarray(rng.uniform(0, 1, (r, s)), jnp.float32), -1)
    w = jnp.asarray(rng.uniform(0, 1, (r, s)), jnp.float32)
    w = w / jnp.sum(w, -1, keepdims=True)
    loss = interlevel_loss(z, w, z, w)
    assert float(loss) < 1e-8
    # proposal with mass in the wrong place -> positive loss
    w_bad = jnp.roll(w, s // 2, axis=-1)
    assert float(interlevel_loss(z, w_bad, z, w)) > 1e-3


def test_resample_concentrates(rng):
    r, s = 16, 64
    z = jnp.broadcast_to(jnp.linspace(0.0, 1.0, s), (r, s))
    w = jnp.zeros((r, s)).at[:, 30:34].set(1.0)
    out = resample_from_weights(jax.random.PRNGKey(0), z, w, 32)
    frac = float(jnp.mean((out > 0.4) & (out < 0.6)))
    assert frac > 0.9
    assert np.all(np.diff(np.asarray(out), axis=-1) >= 0)


@pytest.mark.slow
def test_hash_proposal_training(rng):
    """Full NGP-class config: hash main field + proposal sampler trains and
    the interlevel loss decreases."""
    mc = ModelConfig(encoding="hash")
    rc = RenderConfig(n_samples=8, n_proposal=16, proposal=True,
                      compute_dtype="float32")
    tr = Trainer(mc, rc, LossConfig(prop_lambda=1.0), lr=5e-3,
                 steps_per_epoch=50, max_steps=500)
    state = tr.init_state(jax.random.PRNGKey(0))
    assert "proposal" in state.params

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
    assert "coarse_prop" in ld0
    first = float(ld0["loss"])
    for _ in range(30):
        state, ld = step(state, data, jax.random.PRNGKey(1))
        jax.block_until_ready(ld["loss"])
    assert float(ld["loss"]) < first
    assert np.isfinite(float(ld["coarse_prop"]))
