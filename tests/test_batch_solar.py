"""Parity tests for the batched solar pass with per-row head pruning
(SPNERF_BATCH_SOLAR, ops/render._eval_field_tail + the models' `solar_tail`
kwarg): the batched path must reproduce the separate-pass renderer's outputs
AND gradients for both field families, since every matmul involved is
row-independent (same per-row math, different batching)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spnerf_tpu.config import ModelConfig, RenderConfig
from spnerf_tpu.models import init_hash_spnerf
from spnerf_tpu.models.spnerf import init_spnerf
from spnerf_tpu.ops.render import render_rays


def _make_rays(n, key=0):
    k = jax.random.PRNGKey(key)
    o = jax.random.normal(k, (n, 3)) * 0.1
    d = jnp.tile(jnp.array([[0.2, 0.1, -0.97]]), (n, 1))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    near = jnp.zeros((n, 1))
    far = jnp.full((n, 1), 1.4)
    sun = jnp.tile(jnp.array([[0.3, 0.3, 0.9]]), (n, 1))
    sun = sun / jnp.linalg.norm(sun, axis=-1, keepdims=True)
    return jnp.concatenate([o, d, near, far, sun], axis=-1).astype(jnp.float32)


def _run(model, params, rc, monkeypatch, batched, t_emb=None, guided=True):
    """One render + grad evaluation with SPNERF_BATCH_SOLAR forced on/off."""
    monkeypatch.setenv("SPNERF_BATCH_SOLAR", "1" if batched else "0")
    n = 6
    rays = _make_rays(n)
    sems = jnp.array([0, 1, 2, 0, 1, -100])
    valid = jnp.array([1, 0, 1, 0, 1, 0])
    tdepths = jnp.stack([jnp.full((n,), 0.7), jnp.ones((n,))], axis=-1)
    tstd = jnp.full((n,), 0.05)

    def loss_fn(p):
        def apply(xyz, sun, t, s, heads=None, solar_tail=0):
            return model.apply(p, xyz, sun, t, s, heads=heads,
                               solar_tail=solar_tail)

        apply.supports_solar_tail = True
        out = render_rays(
            apply, rc, rays, t_emb=t_emb, sems=sems,
            key=jax.random.PRNGKey(1), train=guided, valid_depth=valid,
            target_depths=tdepths, target_std=tstd)
        loss = (jnp.mean(out["rgb_coarse"])
                + jnp.mean(out["sun_sc_coarse"])
                + jnp.mean(out["weights_sc_coarse"])
                + jnp.mean(out["depth_coarse"]))
        if "sem_logits_coarse" in out:
            loss = loss + jnp.mean(out["sem_logits_coarse"])
        if "beta_coarse" in out:
            loss = loss + jnp.mean(out["beta_coarse"])
        return loss, out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    return loss, out, grads


def _assert_tree_close(a, b, rtol=1e-6, atol=1e-6):
    fa, ta = jax.tree_util.tree_flatten(a)
    fb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


@pytest.mark.slow
@pytest.mark.parametrize("guided", [True, False])
def test_siren_batch_solar_matches_separate(monkeypatch, guided):
    cfg = ModelConfig(mapping=True, sem=True, num_sem_classes=3, fc_units=16,
                      fc_layers=2, skips=(1,), beta=True, t_embedding_dims=4)
    rc = RenderConfig(n_samples=6, guidedsample=guided, solar_correction=True,
                      sem=True)
    model, params = init_spnerf(jax.random.PRNGKey(0), cfg)
    t_emb = jax.random.normal(jax.random.PRNGKey(7), (6, 4))
    ref = _run(model, params, rc, monkeypatch, batched=False, t_emb=t_emb,
               guided=guided)
    got = _run(model, params, rc, monkeypatch, batched=True, t_emb=t_emb,
               guided=guided)
    assert set(ref[1]) == set(got[1])
    _assert_tree_close(got[1], ref[1])
    _assert_tree_close(got[2], ref[2])


@pytest.mark.slow
def test_hash_batch_solar_matches_separate(monkeypatch):
    cfg = ModelConfig(sem=True, num_sem_classes=3, encoding="hash")
    rc = RenderConfig(n_samples=6, guidedsample=True, solar_correction=True,
                      sem=True)
    model, params = init_hash_spnerf(
        jax.random.PRNGKey(0), cfg, n_levels=3, n_features=2,
        log2_table_size=8, enc_impl="xla")
    ref = _run(model, params, rc, monkeypatch, batched=False)
    got = _run(model, params, rc, monkeypatch, batched=True)
    assert set(ref[1]) == set(got[1])
    _assert_tree_close(got[1], ref[1])
    # table gradients flow identically through the single batched gather
    _assert_tree_close(got[2], ref[2])


@pytest.mark.slow
def test_fine_pass_batch_solar_matches_separate(monkeypatch):
    """n_importance configs: the fine pass and its solar pass batch too."""
    cfg = ModelConfig(mapping=True, fc_units=16, fc_layers=2, skips=(1,))
    rc = RenderConfig(n_samples=6, n_importance=2, guidedsample=False,
                      solar_correction=True)
    model, params = init_spnerf(jax.random.PRNGKey(0), cfg)

    def run(batched):
        monkeypatch.setenv("SPNERF_BATCH_SOLAR", "1" if batched else "0")
        n = 5
        rays = _make_rays(n)

        def loss_fn(p):
            def apply(xyz, sun, t, s, heads=None, solar_tail=0):
                return model.apply(p, xyz, sun, t, s, heads=heads,
                                   solar_tail=solar_tail)

            apply.supports_solar_tail = True
            out = render_rays(apply, rc, rays, key=jax.random.PRNGKey(1),
                              train=True)
            return (jnp.mean(out["rgb_fine"]) + jnp.mean(out["sun_sc_fine"])
                    + jnp.mean(out["weights_sc_fine"])), out

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    (loss_ref, out_ref), g_ref = run(False)
    (loss_got, out_got), g_got = run(True)
    assert set(out_ref) == set(out_got)
    _assert_tree_close(out_got, out_ref)
    _assert_tree_close(g_got, g_ref)


def test_batch_solar_requires_field_support(monkeypatch):
    """Fields without `supports_solar_tail` (e.g. the fused Pallas eval
    apply) must keep the separate-pass path even when the env asks for
    batching."""
    monkeypatch.setenv("SPNERF_BATCH_SOLAR", "1")
    cfg = ModelConfig(fc_units=16, fc_layers=2, skips=(1,))
    rc = RenderConfig(n_samples=4, guidedsample=False, solar_correction=True)
    model, params = init_spnerf(jax.random.PRNGKey(0), cfg)
    apply = lambda xyz, sun, t, s, heads=None: model.apply(
        params, xyz, sun, t, s, heads=heads)
    out = render_rays(apply, rc, _make_rays(3), key=jax.random.PRNGKey(1))
    assert out["rgb_coarse"].shape == (3, 3)
    assert jnp.all(jnp.isfinite(out["sun_sc_coarse"]))
