"""Fused full-field training kernel (ops/pallas/field_train) vs the flax
field: forward outputs and parameter gradients must agree (interpret mode on
CPU). The backward uses the cos-polynomial for the Siren derivative instead of
autodiff's exact derivative of the sin-polynomial (~1e-5 relative), so grads
are compared at 1e-3/1e-4 tolerances in f32."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spnerf_tpu.config import ModelConfig
from spnerf_tpu.models.spnerf import SPNeRF, init_spnerf
from spnerf_tpu.ops.pallas.field_train import make_train_field


def _cfg(beta=False):
    return ModelConfig(
        siren=True, mapping=True, mapping_sizes=(10, 4), fc_units=64,
        fc_layers=6, skips=(4,), sem=True, num_sem_classes=3,
        s_embedding_factor=4, beta=beta, t_embedding_dims=8,
    )


def _inputs(rng, n, cfg):
    xyz = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    sun = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    sun = sun / jnp.linalg.norm(sun, axis=-1, keepdims=True)
    t = (jnp.asarray(rng.normal(size=(n, cfg.t_embedding_dims))
                     .astype(np.float32)) if cfg.beta else None)
    sem = jnp.asarray(rng.integers(-1, cfg.num_sem_classes, (n,))
                      .astype(np.int32))
    return xyz, sun, t, sem


def _loss_weights(rng, out):
    return {k: jnp.asarray(rng.normal(size=np.shape(v)).astype(np.float32))
            for k, v in out.items()}


@pytest.mark.parametrize("beta", [False, True])
def test_field_train_matches_flax_grads(beta):
    rng = np.random.default_rng(0)
    cfg = _cfg(beta=beta)
    model, variables = init_spnerf(jax.random.PRNGKey(1), cfg,
                                   compute_dtype=jnp.float32)
    params = variables["params"]
    xyz, sun, t, sem = _inputs(rng, 200, cfg)  # non-multiple of TILE: pads

    fused = make_train_field(cfg, compute_dtype_name="float32",
                             interpret=True)

    out_flax = model.apply({"params": params}, xyz, sun, t, sem)
    out_fused = fused(params, xyz, sun, t, sem)
    assert set(out_flax) == set(out_fused)
    for k in out_flax:
        np.testing.assert_allclose(out_fused[k], out_flax[k], rtol=2e-5,
                                   atol=2e-6, err_msg=f"forward {k}")

    wts = _loss_weights(rng, out_flax)

    def loss_flax(p):
        o = model.apply({"params": p}, xyz, sun, t, sem)
        return sum(jnp.sum(wts[k] * o[k]) for k in o)

    def loss_fused(p):
        o = fused(p, xyz, sun, t, sem)
        return sum(jnp.sum(wts[k] * o[k]) for k in o)

    l0, g_flax = jax.value_and_grad(loss_flax)(params)
    l1, g_fused = jax.value_and_grad(loss_fused)(params)
    assert float(l0) == pytest.approx(float(l1), rel=1e-5)

    flat0 = jax.tree_util.tree_leaves_with_path(g_flax)
    flat1 = {jax.tree_util.keystr(p): v
             for p, v in jax.tree_util.tree_leaves_with_path(g_fused)}
    for path, v0 in flat0:
        v1 = flat1[jax.tree_util.keystr(path)]
        scale = max(float(jnp.max(jnp.abs(v0))), 1e-3)
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v0), rtol=1e-3, atol=1e-4 * scale,
            err_msg=f"grad {jax.tree_util.keystr(path)}")


def test_field_train_head_pruning_matches_flax():
    """Solar-pass shape: heads=("sun",) — only sigma/sun_v outputs, grads for
    unused heads are zero, used ones match flax with the same pruning."""
    rng = np.random.default_rng(2)
    cfg = _cfg(beta=False)
    model, variables = init_spnerf(jax.random.PRNGKey(3), cfg,
                                   compute_dtype=jnp.float32)
    params = variables["params"]
    xyz, sun, t, sem = _inputs(rng, 130, cfg)
    fused = make_train_field(cfg, compute_dtype_name="float32",
                             interpret=True)

    out_flax = model.apply({"params": params}, xyz, sun, t, sem,
                           heads=("sun",))
    out_fused = fused(params, xyz, sun, t, sem, heads=("sun",))
    assert set(out_fused) == {"sigma", "sun_v"} == set(out_flax)
    for k in out_flax:
        np.testing.assert_allclose(out_fused[k], out_flax[k], rtol=2e-5,
                                   atol=2e-6)

    wts = _loss_weights(rng, out_flax)

    def loss(p, f):
        o = f(p)
        return sum(jnp.sum(wts[k] * o[k]) for k in o)

    g_flax = jax.grad(lambda p: loss(
        p, lambda q: model.apply({"params": q}, xyz, sun, t, sem,
                                 heads=("sun",))))(params)
    g_fused = jax.grad(lambda p: loss(
        p, lambda q: fused(q, xyz, sun, t, sem, heads=("sun",))))(params)

    flat0 = jax.tree_util.tree_leaves_with_path(g_flax)
    flat1 = {jax.tree_util.keystr(p): v
             for p, v in jax.tree_util.tree_leaves_with_path(g_fused)}
    for path, v0 in flat0:
        v1 = flat1[jax.tree_util.keystr(path)]
        scale = max(float(jnp.max(jnp.abs(v0))), 1e-3)
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v0), rtol=1e-3, atol=1e-4 * scale,
            err_msg=f"grad {jax.tree_util.keystr(path)}")


def test_field_train_bf16_close():
    """bf16 compute path stays within training-noise distance of f32."""
    rng = np.random.default_rng(4)
    cfg = _cfg(beta=False)
    model, variables = init_spnerf(jax.random.PRNGKey(5), cfg,
                                   compute_dtype=jnp.float32)
    params = variables["params"]
    xyz, sun, t, sem = _inputs(rng, 96, cfg)
    fused = make_train_field(cfg, compute_dtype_name="bfloat16",
                             interpret=True)
    out32 = model.apply({"params": params}, xyz, sun, t, sem)
    out16 = fused(params, xyz, sun, t, sem)
    for k in out32:
        np.testing.assert_allclose(out16[k], out32[k], rtol=0.1, atol=0.05,
                                   err_msg=k)


def test_field_train_step_under_mesh():
    """One shard_map training step with the fused field on an 8-virtual-device
    mesh (the deployment shape: dp over rays, replicated params, pmean'd
    grads through the custom VJP)."""
    import numpy as np

    from spnerf_tpu.config import LossConfig, RenderConfig
    from spnerf_tpu.parallel import data_mesh
    from spnerf_tpu.train.loop import Trainer

    rng = np.random.default_rng(7)
    mc = _cfg(beta=False)
    rc = RenderConfig(n_samples=4, compute_dtype="float32", use_pallas=True,
                      sem=True, solar_correction=True, guidedsample=True)
    mesh = data_mesh(8)
    tr = Trainer(mc, rc, LossConfig(sc_lambda=0.05, sem=True, ss_lambda=0.1),
                 lr=1e-3, steps_per_epoch=10, max_steps=100, mesh=mesh)
    assert tr._fused_train_apply is not None
    state = tr.replicate_state(tr.init_state(jax.random.PRNGKey(0)))
    n = 256
    o = rng.normal(size=(n, 3)).astype(np.float32) * 0.05
    d = np.tile(np.array([[0.1, 0.2, -0.97]], np.float32), (n, 1))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate([o, d, np.zeros((n, 1), np.float32),
                           np.full((n, 1), 1.2, np.float32), d], -1)
    data = tr.shard_data({
        "rays": rays,
        "rgbs": np.tile([[0.3, 0.6, 0.2]], (n, 1)).astype(np.float32),
        "ids": np.zeros(n, np.int32),
        "depths": np.zeros((n, 2), np.float32),
        "valid_depth": np.zeros(n, np.float32),
        "depth_std": np.zeros(n, np.float32),
        "sems": rng.integers(0, 3, size=(n,)).astype(np.int32),
    })
    step = tr.build_train_step(64)
    state, ld = step(state, data, jax.random.PRNGKey(1))
    assert np.isfinite(float(ld["loss"]))
