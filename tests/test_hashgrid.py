"""Hash-grid encoding + hash-trunk field tests, and incidence-angle sorting."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spnerf_tpu.config import ModelConfig
from spnerf_tpu.models import HashGridEncoding, init_hash_spnerf


def test_encoding_shapes_and_range(rng):
    enc = HashGridEncoding(n_levels=4, n_features=2, log2_table_size=12)
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(100, 3)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), xyz)
    out = enc.apply(params, xyz)
    assert out.shape == (100, 8)
    assert np.abs(np.asarray(out)).max() < 1e-3  # tiny init


def test_encoding_is_continuous(rng):
    """Trilinear interpolation: tiny input perturbations give tiny output
    changes (no hashing discontinuities within a cell interior)."""
    enc = HashGridEncoding(n_levels=4, n_features=2, log2_table_size=12,
                           base_resolution=4, max_resolution=32)
    x0 = jnp.asarray([[0.1234, -0.3456, 0.7]], jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x0)
    # re-scale table so outputs are visible
    params = jax.tree_util.tree_map(lambda t: t * 1e4, params)
    a = enc.apply(params, x0)
    b = enc.apply(params, x0 + 1e-5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-2)
    c = enc.apply(params, x0 + 0.5)
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-4  # actually varies


def test_encoding_gradients_flow(rng):
    enc = HashGridEncoding(n_levels=2, n_features=2, log2_table_size=10)
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(50, 3)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), xyz)

    def loss(p):
        return jnp.sum(enc.apply(p, xyz) ** 2)

    g = jax.grad(loss)(params)
    table_grad = np.asarray(g["params"]["table"])
    assert np.any(table_grad != 0)


def test_hash_field_outputs(rng):
    cfg = ModelConfig(sem=True, num_sem_classes=3, encoding="hash")
    model, params = init_hash_spnerf(jax.random.PRNGKey(0), cfg,
                                     n_levels=4, log2_table_size=12)
    n = 33
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(n, 3)).astype(np.float32))
    sun = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    sems = jnp.asarray(rng.integers(0, 3, n).astype(np.int32))
    out = model.apply(params, xyz, sun, None, sems)
    assert out["rgb"].shape == (n, 3)
    assert out["sigma"].shape == (n,)
    assert out["sem_logits"].shape == (n, 3)
    assert jnp.all(out["sigma"] >= 0)


def test_hash_field_trains_in_renderer(rng):
    """End-to-end: the hash field drops into the Trainer and the loss falls."""
    from spnerf_tpu.config import LossConfig, RenderConfig
    from spnerf_tpu.train.loop import Trainer

    mc = ModelConfig(encoding="hash", sem=False)
    rc = RenderConfig(n_samples=6, compute_dtype="float32")
    tr = Trainer(mc, rc, LossConfig(), lr=5e-3, steps_per_epoch=50,
                 max_steps=500)
    state = tr.init_state(jax.random.PRNGKey(0))
    n = 1024
    o = rng.normal(size=(n, 3)).astype(np.float32) * 0.05
    d = np.tile(np.array([[0.1, 0.2, -0.97]], np.float32), (n, 1))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    sun = d.copy()
    rays = np.concatenate([o, d, np.zeros((n, 1), np.float32),
                           np.full((n, 1), 1.2, np.float32), sun], -1)
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
    for _ in range(30):
        state, ld = step(state, data, jax.random.PRNGKey(1))
        jax.block_until_ready(ld["loss"])
    assert float(ld["loss"]) < first * 0.5


@pytest.mark.parametrize("impl", ["fused_vjp", "sorted_vjp"])
def test_restructured_vjp_hash_encode_matches_xla(rng, impl):
    """The restructured-VJP lookups (flat-scatter backward, and per-level
    sort-then-sorted-scatter backward) are bit-compatible with the
    plain-autodiff path: same forward, same table and position gradients."""
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(517, 3)).astype(np.float32))
    kw = dict(n_levels=4, n_features=2, log2_table_size=12,
              base_resolution=4, max_resolution=64)
    enc_x = HashGridEncoding(impl="xla", **kw)
    enc_p = HashGridEncoding(impl=impl, **kw)
    params = enc_x.init(jax.random.PRNGKey(0), xyz)
    params = jax.tree_util.tree_map(lambda t: t * 1e4, params)  # visible scale

    out_x = enc_x.apply(params, xyz)
    out_p = enc_p.apply(params, xyz)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-6, atol=1e-6)

    g = jnp.asarray(rng.normal(size=out_x.shape).astype(np.float32))

    def loss(enc, p, x):
        return jnp.sum(enc.apply(p, x) * g)

    gx_t, gx_x = jax.grad(lambda p, x: loss(enc_x, p, x), argnums=(0, 1))(
        params, xyz)
    gp_t, gp_x = jax.grad(lambda p, x: loss(enc_p, p, x), argnums=(0, 1))(
        params, xyz)
    np.testing.assert_allclose(np.asarray(gp_t["params"]["table"]),
                               np.asarray(gx_t["params"]["table"]),
                               rtol=1e-5, atol=1e-5)
    # dx grows with resolution * table scale; compare with a relative floor
    ref = np.asarray(gx_x)
    np.testing.assert_allclose(np.asarray(gp_x), ref,
                               rtol=1e-4, atol=1e-4 * np.abs(ref).max())


def test_matmul_vjp_hash_encode_matches_xla(rng, monkeypatch):
    """matmul_vjp: the backward scatter-add re-expressed as a factorized
    one-hot matmul. In f32 operand mode it must match the plain-autodiff
    table gradient to float tolerance; in the default bf16 operand mode
    (MXU path shipped on TPU) the cotangent rows round to bf16 before the
    f32-accumulating matmul, so the match is at bf16 resolution."""
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(517, 3)).astype(np.float32))
    kw = dict(n_levels=4, n_features=2, log2_table_size=12,
              base_resolution=4, max_resolution=64)
    enc_x = HashGridEncoding(impl="xla", **kw)
    enc_m = HashGridEncoding(impl="matmul_vjp", **kw)
    params = enc_x.init(jax.random.PRNGKey(0), xyz)
    params = jax.tree_util.tree_map(lambda t: t * 1e4, params)

    out_x = enc_x.apply(params, xyz)
    out_m = enc_m.apply(params, xyz)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_x),
                               rtol=1e-6, atol=1e-6)

    g = jnp.asarray(rng.normal(size=out_x.shape).astype(np.float32))

    def loss(enc, p, x):
        return jnp.sum(enc.apply(p, x) * g)

    gx_t = jax.grad(lambda p: loss(enc_x, p, xyz))(params)
    gx = np.asarray(gx_t["params"]["table"])

    monkeypatch.setenv("SPNERF_HASH_MATMUL_F32", "1")
    gm_f32 = np.asarray(jax.grad(lambda p: loss(enc_m, p, xyz))(params)
                        ["params"]["table"])
    np.testing.assert_allclose(gm_f32, gx, rtol=1e-5, atol=1e-5)

    monkeypatch.delenv("SPNERF_HASH_MATMUL_F32")
    jax.clear_caches()  # the env var is read at trace time
    gm_bf16 = np.asarray(jax.grad(lambda p: loss(enc_m, p, xyz))(params)
                         ["params"]["table"])
    np.testing.assert_allclose(gm_bf16, gx, rtol=2e-2,
                               atol=2e-2 * np.abs(gx).max())


def test_fused_vjp_hash_field_trains(rng):
    """HashSPNeRF with the restructured-VJP encoding trains: grads flow into
    the table through the custom VJP inside the full renderer+loss graph."""
    cfg = ModelConfig(sem=False, encoding="hash")
    model, params = init_hash_spnerf(jax.random.PRNGKey(0), cfg,
                                     n_levels=2, log2_table_size=10,
                                     enc_impl="fused_vjp")
    n = 32
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(n, 3)).astype(np.float32))
    sun = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))

    def loss(p):
        out = model.apply(p, xyz, sun, None, None)
        return jnp.mean(out["rgb"] ** 2) + jnp.mean(out["sigma"])

    g = jax.grad(loss)(params)
    table_grad = np.asarray(
        g["params"]["HashGridEncoding_0"]["table"])
    assert np.any(table_grad != 0)


def test_incidence_angle_sorting(dfc269_json_dir):
    from spnerf_tpu.geo.angles import (
        solar_incidence_angle,
        sort_by_increasing_solar_incidence_angle,
        sort_by_increasing_view_incidence_angle,
        view_incidence_angle,
    )
    import json

    paths = sort_by_increasing_view_incidence_angle(dfc269_json_dir)
    assert len(paths) >= 3
    angles = []
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        from spnerf_tpu.geo import RPCModel

        rpc = RPCModel.from_dict(d["rpc"])
        lon_c, lat_c = d["geojson"]["center"][:2]
        angles.append(view_incidence_angle(rpc, lon_c, lat_c))
    assert angles == sorted(angles)
    assert all(0 <= a < 60 for a in angles)  # satellite view angles

    spaths = sort_by_increasing_solar_incidence_angle(dfc269_json_dir)
    assert len(spaths) == len(paths)
    assert solar_incidence_angle(90.0, 0.0) == pytest.approx(0.0)
    assert solar_incidence_angle(0.0, 90.0) == pytest.approx(90.0)


def test_multi_aoi_frames_hash_disjointly(rng):
    """Multi-AOI: AOI k lives at x + k*FRAME_SPACING (data/multi.py). With
    frames>1 the encoding must (a) see each frame at full resolution (not the
    round-1 bug where the [-1,1] clip collapsed AOI k>0 onto a boundary
    plane), and (b) give different features to identical local coordinates in
    different frames (disjoint pseudo-tables)."""
    from spnerf_tpu.data.multi import FRAME_SPACING

    xyz0 = jnp.asarray(rng.uniform(-0.9, 0.9, size=(257, 3))
                       .astype(np.float32))
    xyz1 = xyz0 + jnp.array([FRAME_SPACING, 0.0, 0.0])
    kw = dict(n_levels=4, n_features=2, log2_table_size=12,
              base_resolution=4, max_resolution=64)
    enc = HashGridEncoding(frames=2, **kw)
    params = enc.init(jax.random.PRNGKey(0), xyz0)
    params = jax.tree_util.tree_map(lambda t: t * 1e4, params)

    f0 = np.asarray(enc.apply(params, xyz0))
    f1 = np.asarray(enc.apply(params, xyz1))
    # frame 1 is NOT collapsed: distinct inputs give distinct features
    assert np.std(f1, axis=0).mean() > 0.1 * np.std(f0, axis=0).mean()
    # and the two frames hash into different cells
    assert np.abs(f0 - f1).max() > 1e-3

    # frames=1 stays bit-identical to the pre-frames encoding
    enc_plain = HashGridEncoding(frames=1, **kw)
    np.testing.assert_array_equal(np.asarray(enc_plain.apply(params, xyz0)),
                                  f0)
