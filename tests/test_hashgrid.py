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


@pytest.mark.slow
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
    # direct_coarse=False: fused_vjp implements the hash-every-level function
    # flat_table=False: sorted/fused impls keep (T, F) storage, so the shared
    # params must too (flat <-> (T, F) equivalence pinned separately below)
    kw = dict(n_levels=4, n_features=2, log2_table_size=12,
              base_resolution=4, max_resolution=64, direct_coarse=False,
              flat_table=False)
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


@pytest.mark.slow
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


def test_direct_coarse_matches_dense_trilinear_oracle(rng):
    """Levels whose dense grid fits the table use collision-free direct
    indexing (NGP convention, round 3): the encoding must equal a brute-force
    numpy trilinear interpolation of the table rows laid out as a dense
    (side, side, side) grid."""
    L, F, log2T = 2, 2, 12
    enc = HashGridEncoding(n_levels=L, n_features=F, log2_table_size=log2T,
                           base_resolution=4, max_resolution=8)
    xyz = rng.uniform(-1, 1, size=(257, 3)).astype(np.float32)
    # exact +1/-1 boundary rows (what out-of-box samples clip to): the cell
    # index clamps to res-1 with frac 1.0 — interpolates onto the face
    # corners, stays in the side^3 dense range
    xyz[:4] = [[1.0, 1.0, 1.0], [-1.0, 1.0, -1.0],
               [1.0, 0.3, -0.7], [0.2, -1.0, 1.0]]
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(xyz))
    params = jax.tree_util.tree_map(lambda t: t * 1e4, params)
    out = np.asarray(enc.apply(params, jnp.asarray(xyz)))

    # flat (L, T*F) storage is FEATURE-MAJOR: row[f*T + t]
    tab = np.asarray(params["params"]["table"]).reshape(
        L, F, -1).transpose(0, 2, 1)
    b = np.exp((np.log(8) - np.log(4)) / (L - 1))
    x01 = np.clip((xyz + 1.0) * 0.5, 0.0, 1.0)
    for l in range(L):
        res = int(np.floor(4 * b ** l))
        side = res + 1
        assert side ** 3 <= 2 ** log2T  # this level must be direct-indexed
        grid = tab[l][: side ** 3].reshape(side, side, side, F)
        xs = x01 * res
        x0 = np.minimum(np.floor(xs), res - 1).astype(np.int64)
        f = xs - x0
        expect = np.zeros((xyz.shape[0], F), np.float32)
        for ci in (0, 1):
            for cj in (0, 1):
                for ck in (0, 1):
                    w = (np.where(ci, f[:, 0], 1 - f[:, 0])
                         * np.where(cj, f[:, 1], 1 - f[:, 1])
                         * np.where(ck, f[:, 2], 1 - f[:, 2]))
                    expect += (w[:, None]
                               * grid[x0[:, 0] + ci, x0[:, 1] + cj,
                                      x0[:, 2] + ck])
        np.testing.assert_allclose(out[:, l * F:(l + 1) * F], expect,
                                   rtol=1e-4, atol=1e-4)


def test_hash_level_annealing(rng):
    """--hash_anneal_steps (opt-in coarse-to-fine, no reference counterpart):
    at step 0 only the 2 coarsest levels carry features/gradients; once
    step >= anneal_steps the loss is bit-identical to annealing off (the
    ramp multiplies by exactly 1.0)."""
    from spnerf_tpu.config import LossConfig, ModelConfig, RenderConfig
    from spnerf_tpu.train.loop import Trainer
    from test_train import _fake_data

    mc = ModelConfig(fc_units=32, fc_layers=2, skips=(), encoding="hash",
                     hash_levels=4, hash_features=2, hash_log2T=12,
                     hash_anneal_steps=8)
    mc_off = ModelConfig(fc_units=32, fc_layers=2, skips=(), encoding="hash",
                         hash_levels=4, hash_features=2, hash_log2T=12)
    rc = RenderConfig(n_samples=6, compute_dtype="float32")
    kw = dict(lr=1e-3, steps_per_epoch=10, max_steps=100, donate=False)
    tr = Trainer(mc, rc, LossConfig(), **kw)
    tr_off = Trainer(mc_off, rc, LossConfig(), **kw)
    state = tr.init_state(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v[:64]) for k, v in
             _fake_data(np.random.default_rng(3)).items()}
    key = jax.random.PRNGKey(1)

    # step 0: fine levels (l >= 2) closed -> zero table gradient there
    (_, _), grads = jax.value_and_grad(tr._loss_fn, has_aux=True)(
        state.params, batch, key, jnp.int32(0))
    gt = np.asarray(grads["coarse"]["HashGridEncoding_0"]["table"])
    assert np.abs(gt[:2]).max() > 0  # coarse levels train
    np.testing.assert_array_equal(gt[2:], 0.0)  # fine levels closed

    # step >= anneal_steps: identical to the anneal-off trainer, bitwise
    for step in (8, 50):
        l_on, _ = tr._loss_fn(state.params, batch, key, jnp.int32(step))
        l_off, _ = tr_off._loss_fn(state.params, batch, key, jnp.int32(step))
        np.testing.assert_array_equal(np.asarray(l_on), np.asarray(l_off))


def test_table_wd_and_level_lr_decay(rng):
    """--hash_table_wd / --hash_level_lr_decay (opt-in table regularizers):
    vs the plain-Adam trainer on one identical step,
      * table_wd shifts ONLY the table leaf, by exactly -lr * wd * table
        (AdamW-decoupled: decay added after Adam scaling, scaled by lr);
      * level_lr_decay gamma scales level l's table update by gamma**l and
        nothing else.
    Every non-table leaf stays bitwise identical in both cases (the chain
    decomposition scale_by_adam + scale_by_learning_rate == optax.adam)."""
    from spnerf_tpu.config import LossConfig, ModelConfig, RenderConfig
    from spnerf_tpu.train.loop import Trainer
    from test_train import _fake_data

    L = 4
    mc = ModelConfig(fc_units=32, fc_layers=2, skips=(), encoding="hash",
                     hash_levels=L, hash_features=2, hash_log2T=12)
    rc = RenderConfig(n_samples=6, compute_dtype="float32")
    kw = dict(lr=1e-3, steps_per_epoch=10, max_steps=100, donate=False)
    wd, gamma = 1e-2, 0.5
    tr0 = Trainer(mc, rc, LossConfig(), **kw)
    tr_wd = Trainer(mc, rc, LossConfig(), table_wd=wd, **kw)
    tr_lv = Trainer(mc, rc, LossConfig(), table_level_lr_decay=gamma, **kw)

    data = {k: jnp.asarray(v) for k, v in
            _fake_data(np.random.default_rng(3)).items()}
    key = jax.random.PRNGKey(1)
    states = []
    for tr in (tr0, tr_wd, tr_lv):
        s = tr.init_state(jax.random.PRNGKey(0))
        states.append(tr.build_train_step(64)(s, data, key)[0])
    s0, s_wd, s_lv = states
    path = ("coarse", "HashGridEncoding_0", "table")

    def leaves(state):
        import flax

        return flax.traverse_util.flatten_dict(state.params)

    t0_init = np.asarray(
        tr0.init_state(jax.random.PRNGKey(0)).params["coarse"][
            "HashGridEncoding_0"]["table"])
    lr = float(tr0.lr_schedule(0))
    for k, v in leaves(s0).items():
        if k == path:
            # wd: delta is exactly -lr * wd * table_initial on the table
            np.testing.assert_allclose(
                np.asarray(leaves(s_wd)[k]), np.asarray(v) - lr * wd * t0_init,
                rtol=0, atol=1e-9)
            # level decay: per-level update ratio gamma**l
            upd0 = np.asarray(v) - t0_init
            upd_lv = np.asarray(leaves(s_lv)[k]) - t0_init
            mult = gamma ** np.arange(L, dtype=np.float64)[:, None]
            np.testing.assert_allclose(upd_lv, upd0 * mult, rtol=0, atol=1e-9)
        else:
            np.testing.assert_array_equal(np.asarray(leaves(s_wd)[k]),
                                          np.asarray(v))
            np.testing.assert_array_equal(np.asarray(leaves(s_lv)[k]),
                                          np.asarray(v))


@pytest.mark.parametrize("impl", ["xla", "matmul_vjp"])
def test_boundary_points_keep_full_gradient_mass(rng, impl):
    """Regression for the +1-face cell aliasing: with side = res+1 a power
    of two (res 7 -> side 8, side^3 = 512 = t_eff exactly), the unclamped
    cell index at x01 == 1.0 produced linear corner ids up to
    side^3 + side^2 + side > t_eff — clamped reads, and gradients silently
    DROPPED by the factorized one-hot backward (no row matches an
    out-of-range id). Every sample clipped to the +1 AOI boundary (e.g.
    solar-pass points marching off the box) hits this. The trilinear
    weights of each (point, level) sum to 1, so the table gradient of
    sum(encoding) must carry exactly N per (level, feature)."""
    enc = HashGridEncoding(n_levels=1, n_features=2, log2_table_size=12,
                           base_resolution=7, max_resolution=7, impl=impl)
    xyz = rng.uniform(-1, 1, size=(64, 3)).astype(np.float32)
    xyz[:8] = 1.0  # the worst face corner
    xyz[8:16, 0] = 1.0  # +1 x-face
    xyz = jnp.asarray(xyz)
    params = enc.init(jax.random.PRNGKey(0), xyz)
    g = jax.grad(lambda p: float(0) + jnp.sum(enc.apply(p, xyz)))(params)
    gt = np.asarray(g["params"]["table"], np.float64)
    # matmul_vjp rounds cotangent rows to bf16 (f32 accumulation): ~1e-4 rel
    np.testing.assert_allclose(gt.sum(), 64 * 1 * 2, rtol=1e-3)
    # direct level occupies the first side^3 = 512 rows of each feature's
    # T-sized span (flat F-major row): nothing may land beyond them
    T = 2 ** 12
    span = gt.reshape(2, T)
    assert np.all(span[:, 512:] == 0.0)


def test_direct_coarse_toggle_changes_coarse_levels_only(rng):
    """direct_coarse=False reproduces the hash-everywhere encoding: fine
    (hashed) levels are identical between the two modes, coarse levels
    differ (different row addressing), and gradients flow in both."""
    kw = dict(n_levels=3, n_features=2, log2_table_size=10,
              base_resolution=4, max_resolution=256)
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(100, 3)).astype(np.float32))
    enc_d = HashGridEncoding(direct_coarse=True, **kw)
    enc_h = HashGridEncoding(direct_coarse=False, **kw)
    params = enc_d.init(jax.random.PRNGKey(0), xyz)
    params = jax.tree_util.tree_map(lambda t: t * 1e4, params)
    out_d = np.asarray(enc_d.apply(params, xyz))
    out_h = np.asarray(enc_h.apply(params, xyz))
    # levels: res 4 (125 cells, direct), 32 (35937 > 1024, hashed), 256
    assert np.abs(out_d[:, :2] - out_h[:, :2]).max() > 0  # coarse differs
    np.testing.assert_allclose(out_d[:, 2:], out_h[:, 2:], rtol=0, atol=0)
    g = jax.grad(lambda p: jnp.sum(enc_d.apply(p, xyz) ** 2))(params)
    assert np.any(np.asarray(g["params"]["table"]) != 0)


@pytest.mark.parametrize("impl", ["xla", "matmul_vjp"])
def test_flat_table_matches_tf_storage(rng, impl):
    """Flat (L, T*F) table storage (the default; avoids TPU layout padding
    on the narrow F-minor shape) is numerically identical to (T, F)
    storage: same forward and same table/position gradients when the flat
    params are the FEATURE-MAJOR reorder (per-level (T, F) -> (F, T)
    transpose) of the (T, F) params. Covers hashed AND direct-coarse
    (t_eff < T prefix slicing) levels."""
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(517, 3)).astype(np.float32))
    kw = dict(n_levels=4, n_features=2, log2_table_size=12,
              base_resolution=4, max_resolution=64, impl=impl)
    enc_tf = HashGridEncoding(flat_table=False, **kw)
    enc_fl = HashGridEncoding(flat_table=True, **kw)
    params_tf = enc_tf.init(jax.random.PRNGKey(0), xyz)
    params_tf = jax.tree_util.tree_map(lambda t: t * 1e4, params_tf)
    L = kw["n_levels"]
    params_fl = {"params": {
        "table": jnp.transpose(params_tf["params"]["table"],
                               (0, 2, 1)).reshape(L, -1)}}

    out_tf = enc_tf.apply(params_tf, xyz)
    out_fl = enc_fl.apply(params_fl, xyz)
    np.testing.assert_allclose(np.asarray(out_fl), np.asarray(out_tf),
                               rtol=1e-6, atol=1e-6)

    g = jnp.asarray(rng.normal(size=out_tf.shape).astype(np.float32))
    gt_tf, gx_tf = jax.grad(
        lambda p, x: jnp.sum(enc_tf.apply(p, x) * g), argnums=(0, 1))(
            params_tf, xyz)
    gt_fl, gx_fl = jax.grad(
        lambda p, x: jnp.sum(enc_fl.apply(p, x) * g), argnums=(0, 1))(
            params_fl, xyz)
    np.testing.assert_allclose(
        np.asarray(gt_fl["params"]["table"]),
        np.asarray(jnp.transpose(gt_tf["params"]["table"],
                                 (0, 2, 1))).reshape(L, -1),
        rtol=1e-5, atol=1e-5)
    ref = np.asarray(gx_tf)
    np.testing.assert_allclose(np.asarray(gx_fl), ref,
                               rtol=1e-4, atol=1e-4 * np.abs(ref).max())


@pytest.mark.parametrize("impl", ["xla", "matmul_vjp"])
def test_flat_fmajor_matches_tmajor(rng, monkeypatch, impl):
    """SPNERF_HASH_FMAJOR=1 (feature-major flat rows, row[f*T+t]) is
    numerically identical to the default t-major flat storage when the
    params are the per-level (T, F) -> (F, T) transpose: same forward and
    same table/position gradients, covering hashed and direct-coarse
    (t_eff < T prefix) levels."""
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(517, 3)).astype(np.float32))
    kw = dict(n_levels=4, n_features=2, log2_table_size=12,
              base_resolution=4, max_resolution=64, impl=impl)
    enc = HashGridEncoding(flat_table=True, **kw)
    params = enc.init(jax.random.PRNGKey(0), xyz)
    params = jax.tree_util.tree_map(lambda t: t * 1e4, params)
    L, F, T = 4, 2, 2 ** 12
    g = jnp.asarray(rng.normal(size=(517, L * F)).astype(np.float32))

    monkeypatch.setenv("SPNERF_HASH_FMAJOR", "0")
    out_t = enc.apply(params, xyz)
    gt_t, gx_t = jax.grad(lambda p, x: jnp.sum(enc.apply(p, x) * g),
                          argnums=(0, 1))(params, xyz)

    tab = params["params"]["table"].reshape(L, T, F)
    params_f = {"params": {
        "table": jnp.transpose(tab, (0, 2, 1)).reshape(L, -1)}}
    monkeypatch.setenv("SPNERF_HASH_FMAJOR", "1")
    out_f = enc.apply(params_f, xyz)
    gt_f, gx_f = jax.grad(lambda p, x: jnp.sum(enc.apply(p, x) * g),
                          argnums=(0, 1))(params_f, xyz)

    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_t),
                               rtol=1e-6, atol=1e-6)
    gtf = np.asarray(gt_f["params"]["table"]).reshape(L, F, T)
    gtt = np.asarray(gt_t["params"]["table"]).reshape(L, T, F)
    np.testing.assert_allclose(gtf, np.transpose(gtt, (0, 2, 1)),
                               rtol=1e-5, atol=1e-5)
    ref = np.asarray(gx_t)
    np.testing.assert_allclose(np.asarray(gx_f), ref, rtol=1e-4,
                               atol=1e-4 * np.abs(ref).max())


def test_merged_tail_multi_take_matches_default(rng, monkeypatch):
    """SPNERF_HASH_MERGED_TAIL=1 (one custom VJP over all levels with a
    single merged tail conditional — refuted for speed on the v5e, kept
    opt-in) is numerically identical to the default per-level takes:
    same forward, same table/position gradients."""
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(517, 3)).astype(np.float32))
    enc = HashGridEncoding(n_levels=4, n_features=2, log2_table_size=12,
                           base_resolution=4, max_resolution=64,
                           impl="matmul_vjp")
    params = enc.init(jax.random.PRNGKey(0), xyz)
    params = jax.tree_util.tree_map(lambda t: t * 1e4, params)
    g = jnp.asarray(rng.normal(size=(517, 8)).astype(np.float32))

    monkeypatch.setenv("SPNERF_HASH_MERGED_TAIL", "0")
    out0 = enc.apply(params, xyz)
    gt0, gx0 = jax.grad(lambda p, x: jnp.sum(enc.apply(p, x) * g),
                        argnums=(0, 1))(params, xyz)
    monkeypatch.setenv("SPNERF_HASH_MERGED_TAIL", "1")
    out1 = enc.apply(params, xyz)
    gt1, gx1 = jax.grad(lambda p, x: jnp.sum(enc.apply(p, x) * g),
                        argnums=(0, 1))(params, xyz)

    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gt1["params"]["table"]),
                               np.asarray(gt0["params"]["table"]),
                               rtol=1e-5, atol=1e-5)
    ref = np.asarray(gx0)
    np.testing.assert_allclose(np.asarray(gx1), ref, rtol=1e-4,
                               atol=1e-4 * np.abs(ref).max())


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


def test_take_matmul_ft_bf16_values_and_grad(rng, monkeypatch):
    """_take_matmul_ft_bf16: gather reads a bf16 copy of the (F, T) view
    (value == take of the bf16-cast table); the table gradient is the same
    f32 one-hot matmul as _take_matmul_ft (the cast's derivative is
    identity; the bf16 cotangent converts to f32 exactly), so it matches a
    numpy scatter-add oracle of the cotangent."""
    from spnerf_tpu.models.hashgrid import _take_matmul_ft_bf16

    F, T = 4, 256
    tab = jnp.asarray(rng.normal(size=(F, T)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, T, (97, 8)).astype(np.int32))
    out = _take_matmul_ft_bf16(tab, idx)
    expect = jnp.take(tab.astype(jnp.bfloat16), idx, axis=1)
    np.testing.assert_array_equal(np.asarray(out.astype(jnp.float32)),
                                  np.asarray(expect.astype(jnp.float32)))

    ct = rng.normal(size=(F, 97, 8)).astype(np.float32)
    ct_bf = np.asarray(jnp.asarray(ct).astype(jnp.bfloat16)
                       .astype(jnp.float32))

    def loss(t):
        return jnp.sum(_take_matmul_ft_bf16(t, idx).astype(jnp.float32)
                       * jnp.asarray(ct))

    g = np.asarray(jax.grad(loss)(tab))
    oracle = np.zeros((F, T), np.float32)
    flat_idx = np.asarray(idx).reshape(-1)
    # the cotangent reaching the custom VJP is bf16 (the primal output is
    # bf16), so the oracle scatters the bf16-rounded ct rows
    flat_ct = ct_bf.reshape(F, -1)
    for j, t in enumerate(flat_idx):
        oracle[:, t] += flat_ct[:, j]
    np.testing.assert_allclose(g, oracle, rtol=1e-4,
                               atol=1e-4 * np.abs(oracle).max() + 1e-6)


def test_hash_corners_matches_corner_array_form(rng):
    """_hash_corners (per-axis pair xors, no (N, 8, 3) corner array) is
    bit-identical to _hash_coords over the materialized corner array, with
    and without a multi-AOI frame index."""
    from spnerf_tpu.models.hashgrid import (_CORNERS, _hash_coords,
                                            _hash_corners)

    base = jnp.asarray(
        rng.integers(0, 2 ** 20, (257, 3)).astype(np.uint32))
    corners = base[:, None, :] + jnp.asarray(_CORNERS)[None]
    for T in (2 ** 19, 2 ** 15, 1 << 13):
        np.testing.assert_array_equal(
            np.asarray(_hash_corners(base, T)),
            np.asarray(_hash_coords(corners, T)))
    frame = jnp.asarray(
        rng.integers(0, 4, (257,)).astype(np.uint32))[:, None]
    np.testing.assert_array_equal(
        np.asarray(_hash_corners(base, 2 ** 19, frame)),
        np.asarray(_hash_coords(corners, 2 ** 19, frame)))


def test_take_matmul_ft_tm_values_and_grad(rng, monkeypatch):
    """_take_matmul_ft_tm (row gather from a t-major copy of the view) is
    bit-identical to _take_matmul_ft in value and gradient, and the
    SPNERF_HASH_TM_GATHER=1 encoding matches the default bitwise."""
    from spnerf_tpu.models.hashgrid import (HashGridEncoding,
                                            _take_matmul_ft,
                                            _take_matmul_ft_tm)

    F, T = 4, 256
    tab = jnp.asarray(rng.normal(size=(F, T)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, T, (97, 8)).astype(np.int32))
    np.testing.assert_array_equal(np.asarray(_take_matmul_ft_tm(tab, idx)),
                                  np.asarray(_take_matmul_ft(tab, idx)))
    ct = jnp.asarray(rng.normal(size=(F, 97, 8)).astype(np.float32))
    g_tm = jax.grad(lambda t: jnp.sum(_take_matmul_ft_tm(t, idx) * ct))(tab)
    g = jax.grad(lambda t: jnp.sum(_take_matmul_ft(t, idx) * ct))(tab)
    np.testing.assert_array_equal(np.asarray(g_tm), np.asarray(g))

    kw = dict(n_levels=4, n_features=2, log2_table_size=10,
              base_resolution=4, max_resolution=32, impl="matmul_vjp")
    enc = HashGridEncoding(**kw)
    xyz = jnp.asarray(rng.uniform(-1, 1, (83, 3)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), xyz)
    ref = np.asarray(enc.apply(params, xyz))
    monkeypatch.setenv("SPNERF_HASH_TM_GATHER", "1")
    out = np.asarray(enc.apply(params, xyz))
    np.testing.assert_array_equal(out, ref)


def test_dtab_sorted_window_unstable_sort_matches_oracle(rng, monkeypatch):
    """The default (unstable) dtab sort matches a float64 scatter oracle to
    f32 tolerance, and SPNERF_HASH_SORT_STABLE=1 agrees with it to the same
    tolerance (only the summation order among equal ids differs)."""
    from spnerf_tpu.ops.pallas.dtab import dtab_sorted_window

    T, F, M = 1 << 15, 4, 40000
    ids = jnp.asarray(rng.integers(0, T, (M,)).astype(np.int32))
    ct = jnp.asarray(rng.normal(size=(M, F)).astype(np.float32))
    oracle = np.zeros((T, F), np.float64)
    np.add.at(oracle, np.asarray(ids), np.asarray(ct).astype(np.float64))

    out = np.asarray(dtab_sorted_window(ids, ct, T, F, interpret=True))
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-4)
    # the env knob is read at TRACE time: clear the jit cache so the stable
    # variant actually re-traces instead of reusing the unstable executable
    dtab_sorted_window.clear_cache()
    monkeypatch.setenv("SPNERF_HASH_SORT_STABLE", "1")
    out_s = np.asarray(dtab_sorted_window(ids, ct, T, F, interpret=True))
    np.testing.assert_allclose(out_s, oracle, rtol=1e-5, atol=1e-4)
    dtab_sorted_window.clear_cache()


def test_lerp_interp_matches_einsum(rng, monkeypatch):
    """SPNERF_HASH_LERP=1 (successive-lerp trilinear) matches the default
    weighted-8-corner einsum to f32 tolerance in value and table gradient."""
    from spnerf_tpu.models.hashgrid import HashGridEncoding

    kw = dict(n_levels=4, n_features=2, log2_table_size=10,
              base_resolution=4, max_resolution=32, impl="matmul_vjp")
    enc = HashGridEncoding(**kw)
    xyz = jnp.asarray(rng.uniform(-1, 1, (83, 3)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), xyz)

    def loss(p):
        return jnp.sum(jnp.sin(enc.apply(p, xyz)))

    ref = np.asarray(enc.apply(params, xyz))
    g_ref = jax.grad(lambda p: loss(p))(params)
    monkeypatch.setenv("SPNERF_HASH_LERP", "1")
    out = np.asarray(enc.apply(params, xyz))
    g = jax.grad(lambda p: loss(p))(params)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g["params"]["table"]),
        np.asarray(g_ref["params"]["table"]), rtol=1e-4, atol=1e-6)


def test_interp_lerp_custom_vjp_matches_einsum_grads(rng):
    """_interp_lerp (lerp forward, product-form backward): value and BOTH
    cotangents (d_vals and the exact d_frac) match autodiff of the
    weighted-8-corner einsum form."""
    from spnerf_tpu.models.hashgrid import _CORNERS, _interp_lerp

    F, N = 4, 37
    vals = jnp.asarray(rng.normal(size=(F, N, 8)).astype(np.float32))
    frac = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))

    def einsum_form(v, f):
        w = jnp.ones((N, 8), jnp.float32)
        for d in range(3):
            cd = _CORNERS[:, d].astype(jnp.float32)[None]
            w = w * (cd * f[:, d:d + 1] + (1 - cd) * (1 - f[:, d:d + 1]))
        return jnp.einsum('nc,fnc->nf', w, v)

    np.testing.assert_allclose(np.asarray(_interp_lerp(vals, frac)),
                               np.asarray(einsum_form(vals, frac)),
                               rtol=1e-5, atol=1e-6)
    gv, gf = jax.grad(lambda v, f: jnp.sum(_interp_lerp(v, f) * ct),
                      argnums=(0, 1))(vals, frac)
    gv_r, gf_r = jax.grad(lambda v, f: jnp.sum(einsum_form(v, f) * ct),
                          argnums=(0, 1))(vals, frac)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_r),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gf_r),
                               rtol=1e-4, atol=1e-5)


def test_hash_hidden_width_knob(rng):
    """--hash_hidden widens the NGP trunk/head MLPs (capacity knob; the
    step is gather-bound so width is nearly free on TPU). Default 64
    matches NGP-classic and pre-flag checkpoints."""
    from spnerf_tpu.models import load_model

    n = 17
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(n, 3)).astype(np.float32))
    sun = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))

    widths = {}
    for hidden in (64, 96):
        cfg = ModelConfig(encoding="hash", sem=False, hash_levels=4,
                          hash_log2T=12, hash_hidden=hidden)
        model = load_model(cfg, hash_impl="xla")
        params = model.init(jax.random.PRNGKey(0), xyz, sun, None, None)
        out = model.apply(params, xyz, sun, None, None)
        assert out["rgb"].shape == (n, 3)
        from flax.traverse_util import flatten_dict

        kernels = [v.shape for k, v in flatten_dict(params["params"]).items()
                   if k[-1] == "kernel"]
        widths[hidden] = max(s[1] for s in kernels)
    assert widths[64] == 64
    assert widths[96] == 96
