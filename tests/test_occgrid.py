"""Occupancy-grid guided sampling (--occgrid, ops/occgrid.py).

The grid is a TPU-native stretch feature (no reference counterpart; the
reference's only placement is stratified + depth-guided,
/root/reference/modules/rendering.py:119-177): an NGP-style density cache that
redistributes the STATIC coarse sample budget — importance redistribution is
the shape-static equivalent of skip-empty-space marching under jit.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spnerf_tpu.config import LossConfig, ModelConfig, RenderConfig
from spnerf_tpu.ops.occgrid import (
    _lookup_lin,
    init_grid,
    occ_z_vals,
    update_grid,
)
from spnerf_tpu.parallel import data_mesh
from spnerf_tpu.train.loop import Trainer


# ----------------------------------------------------------------- unit: grid
def test_lookup_lin_matches_oracle(rng):
    res = 8
    xyz = rng.uniform(-1.2, 1.2, size=(500, 3)).astype(np.float32)
    got = np.asarray(_lookup_lin(jnp.asarray(xyz), res))
    x01 = np.clip((xyz + 1.0) * 0.5, 0.0, 1.0)
    cell = np.minimum(np.floor(x01 * res), res - 1).astype(np.int64)
    want = (cell[:, 0] * res + cell[:, 1]) * res + cell[:, 2]
    np.testing.assert_array_equal(got, want)
    assert got.min() >= 0 and got.max() < res ** 3


def test_update_grid_sweeps_every_cell():
    """After res^3/rows steps every cell has been refreshed from sigma_fn, and
    the EMA-max semantics hold: new = max(decay * old, sigma(point in cell))."""
    res, rows, decay = 8, 128, 0.5
    n_cells, n_slabs = res ** 3, res ** 3 // 128

    # sigma = flat cell index of the query point: lets us verify each slab
    # sampled points inside its OWN cells (the jittered point stays in-cell)
    def sigma_fn(xyz):
        return _lookup_lin(xyz, res).astype(jnp.float32)

    occ = init_grid(res) * 1000.0  # large: decay side of the max always wins 0
    key = jax.random.PRNGKey(0)
    for s in range(n_slabs):
        occ = update_grid(occ, sigma_fn, jax.random.fold_in(key, s),
                          jnp.int32(s), res, rows, decay)
    got = np.asarray(occ)
    want = np.maximum(1000.0 * decay, np.arange(n_cells, dtype=np.float32))
    np.testing.assert_allclose(got, want)

    # a second full sweep decays once more per cell
    for s in range(n_slabs):
        occ = update_grid(occ, sigma_fn, jax.random.fold_in(key, 100 + s),
                          jnp.int32(n_slabs + s), res, rows, decay)
    want2 = np.maximum(want * decay, np.arange(n_cells, dtype=np.float32))
    np.testing.assert_allclose(np.asarray(occ), want2)


def test_update_grid_rejects_nondivisor_rows():
    with pytest.raises(AssertionError):
        update_grid(init_grid(4), lambda x: x[:, 0], jax.random.PRNGKey(0),
                    jnp.int32(0), 4, 7, 0.9)


# ------------------------------------------------------------- unit: sampling
def _axis_rays(n, near=0.0, far=2.0):
    """Rays marching +x across the box from x=-1 (so z maps directly to x)."""
    o = np.tile(np.array([[-1.0, 0.0, 0.0]], np.float32), (n, 1))
    d = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (n, 1))
    return (jnp.asarray(o), jnp.asarray(d),
            jnp.full((n, 1), near, jnp.float32),
            jnp.full((n, 1), far, jnp.float32))


def test_occ_z_vals_concentrates_where_density_lives():
    res, n, s = 16, 64, 32
    rays_o, rays_d, near, far = _axis_rays(n)
    # density only in x in [0, 0.25] -> cells ix in [8, 10) -> z in [1, 1.25]
    occ = np.zeros((res ** 3,), np.float32)
    grid3 = occ.reshape(res, res, res)
    grid3[8:10, :, :] = 5.0
    z = occ_z_vals(jax.random.PRNGKey(0), jnp.asarray(occ), rays_o, rays_d,
                   near, far, s, res, n_bins=64, floor=0.01)
    z = np.asarray(z)
    assert z.shape == (n, s)
    assert (np.diff(z, axis=-1) >= 0).all()  # ascending for compositing
    assert z.min() >= 0.0 and z.max() <= 2.0
    frac_in = ((z >= 1.0) & (z <= 1.25)).mean()
    assert frac_in > 0.7, frac_in  # most of the budget lands on the slab
    # the exploration floor keeps SOME samples outside the occupied slab
    assert ((z < 1.0) | (z > 1.25)).any()


def test_occ_z_vals_uniform_grid_spans_range():
    """A uniform (fresh) grid must behave like the stratified prior: samples
    cover [near, far] roughly evenly, not collapse anywhere."""
    res, n, s = 8, 32, 64
    rays_o, rays_d, near, far = _axis_rays(n)
    z = np.asarray(occ_z_vals(jax.random.PRNGKey(1), init_grid(res), rays_o,
                              rays_d, near, far, s, res, n_bins=32,
                              floor=0.01))
    # each quarter of the range holds a reasonable share of samples
    for lo in (0.0, 0.5, 1.0, 1.5):
        frac = ((z >= lo) & (z < lo + 0.5)).mean()
        assert 0.15 < frac < 0.35, (lo, frac)


def test_occ_z_vals_det_is_deterministic():
    res, n, s = 8, 8, 16
    rays_o, rays_d, near, far = _axis_rays(n)
    a = occ_z_vals(None, init_grid(res), rays_o, rays_d, near, far, s, res,
                   det=True)
    b = occ_z_vals(None, init_grid(res), rays_o, rays_d, near, far, s, res,
                   det=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# -------------------------------------------------------- integration: Trainer
def _tiny_occ_configs():
    mc = ModelConfig(fc_units=32, fc_layers=2, skips=(), mapping=True)
    rc = RenderConfig(n_samples=6, compute_dtype="float32", occ_grid=True,
                      occ_res=8, occ_bins=16)
    return mc, rc, LossConfig()


def _fake_data(rng, n=2048):
    from test_train import _fake_data as f

    return f(rng, n)


def test_trainer_occ_step_updates_grid(rng):
    mc, rc, lc = _tiny_occ_configs()
    tr = Trainer(mc, rc, lc, lr=1e-3, steps_per_epoch=100, max_steps=1000,
                 occ_rows=64, occ_decay=0.5)
    assert tr.occ_rows == 64  # 8^3 % 64 == 0 -> kept as requested
    state = tr.init_state(jax.random.PRNGKey(0))
    assert state.occ is not None and state.occ.shape == (8 ** 3,)
    data = {k: jnp.asarray(v) for k, v in _fake_data(rng).items()}
    step = tr.build_train_step(128)
    occ0 = np.asarray(state.occ)
    state, ld = step(state, data, jax.random.PRNGKey(1))
    assert np.isfinite(float(ld["loss"]))
    occ1 = np.asarray(state.occ)
    assert np.isfinite(occ1).all()
    # exactly one slab (rows cells starting at slab 0) was refreshed
    assert not np.array_equal(occ0[:64], occ1[:64])
    np.testing.assert_array_equal(occ0[64:], occ1[64:])


def test_occ_rows_snaps_to_divisor():
    mc, rc, lc = _tiny_occ_configs()
    tr = Trainer(mc, rc, lc, occ_rows=100)  # 512 % 100 != 0 -> snap down
    assert tr.occ_rows == 64 and 512 % tr.occ_rows == 0


def test_trainer_occ_scan_matches_sequential_steps(rng):
    """build_train_scan must thread the grid through the scan carry exactly
    like k sequential build_train_step calls."""
    mc, rc, lc = _tiny_occ_configs()
    data = {k: jnp.asarray(v) for k, v in _fake_data(rng).items()}
    key = jax.random.PRNGKey(1)

    tr = Trainer(mc, rc, lc, occ_rows=64, donate=False)
    s_seq = tr.init_state(jax.random.PRNGKey(0))
    step = tr.build_train_step(64)
    for _ in range(3):
        s_seq, _ = step(s_seq, data, key)

    tr2 = Trainer(mc, rc, lc, occ_rows=64, donate=False)
    s_scan = tr2.init_state(jax.random.PRNGKey(0))
    run = tr2.build_train_scan(64, 3)
    s_scan, _ = run(s_scan, data, key)

    np.testing.assert_allclose(np.asarray(s_seq.occ), np.asarray(s_scan.occ),
                               rtol=1e-6, atol=1e-7)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        jax.device_get(s_seq.params), jax.device_get(s_scan.params))


def test_mesh_occ_replicated_and_matches_oracle(rng):
    """Under the 8-device mesh the grid must stay REPLICATED (the update key is
    deliberately not device-folded) and equal the direct update_grid call on
    the post-step params."""
    from spnerf_tpu.ops.occgrid import update_grid as _upd

    mesh = data_mesh(8)
    mc, rc, lc = _tiny_occ_configs()
    tr = Trainer(mc, rc, lc, mesh=mesh, occ_rows=64, occ_decay=0.8,
                 donate=False)
    state = tr.replicate_state(tr.init_state(jax.random.PRNGKey(0)))
    occ0 = np.asarray(state.occ)
    data = tr.shard_data(_fake_data(rng, n=2048))
    step = tr.build_train_step(128)
    key = jax.random.PRNGKey(7)
    new_state, ld = step(state, data, key)
    jax.block_until_ready(ld["loss"])
    got = np.asarray(new_state.occ)
    assert np.isfinite(got).all()

    # oracle: the same slab update computed OUTSIDE shard_map from the
    # post-step params (key folds step=0 then the 0x0CC tag — loop.py)
    k_occ = jax.random.fold_in(jax.random.fold_in(key, jnp.int32(0)), 0x0CC)

    def sigma_fn(xyz):
        return tr.model.apply(
            {"params": jax.device_get(new_state.params)["coarse"]}, xyz,
            jnp.zeros((xyz.shape[0], 3), xyz.dtype), None, None,
            sigma_only=True)["sigma"]

    want = np.asarray(_upd(jnp.asarray(occ0), sigma_fn, k_occ, jnp.int32(0),
                           rc.occ_res, 64, 0.8))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_render_fn_threads_occ(rng):
    """The eval renderer accepts the trained grid and produces different
    images for different grids (placement actually flows through)."""
    mc, rc, lc = _tiny_occ_configs()
    tr = Trainer(mc, rc, lc)
    state = tr.init_state(jax.random.PRNGKey(0))
    render = tr.build_render_fn(chunk=1024)
    # rays marching +x across the box (z maps directly to x+1) so a peaked
    # x-slab is actually traversed — _fake_data's rays hug x~0 and would
    # never see it
    n = 256
    o = np.tile(np.array([[-1.0, 0.0, 0.0]], np.float32), (n, 1))
    d = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (n, 1))
    sun = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (n, 1))
    rays = np.concatenate([o, d, np.zeros((n, 1), np.float32),
                           np.full((n, 1), 2.0, np.float32), sun], -1)
    params = jax.device_get(state.params)

    out_uniform = render(params, rays, 0)  # occ omitted -> uniform prior
    peaked = np.full((rc.occ_res, rc.occ_res, rc.occ_res), 1e-6, np.float32)
    peaked[4:6, :, :] = 10.0  # density only in x in [0, 0.5] -> z in [1, 1.5]
    out_peaked = render(params, rays, 0, occ=peaked.reshape(-1))
    assert out_uniform["rgb_coarse"].shape == (256, 3)
    assert not np.allclose(out_uniform["depth_coarse"],
                           out_peaked["depth_coarse"])


def test_checkpoint_roundtrip_with_occ(tmp_path, rng):
    from spnerf_tpu.train.checkpoints import CheckpointManager

    mc, rc, lc = _tiny_occ_configs()
    tr = Trainer(mc, rc, lc, occ_rows=64)
    state = tr.init_state(jax.random.PRNGKey(0))
    data = {k: jnp.asarray(v) for k, v in _fake_data(rng, 512).items()}
    step = tr.build_train_step(64)
    state, _ = step(state, data, jax.random.PRNGKey(1))
    mgr = CheckpointManager(str(tmp_path / "ckpts"))
    mgr.save(1, state)
    restored = mgr.restore(tr.init_state(jax.random.PRNGKey(2)))
    mgr.close()
    np.testing.assert_array_equal(np.asarray(state.occ),
                                  np.asarray(restored.occ))
    assert int(restored.step) == 1


def test_occ_update_respects_hash_anneal(rng):
    """Under --hash_anneal_steps the grid refresh must evaluate the SAME
    annealed field the renderer composits (fine levels zero-weighted at
    step 0), not the fully-open field."""
    from spnerf_tpu.ops.occgrid import update_grid as _upd

    mc = ModelConfig(fc_units=32, fc_layers=2, skips=(), encoding="hash",
                     hash_levels=4, hash_features=2, hash_log2T=10,
                     hash_anneal_steps=100)
    rc = RenderConfig(n_samples=6, compute_dtype="float32", occ_grid=True,
                      occ_res=8, occ_bins=16)
    tr = Trainer(mc, rc, LossConfig(), occ_rows=64, occ_decay=0.5,
                 donate=False)
    state = tr.init_state(jax.random.PRNGKey(0))
    data = {k: jnp.asarray(v) for k, v in _fake_data(rng, 512).items()}
    step = tr.build_train_step(64)
    key = jax.random.PRNGKey(3)
    new_state, _ = step(state, data, key)
    got = np.asarray(new_state.occ)

    k_occ = jax.random.fold_in(jax.random.fold_in(key, jnp.int32(0)), 0x0CC)
    anneal0 = tr._anneal(jnp.int32(0))  # step 0: only 2 coarse levels on
    assert anneal0 is not None and float(anneal0[2]) == 0.0

    def sigma_annealed(xyz):
        return tr.model.apply(
            {"params": jax.device_get(new_state.params)["coarse"]}, xyz,
            jnp.zeros((xyz.shape[0], 3), xyz.dtype), None, None,
            sigma_only=True, anneal=anneal0)["sigma"]

    want = np.asarray(_upd(jnp.ones_like(new_state.occ), sigma_annealed,
                           k_occ, jnp.int32(0), 8, 64, 0.5))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # and the anneal genuinely changes sigma once fine levels hold content
    # (a 1-step-old table is still ~zero there, so inflate it explicitly)
    params = jax.device_get(new_state.params)["coarse"]
    big = jax.tree_util.tree_map_with_path(
        lambda path, v: jnp.ones_like(v)
        if any(getattr(p, "key", None) == "table" for p in path) else v,
        params)
    xyz = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (32, 3)),
                      jnp.float32)
    sun = jnp.zeros((32, 3), jnp.float32)
    s_ann = tr.model.apply({"params": big}, xyz, sun, None, None,
                           sigma_only=True, anneal=anneal0)["sigma"]
    s_open = tr.model.apply({"params": big}, xyz, sun, None, None,
                            sigma_only=True)["sigma"]
    assert not np.allclose(np.asarray(s_ann), np.asarray(s_open))


# ----------------------------------------------------------------- config/CLI
def test_occgrid_flags_reach_render_config():
    from spnerf_tpu.config import build_train_parser, render_config_from_args

    args = build_train_parser().parse_args(
        ["--project_dir", "/tmp/x", "--aoi_id", "JAX_269", "--occgrid",
         "--occ_res", "32", "--occ_bins", "48", "--occ_floor", "0.05"])
    rc = render_config_from_args(args)
    assert rc.occ_grid and rc.occ_res == 32
    assert rc.occ_bins == 48 and rc.occ_floor == pytest.approx(0.05)


def test_occgrid_proposal_rejected(tmp_path):
    from spnerf_tpu.config import build_train_parser, finalize_args

    args = build_train_parser().parse_args(
        ["--project_dir", str(tmp_path), "--aoi_id", "JAX_269",
         "--occgrid", "--proposal"])
    with pytest.raises(SystemExit):
        finalize_args(args, make_dirs=False)


def test_occgrid_multi_aoi_frames(tmp_path):
    """Multi-AOI runs get one grid block per translated frame."""
    from spnerf_tpu.config import (
        build_train_parser,
        finalize_args,
        render_config_from_args,
    )

    args = build_train_parser().parse_args(
        ["--project_dir", str(tmp_path), "--aoi_id", "JAX_269,JAX_068",
         "--occgrid"])
    finalize_args(args, make_dirs=False)  # accepted
    rc = render_config_from_args(args)
    assert rc.occ_frames == 2


# ------------------------------------------------------------- multi-frame
def test_lookup_lin_multi_frame():
    """Frame k's translated box maps into grid block k, with the same local
    cell as the untranslated point (mirrors the hash encoder's frame rule)."""
    from spnerf_tpu.data.multi import FRAME_SPACING

    res, frames = 8, 3
    rng = np.random.default_rng(3)
    base = rng.uniform(-0.99, 0.99, size=(200, 3)).astype(np.float32)
    lin0 = np.asarray(_lookup_lin(jnp.asarray(base), res, frames))
    for k in (1, 2):
        pts = base + np.array([k * FRAME_SPACING, 0.0, 0.0], np.float32)
        link = np.asarray(_lookup_lin(jnp.asarray(pts), res, frames))
        np.testing.assert_array_equal(link, lin0 + k * res ** 3)
    # out-of-range frames clamp to the LAST block; the residual x offset
    # then clips to the box's +x face (x-cell = res-1), like any
    # out-of-box point within a frame
    far_pts = base + np.array([10 * FRAME_SPACING, 0.0, 0.0], np.float32)
    linf = np.asarray(_lookup_lin(jnp.asarray(far_pts), res, frames))
    assert (linf >= 2 * res ** 3).all() and (linf < 3 * res ** 3).all()
    assert ((linf - 2 * res ** 3) // (res * res) == res - 1).all()


def test_update_grid_multi_frame_sweeps_all_blocks():
    """The slab sweep refreshes every frame's block, and the update points
    land inside the right frame's translated box."""
    from spnerf_tpu.data.multi import FRAME_SPACING

    res, frames, rows = 4, 2, 32
    n_cells = frames * res ** 3

    def sigma_fn(xyz):
        # frame index of the query point (0 or 1): proves the sweep visited
        # each block with points translated into ITS box
        return jnp.round(xyz[:, 0] / FRAME_SPACING)

    occ = init_grid(res, frames) * -1.0  # sigma side of the max always wins
    key = jax.random.PRNGKey(0)
    for s in range(n_cells // rows):
        occ = update_grid(occ, sigma_fn, jax.random.fold_in(key, s),
                          jnp.int32(s), res, rows, 0.9, frames=frames)
    got = np.asarray(occ)
    want = np.repeat(np.arange(frames, dtype=np.float32), res ** 3)
    np.testing.assert_allclose(got, want)


def test_occ_z_vals_multi_frame_uses_own_block():
    """Rays in frame 1's box read frame 1's grid block: density peaked in
    frame 1 concentrates frame-1 rays but leaves frame-0 rays uniform."""
    from spnerf_tpu.data.multi import FRAME_SPACING

    res, frames, n, s = 16, 2, 32, 32
    occ = np.full((frames, res, res, res), 1e-6, np.float32)
    occ[0, :, :, :] = 1.0  # frame 0: uniform
    occ[1, 8:10, :, :] = 5.0  # frame 1: slab at local x in [0, 0.25]
    occ = jnp.asarray(occ.reshape(-1))

    for k, expect_peak in ((0, False), (1, True)):
        o = np.tile(np.array([[k * FRAME_SPACING - 1.0, 0.0, 0.0]],
                             np.float32), (n, 1))
        d = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (n, 1))
        z = np.asarray(occ_z_vals(
            jax.random.PRNGKey(k), occ, jnp.asarray(o), jnp.asarray(d),
            jnp.zeros((n, 1), jnp.float32), jnp.full((n, 1), 2.0, jnp.float32),
            s, res, n_bins=64, floor=0.01, frames=frames))
        frac_in = ((z >= 1.0) & (z <= 1.25)).mean()
        if expect_peak:
            assert frac_in > 0.7, frac_in
        else:
            assert frac_in < 0.3, frac_in
