"""Fused Pallas field-evaluation kernel vs the flax reference (interpret mode
on CPU; on-TPU compilation is exercised by the bench/validation paths)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spnerf_tpu.config import ModelConfig
from spnerf_tpu.models import init_spnerf
from spnerf_tpu.ops.pallas import fused_field_apply, supports_config


@pytest.mark.parametrize("sem", [True, False])
def test_fused_field_matches_flax(sem, rng):
    cfg = ModelConfig(mapping=True, sem=sem, num_sem_classes=3, fc_units=128,
                      fc_layers=8, skips=(4,))
    assert supports_config(cfg)
    model, params = init_spnerf(jax.random.PRNGKey(0), cfg)
    n = 700  # not a multiple of the tile: exercises padding
    xyz = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.3)
    sun = rng.normal(size=(n, 3)).astype(np.float32)
    sun /= np.linalg.norm(sun, axis=-1, keepdims=True)
    sun = jnp.asarray(sun)
    sems = jnp.asarray(rng.integers(-1, 3, size=(n,)).astype(np.int32))
    sems = jnp.where(sems < 0, -100, sems)

    ref = model.apply(params, xyz, sun, None, sems if sem else None)
    fused = fused_field_apply(params["params"], cfg, compute_dtype="float32",
                              interpret=True)
    out = fused(xyz, sun, None, sems if sem else None)
    keys = ["rgb", "sigma", "sun_v", "sky"] + (["sem_logits"] if sem else [])
    for k in keys:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=1e-5, err_msg=k)


def test_fused_field_beta_path_matches_flax(rng):
    """The beta/transient path runs in the fused kernel too (VERDICT r1 #9)."""
    cfg = ModelConfig(mapping=True, beta=True, fc_units=128, fc_layers=8,
                      skips=(4,))
    assert supports_config(cfg)
    model, params = init_spnerf(jax.random.PRNGKey(0), cfg)
    n = 300
    xyz = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.3)
    sun = rng.normal(size=(n, 3)).astype(np.float32)
    sun /= np.linalg.norm(sun, axis=-1, keepdims=True)
    sun = jnp.asarray(sun)
    t_emb = jnp.asarray(rng.normal(size=(n, cfg.t_embedding_dims))
                        .astype(np.float32))

    ref = model.apply(params, xyz, sun, t_emb, None)
    fused = fused_field_apply(params["params"], cfg, compute_dtype="float32",
                              interpret=True)
    out = fused(xyz, sun, t_emb, None)
    for k in ("rgb", "sigma", "sun_v", "sky", "beta"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=1e-5, err_msg=k)


def test_fused_field_head_pruning(rng):
    """heads=("sun",) returns only sigma/sun_v — the solar-pass subset."""
    cfg = ModelConfig(mapping=True, sem=True, num_sem_classes=3, fc_units=128,
                      fc_layers=8, skips=(4,))
    model, params = init_spnerf(jax.random.PRNGKey(0), cfg)
    n = 256
    xyz = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.3)
    sun = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    sems = jnp.zeros((n,), jnp.int32)

    ref = model.apply(params, xyz, sun, None, sems)
    fused = fused_field_apply(params["params"], cfg, compute_dtype="float32",
                              interpret=True)
    out = fused(xyz, sun, None, sems, heads=("sun",))
    assert set(out) == {"sigma", "sun_v"}
    np.testing.assert_allclose(np.asarray(out["sigma"]),
                               np.asarray(ref["sigma"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["sun_v"]),
                               np.asarray(ref["sun_v"]), atol=1e-5)


def test_unsupported_configs_fall_back():
    assert supports_config(ModelConfig(beta=True))  # beta now supported
    assert not supports_config(ModelConfig(siren=False))
    assert not supports_config(ModelConfig(skips=()))
    assert not supports_config(ModelConfig(encoding="hash"))


def test_dtab_pallas_matches_scatter(rng):
    """ops/pallas/dtab: the MXU one-hot matmul == scatter-add, across table
    sizes incl. non-square splits, F widths, and a padded (non-multiple-of-
    MBLK) row count (interpret mode; on-TPU timing in CLAUDE.md round 3)."""
    from spnerf_tpu.ops.pallas.dtab import dtab_pallas

    for T, F, M in [(2048, 4, 5000), (4096, 2, 3000), (1024, 8, 1025),
                    (512, 4, 700)]:
        ids = jnp.asarray(rng.integers(0, T, M).astype(np.int32))
        ct = jnp.asarray(rng.normal(size=(M, F)).astype(np.float32))
        ref = jnp.zeros((T, F), jnp.float32).at[ids].add(ct)
        out = dtab_pallas(ids, ct, T, F, f32=True, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, err_msg=f"T={T} F={F} M={M}")


@pytest.mark.parametrize("acc,cols", [("1", "1"), ("1", "0"), ("0", "0")])
def test_dtab_sorted_window_matches_scatter(rng, monkeypatch, acc, cols):
    """ops/pallas/dtab sorted-window path == scatter-add: uniform ids, skewed
    ids that force the tail scatter fallback, non-MBLK-multiple row counts,
    and ids concentrated in the last window — which for the accumulating
    variant (SPNERF_HASH_SW_ACC=1) leaves most window tiles unvisited,
    pinning the visited-mask (interpret mode). Covers the default COLUMN
    operands (SPNERF_HASH_SW_COLS=1, transposed B-side one-hot contracted
    with dot_general), the stacked-(mp, F) variant, and the non-accumulating
    tile-scatter fallback. The env is read at trace time, so the jit cache
    is cleared per variant."""
    from spnerf_tpu.ops.pallas.dtab import dtab_sorted_window

    monkeypatch.setenv("SPNERF_HASH_SW_ACC", acc)
    monkeypatch.setenv("SPNERF_HASH_SW_COLS", cols)
    dtab_sorted_window.clear_cache()

    cases = []
    T, F, M = 2 ** 15, 4, 70000
    ids = rng.integers(0, T, M)
    cases.append((T, F, jnp.asarray(ids.astype(np.int32))))
    skew = ids.copy()
    skew[: M // 2] = rng.integers(0, 64, M // 2)  # block spans >2 windows
    cases.append((T, F, jnp.asarray(skew.astype(np.int32))))
    cases.append((2 ** 14, 2, jnp.asarray(
        rng.integers(0, 2 ** 14, 5000).astype(np.int32))))  # padded rows
    cases.append((2 ** 13, 8, jnp.asarray(
        rng.integers(0, 2 ** 13, 4097).astype(np.int32))))
    cases.append((2 ** 14, 4, jnp.asarray(
        rng.integers(2 ** 14 - 200, 2 ** 14, 3000).astype(np.int32))))

    try:
        for T, F, idsj in cases:
            ct = jnp.asarray(
                rng.normal(size=(idsj.shape[0], F)).astype(np.float32))
            ref = jnp.zeros((T, F), jnp.float32).at[idsj].add(ct)
            out = dtab_sorted_window(idsj, ct, T, F, interpret=True)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=1e-3, err_msg=f"T={T} F={F}")
    finally:
        dtab_sorted_window.clear_cache()


def test_dtab_fmajor_matches_scatter(rng):
    """fmajor=True variants (feature-major (F, M) cotangent in, (F, T)
    gradient out — the flat F-major table storage's orientation) == the
    transposed scatter-add, for both the dense kernel and the sorted-window
    path including a forced tail (interpret mode)."""
    from spnerf_tpu.ops.pallas.dtab import dtab_pallas, dtab_sorted_window

    T, F, M = 2 ** 15, 4, 8192
    ids = jnp.asarray(rng.integers(0, T, M).astype(np.int32))
    ct = jnp.asarray(rng.normal(size=(M, F)).astype(np.float32))
    ref = jnp.zeros((T, F), jnp.float32).at[ids].add(ct)

    out = dtab_pallas(ids, ct.T, T, F, f32=True, fmajor=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref).T, atol=1e-4)

    out = dtab_sorted_window(ids, ct.T, T, F, fmajor=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref).T, atol=1e-3)

    # forced tail: duplicate-heavy block bridging to a far id
    ids2 = np.zeros((2048,), np.int32)
    ids2[-1] = T - 1
    ct2 = jnp.asarray(rng.normal(size=(2048, F)).astype(np.float32))
    ref2 = jnp.zeros((T, F), jnp.float32).at[jnp.asarray(ids2)].add(ct2)
    out2 = dtab_sorted_window(jnp.asarray(ids2), ct2.T, T, F, fmajor=True,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2).T,
                               atol=1e-3)


def test_dtab_defer_tail_fix_ingredients(rng):
    """defer_tail=True returns (unfixed dtab, any_tail, sorted ids, masked
    cotangent rows) such that dtab + scatter(ids_s, t_ct) == the exact
    scatter-add — the contract the merged-tail multi-level VJP
    (models/hashgrid._take_ft_multi) builds its single conditional on.
    Forced-tail and no-tail cases (interpret mode)."""
    from spnerf_tpu.ops.pallas.dtab import dtab_sorted_window

    T, F = 2 ** 15, 4
    # forced tail: duplicate-heavy block bridging to a far id
    ids = np.zeros((2048,), np.int32)
    ids[-1] = T - 1
    ct = jnp.asarray(rng.normal(size=(2048, F)).astype(np.float32))
    ref = jnp.zeros((T, F), jnp.float32).at[jnp.asarray(ids)].add(ct)
    d, pred, ids_s, t_ct = dtab_sorted_window(
        jnp.asarray(ids), ct.T, T, F, fmajor=True, defer_tail=True,
        interpret=True)
    assert bool(pred)
    fixed = d + jnp.zeros((F, T), jnp.float32).at[:, ids_s].add(t_ct.T)
    np.testing.assert_allclose(np.asarray(fixed), np.asarray(ref).T,
                               atol=1e-3)

    # no tail: uniform ids — pred False and dtab already exact
    ids2 = jnp.asarray(rng.integers(0, T, 70000).astype(np.int32))
    ct2 = jnp.asarray(rng.normal(size=(70000, F)).astype(np.float32))
    ref2 = jnp.zeros((T, F), jnp.float32).at[ids2].add(ct2)
    d2, pred2, _, t_ct2 = dtab_sorted_window(
        ids2, ct2.T, T, F, fmajor=True, defer_tail=True, interpret=True)
    assert not bool(pred2) and not np.asarray(t_ct2).any()
    np.testing.assert_allclose(np.asarray(d2), np.asarray(ref2).T, atol=1e-3)


def test_dtab_sorted_window_batched_matches_scatter(rng):
    """Batched cross-level sorted-window == L independent scatter-adds,
    including a level whose ids concentrate in few rows (direct-coarse-like)
    and one that forces the tail fallback (interpret mode)."""
    from spnerf_tpu.ops.pallas.dtab import dtab_sorted_window_batched

    T, F, M = 2 ** 15, 4, 70000
    lvl0 = rng.integers(0, T, M)  # uniform (hashed level)
    lvl1 = rng.integers(0, 4913, M)  # concentrated (direct coarse level)
    lvl2 = rng.integers(0, T, M)
    lvl2[: M // 2] = rng.integers(0, 64, M // 2)  # skew -> tail branch
    ids = jnp.asarray(np.stack([lvl0, lvl1, lvl2]).astype(np.int32))
    ct = jnp.asarray(rng.normal(size=(3, M, F)).astype(np.float32))
    ref = np.stack([
        np.asarray(jnp.zeros((T, F), jnp.float32).at[ids[l]].add(ct[l]))
        for l in range(3)])
    out = dtab_sorted_window_batched(ids, ct, T, F, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3)
