"""Multiresolution hash-grid encoding (Instant-NGP) and a hash-trunk SPNeRF.

Stretch configuration from BASELINE.json (config 5): replace the Siren trunk's
positional mapping + 8x512 MLP with a multiresolution hash encoding and a small
MLP, on the same RPC camera model, renderer, losses, and heads.

TPU-native formulation: the per-level lookup is a single `jnp.take` gather of
the 8 trilinear corners for every (point, level) at once — one big gather the
TPU handles well — followed by dense (N, L*F) matmuls. All shapes static.

Encoding follows Mueller et al. 2022: per level l, resolution
N_l = floor(N_min * b^l); corner hash = xor of coordinates times large primes,
mod table size; features trilinearly interpolated, concatenated across levels.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import ModelConfig
from .spnerf import TorchDense

# numpy at module scope: creating jnp arrays at import time initializes the
# JAX backends, which permanently defeats a later jax_platforms=cpu pin
# (the sitecustomize pre-imports jax; see utils/platform.py)
_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint32)
# 4th prime for the AOI-frame index in multi-AOI hashing (disjoint tables
# per frame without spending resolution on the empty inter-AOI gaps)
_FRAME_PRIME = np.uint32(3674653429)

# the 8 corner offsets of a unit cell
_CORNERS = np.array(
    [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
    dtype=np.uint32,
)  # (8, 3)


def _hash_coords(coords, table_size, frame=None):
    """coords: (..., 3) uint32 -> (...,) int32 indices in [0, table_size).

    frame: optional (...,) uint32 AOI-frame index XORed into the hash so each
    multi-AOI frame addresses a disjoint pseudo-table at full resolution."""
    h = (coords * _PRIMES).astype(jnp.uint32)
    h = h[..., 0] ^ h[..., 1] ^ h[..., 2]
    if frame is not None:
        h = h ^ (frame * _FRAME_PRIME)
    return (h % jnp.uint32(table_size)).astype(jnp.int32)


def _hash_corners(base, table_size, frame=None):
    """(N, 3) uint32 cell base -> (N, 8) int32 hashed corner ids, equal to
    ``_hash_coords(base[:, None, :] + _CORNERS, table_size, frame)`` without
    materializing the (N, 8, 3) corner array. The corner hash decomposes into
    per-AXIS pairs: h(i,j,k) = hx_i ^ hy_j ^ hz_k with hx_i = (x+i)*p1 =
    x*p1 + i*p1 (exact in u32 wraparound), so only six (N,) columns are
    computed and xor-combined — the profiled (N, 8, 3) u32 corner fusions
    (4.5 ms/step of u32 math at the default geometry, round 3) disappear
    along with their downstream copies. Measured integrated (full sp-nerf
    hash step, T=2^19, v5e): 174.1 -> 161.4 ms/step together with the
    direct-level base_lin + constant-offset decomposition.

    frame: optional (N, 1) uint32 AOI-frame index (see _hash_coords)."""
    hx = [base[:, a] * _PRIMES[a] for a in range(3)]  # (N,) per axis
    h = jnp.stack(
        [(hx[0] + np.uint32(i * _PRIMES[0]))
         ^ (hx[1] + np.uint32(j * _PRIMES[1]))
         ^ (hx[2] + np.uint32(k * _PRIMES[2]))
         for i, j, k in _CORNERS.tolist()], axis=-1)  # (N, 8)
    if frame is not None:
        h = h ^ (frame * _FRAME_PRIME)
    return (h % jnp.uint32(table_size)).astype(jnp.int32)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _take_sorted(tab, idx):
    """jnp.take(tab, idx, axis=0) whose BACKWARD scatter-add runs on sorted
    indices. XLA's take-VJP scatters the cotangent rows in arrival order;
    on TPU that scatter is row-latency-bound (~22 ns/row measured at 1M rows
    into a 2^15 x 2 table). Sorting the rows first (one multi-operand
    `lax.sort` carrying the F value columns) lets the sorted scatter merge
    duplicate keys in linear passes: measured 17.5 ms vs 22.2 ms at 1M rows
    (sort included) — and the win grows with the duplication factor, which is
    high for coarse hash levels."""
    return jnp.take(tab, idx, axis=0)


def _take_sorted_fwd(tab, idx):
    return jnp.take(tab, idx, axis=0), (idx, tab.shape)


def _take_sorted_bwd(res, ct):
    idx, (T, F) = res
    ids = idx.reshape(-1)
    d = ct.reshape(-1, F).astype(jnp.float32)
    ops = jax.lax.sort((ids,) + tuple(d[:, j] for j in range(F)), num_keys=1)
    k = ops[0]
    vals = jnp.stack(ops[1:], axis=-1)
    dtab = jnp.zeros((T, F), jnp.float32).at[k].add(
        vals, indices_are_sorted=True)
    return dtab, np.zeros(idx.shape, jax.dtypes.float0)


_take_sorted.defvjp(_take_sorted_fwd, _take_sorted_bwd)


# ---------------------------------------------------------------- matmul VJP
# The hash backward is scatter-bound on TPU (86 ms for 1M rows at T=2^19,
# 20 ms at 2^15 — CLAUDE.md round-2). A scatter-add into a table is also a
# matmul: dtab = one_hot(ids)^T @ ct. Materializing (M, T) one-hots is
# impossible, but one_hot(ids) factorizes exactly: with T = A*B,
# one_hot_T(i) = one_hot_A(i // B) (x) one_hot_B(i % B), so
#   dtab[a*B+b, f] = sum_m 1[a_m=a] * (1[b_m=b] * ct[m, f])
# is ONE (A, M) x (M, B*F) matmul — MXU work instead of serialized scatter
# rows. FLOPs are M*T*F*2 regardless of the (A, B) split; the split is chosen
# to minimize operand traffic M*(A + B*F). Blocked over M via lax.scan with
# an f32 (A, B*F) accumulator so the one-hot blocks never hit HBM at full M.
# Operands are bf16 (one-hots are exact in any dtype; ct rows round to bf16,
# accumulation is f32 on the MXU) unless SPNERF_HASH_MATMUL_F32=1.

def _matmul_dtab(ids, ct, T, F, fmajor=False):
    """scatter-add equivalent: (M,) int32 ids, (M, F) f32 ct -> (T, F) f32.

    fmajor=True: ct arrives (F, M) and the result is (F, T) — used by the
    flat F-major table storage (no layout change in the math)."""
    import os

    f32 = os.environ.get("SPNERF_HASH_MATMUL_F32") == "1"
    # On TPU the one-hot operands can be generated in VMEM and fed straight
    # to the MXU instead of materializing in HBM (ops/pallas/dtab.py);
    # SPNERF_HASH_MATMUL_PALLAS=0 forces the XLA fallback for A/B timing
    from ..ops.pallas.dtab import LANES, dtab_pallas, dtab_sorted_window

    use_pallas = (os.environ.get("SPNERF_HASH_MATMUL_PALLAS", "1") == "1"
                  and jax.default_backend() not in ("cpu",)
                  and F in (1, 2, 4, 8) and T % (LANES // F) == 0)
    if use_pallas:
        # sorted-window path when the dense kernel's FLOP surplus (A vs
        # 2*WIN one-hot rows) dwarfs the sort cost AND blocks of sorted rows
        # span well under one window (window_eligible)
        from ..ops.pallas.dtab import window_eligible

        if (os.environ.get("SPNERF_HASH_SORTED_WINDOW", "1") == "1"
                and window_eligible(T, F, ids.shape[0])):
            return dtab_sorted_window(ids, ct.astype(jnp.float32), T, F,
                                      fmajor=fmajor)
        # f32 operands measured FASTER in-kernel (65 vs 29.5 TFLOP/s at
        # T=2^19: the bf16 one-hot cast/multiply costs more on the VPU than
        # the MXU saves) — the opposite of the XLA path below
        return dtab_pallas(ids, ct.astype(jnp.float32), T, F, f32=True,
                           fmajor=fmajor)
    if fmajor:  # XLA fallback computes (T, F); shuffle at the boundaries
        return _matmul_dtab(ids, ct.T, T, F).T

    dtype = jnp.float32 if f32 else jnp.bfloat16
    # g per block is block*B*F bytes in bf16: 32768 rows at B=512, F=4 is
    # 128 MB of fused intermediate — fine for a 16 GB chip, and the scan
    # keeps it out of simultaneous-liveness with the training buffers.
    block = int(os.environ.get("SPNERF_HASH_MATMUL_BLOCK", "32768"))
    # A = smallest power of two >= sqrt(T*F) that divides T (T is a power of
    # two here), balancing one-hot-A traffic (M*A) against g traffic (M*B*F).
    # Block size and split are env-tunable for hardware sweeps.
    log2T = int(np.log2(T))
    assert 2 ** log2T == T, "matmul_vjp requires a power-of-two table size"
    log2A = min(max((log2T + int(np.ceil(np.log2(max(F, 1))))) // 2 + 1, 1),
                log2T)
    log2A = int(os.environ.get("SPNERF_HASH_MATMUL_LOG2A", log2A))
    A = 2 ** log2A
    B = T // A
    M = ids.shape[0]
    pad = (-M) % block
    if pad:
        ids = jnp.concatenate([ids, jnp.zeros((pad,), ids.dtype)])
        ct = jnp.concatenate([ct, jnp.zeros((pad, F), ct.dtype)])
    n_blocks = (M + pad) // block
    ids = ids.reshape(n_blocks, block)
    ct = ct.reshape(n_blocks, block, F)

    iota_a = jax.lax.broadcasted_iota(jnp.int32, (1, A), 1)
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)

    def body(acc, xs):
        ids_blk, ct_blk = xs
        ia = ids_blk // B
        ib = ids_blk % B
        oh_a = (ia[:, None] == iota_a).astype(dtype)  # (block, A)
        g = ((ib[:, None] == iota_b).astype(dtype)[:, :, None]
             * ct_blk.astype(dtype)[:, None, :])  # (block, B, F)
        acc = acc + jnp.matmul(oh_a.T, g.reshape(block, B * F),
                               preferred_element_type=jnp.float32)
        return acc, None

    acc0 = jnp.zeros((A, B * F), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (ids, ct))
    return acc.reshape(T, F)


# ------------------------------------------------------------- flat storage
# A (T, F) table with F=4 minor is a pathological TPU shape: the (8, 128)
# tile pads the 4-lane minor dim, and XLA resolves the conflicting layout
# preferences of the gather (wants the F-major {0,1:T(4,128)} order), the
# dtab producer, and the optimizer carry ({2,1,0:T(8,128)}) by inserting
# per-step conversion copies. Profiled on the full hash step at T=2^19
# (round 3): the Adam update on the (L, T, F) table alone is 27.6 ms/step
# (~50x off its traffic bound) plus ~10 ms/step of mu/nu layout copies.
# Storing each level's table as ONE FLAT row (L, T*F) keeps the param, its
# gradient, and the Adam carries on one unambiguous linear layout; ordering
# that row FEATURE-MAJOR (row[f*T + t]) additionally makes the free (F, T)
# view exactly the operand order the gather prefers, so the layout
# conversions vanish on both sides (the t-major ordering, which reshapes to
# (t_eff, F) and row-gathers, still paid ~33 ms/step of {1,0}->{0,1}
# conversion copies around the takes — profiled).
# Integrated full sp-nerf hash step, T=2^19, v5e:
#   (L, T, F) storage                 266.6 ms/step
#   flat t-major + (t_eff, F) reshape 251.2 ms/step (SPNERF_HASH_FMAJOR=0)
#   flat F-MAJOR (F, T) view          220.1 ms/step (the default)
# Two more refuted variants live only in git history (folded, like the
# round-2 fused training kernels):
#  - F-element slice gather straight off the flat 1-D row at offsets id*F:
#    735 ms/step — XLA lowers a 1-D multi-slice gather ~3x worse than the
#    2-D-operand gather (was _gather_slices/_take_flat_matmul).
#  - Param parked as 3-D (L, F, T), bytes identical to the flat row,
#    hoping XLA propagates the gather's tiled layout into the loop carry:
#    297.1 ms/step — the 3-D carry layout costs more than the per-gather
#    conversions it removes (was SPNERF_HASH_FM3D).


@jax.custom_vjp
def _take_matmul_ft(tab_ft, idx):
    """jnp.take(tab_ft, idx, axis=1) on a FEATURE-MAJOR (F, T) table view,
    with the factorized one-hot matmul backward producing (F, T) directly
    (impl="matmul_vjp" under F-major flat storage)."""
    return jnp.take(tab_ft, idx, axis=1)


def _take_matmul_ft_fwd(tab_ft, idx):
    return jnp.take(tab_ft, idx, axis=1), (idx, tab_ft.shape)


def _take_matmul_ft_bwd(res, ct):
    idx, (F, T) = res
    dtab = _matmul_dtab(idx.reshape(-1),
                        ct.reshape(F, -1).astype(jnp.float32), T, F,
                        fmajor=True)
    return dtab, np.zeros(idx.shape, jax.dtypes.float0)


_take_matmul_ft.defvjp(_take_matmul_ft_fwd, _take_matmul_ft_bwd)


@jax.custom_vjp
def _take_matmul_ft_bf16(tab_ft, idx):
    """_take_matmul_ft with the gather reading a BF16 copy of the (F, T)
    table view. The hash-step profile (174.9 ms config, T=2^19) shows gather
    cost scales with OPERAND footprint, not just rows: 4.53 ms per 1M-row
    gather from the (4, 524288) f32 hashed-level view vs 1.88 ms for the
    same rows from a (4, 65536) direct-level view — the random columns
    thrash whatever cache tier holds the table. Halving the operand to bf16
    (optimization_barrier keeps the cast from fusing back into the gather,
    which would re-read f32) targets exactly that. Values are quantized to
    bf16 before trilinear interpolation (they feed bf16 matmuls anyway);
    the table param, its gradient, and Adam state stay f32.

    REFUTED on the v5e (kept opt-in, SPNERF_HASH_BF16_GATHER=1): integrated
    full hash step 248.1 vs 174.9 ms/step (reproduced on a second run of
    the cached executable) — the bf16 gather output's 2-byte-lane tiling
    forces conversion/relayout work on the f32 interpolation side that
    costs far more than the halved operand footprint saves. The footprint
    observation itself still fits the profile (4.53 ms/1M-row gathers from
    the 8 MB hashed-level view vs 1.88 ms from 64-256 KB direct-level
    views), but exploiting it needs the narrow dtype to survive END-TO-END,
    which the f32 trilinear weights prevent here."""
    tab_bf = jax.lax.optimization_barrier(tab_ft.astype(jnp.bfloat16))
    return jnp.take(tab_bf, idx, axis=1)


def _take_matmul_ft_bf16_fwd(tab_ft, idx):
    return _take_matmul_ft_bf16(tab_ft, idx), (idx, tab_ft.shape)


def _take_matmul_ft_bf16_bwd(res, ct):
    idx, (F, T) = res
    dtab = _matmul_dtab(idx.reshape(-1),
                        ct.reshape(F, -1).astype(jnp.float32), T, F,
                        fmajor=True)
    return dtab, np.zeros(idx.shape, jax.dtypes.float0)


_take_matmul_ft_bf16.defvjp(_take_matmul_ft_bf16_fwd, _take_matmul_ft_bf16_bwd)


@jax.custom_vjp
def _take_matmul_ft_tm(tab_ft, idx):
    """_take_matmul_ft whose forward gathers ROWS from a materialized
    T-MAJOR (t_eff, F) copy of the view instead of columns from (F, t_eff).

    Motivation (round-3 xplane profile, T=2^19 hash step): gathers whose
    operand carries the {1,0:T(4,128)} layout of the big (F, T) views run at
    4.53 ms/1M rows fused, while the small direct-level views — materialized
    by XLA as {0,1:T(8,128)} copies, i.e. t-major memory order — gather at
    1.88 ms/1M + a 1.35 ms/1M relayout of the output. This variant recreates
    the fast form explicitly: one (t_eff, F) transpose copy per level per
    step (CSE-shared across the 3 render passes — the table is loop-invariant
    within a step), then a row gather, then the output relayout back to the
    (F, N, 8) interface. Backward is unchanged (fmajor matmul dtab).
    Opt-in via SPNERF_HASH_TM_GATHER=1 — measured NEUTRAL on the v5e
    (156.8 vs 156.7 ms/step integrated at T=2^19): whatever XLA emits for
    the explicit copy+row-gather+relayout chain costs the same as its
    fused column-gather, so the default stays the simpler form."""
    tab_tf = jax.lax.optimization_barrier(tab_ft.T)  # (t_eff, F) copy
    v = jnp.take(tab_tf, idx.reshape(-1), axis=0)  # (N*8, F) row gather
    return v.T.reshape(tab_ft.shape[0], *idx.shape)  # (F, N, 8)


def _take_matmul_ft_tm_fwd(tab_ft, idx):
    return _take_matmul_ft_tm(tab_ft, idx), (idx, tab_ft.shape)


_take_matmul_ft_tm.defvjp(_take_matmul_ft_tm_fwd, _take_matmul_ft_bwd)


# ------------------------------------------------------- lerp interpolation
# Trilinear interpolation with a LERP forward and a PRODUCT-form backward.
# Forward: 7 successive lerps on the (F, N, 8) gather output — no (N, 8)
# trilinear-weight array is ever built (the einsum path's weight build +
# contraction fusions profiled ~14 ms/step at T=2^19). Backward: the exact
# derivative of the same function, d_vals[f, n, c] = ct[f, n] * w[n, c],
# emitted as ONE broadcast multiply — plain autodiff of the lerp chain
# instead reassembles the (F, N, 8) cotangent through a chain of pad ops in
# a {1,0,2} layout that then pays relayout copies into the dtab sort
# (profiled ~0.4 ms x 6/step). d_frac is returned exactly as well (product
# rule over the three axis factors); when positions carry no parameter
# dependence — sample z values are stop-gradient everywhere in this
# renderer — XLA dead-code-eliminates that branch and the vals residual it
# reads inside the jitted train step. Measured integrated on the v5e
# (T=2^19): 146.3 vs 146.5 ms/step — NEUTRAL vs plain autodiff of the lerp
# chain (XLA fuses the pad-chain backward well); kept because the
# product-form table gradients are bitwise-identical to the einsum path's
# (gradient semantics independent of the forward's interpolation form).

@jax.custom_vjp
def _interp_lerp(vals_ft, frac):
    """(F, N, 8) corner values, (N, 3) in-cell fractions -> (N, F)."""
    v = vals_ft.astype(jnp.float32)
    for d in (2, 1, 0):  # k, then j, then i: 8 -> 4 -> 2 -> 1
        fd = frac[:, d][None, :, None]
        v = v[..., 0::2] * (1.0 - fd) + v[..., 1::2] * fd
    return v[..., 0].T  # (N, F)


def _interp_lerp_fwd(vals_ft, frac):
    return _interp_lerp(vals_ft, frac), (vals_ft, frac)


def _interp_lerp_bwd(res, ct):
    vals_ft, frac = res
    ct_fn = ct.T.astype(jnp.float32)  # (F, N)
    c = _CORNERS.astype(np.float32)  # (8, 3)
    # per-axis interpolation factors g_d[n, c] and the full weight product
    g = [c[None, :, d] * frac[:, d:d + 1]
         + (1.0 - c[None, :, d]) * (1.0 - frac[:, d:d + 1])
         for d in range(3)]  # 3 x (N, 8)
    w = g[0] * g[1] * g[2]
    d_vals = ct_fn[:, :, None] * w[None]  # (F, N, 8)
    # d_frac via the product rule: dw/dfd = (2 c_d - 1) * prod_{d' != d} g_d'
    s = jnp.einsum('fn,fnc->nc', ct_fn, vals_ft.astype(jnp.float32))
    others = (g[1] * g[2], g[0] * g[2], g[0] * g[1])
    d_frac = jnp.stack(
        [jnp.sum(s * (2.0 * c[None, :, d] - 1.0) * others[d], axis=-1)
         for d in range(3)], axis=-1)  # (N, 3)
    return d_vals.astype(vals_ft.dtype), d_frac


_interp_lerp.defvjp(_interp_lerp_fwd, _interp_lerp_bwd)


def _take_ft_multi(table, idxs, t_effs, T, F):
    """All levels' F-major takes through ONE custom VJP whose backward
    applies a SINGLE merged tail conditional instead of one per level.

    REFUTED on the v5e, kept opt-in (SPNERF_HASH_MERGED_TAIL=1): the
    hypothesis was that merging the 21 per-level tail conds (each ~0.6 ms
    of sequencer sync — see ops/pallas/dtab.py) into one per pass would
    recover ~11 ms/step. Measured integrated: 251.3 vs 220.1 ms/step — the
    backward's explicit jnp.stack of the (L, T*F) cotangent plus the
    per-level pads cost far more than the 18 saved cond syncs; autodiff's
    own accumulation of per-level padded contributions is cheaper than
    assembling the array by hand. Same lesson as the batched cross-level
    dtab refutation: don't serialize or materialize what XLA already
    overlaps and fuses."""
    return _TakeFtMulti(tuple(t_effs), T, F)(table, tuple(idxs))


@functools.lru_cache(maxsize=None)
def _TakeFtMulti(t_effs, T, F):
    L = len(t_effs)

    @jax.custom_vjp
    def take(table, idxs):
        outs = []
        for l, t_eff in enumerate(t_effs):
            tab_ft = table[l].reshape(F, T)
            if t_eff != T:
                tab_ft = tab_ft[:, :t_eff]
            outs.append(jnp.take(tab_ft, idxs[l], axis=1))  # (F, N, 8)
        return tuple(outs)

    def fwd(table, idxs):
        return take(table, idxs), idxs

    def bwd(idxs, cts):
        import os

        from ..ops.pallas.dtab import (LANES, dtab_sorted_window,
                                       window_eligible)

        use_pallas = (os.environ.get("SPNERF_HASH_MATMUL_PALLAS", "1") == "1"
                      and jax.default_backend() not in ("cpu",)
                      and F in (1, 2, 4, 8))
        sw = os.environ.get("SPNERF_HASH_SORTED_WINDOW", "1") == "1"
        rows, fixes = [], []
        for l, t_eff in enumerate(t_effs):
            ids = idxs[l].reshape(-1)
            ct_fm = cts[l].reshape(F, -1).astype(jnp.float32)
            # same per-level path choice as _matmul_dtab, but the window
            # path defers its tail fix to the one merged cond below
            if (use_pallas and sw and t_eff % (LANES // F) == 0
                    and window_eligible(t_eff, F, ids.shape[0])):
                d, pred, ids_s, t_ct = dtab_sorted_window(
                    ids, ct_fm, t_eff, F, fmajor=True, defer_tail=True)
                fixes.append((l, t_eff, pred, ids_s, t_ct))
            else:
                d = _matmul_dtab(ids, ct_fm, t_eff, F, fmajor=True)
            if t_eff != T:
                d = jnp.pad(d, ((0, 0), (0, T - t_eff)))
            rows.append(d.reshape(-1))
        dtab = jnp.stack(rows)  # (L, T*F)

        if fixes:
            pred = fixes[0][2]
            for f in fixes[1:]:
                pred = jnp.logical_or(pred, f[2])

            def fix_fn(ops):
                delta = jnp.zeros((L, T * F), jnp.float32)
                for (l, t_eff, _, _, _), (ids_s, t_ct) in zip(fixes, ops):
                    fx = jnp.zeros((F, t_eff), jnp.float32).at[
                        :, ids_s].add(t_ct.T)
                    if t_eff != T:
                        fx = jnp.pad(fx, ((0, 0), (0, T - t_eff)))
                    delta = delta.at[l].set(fx.reshape(-1))
                return delta

            ops = tuple((f[3], f[4]) for f in fixes)
            delta = jax.lax.cond(
                pred, fix_fn,
                lambda ops: jnp.zeros((L, T * F), jnp.float32), ops)
            dtab = dtab + delta
        return dtab, tuple(np.zeros(i.shape, jax.dtypes.float0)
                           for i in idxs)

    take.defvjp(fwd, bwd)
    return take


@jax.custom_vjp
def _take_matmul(tab, idx):
    """jnp.take(tab, idx, axis=0) whose BACKWARD is the factorized one-hot
    matmul above instead of XLA's scatter-add (impl="matmul_vjp")."""
    return jnp.take(tab, idx, axis=0)


def _take_matmul_fwd(tab, idx):
    return jnp.take(tab, idx, axis=0), (idx, tab.shape)


def _take_matmul_bwd(res, ct):
    idx, (T, F) = res
    dtab = _matmul_dtab(idx.reshape(-1),
                        ct.reshape(-1, F).astype(jnp.float32), T, F)
    return dtab, np.zeros(idx.shape, jax.dtypes.float0)


_take_matmul.defvjp(_take_matmul_fwd, _take_matmul_bwd)


# ------------------------------------------------------- batched-levels VJP
# One take + one backward for ALL levels at once — REFUTED on the v5e, kept
# opt-in via SPNERF_HASH_SW_BATCHED=1 (default off): XLA already overlaps
# the L independent per-level dispatch chains, so the single batched chain
# loses standalone (35.5 vs 27.7 ms, L=8 x 524288 rows at T=2^19) and loses
# harder integrated (412.6 vs 272.7 ms/step — the (L, N, 8) id stack and
# batched-gather copies compound). Full measurements in ops/pallas/dtab.py.
# Only valid when every level is window-eligible at full table size T (gate
# in HashGridEncoding): the per-level path's T_eff slicing for direct levels
# only mattered for the DENSE backward, whose FLOPs scale with T — the
# window backward's don't.

@jax.custom_vjp
def _take_batched(tab, idx):
    """(L, T, F) table, (L, N, 8) int32 ids -> (L, N, 8, F); backward is one
    cross-level batched sorted-window dtab."""
    return jax.vmap(lambda t, i: jnp.take(t, i, axis=0))(tab, idx)


def _take_batched_fwd(tab, idx):
    return _take_batched(tab, idx), (idx, tab.shape)


def _take_batched_bwd(res, ct):
    idx, (L, T, F) = res
    from ..ops.pallas.dtab import dtab_sorted_window_batched

    dtab = dtab_sorted_window_batched(
        idx.reshape(L, -1), ct.reshape(L, -1, F).astype(jnp.float32), T, F)
    return dtab, np.zeros(idx.shape, jax.dtypes.float0)


_take_batched.defvjp(_take_batched_fwd, _take_batched_bwd)


class HashGridEncoding(nn.Module):
    """xyz in [-1, 1]^3 -> (N, n_levels * n_features).

    impl — gather/scatter strategy (identical numerics):
      * "xla": plain autodiff (XLA's take-VJP emits one scatter-add per level)
      * "sorted_vjp": per-level custom VJP whose backward sorts the cotangent
        rows before a sorted scatter-add (_take_sorted)
      * "matmul_vjp": per-level custom VJP whose backward is a factorized
        one-hot MATMUL on the MXU instead of a scatter (_take_matmul)
      * "fused_vjp": ops/pallas/hash_enc.py — ONE flat scatter-add across all
        levels (measured slower than per-level on the v5e; kept selectable)"""

    n_levels: int = 16
    n_features: int = 2
    log2_table_size: int = 19
    base_resolution: int = 16
    max_resolution: int = 2048
    impl: str = "xla"
    # Instant-NGP convention (Mueller et al. 2022 sec. 3): levels whose dense
    # grid fits the table budget ((res+1)^3 <= T) index it DIRECTLY (linear
    # corner index into the first next_pow2((res+1)^3) rows) instead of
    # hashing — collision-free, and the smaller effective table makes the
    # backward cheaper for exactly the levels with the highest duplication
    # factor: scatter rows land in a hotter table (xla/sorted_vjp) and the
    # factorized one-hot matmul's FLOPs scale with T_eff (matmul_vjp, ~23%
    # dtab FLOP cut at the default 8x4 geometry). Disable to reproduce
    # round<=2 checkpoints (same param shapes, different row usage).
    direct_coarse: bool = True
    # number of disjoint multi-AOI frames along x (data/multi.py translates
    # AOI k by k * FRAME_SPACING). Each frame is hashed at FULL resolution in
    # its own pseudo-table (frame index XORed into the hash) — without this,
    # the [-1,1] clip collapses every AOI after the first onto one boundary
    # plane of the grid.
    frames: int = 1
    # store each level's table as one FLAT feature-major (T*F,) row
    # (row[f*T + t]) instead of (T, F): numerically identical, but the
    # narrow F-minor shape forces padded tilings + per-step
    # layout-conversion copies on TPU (measurements in the flat-storage
    # comment above; 266.6 -> 220.1 ms/step integrated). Applies to the xla
    # and matmul_vjp impls (the CPU/accelerator defaults); other impls keep
    # (T, F) storage. --no_hash_flat_table reproduces checkpoints trained
    # before this change (different param SHAPES).
    flat_table: bool = True

    @nn.compact
    def __call__(self, xyz):
        L, F, T = self.n_levels, self.n_features, 2 ** self.log2_table_size
        b = float(np.exp((np.log(self.max_resolution)
                          - np.log(self.base_resolution)) / max(L - 1, 1)))
        resolutions = np.floor(
            self.base_resolution * b ** np.arange(L)).astype(np.int64)

        flat = self.flat_table and self.impl in ("xla", "matmul_vjp")
        # Flat rows are ordered FEATURE-MAJOR (row[f*T + t]): the (F, T)
        # view hands the gather its preferred operand order with no layout
        # conversion. Measured integrated at T=2^19 (v5e): 220.1 ms/step
        # vs 251.2 t-major flat vs 266.6 (T, F) storage. SPNERF_HASH_FMAJOR=0
        # selects the t-major flat ordering — MEASUREMENT ONLY: it changes
        # the param SEMANTICS (not shape), so never mix checkpoints across
        # settings.
        import os

        fmajor = flat and os.environ.get("SPNERF_HASH_FMAJOR", "1") == "1"
        table = self.param(
            "table",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32,
                                                  -1e-4, 1e-4),
            (L, T * F) if flat else (L, T, F),
        )

        xyz = jnp.asarray(xyz, jnp.float32)
        frame = None
        if self.frames > 1:
            from ..data.multi import FRAME_SPACING

            fidx = jnp.clip(jnp.round(xyz[:, 0] / FRAME_SPACING), 0,
                            self.frames - 1)
            xyz = xyz - jnp.stack(
                [fidx * FRAME_SPACING, jnp.zeros_like(fidx),
                 jnp.zeros_like(fidx)], axis=-1)
            frame = fidx.astype(jnp.uint32)[:, None]  # broadcast over corners

        x01 = jnp.clip((xyz + 1.0) * 0.5, 0.0, 1.0)

        # fused_vjp hashes EVERY level in one flat program, so it is only a
        # valid implementation of this module when no level uses direct
        # (collision-free) indexing; otherwise fall through to the per-level
        # loop (plain-autodiff take), keeping impl a pure implementation
        # choice rather than a function change
        any_direct = self.direct_coarse and any(
            (int(r) + 1) ** 3 <= T for r in resolutions)
        if self.impl == "fused_vjp" and frame is None and not any_direct:
            from ..ops.pallas.hash_enc import hash_encode

            return hash_encode(x01, table,
                               tuple(int(r) for r in resolutions))

        # phase 1: per-level corner indices (direct or hashed) + fractions
        per_level = []  # (idx (N, 8) int32, frac (N, 3), t_eff)
        for l in range(L):
            res = int(resolutions[l])
            xs = x01 * res
            # cell index clamped to res-1 (standard trilinear convention):
            # at x01 == 1.0 exactly — which every sample clipped to the +1
            # AOI boundary hits, e.g. solar-pass points marching off the
            # box — floor(xs) == res would address corner res+1: aliased
            # rows for hashed levels and OUT-OF-RANGE linear indices for
            # direct levels (clamped reads, silently dropped one-hot
            # gradients). Clamping the CELL and letting frac reach 1.0
            # interpolates onto the face corners instead; interior points
            # (floor < res) are bit-identical.
            x0 = jnp.minimum(jnp.floor(xs), float(res - 1))
            frac = xs - x0  # (N, 3) in [0, 1] (1.0 only on the +1 faces)
            base = x0.astype(jnp.uint32)  # (N, 3)
            side = res + 1  # dense grid has res cells -> res+1 corners/axis
            n_frames = self.frames if frame is not None else 1
            # Corner ids are computed WITHOUT materializing the (N, 8, 3)
            # corner-coordinate array (profiled at 4.5 ms/step of u32
            # fusions at the default geometry): the direct linear index
            # decomposes into base_lin + a constant per-corner offset, and
            # the hash into per-axis pair xors (_hash_corners). Both are
            # bit-identical to the corner-array forms.
            if self.direct_coarse and side ** 3 * n_frames <= T:
                # collision-free linear index (one dense side^3 block per
                # multi-AOI frame); the slice to the pow2-padded dense size
                # keeps matmul_vjp's factorization valid and its VJP
                # zero-pads dtab back to (T, F) for free. Frame 0 is
                # bit-identical to the frames=1 encoding.
                t_eff = 1 << int(np.ceil(np.log2(side ** 3 * n_frames)))
                base_lin = ((base[:, 0] * np.uint32(side) + base[:, 1])
                            * np.uint32(side) + base[:, 2])  # (N,)
                offs = ((_CORNERS[:, 0] * side + _CORNERS[:, 1]) * side
                        + _CORNERS[:, 2]).astype(np.uint32)  # (8,) constant
                lin = base_lin[:, None] + offs[None]  # (N, 8)
                if frame is not None:
                    lin = lin + frame * np.uint32(side ** 3)
                idx = lin.astype(jnp.int32)
            else:
                idx = _hash_corners(base, T, frame)  # (N, 8)
                t_eff = T
            per_level.append((idx, frac, t_eff))

        # phase 2: table lookups. SPNERF_HASH_SW_BATCHED=1 (refuted on the
        # v5e — see _take_batched) gathers all levels in ONE custom-VJP take
        # whose backward is a single cross-level batched sorted-window dtab;
        # default is per-level takes, whose independent chains XLA overlaps.
        import os

        from ..ops.pallas.dtab import window_eligible

        n = x01.shape[0]
        use_batched = (
            self.impl == "matmul_vjp" and not flat
            and os.environ.get("SPNERF_HASH_MATMUL_PALLAS", "1") == "1"
            and os.environ.get("SPNERF_HASH_SORTED_WINDOW", "1") == "1"
            and os.environ.get("SPNERF_HASH_SW_BATCHED", "0") == "1"
            and jax.default_backend() not in ("cpu",)
            and window_eligible(T, self.n_features, n * 8))
        if use_batched:
            vals_all = _take_batched(
                table, jnp.stack([p[0] for p in per_level]))  # (L, N, 8, F)

        # all F-major takes through one custom VJP with ONE merged tail
        # conditional — REFUTED (251.3 vs 220.1 ms/step, see
        # _take_ft_multi), default off
        use_ft_multi = (
            fmajor and self.impl == "matmul_vjp"
            and os.environ.get("SPNERF_HASH_MERGED_TAIL", "0") == "1")
        if use_ft_multi:
            vals_ft_all = _take_ft_multi(
                table, tuple(p[0] for p in per_level),
                tuple(p[2] for p in per_level), T, F)

        # phase 3: trilinear interpolation.
        # SPNERF_HASH_FM_FEATS (REFUTED, default off) keeps the interpolation
        # FEATURE-MAJOR: the compiled step's HLO shows every f-major gather's
        # result transposed to an (N·8, F){T(8,128)} layout for the n-major
        # interpolation — 24 such transposes per step. =1 emits each level's
        # features as (F, N) and concatenates to (L·F, N) with ONE transpose
        # per field call (3/step); =2 adds an optimization_barrier on the
        # stack so the transpose cannot fold back. Measured integrated at
        # T=2^19 (v5e, round 3): =1 compiles to the BITWISE-IDENTICAL
        # executable (XLA's transpose folding pushes the final .T back into
        # the per-level einsums; warmup losses match to 17 digits) and =2 is
        # neutral (214.9 vs 215.0 ms/step) — the gather-output transposes are
        # fused and effectively free; the per-gather cost profiled earlier is
        # the gather's random-access traffic itself, not the layout change.
        fm_feats = (fmajor and not use_batched
                    and os.environ.get("SPNERF_HASH_FM_FEATS", "0") != "0")
        feats = []
        for l, (idx, frac, t_eff) in enumerate(per_level):
            if use_batched:
                vals = vals_all[l]  # (N, 8, F)
            elif flat:
                if fmajor and use_ft_multi:
                    vals_ft = vals_ft_all[l]  # (F, N, 8)
                    vals = None
                elif fmajor:
                    # FEATURE-MAJOR flat row: view as (F, T) (free bitcast),
                    # slice the level's t_eff prefix along the minor axis
                    # (lane-contiguous), gather COLUMNS. The gather's
                    # preferred operand layout on a (T, F) table is
                    # F-major-tiled — this storage hands it that order
                    # without the {1,0}->{0,1} conversion copies the t-major
                    # reshape path pays (profiled at 33 ms/step at T=2^19).
                    tab_ft = table[l].reshape(F, T)
                    if t_eff != T:
                        tab_ft = tab_ft[:, :t_eff]
                    if os.environ.get("SPNERF_HASH_TAB_BARRIER", "0") == "1":
                        # REFUTED: forcing the (F, T) view to materialize,
                        # hoping post-layout CSE would share the per-gather
                        # operand conversion (profiled: 2.6 ms x 24/step,
                        # duplicated into each pass's gather fusion) across
                        # passes, measured NEUTRAL: 220.0 vs 220.1 ms/step.
                        tab_ft = jax.lax.optimization_barrier(tab_ft)
                    if self.impl == "matmul_vjp":
                        # SPNERF_HASH_BF16_GATHER=1: gather from a bf16 copy
                        # of the view (halves the random-access operand
                        # footprint — see _take_matmul_ft_bf16; REFUTED
                        # standalone: the f32 interpolation converts the
                        # bf16 gather output with a relayout copy).
                        # SPNERF_HASH_BF16_E2E=1 additionally runs the
                        # trilinear interpolation in bf16 (w cast to bf16,
                        # f32 accumulation) so no conversion buffer of the
                        # (F, N, 8) gather output ever exists — the "needs
                        # end-to-end narrow dtype" follow-up to the
                        # BF16_GATHER refutation. ALSO REFUTED on the v5e:
                        # 247.9 vs 174.1 ms/step integrated (T=2^19) —
                        # within noise of plain BF16_GATHER's 248.1, i.e.
                        # the equal-dtype einsum recovered nothing. The
                        # penalty is the bf16 gather OUTPUT's (16, 128)
                        # 2-byte tiling itself (the gather emits into a
                        # narrow-lane layout the surrounding f32 program
                        # can't use without relayout, consumer dtype
                        # notwithstanding), not the convert op.
                        if (os.environ.get("SPNERF_HASH_BF16_GATHER",
                                           "0") == "1"
                                or os.environ.get("SPNERF_HASH_BF16_E2E",
                                                  "0") == "1"):
                            vals_ft = _take_matmul_ft_bf16(tab_ft, idx)
                        elif os.environ.get("SPNERF_HASH_TM_GATHER",
                                            "0") == "1":
                            # row-gather from a t-major copy of the view
                            # (see _take_matmul_ft_tm)
                            vals_ft = _take_matmul_ft_tm(tab_ft, idx)
                        else:
                            vals_ft = _take_matmul_ft(tab_ft, idx)  # (F,N,8)
                    else:  # "xla": autodiff VJP is the native scatter-add
                        vals_ft = jnp.take(tab_ft, idx, axis=1)
                    vals = None
                else:
                    # t-major flat (SPNERF_HASH_FMAJOR=0, measurement-only):
                    # contiguous t_eff*F prefix of the flat row, reshaped to
                    # (t_eff, F) for the proven row-gather programs
                    row = table[l] if t_eff == T else table[l][:t_eff * F]
                    take = {"sorted_vjp": _take_sorted,
                            "matmul_vjp": _take_matmul}.get(
                                self.impl,
                                lambda t, i: jnp.take(t, i, axis=0))
                    vals = take(row.reshape(t_eff, F), idx)  # (N, 8, F)
            else:
                take = {"sorted_vjp": _take_sorted,
                        "matmul_vjp": _take_matmul}.get(
                            self.impl, lambda t, i: jnp.take(t, i, axis=0))
                vals = take(table[l][:t_eff], idx)  # (N, 8, F)
            # SPNERF_HASH_LERP (fmajor matmul/xla path only; default ON for
            # accelerators, off on CPU): trilinear interpolation as 7
            # successive LERPs on the (F, N, 8) gather output instead of
            # the (N, 8) weight product + 8-corner einsum — never
            # materializes w (the einsum path's weight build + contraction
            # fusions profiled at ~14 ms/step at T=2^19). _CORNERS orders
            # corners (i, j, k) with k minor, so the axis pairs are
            # even/odd slices. Numerics: same math, different f32
            # rounding/association than the weighted sum (not bitwise;
            # parity-tested to f32 tolerance). Measured integrated on the
            # v5e (T=2^19): 149.4 vs 156.7 ms/step (+5% rays/s).
            lerp_default = ("1" if jax.default_backend() not in ("cpu",)
                            else "0")
            if (fmajor and vals is None and not fm_feats
                    and os.environ.get("SPNERF_HASH_LERP",
                                       lerp_default) == "1"):
                feats.append(_interp_lerp(vals_ft, frac))  # (N, F)
                continue
            # trilinear weights for the (i, j, k) corner order of _CORNERS
            w = jnp.ones((n, 8), jnp.float32)
            for d in range(3):
                cd = _CORNERS[:, d].astype(jnp.float32)[None]  # (1, 8)
                fd = frac[:, d: d + 1]  # (N, 1)
                w = w * (cd * fd + (1.0 - cd) * (1.0 - fd))
            if fmajor and vals is None:
                # bf16 end-to-end: when the gather emitted bf16 (BF16_E2E),
                # feed the einsum bf16 on BOTH sides with f32 accumulation —
                # equal-dtype operands mean XLA never materializes an f32
                # convert (relayout) of the (F, N, 8) gather output, which is
                # what refuted the plain BF16_GATHER variant.
                wi = w
                if (vals_ft.dtype == jnp.bfloat16
                        and os.environ.get("SPNERF_HASH_BF16_E2E",
                                           "0") == "1"):
                    wi = w.astype(jnp.bfloat16)
                if fm_feats:
                    feats.append(jnp.einsum(
                        'nc,fnc->fn', wi, vals_ft,
                        preferred_element_type=jnp.float32))  # (F, N)
                else:
                    feats.append(jnp.einsum(
                        'nc,fnc->nf', wi, vals_ft,
                        preferred_element_type=jnp.float32))  # (N, F)
            else:
                feats.append(jnp.sum(w[..., None] * vals, axis=1))  # (N, F)
        if fm_feats:
            out_fm = jnp.concatenate(feats, axis=0)  # (L*F, N)
            if os.environ.get("SPNERF_HASH_FM_FEATS") == "2":
                out_fm = jax.lax.optimization_barrier(out_fm)
            return out_fm.T  # ONE (L*F, N) -> (N, L*F) transpose per call
        return jnp.concatenate(feats, axis=-1)  # (N, L*F)


class HashSPNeRF(nn.Module):
    """SPNeRF with a hash-grid trunk: same inputs/outputs as `SPNeRF`
    (drop-in for the renderer/losses), Instant-NGP-sized MLPs."""

    cfg: ModelConfig
    compute_dtype: jnp.dtype = jnp.float32
    n_levels: int = 16
    n_features: int = 2
    log2_table_size: int = 19
    hidden: int = 64
    enc_impl: str = "xla"  # forwarded to HashGridEncoding.impl
    frames: int = 1  # multi-AOI frames (HashGridEncoding.frames)
    direct_coarse: bool = True  # HashGridEncoding.direct_coarse
    flat_table: bool = True  # HashGridEncoding.flat_table

    @nn.compact
    def __call__(self, xyz, sun_d, t_emb=None, sem_labels=None,
                 sigma_only=False, heads=None, anneal=None, solar_tail=0):
        """solar_tail: static int — the LAST `solar_tail` rows are
        solar-correction points that only need sigma and sun_v (the solar
        loss consumes nothing else, reference modules/rendering.py:171-177).
        The hash encoding, shared trunk, sigma and sun head run batched over
        ALL rows (ONE table gather per level instead of one per pass — each
        gather fusion pays a ~2.6 ms table-operand layout conversion on the
        v5e, so fusion count is the cost driver, not row count); the
        rgb/sky/beta/sem heads are sliced to the leading view rows so their
        matmuls never touch solar rows (the unpruned-head waste that refuted
        SPNERF_BATCH_SC, ops/render.py)."""
        cfg = self.cfg
        dense = lambda feats: TorchDense(
            feats, kernel_init_name="torch", compute_dtype=self.compute_dtype
        )
        if heads is None:
            heads = ("rgb", "sun", "sky", "beta", "sem")
        nv = xyz.shape[0] - solar_tail  # leading view rows (all heads)
        view = (lambda v: v[:nv]) if solar_tail else (lambda v: v)

        enc = HashGridEncoding(
            n_levels=self.n_levels, n_features=self.n_features,
            log2_table_size=self.log2_table_size, impl=self.enc_impl,
            frames=self.frames, direct_coarse=self.direct_coarse,
            flat_table=self.flat_table,
        )(xyz)
        if anneal is not None:
            # coarse-to-fine level annealing (ModelConfig.hash_anneal_steps):
            # anneal is an (L,) per-level weight in [0, 1]; scaling the
            # (N, L*F) level-major features also scales their table
            # gradients, so closed levels stay at init until their ramp
            # opens (BARF-style schedule, computed in Trainer._loss_fn)
            enc = enc * jnp.repeat(jnp.asarray(anneal, enc.dtype),
                                   self.n_features)[None, :]

        x_in = enc
        if cfg.sem:
            sem_size = cfg.num_sem_classes * cfg.s_embedding_factor
            table = self.param(
                "semantic_embedding",
                lambda key, shape: jax.random.normal(key, shape)
                .at[cfg.num_sem_classes].set(0.0),
                (cfg.num_sem_classes + 1, sem_size),
            )
            labels = jnp.where(sem_labels < 0, cfg.num_sem_classes,
                               sem_labels).astype(jnp.int32)
            from .spnerf import embed_lookup

            x_in = jnp.concatenate(
                [x_in, embed_lookup(table, labels).astype(x_in.dtype)],
                axis=-1)

        h = jax.nn.relu(dense(self.hidden)(x_in))
        h = jax.nn.relu(dense(self.hidden)(h))
        shared = h

        sigma = jax.nn.softplus(dense(1)(shared))[..., 0]
        if sigma_only:
            return {"sigma": sigma}

        # construct all head submodules unconditionally so flax auto-naming is
        # independent of `heads` (same convention as SPNeRF.__call__)
        d_feats = dense(self.hidden)
        d_rgb0, d_rgb1 = dense(self.hidden), dense(3)
        d_sun0, d_sun1, d_sun2 = dense(self.hidden), dense(self.hidden), dense(1)
        d_sky0, d_sky1 = dense(self.hidden), dense(3)
        if cfg.beta:
            d_beta0, d_beta1 = dense(self.hidden), dense(1)
        if cfg.sem:
            d_sem0 = dense(self.hidden)
            d_sem1 = dense(cfg.num_sem_classes)

        out = {"sigma": sigma}
        feats = None
        if {"rgb", "sun", "beta"} & set(heads):
            feats = d_feats(shared)

        if "rgb" in heads:
            r = jax.nn.relu(d_rgb0(view(feats)))
            out["rgb"] = jax.nn.sigmoid(d_rgb1(r)) * 1.002 - 0.001

        if "sun" in heads:
            # all rows: solar points need sun_v too (transparency term)
            s = jax.nn.relu(d_sun0(feats, sun_d))
            s = jax.nn.relu(d_sun1(s))
            out["sun_v"] = jax.nn.sigmoid(d_sun2(s))

        if "sky" in heads:
            k = jax.nn.relu(d_sky0(view(sun_d)))
            out["sky"] = jax.nn.sigmoid(d_sky1(k))

        if cfg.beta and "beta" in heads:
            bb = jax.nn.relu(d_beta0(view(feats), view(t_emb)))
            out["beta"] = jax.nn.softplus(d_beta1(bb))

        if cfg.sem and "sem" in heads:
            g = jax.nn.relu(d_sem0(view(shared)))
            out["sem_logits"] = d_sem1(g)
        return out


def init_hash_spnerf(key, cfg: ModelConfig, compute_dtype=jnp.float32, **kw):
    model = HashSPNeRF(cfg=cfg, compute_dtype=compute_dtype, **kw)
    xyz = jnp.zeros((2, 3), jnp.float32)
    sun = jnp.zeros((2, 3), jnp.float32)
    t_emb = jnp.zeros((2, cfg.t_embedding_dims), jnp.float32) if cfg.beta else None
    sem = jnp.zeros((2,), jnp.int32) if cfg.sem else None
    params = model.init(key, xyz, sun, t_emb, sem)
    return model, params
