"""Pallas TPU kernel for the hash-table gradient (scatter-add as a matmul).

The hash encoding's backward is dtab[t, f] = sum_m 1[ids_m = t] * ct[m, f] —
a scatter-add that is row-latency-bound as an XLA scatter (CLAUDE.md round-2:
86 ms per 1M rows at T=2^19). Round 3 restructured it as a factorized one-hot
matmul in XLA (`models/hashgrid._matmul_dtab`): with T = A*B,
one_hot_T(i) = one_hot_A(i // B) (x) one_hot_B(i % B), so dtab is computed as
(A, M) x (M, B*F) matmuls. That wins 2.1x over the scatter (84.7 ms) but runs
at only ~26% MFU: XLA must MATERIALIZE the one-hot operands in HBM (dot
operands cannot be fused), so every M-block writes + reads ~192 MB of
synthesized one-hots.

This kernel removes that traffic entirely: the one-hot tiles are generated
in VMEM (two `broadcasted_iota` compares) and fed straight to the MXU. Per
grid step (i = A-tile, k = M-block) it accumulates

    out[i*tA : (i+1)*tA, f*B : (f+1)*B] += oh_aT @ ((ib == iota_B) * ct[:, f])

into a resident f32 output tile, F dots of (tA, m) x (m, B). The output is
laid out (A, F*B) — lane-dim F*B = 1024 — and unscrambled to (T, F) by a
cheap XLA transpose afterwards. Operands are bf16 by default (one-hots are
exact in any dtype; ct rows round to bf16, accumulation f32 on the MXU),
matching the XLA matmul path's default — SPNERF_HASH_MATMUL_F32=1 selects
f32 operands in both paths.

No reference counterpart: the reference's hash configs don't exist
(SURVEY.md section 2 — the hash trunk is this repo's BASELINE.json config-5
stretch); the gradient it computes is bit-compatible with XLA scatter-add
autodiff up to f32 summation order (pinned by tests/test_pallas.py).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 1024  # lane width of the (A, F*B) output tile: B = LANES // F
MBLK = 1024  # index rows per grid step
TA = 256  # output rows per grid step (capped to A when A is smaller)
WIN = 16  # sorted-window path: one-hot window width in A-rows per block


def _sort_stable():
    """jax.lax.sort defaults to is_stable=True, which XLA:TPU implements by
    appending an s32 iota tiebreaker operand to the sort (visible in the
    round-3 xplane profile: every dtab sort carried 6 operands instead of 5
    and 31.3 ms/step total). The window dtab does not need stability — the
    scatter-sum is order-independent; only the f32 summation order among
    EQUAL ids changes, the same numerics class as the kernel's block
    summation order. SPNERF_HASH_SORT_STABLE=1 restores the stable sort.
    Measured integrated (full sp-nerf hash step, T=2^19, v5e): unstable
    156.7 vs stable 161.4 ms/step (~0.22 ms saved per 1M-row sort)."""
    import os

    return os.environ.get("SPNERF_HASH_SORT_STABLE", "0") == "1"


def window_eligible(T, F, M):
    """True when the sorted-window path applies and should win: lane-aligned
    power-of-two split, enough table rows A that the dense kernel's FLOP
    surplus dwarfs the sort (A >= 16*WIN), and sorted blocks spanning well
    under one window (mean span = A*MBLK/M <= WIN/4)."""
    if F not in (1, 2, 4, 8) or T % (LANES // F):
        return False
    A = T // (LANES // F)
    return A % WIN == 0 and A >= 16 * WIN and M * WIN >= 4 * A * MBLK


def _kernel(ids_row_ref, ids_col_ref, ct_ref, out_ref, *, B, F, ta, dtype):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    i = pl.program_id(0)
    ia = ids_row_ref[:] // B  # (1, m)
    ib = ids_col_ref[:] % B  # (m, 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (ta, MBLK), 0) + i * ta
    oh_at = (rows == ia).astype(dtype)  # (ta, m): one_hot_A rows, transposed
    cols = jax.lax.broadcasted_iota(jnp.int32, (MBLK, B), 1)
    oh_b = (ib == cols).astype(dtype)  # (m, B)
    ct = ct_ref[:]  # (m, F) f32
    for f in range(F):
        g = oh_b * ct[:, f:f + 1].astype(dtype)  # (m, B)
        out_ref[:, f * B:(f + 1) * B] += jnp.dot(
            oh_at, g, preferred_element_type=jnp.float32)


def _kernel_cols(ids_row_ref, *rest, B, F, ta, dtype):
    """_kernel with COLUMN operands (fmajor callers only): ids and the F
    cotangent rows of the (F, M) fmajor cotangent all arrive as (1, m) rows
    — no (m, 1) id operand and no materialized (m, F) ct transpose, the
    same marshalling the sorted-window cols kernel removed (the dense
    kernel's (mp, 1) id reshapes profiled 0.8+0.4+0.4 ms/step at the
    default geometry). The B-side one-hot is built TRANSPOSED (B, m) and
    contracted with dot_general on the m axis. Measured integrated (full
    sp-nerf hash step, T=2^19, v5e): 146.5 vs 149.4 ms/step;
    SPNERF_HASH_DENSE_COLS=0 reverts."""
    ct_refs, out_ref = rest[:-1], rest[-1]
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    i = pl.program_id(0)
    ids_row = ids_row_ref[:]  # (1, m)
    ia = ids_row // B
    rows = jax.lax.broadcasted_iota(jnp.int32, (ta, MBLK), 0) + i * ta
    oh_at = (rows == ia).astype(dtype)  # (ta, m)
    ib = ids_row % B  # (1, m)
    colsT = jax.lax.broadcasted_iota(jnp.int32, (B, MBLK), 0)
    oh_bt = (ib == colsT).astype(dtype)  # (B, m): one_hot_B, transposed
    for f in range(F):
        gt = oh_bt * ct_refs[f][:].astype(dtype)  # (B, m)
        out_ref[:, f * B:(f + 1) * B] += jax.lax.dot_general(
            oh_at, gt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("T", "F", "f32", "interpret", "fmajor"))
def dtab_pallas(ids, ct, T, F, f32=False, interpret=False, fmajor=False):
    """Scatter-add equivalent on the MXU: (M,) int32 ids in [0, T), (M, F)
    f32 cotangent rows -> (T, F) f32 table gradient.

    fmajor=True: ct arrives FEATURE-MAJOR (F, M) and the gradient returns
    (F, T) — the layout the flat F-major table storage uses; the kernel is
    unchanged (only the cheap pre/post shuffles differ).

    Requires T and F powers of two with T >= LANES // F (callers fall back to
    the XLA paths below that — see models/hashgrid.py)."""
    assert T % (LANES // F) == 0 and T >= LANES // F, (T, F)
    B = LANES // F
    A = T // B
    ta = min(TA, A)
    dtype = jnp.float32 if f32 else jnp.bfloat16

    M = ids.shape[0]
    pad = (-M) % MBLK
    if pad:  # padded ids hit row 0 with ct = 0: contributes zero
        ids = jnp.concatenate([ids, jnp.zeros((pad,), ids.dtype)])
        if fmajor:
            ct = jnp.concatenate([ct, jnp.zeros((F, pad), ct.dtype)], axis=1)
        else:
            ct = jnp.concatenate([ct, jnp.zeros((pad, F), ct.dtype)])
    mp = M + pad
    ids = ids.astype(jnp.int32)
    ct = ct.astype(jnp.float32)
    import os

    row_spec = pl.BlockSpec((1, MBLK), lambda i, k: (0, k),
                            memory_space=pltpu.VMEM)
    if fmajor and os.environ.get("SPNERF_HASH_DENSE_COLS", "1") == "1":
        # COLUMN operands (see _kernel_cols): the (F, mp) fmajor cotangent's
        # rows feed the kernel directly — no ct.T and no (mp, 1) id reshape
        kern = functools.partial(_kernel_cols, B=B, F=F, ta=ta, dtype=dtype)
        in_specs = [row_spec] * (1 + F)
        operands = ((ids.reshape(1, mp),)
                    + tuple(ct[f].reshape(1, mp) for f in range(F)))
    else:
        if fmajor:
            ct = ct.T  # (mp, F) for the kernel's block specs
        kern = functools.partial(_kernel, B=B, F=F, ta=ta, dtype=dtype)
        in_specs = [
            row_spec,
            pl.BlockSpec((MBLK, 1), lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MBLK, F), lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = (ids.reshape(1, mp), ids.reshape(mp, 1), ct)

    out = pl.pallas_call(
        kern,
        grid=(A // ta, mp // MBLK),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((ta, F * B), lambda i, k: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((A, F * B), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * T * F,
            bytes_accessed=mp * (4 + 4 + 4 * F) * (A // ta) + A * B * F * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    # out[a, f*B + b] = dtab[a*B + b, f]
    if fmajor:  # (F, T): contiguous B-lane blocks move — tile-friendly
        return out.reshape(A, F, B).transpose(1, 0, 2).reshape(F, T)
    return out.reshape(A, F, B).transpose(0, 2, 1).reshape(T, F)


# ------------------------------------------------------------- sorted window
# The dense kernel above runs at ~158 TFLOP/s in-context (per the round-3
# profile: 28 ms per 1M rows at T=2^19) — near the MXU ceiling — yet the hash
# backward still dominates the depth-supervised step (335 of 535 ms) because
# dense FLOPs are M*T*F*2: ~54 TFLOP per step. The remaining lever is a FLOP
# CUT, not a faster matmul. Sorting the rows by id makes the one-hot matmix
# nearly block-diagonal: an MBLK-row block of SORTED ids spans only
# ~A*MBLK/M one-hot rows (2-4 here), so each block needs a (WIN, m) x
# (m, B*F) dot against a narrow WINDOW of the table instead of all A rows —
# an A/(2*WIN) = 64x FLOP cut at T=2^19. Exactness: each block is evaluated
# against the two aligned windows [w_j, w_j+2)*WIN covering its first row;
# rows beyond that (possible only for severely skewed ids — the spatial hash
# whitens them) are detected host-free and added by a lax.cond scatter-add
# fallback that compiles in but executes only when the tail is non-empty.
# A sorted SCATTER does not get the same benefit: measured in-context the
# full step is 724.6 ms (sorted_vjp) / 693.3 (plain scatter) / 541.9 (dense
# matmul) — the scatter stays row-latency-bound even on sorted indices.
#
# Measured (v5e, full sp-nerf hash config w/ depth supervision, T=2^19,
# batch 1024): 294.6 ms/step (3476 rays/s) vs 541.0 dense-pallas (1893) vs
# 551.9 XLA factorized matmul (1856) — 1.84x integrated. Standalone
# (M=1M, T=2^19, F=4) it only TIES the XLA matmul (39.5 vs 36.8 ms): alone,
# the sort + per-block grid overhead eat the FLOP cut; in context the dense
# paths' 54 TFLOP/step of table matmuls are the step's critical resource
# while the sort rides the VPU/HBM alongside other work.


def _win_kernel(w_ref, ids_row_ref, ids_col_ref, ct_ref, out_ref, *, B, F,
                mblk, dtype):
    j = pl.program_id(0)  # row block; both WIN-windows evaluated in one dot
    base = w_ref[j] * WIN
    ia = ids_row_ref[:] // B - base  # (1, m) window-relative one-hot rows
    ib = ids_col_ref[:] % B  # (m, 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (2 * WIN, mblk), 0)
    oh = (rows == ia).astype(dtype)  # (2W, m); rows outside [0, 2W) -> 0
    cols = jax.lax.broadcasted_iota(jnp.int32, (mblk, B), 1)
    oh_b = (ib == cols).astype(dtype)  # (m, B)
    ct = ct_ref[:]
    for f in range(F):
        g = oh_b * ct[:, f:f + 1].astype(dtype)
        out_ref[0, :, f * B:(f + 1) * B] = jnp.dot(
            oh, g, preferred_element_type=jnp.float32)


def _win_kernel_acc(w_ref, ids_row_ref, ids_col_ref, ct_ref, out_ref, *, B,
                    F, mblk, dtype):
    """Window dot ACCUMULATED into per-window tiles: the output index_map
    sends grid step j to tile w_j; since w is non-decreasing (ids sorted),
    each tile is visited in one contiguous run — zero it on first visit,
    `+=` on revisits, and Pallas flushes it to HBM when w changes. Output
    traffic shrinks from one (2W, F*B) partial PER BLOCK (nm tiles) to one
    per WINDOW (A/WIN tiles), and the XLA tile-scatter disappears."""
    j = pl.program_id(0)
    first = jnp.logical_or(
        j == 0, w_ref[j] != w_ref[jnp.maximum(j - 1, 0)])

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    base = w_ref[j] * WIN
    ia = ids_row_ref[:] // B - base  # (1, m) window-relative one-hot rows
    ib = ids_col_ref[:] % B  # (m, 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (2 * WIN, mblk), 0)
    oh = (rows == ia).astype(dtype)  # (2W, m); rows outside [0, 2W) -> 0
    cols = jax.lax.broadcasted_iota(jnp.int32, (mblk, B), 1)
    oh_b = (ib == cols).astype(dtype)  # (m, B)
    ct = ct_ref[:]
    for f in range(F):
        g = oh_b * ct[:, f:f + 1].astype(dtype)
        out_ref[0, :, f * B:(f + 1) * B] += jnp.dot(
            oh, g, preferred_element_type=jnp.float32)


def _win_kernel_acc_cols(w_ref, ids_row_ref, *rest, B, F, mblk, dtype):
    """_win_kernel_acc with COLUMN operands: ids and the F sorted cotangent
    columns all arrive as (1, m) rows — no (m, 1) id operand and no (m, F)
    ct stack, which on the v5e cost an ~0.8 ms T(1024)->T(8,128) relayout
    EACH per level-pass (profiled round 3). The B-side one-hot is built
    TRANSPOSED, (B, m), directly from the (1, m) row, and contracted with
    dot_general on its m axis — the MXU takes either operand order."""
    ct_refs, out_ref = rest[:-1], rest[-1]
    j = pl.program_id(0)
    first = jnp.logical_or(
        j == 0, w_ref[j] != w_ref[jnp.maximum(j - 1, 0)])

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    base = w_ref[j] * WIN
    ids_row = ids_row_ref[:]  # (1, m)
    ia = ids_row // B - base  # (1, m) window-relative one-hot rows
    rows = jax.lax.broadcasted_iota(jnp.int32, (2 * WIN, mblk), 0)
    oh = (rows == ia).astype(dtype)  # (2W, m); rows outside [0, 2W) -> 0
    ib = ids_row % B  # (1, m)
    colsT = jax.lax.broadcasted_iota(jnp.int32, (B, mblk), 0)
    oh_bt = (ib == colsT).astype(dtype)  # (B, m): one_hot_B, transposed
    for f in range(F):
        gt = oh_bt * ct_refs[f][:].astype(dtype)  # (B, m)
        out_ref[0, :, f * B:(f + 1) * B] += jax.lax.dot_general(
            oh, gt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("T", "F", "mblk", "interpret",
                                             "fmajor", "defer_tail"))
def dtab_sorted_window(ids, ct, T, F, mblk=None, interpret=False,
                       fmajor=False, defer_tail=False):
    """Exact scatter-add equivalent, FLOP-reduced: sort rows by id, evaluate
    each mblk block against the aligned 2*WIN-wide one-hot window covering
    its leading row (one (2W, m) x (m, B*F) dot per block), scatter the
    per-block partials at WIN-tile granularity, and fix any overflow tail
    with a conditional scatter-add.

    fmajor=True: ct arrives FEATURE-MAJOR (F, M) and the gradient returns
    (F, T) — the sort's payload extracts become contiguous row slices
    instead of strided column reads, and the kernel-output unscramble moves
    contiguous B-lane blocks.

    Callers should gate on A = T*F/LANES >= ~16*WIN (below that the dense
    kernel's FLOP surplus is too small to pay for the sort)."""
    import os

    if mblk is None:
        mblk = int(os.environ.get("SPNERF_HASH_SW_MBLK", MBLK))
    B = LANES // F
    A = T // B
    assert T % B == 0 and A % WIN == 0, (T, F)
    M = ids.shape[0]
    pad = (-M) % mblk
    if pad:  # pad with the largest id so sorted order puts them last
        ids = jnp.concatenate(
            [ids, jnp.full((pad,), T - 1, ids.dtype)])
        if fmajor:
            ct = jnp.concatenate([ct, jnp.zeros((F, pad), ct.dtype)], axis=1)
        else:
            ct = jnp.concatenate([ct, jnp.zeros((pad, F), ct.dtype)])
    mp = M + pad
    nm = mp // mblk
    ct = ct.astype(jnp.float32)

    # the payload rides the sort: an argsort + take(perm) variant was
    # measured SLOWER integrated (366 vs 295 ms/step at T=2^19 — the (M, F)
    # row gather is itself row-latency-bound), so the F value columns are
    # carried as sort operands instead
    cols_mode, ct_cols = False, None
    if os.environ.get("SPNERF_HASH_SW_ARGSORT", "0") == "1":
        ids_s, perm = jax.lax.sort(
            (ids.astype(jnp.int32), jnp.arange(mp, dtype=jnp.int32)),
            num_keys=1, is_stable=_sort_stable())
        ct_s = jnp.take(ct.T if fmajor else ct, perm, axis=0)
    elif (os.environ.get("SPNERF_HASH_SW_BF16SORT", "0") == "1"
          and F % 2 == 0):
        # Round ct to bf16 and ride PAIRS of bf16 columns through the sort
        # as bitcast f32 operands — 40% less sort payload traffic (keys 4B
        # + 2*4B vs 4B + F*4B at F=4). The pack/unpack is exact; the only
        # numerics change is the bf16 rounding of ct, the same rounding the
        # XLA matmul fallback applies by default. Measured integrated:
        # 218.9 vs 220.1 ms/step — within noise (the sort is not
        # payload-bandwidth-bound), so this stays opt-in to keep the
        # default gradient f32-exact.
        cm = ct if fmajor else ct.T  # (F, mp)

        def _pack(a, b):  # two f32 rows -> one u32 row of bf16 halves
            ua = jax.lax.bitcast_convert_type(
                a.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
            ub = jax.lax.bitcast_convert_type(
                b.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
            return ua | (ub << 16)

        def _unpack(u):  # u32 row -> two f32 rows
            lo = jax.lax.bitcast_convert_type(
                u.astype(jnp.uint16), jnp.bfloat16)
            hi = jax.lax.bitcast_convert_type(
                (u >> 16).astype(jnp.uint16), jnp.bfloat16)
            return lo.astype(jnp.float32), hi.astype(jnp.float32)

        packed = tuple(_pack(cm[2 * p], cm[2 * p + 1]) for p in range(F // 2))
        ops = jax.lax.sort((ids.astype(jnp.int32),) + packed, num_keys=1,
                           is_stable=_sort_stable())
        ids_s = ops[0]
        cols = []
        for p in range(F // 2):
            cols.extend(_unpack(ops[1 + p]))
        ct_s = jnp.stack(cols, axis=-1)
    else:
        cols = (tuple(ct[j] for j in range(F)) if fmajor
                else tuple(ct[:, j] for j in range(F)))
        ops = jax.lax.sort((ids.astype(jnp.int32),) + cols, num_keys=1,
                           is_stable=_sort_stable())
        ids_s = ops[0]
        # COLS mode (default; SPNERF_HASH_SW_COLS=0 reverts): keep the
        # sorted cotangent as F separate (mp,) columns all the way into the
        # kernel and the tail cond. The (mp, F) stack and the (mp, 1) id
        # operand each cost an ~0.8 ms T(1024)->T(8,128) relayout copy per
        # level-pass on the v5e (21 level-passes/step — profiled round 3);
        # the column kernel needs neither. Measured integrated (full
        # sp-nerf hash step, T=2^19, batch 1024): 179.8 vs 215.0 ms/step
        # (+20% rays/s), numerics BITWISE identical (same per-element f32
        # summation order — only operand marshalling changed).
        ct_cols = ops[1:]
        cols_mode = (os.environ.get("SPNERF_HASH_SW_COLS", "1") == "1"
                     and not defer_tail
                     and os.environ.get("SPNERF_HASH_SW_ACC", "1") == "1")
        ct_s = None if cols_mode else jnp.stack(ct_cols, axis=-1)
    ia = ids_s // B
    w = ia[::mblk] // WIN  # (nm,) leading window index per block
    tail = (ia.reshape(nm, mblk)
            >= (w[:, None] + 2) * WIN).reshape(-1)  # rows the window misses

    row_spec = pl.BlockSpec((1, mblk), lambda j, w_ref: (0, j),
                            memory_space=pltpu.VMEM)
    if cols_mode:
        # ids and every sorted cotangent column ride in as (1, m) rows —
        # no (mp, 1) or (mp, F) operands, hence none of their relayouts
        in_specs = [row_spec] * (1 + F)
        operands = ((w.astype(jnp.int32), ids_s.reshape(1, mp))
                    + tuple(c.reshape(1, mp) for c in ct_cols))
        kern = functools.partial(_win_kernel_acc_cols, B=B, F=F, mblk=mblk,
                                 dtype=jnp.float32)
    else:
        in_specs = [
            row_spec,
            pl.BlockSpec((mblk, 1), lambda j, w_ref: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mblk, F), lambda j, w_ref: (j, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = (w.astype(jnp.int32), ids_s.reshape(1, mp),
                    ids_s.reshape(mp, 1), ct_s)
        kern = functools.partial(_win_kernel_acc, B=B, F=F, mblk=mblk,
                                 dtype=jnp.float32)

    if os.environ.get("SPNERF_HASH_SW_ACC", "1") == "1":
        # accumulate in-kernel into per-WINDOW tiles (w is non-decreasing,
        # so each tile is one contiguous run of grid steps): output traffic
        # drops nm -> A/WIN tiles and the XLA tile-scatter disappears.
        nw = A // WIN
        tiles = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nm,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((1, 2 * WIN, F * B),
                                       lambda j, w_ref: (w_ref[j], 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((nw, 2 * WIN, F * B),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            cost_estimate=pl.CostEstimate(
                flops=2 * mp * 2 * WIN * B * F,
                bytes_accessed=mp * (4 + 4 + 4 * F)
                + nw * 2 * WIN * F * B * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(*operands)
        # tiles NEVER visited by any block keep uninitialized garbage: mask
        # them (the tiny nm-row scatter replaces the removed nm-row
        # tile-scatter, keeping the program's sparse-op count neutral)
        visited = jnp.zeros((nw,), jnp.bool_).at[w].set(True)
        tiles = jnp.where(visited[:, None, None], tiles, 0.0)
        # overlap-add: tile v covers rows [v*WIN, (v+2)*WIN) — half H0 lands
        # at v*WIN, half H1 at (v+1)*WIN; H1 of the last window covers rows
        # >= A which no ia < A ever hits, so it is zero and dropped
        h0 = tiles[:, :WIN]  # (nw, WIN, F*B)
        h1 = tiles[:, WIN:]
        out = h0 + jnp.concatenate(
            [jnp.zeros((1, WIN, F * B), jnp.float32), h1[:-1]])
        out = out.reshape(A, F, B)
    else:
        partials = pl.pallas_call(
            functools.partial(_win_kernel, B=B, F=F, mblk=mblk,
                              dtype=jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nm,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((1, 2 * WIN, F * B),
                                       lambda j, w_ref: (j, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((nm, 2 * WIN, F * B),
                                           jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * mp * 2 * WIN * B * F,
                bytes_accessed=mp * (4 + 4 + 4 * F)
                + nm * 2 * WIN * F * B * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(*operands)

        # tile-granular accumulation: nm scatter rows of (2, WIN, F*B) each
        widx = jnp.stack([w, w + 1], axis=1)  # w+1 can hit A//WIN: pad row
        aw = jnp.zeros((A // WIN + 1, WIN, F * B), jnp.float32)
        aw = aw.at[widx].add(partials.reshape(nm, 2, WIN, F * B))
        out = aw[:A // WIN].reshape(A, F, B)
    if fmajor:  # (F, T): contiguous B-lane blocks move — tile-friendly
        dtab = out.transpose(1, 0, 2).reshape(F, T)
    else:
        dtab = out.transpose(0, 2, 1).reshape(T, F)

    # defer_tail: return the unfixed dtab + the fix ingredients so the
    # CALLER can apply ONE merged conditional across levels/passes — each
    # data-dependent cond costs ~0.6 ms of sequencer sync (below)
    if defer_tail:
        t_ct = jnp.where(tail[:, None], ct_s, 0.0)
        return dtab, jnp.any(tail), ids_s, t_ct
    # SPNERF_HASH_SW_TAIL=0: MEASUREMENT ONLY — drops the exactness
    # fallback to attribute the XLA `conditional` cost in profiles
    if os.environ.get("SPNERF_HASH_SW_TAIL", "1") == "0":
        return dtab
    # The cond returns only the tail DELTA, added outside: routing `dtab`
    # itself through the cond let XLA sink the whole downstream (L, T*F)
    # table-gradient accumulation into the branches, turning three of the
    # per-step conditionals into 168 MB copies (12.6-13.7 ms/step EACH —
    # profiled; skipping the fallback entirely measured 238.6 vs 254.8
    # ms/step integrated). With the delta form the branch result is one
    # (T, F) tile and the add fuses outside.
    def tail_delta(ops):
        ids_s, ct_like, tail = ops
        # cols_mode passes the F sorted columns unstacked so the (mp, F)
        # stack only materializes inside the (rare) taken branch
        ct_full = (jnp.stack(ct_like, axis=-1) if isinstance(ct_like, tuple)
                   else ct_like)
        t_ct = jnp.where(tail[:, None], ct_full, 0.0)
        if fmajor:
            return jnp.zeros((F, T), jnp.float32).at[:, ids_s].add(t_ct.T)
        return jnp.zeros((T, F), jnp.float32).at[ids_s].add(t_ct)

    delta = jax.lax.cond(jnp.any(tail), tail_delta,
                         lambda ops: jnp.zeros(
                             (F, T) if fmajor else (T, F), jnp.float32),
                         (ids_s, tuple(ct_cols) if cols_mode else ct_s, tail))
    # The remaining ~0.6 ms/cond (12.6 ms/step over 21 calls, measured by
    # SPNERF_HASH_SW_TAIL=0: 238.6 vs 251.2 ms/step) is the data-dependent
    # branch itself — the sequencer synchronizes on the predicate — not code
    # motion: adding an optimization_barrier after the cond changed nothing
    # (251.26). That cost is the price of the exactness guarantee.
    return dtab + delta


# ------------------------------------------------- batched (cross-level) form
# REFUTED optimization, kept opt-in (SPNERF_HASH_SW_BATCHED=1) for other
# hardware. Hypothesis: the hash backward issues one dtab per LEVEL per pass
# (21 sorted windows + 3 dense tiles per train step at the default geometry),
# each with its own sort, pallas launch, tile scatter, and tail conditional —
# batching all levels into ONE chain (one batched (L, M) `lax.sort`, one
# (L, nm)-grid pallas call, one (L,)-batched tile scatter, one conditional)
# should cut the dispatch tax the profile showed (31 ms sort, 12.6 ms cond,
# ~60 ms copies around 48.5 ms of window matmuls).
# MEASURED (v5e, L=8, M=524288/level, T=2^19, F=4): per-level-in-one-jit
# 27.7 ms, batched 35.5 ms, flat-offset-into-one-(L*T)-table 50.3 ms — XLA
# already OVERLAPS the L independent per-level chains, so serializing them
# behind one giant sort loses, and integrated it is far worse (412.6 vs
# 272.7 ms/step: the (L, N, 8) id stack + batched-gather copies compound).
# Semantically identical to L independent dtab_sorted_window calls at full
# table size T (pinned by tests/test_pallas.py).


def _win_kernel_b(w_ref, ids_ref, idc_ref, ct_ref, out_ref, *, B, F, mblk,
                  dtype):
    l = pl.program_id(0)
    j = pl.program_id(1)
    base = w_ref[l, j] * WIN
    ia = ids_ref[0] // B - base  # (1, mblk) window-relative one-hot rows
    ib = idc_ref[0] % B  # (mblk, 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (2 * WIN, mblk), 0)
    oh = (rows == ia).astype(dtype)  # (2W, m); rows outside [0, 2W) -> 0
    cols = jax.lax.broadcasted_iota(jnp.int32, (mblk, B), 1)
    oh_b = (ib == cols).astype(dtype)  # (m, B)
    ct = ct_ref[0]  # (mblk, F)
    for f in range(F):
        g = oh_b * ct[:, f:f + 1].astype(dtype)
        out_ref[0, 0, :, f * B:(f + 1) * B] = jnp.dot(
            oh, g, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("T", "F", "mblk", "interpret"))
def dtab_sorted_window_batched(ids, ct, T, F, mblk=None, interpret=False):
    """L independent sorted-window scatter-adds in one dispatch chain:
    (L, M) int32 ids in [0, T), (L, M, F) f32 cotangents -> (L, T, F)."""
    import os

    if mblk is None:
        mblk = int(os.environ.get("SPNERF_HASH_SW_MBLK", MBLK))
    B = LANES // F
    A = T // B
    assert T % B == 0 and A % WIN == 0, (T, F)
    L, M = ids.shape
    pad = (-M) % mblk
    if pad:  # pad with the largest id so sorted order puts them last
        ids = jnp.concatenate(
            [ids, jnp.full((L, pad), T - 1, ids.dtype)], axis=1)
        ct = jnp.concatenate([ct, jnp.zeros((L, pad, F), ct.dtype)], axis=1)
    mp = M + pad
    nm = mp // mblk
    ct = ct.astype(jnp.float32)

    # one batched sort for all levels; payload rides the sort (argsort+take
    # refutation above applies here too)
    ops = jax.lax.sort((ids.astype(jnp.int32),)
                       + tuple(ct[..., j] for j in range(F)), num_keys=1,
                       is_stable=_sort_stable())
    ids_s = ops[0]  # (L, mp)
    ct_s = jnp.stack(ops[1:], axis=-1)  # (L, mp, F)
    ia = ids_s // B
    w = ia[:, ::mblk] // WIN  # (L, nm) leading window index per block
    tail = (ia.reshape(L, nm, mblk)
            >= (w[..., None] + 2) * WIN)  # rows the 2W window misses

    partials = pl.pallas_call(
        functools.partial(_win_kernel_b, B=B, F=F, mblk=mblk,
                          dtype=jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L, nm),
            in_specs=[
                # (L, 1, mp) so the block's last two dims are (1, mblk)
                # against array dims (1, mp) — Mosaic's tiling rule rejects
                # a (1, mblk) block over (L, mp) directly
                pl.BlockSpec((1, 1, mblk), lambda l, j, w_ref: (l, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, mblk, 1), lambda l, j, w_ref: (l, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, mblk, F), lambda l, j, w_ref: (l, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, 2 * WIN, F * B),
                                   lambda l, j, w_ref: (l, j, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((L, nm, 2 * WIN, F * B), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * L * mp * 2 * WIN * B * F,
            bytes_accessed=L * (mp * (4 + 4 + 4 * F)
                                + nm * 2 * WIN * F * B * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(w.astype(jnp.int32), ids_s[:, None, :], ids_s[..., None], ct_s)

    # one batched tile-granular accumulation: (L, nm, 2) rows of (WIN, F*B)
    widx = jnp.stack([w, w + 1], axis=-1)  # w+1 may hit A//WIN: one pad row
    lidx = jnp.arange(L, dtype=jnp.int32)[:, None, None]
    aw = jnp.zeros((L, A // WIN + 1, WIN, F * B), jnp.float32)
    aw = aw.at[lidx, widx].add(partials.reshape(L, nm, 2, WIN, F * B))
    out = aw[:, :A // WIN].reshape(L, A, F, B)
    dtab = out.transpose(0, 1, 3, 2).reshape(L, T, F)

    # delta-form cond (see dtab_sorted_window): keep dtab and its consumers
    # out of the branches so XLA cannot sink the table-gradient
    # accumulation into the conditional
    def tail_delta(ops):
        ids_s, ct_s, tail = ops
        t_ct = jnp.where(tail.reshape(L, mp)[..., None], ct_s, 0.0)
        flat_ids = (jnp.arange(L, dtype=jnp.int32)[:, None] * T
                    + ids_s).reshape(-1)
        fix = jnp.zeros((L * T, F), jnp.float32).at[flat_ids].add(
            t_ct.reshape(-1, F))
        return fix.reshape(L, T, F)

    delta = jax.lax.cond(jnp.any(tail), tail_delta,
                         lambda ops: jnp.zeros((L, T, F), jnp.float32),
                         (ids_s, ct_s, tail))
    return dtab + delta
