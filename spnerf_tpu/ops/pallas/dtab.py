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


@functools.partial(jax.jit, static_argnames=("T", "F", "f32", "interpret"))
def dtab_pallas(ids, ct, T, F, f32=False, interpret=False):
    """Scatter-add equivalent on the MXU: (M,) int32 ids in [0, T), (M, F)
    f32 cotangent rows -> (T, F) f32 table gradient.

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
        ct = jnp.concatenate([ct, jnp.zeros((pad, F), ct.dtype)])
    mp = M + pad
    ids = ids.astype(jnp.int32)
    ct = ct.astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, B=B, F=F, ta=ta, dtype=dtype),
        grid=(A // ta, mp // MBLK),
        in_specs=[
            pl.BlockSpec((1, MBLK), lambda i, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MBLK, 1), lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MBLK, F), lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
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
    )(ids.reshape(1, mp), ids.reshape(mp, 1), ct)
    # out[a, f*B + b] = dtab[a*B + b, f]
    return out.reshape(A, F, B).transpose(0, 2, 1).reshape(T, F)
