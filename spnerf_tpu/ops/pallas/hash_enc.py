"""Restructured multiresolution hash-grid lookup (custom VJP, XLA ops).

Why not a Pallas kernel: the Instant-NGP lookup is a (T, F)-table gather by
arbitrary per-point indices, and Mosaic's gather support (jax 0.8 toolchain)
only covers `take_along_axis`-style gathers whose index shape EQUALS the
operand shape (tpu.dynamic_gather; jax/_src/pallas/mosaic/lowering.py,
_gather_lowering_rule) — a table lookup cannot lower, and a scatter-add (the
backward) has no Mosaic formulation at all. Measured on the v5e (round 2):
the XLA forward gather is cheap (~7.6 ms per 1M index rows on a 2^19 x 2
table) while the XLA backward scatter-add dominates (~86 ms per 1M rows at
T=2^19, ~20 ms at T=2^15) — the hash config is SCATTER-bound, not
gather-bound.

This module therefore restructures the autodiff graph instead:

  * forward: the same per-level gathers as models/hashgrid.py (one `jnp.take`
    per level; a single fused all-level gather measured SLOWER round 1);
  * backward: ONE batched scatter-add of all (level, point, corner)
    contributions into the flattened (L*T, F) table, instead of the L
    separate zeros+scatter+adds XLA's take-VJP emits, and with
    `unique_indices=False, indices_are_sorted=False` semantics identical to
    the autodiff path;
  * dx01 is exact (needed for completeness; DCE'd in training where sample
    positions carry no gradient — z_vals are stop-gradient'd in
    ops/render.py).

Encoding math matches models/hashgrid.py exactly (same primes, xor hash,
corner ordering, trilinear weights); parity pinned by tests/test_hashgrid.py.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint32)
_CORNERS = np.array(
    [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
    dtype=np.uint32,
)  # (8, 3)


def _corner_data(x01, resolutions, table_size):
    """(idx, w) per level: idx (L, N, 8) int32 table rows, w (L, N, 8) f32
    trilinear weights. Same math as models/hashgrid.py."""
    idxs, ws = [], []
    for res in resolutions:
        xs = x01 * float(res)
        # cell clamped to res-1, frac up to 1.0 on the +1 faces — matches
        # models/hashgrid.py (boundary-aliasing fix; see the comment there)
        x0 = jnp.minimum(jnp.floor(xs), float(res - 1))
        frac = xs - x0
        base = x0.astype(jnp.uint32)
        cc = base[:, None, :] + _CORNERS[None]  # (N, 8, 3)
        h = cc * _PRIMES
        idx = ((h[..., 0] ^ h[..., 1] ^ h[..., 2])
               % jnp.uint32(table_size)).astype(jnp.int32)
        cf = _CORNERS.astype(np.float32)  # (8, 3)
        w = jnp.prod(cf[None] * frac[:, None, :]
                     + (1.0 - cf[None]) * (1.0 - frac[:, None, :]), axis=-1)
        idxs.append(idx)
        ws.append(w)
    return jnp.stack(idxs), jnp.stack(ws)


@functools.partial(jax.jit, static_argnames=("resolutions",))
def _hash_encode_fwd_impl(x01, table, resolutions):
    n_levels, table_size, n_feat = table.shape
    n = x01.shape[0]
    x01 = x01.astype(jnp.float32)
    feats = []
    for li, res in enumerate(resolutions):
        xs = x01 * float(res)
        x0 = jnp.minimum(jnp.floor(xs), float(res - 1))  # see _corner_data
        frac = xs - x0
        base = x0.astype(jnp.uint32)
        cc = base[:, None, :] + _CORNERS[None]
        h = cc * _PRIMES
        idx = ((h[..., 0] ^ h[..., 1] ^ h[..., 2])
               % jnp.uint32(table_size)).astype(jnp.int32)  # (N, 8)
        vals = jnp.take(table[li], idx.reshape(-1), axis=0).reshape(
            n, 8, n_feat)
        cf = _CORNERS.astype(np.float32)
        w = jnp.prod(cf[None] * frac[:, None, :]
                     + (1.0 - cf[None]) * (1.0 - frac[:, None, :]), axis=-1)
        feats.append(jnp.sum(w[..., None] * vals, axis=1))
    return jnp.concatenate(feats, axis=-1)  # (N, L*F)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_encode(x01, table, resolutions):
    """Hash encoding with a restructured backward.

    x01: (N, 3) float32 in [0, 1]; table: (L, T, F) float32;
    resolutions: static tuple of L ints. Returns (N, L*F) float32."""
    return _hash_encode_fwd_impl(x01, table, tuple(resolutions))


def _vjp_fwd(x01, table, resolutions):
    y = _hash_encode_fwd_impl(x01, table, tuple(resolutions))
    return y, (x01, table)


def _vjp_bwd(resolutions, res, g):
    x01, table = res
    n_levels, table_size, n_feat = table.shape
    n = x01.shape[0]
    x01 = x01.astype(jnp.float32)
    gf = g.reshape(n, n_levels, n_feat)  # (N, L, F)
    idx, w = _corner_data(x01, resolutions, table_size)  # (L, N, 8)

    # ONE flat scatter-add over every (level, point, corner) contribution
    upd = w[..., None] * jnp.moveaxis(gf, 1, 0)[:, :, None, :]  # (L, N, 8, F)
    offsets = (jnp.arange(n_levels, dtype=jnp.int32)
               * jnp.int32(table_size))[:, None, None]
    flat_idx = (idx + offsets).reshape(-1)  # (L*N*8,)
    dtable = (jnp.zeros((n_levels * table_size, n_feat), table.dtype)
              .at[flat_idx].add(upd.reshape(-1, n_feat))
              .reshape(n_levels, table_size, n_feat))

    # dx01: exact; DCE'd whenever positions carry no gradient (training)
    vals = jnp.stack(
        [jnp.take(table[l], idx[l].reshape(-1), axis=0).reshape(n, 8, n_feat)
         for l in range(n_levels)])  # (L, N, 8, F)
    corners = _CORNERS.astype(np.float32)  # (8, 3)
    dx = jnp.zeros_like(x01)
    for li, r in enumerate(resolutions):
        xs = x01 * float(r)
        frac = xs - jnp.minimum(jnp.floor(xs), float(r - 1))  # (N, 3)
        gv = jnp.sum(vals[li] * gf[:, li][:, None, :], axis=-1)  # (N, 8)
        for d in range(3):
            others = [o for o in range(3) if o != d]
            wo = jnp.prod(jnp.stack(
                [corners[None, :, o] * frac[:, None, o]
                 + (1.0 - corners[None, :, o]) * (1.0 - frac[:, None, o])
                 for o in others]), axis=0)  # (N, 8)
            dwdf = jnp.where(corners[None, :, d] > 0, 1.0, -1.0) * wo
            dx = dx.at[:, d].add(jnp.sum(gv * dwdf, axis=1) * float(r))
    return dx.astype(res[0].dtype), dtable


hash_encode.defvjp(_vjp_fwd, _vjp_bwd)
