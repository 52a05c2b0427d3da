"""Training-path fused Siren trunk: forward AND backward as Pallas kernels.

The flagship step's remaining cost is HBM traffic of the trunk's inter-layer
activations (forward writes + backward reads). This module fuses the 8-layer
Siren trunk into:

  * a forward kernel producing only `shared` (the trunk output) — no
    intermediate activation ever reaches HBM;
  * a backward kernel that, per point-tile, RECOMPUTES the forward in VMEM and
    backpropagates, accumulating dW/db across grid steps in VMEM-resident
    output blocks (constant index_map => the accumulators stay on-chip and are
    written back once at the end).

Exposed as `trunk_fused(x_in, ws, bs, cfg)` with a jax.custom_vjp, so
`jax.grad` through the whole training loss works transparently. Heads remain
XLA ops (they are a small fraction of the traffic and fuse well).

Numerics match the flax trunk: bf16 matmuls with f32 accumulation, f32
bias/activation, fast_sin activation (models/spnerf.py).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.spnerf import fast_sin

import os as _os

TILE_FWD = int(_os.environ.get("SPNERF_TILE_FWD", 512))
# bwd holds dW accumulators + recomputed activations + activation-derivative
# factors in VMEM. Measured on the v5e flagship trunk (fwd+bwd, N=262144):
# TILE 128 -> 32.6 ms, 256 -> 30.5 ms, 512 -> 29.3 ms (XLA: 36.6 ms).
TILE_BWD = int(_os.environ.get("SPNERF_TILE_BWD", 512))


def _fast_cos(x):
    return fast_sin(x + 0.5 * np.pi)


def _trunk_config(cfg):
    """(n_layers, skip, w0s): first layer uses w0=30 (sine_init convention)."""
    n = cfg.fc_layers
    skip = cfg.skips[0] if cfg.skips else None
    w0s = [30.0] + [1.0] * (n - 1)
    return n, skip, w0s


# ----------------------------------------------------------------- forward
def _fwd_kernel(cfg, compute_dtype):
    n, skip, w0s = _trunk_config(cfg)

    def kernel(x_ref, *refs):
        ws = refs[:n]
        bs = refs[n: 2 * n]
        out_ref = refs[2 * n]
        cd = compute_dtype
        x_in = x_ref[:].astype(jnp.float32)
        h = x_in
        for i in range(n):
            if skip is not None and i == skip:
                h = jnp.concatenate([h, x_in], axis=-1)
            pre = jnp.dot(h.astype(cd), ws[i][:],
                          preferred_element_type=jnp.float32) + bs[i][:]
            h = fast_sin(w0s[i] * pre)
        out_ref[:] = h

    return kernel


# ---------------------------------------------------------------- backward
def _bwd_kernel(cfg, compute_dtype):
    n, skip, w0s = _trunk_config(cfg)

    def kernel(x_ref, dy_ref, *refs):
        # pallas passes input refs first, then output refs
        ws = refs[:n]
        bs = refs[n: 2 * n]
        dws = refs[2 * n: 3 * n]
        dbs = refs[3 * n: 4 * n]
        dx_ref = refs[4 * n]
        cd = compute_dtype
        is_first = pl.program_id(0) == 0

        @pl.when(is_first)
        def _():
            for i in range(n):
                dws[i][:] = jnp.zeros_like(dws[i])
                dbs[i][:] = jnp.zeros_like(dbs[i])

        x_in = x_ref[:].astype(jnp.float32)

        # recompute forward once, keeping each layer's INPUT h_i (bf16, matmul
        # operand only) and its activation-derivative factor
        # g_i = w0 * cos(w0 * pre) in VMEM. Recomputing `pre` again in the
        # backward loop would cost a third full matmul sweep (4x fwd FLOPs
        # instead of the 3x floor for a recompute backward).
        hs, gs = [], []
        h = x_in
        for i in range(n):
            if skip is not None and i == skip:
                h = jnp.concatenate([h, x_in], axis=-1)
            hs.append(h.astype(cd))
            pre = jnp.dot(h.astype(cd), ws[i][:],
                          preferred_element_type=jnp.float32) + bs[i][:]
            gs.append(w0s[i] * _fast_cos(w0s[i] * pre))
            h = fast_sin(w0s[i] * pre)

        # backward. dW and dh are expressed as dot_general contractions over
        # the existing layouts (TN and NT matmuls) — an explicit .T on a
        # 512x512 block would materialize a transposed copy in VMEM on every
        # grid step, which the MXU does not need.
        dh = dy_ref[:].astype(jnp.float32)
        dx = jnp.zeros_like(x_in)
        for i in reversed(range(n)):
            h_i = hs[i]
            dpre = dh * gs[i]
            # dW[i] = h_i^T @ dpre: contract the point dim of both operands
            dws[i][:] += jax.lax.dot_general(
                h_i, dpre.astype(cd),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dbs[i][:] += jnp.sum(dpre, axis=0, keepdims=True)
            # dh = dpre @ W^T: contract the output-feature dim of both
            dh = jax.lax.dot_general(
                dpre.astype(cd), ws[i][:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if skip is not None and i == skip:
                dx = dx + dh[:, -x_in.shape[-1]:]
                dh = dh[:, : -x_in.shape[-1]]
        dx_ref[:] = dx + dh  # dh here is d(x_in) through layer 0

    return kernel


def _pad_points(x, n_pad):
    pad = n_pad - x.shape[0]
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)
    return x


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype_name",
                                             "interpret"))
def _trunk_fwd_impl(x_in, ws, bs, cfg, compute_dtype_name, interpret):
    cd = jnp.dtype(compute_dtype_name)
    n_out = cfg.fc_units
    npts = x_in.shape[0]
    n_pad = -(-npts // TILE_FWD) * TILE_FWD
    x = _pad_points(x_in, n_pad)
    ws = tuple(w.astype(cd) for w in ws)  # weights live in VMEM in bf16
    point = lambda d: pl.BlockSpec((TILE_FWD, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    full = lambda s: pl.BlockSpec(s, lambda i: tuple(0 for _ in s),
                                  memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _fwd_kernel(cfg, cd),
        grid=(n_pad // TILE_FWD,),
        in_specs=[point(x.shape[-1])] + [full(w.shape) for w in ws]
        + [full(b.shape) for b in bs],
        out_specs=point(n_out),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_out), jnp.float32),
        interpret=interpret,
    )(x, *ws, *bs)
    return out[:npts]


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype_name",
                                             "interpret"))
def _trunk_bwd_impl(x_in, dy, ws, bs, cfg, compute_dtype_name, interpret):
    cd = jnp.dtype(compute_dtype_name)
    npts = x_in.shape[0]
    n_pad = -(-npts // TILE_BWD) * TILE_BWD
    x = _pad_points(x_in, n_pad)
    g = _pad_points(dy, n_pad)
    ws = tuple(w.astype(cd) for w in ws)
    point = lambda d: pl.BlockSpec((TILE_BWD, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    full = lambda s: pl.BlockSpec(s, lambda i: tuple(0 for _ in s),
                                  memory_space=pltpu.VMEM)

    dW_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
    db_shapes = [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs]
    outs = pl.pallas_call(
        _bwd_kernel(cfg, cd),
        grid=(n_pad // TILE_BWD,),
        in_specs=[point(x.shape[-1]), point(dy.shape[-1])]
        + [full(w.shape) for w in ws] + [full(b.shape) for b in bs],
        out_specs=[full(w.shape) for w in ws] + [full(b.shape) for b in bs]
        + [point(x.shape[-1])],
        out_shape=dW_shapes + db_shapes
        + [jax.ShapeDtypeStruct((n_pad, x.shape[-1]), jnp.float32)],
        interpret=interpret,
        # dW accumulators (~8 MB f32) + weights + per-tile activations exceed
        # the default 16 MB scoped-vmem budget at TILE_BWD >= 512; the chip
        # has headroom, so raise the per-kernel limit instead of shrinking
        # the tile (TILE 512 measured 29.3 ms vs 32.6 ms at TILE 128)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x, g, *ws, *bs)
    n = len(ws)
    dws = list(outs[:n])
    dbs = list(outs[n: 2 * n])
    dx = outs[2 * n][:npts]
    return dws, dbs, dx


# ------------------------------------------------------------- custom vjp
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def trunk_fused(x_in, ws, bs, cfg, compute_dtype_name="bfloat16",
                interpret=False):
    """Fused Siren trunk: x_in (N, D) -> shared (N, fc_units).

    ws/bs: tuples of trunk weights/biases in layer order (biases (1, F))."""
    return _trunk_fwd_impl(x_in, tuple(ws), tuple(bs), cfg,
                           compute_dtype_name, interpret)


def _vjp_fwd(x_in, ws, bs, cfg, compute_dtype_name, interpret):
    y = _trunk_fwd_impl(x_in, tuple(ws), tuple(bs), cfg, compute_dtype_name,
                        interpret)
    return y, (x_in, tuple(ws), tuple(bs))


def _vjp_bwd(cfg, compute_dtype_name, interpret, res, dy):
    x_in, ws, bs = res
    dws, dbs, dx = _trunk_bwd_impl(x_in, dy, ws, bs, cfg, compute_dtype_name,
                                   interpret)
    return dx, tuple(dws), tuple(dbs)


trunk_fused.defvjp(_vjp_fwd, _vjp_bwd)


# ----------------------------------------------------- field_apply factory
def make_fused_train_field(cfg, compute_dtype_name="bfloat16", interpret=False):
    """Returns field_apply(params, xyz, sun_d, t_emb, sem_labels) evaluating
    the SPNeRF field with the fused trunk and XLA heads, differentiable w.r.t.
    all params. Param layout = flax SPNeRF params (pack_params naming)."""
    from .field_eval import _positional_mapping, pack_params

    n_trunk = cfg.fc_layers
    cd = jnp.dtype(compute_dtype_name)

    def apply(params, xyz, sun_d, t_emb=None, sem_labels=None, heads=None):
        if heads is None:
            heads = ("rgb", "sun", "sky", "sem")
        names, ws, bs, sem_table = pack_params(params, cfg)
        trunk_ws = tuple(ws[:n_trunk])
        trunk_bs = tuple(bs[:n_trunk])
        head = {n: (ws[i], bs[i]) for i, n in enumerate(names)}

        if cfg.mapping:
            x_in = _positional_mapping(xyz.astype(jnp.float32),
                                       cfg.mapping_sizes[0])
        else:
            x_in = xyz.astype(jnp.float32)
        if cfg.sem:
            labels = jnp.where(sem_labels < 0, cfg.num_sem_classes,
                               sem_labels).astype(jnp.int32)
            emb = jnp.take(sem_table, labels, axis=0)
            x_in = jnp.concatenate([x_in, emb.astype(x_in.dtype)], axis=-1)

        shared = trunk_fused(x_in, trunk_ws, trunk_bs, cfg,
                             compute_dtype_name, interpret)

        def dense(name, x):
            w, b = head[name]
            return jnp.dot(x.astype(cd), w.astype(cd),
                           preferred_element_type=jnp.float32) + b

        sun = sun_d.astype(jnp.float32)
        out = {"sigma": jax.nn.softplus(dense("sigma", shared))[..., 0]}
        feats = None
        if {"rgb", "sun"} & set(heads):
            feats = dense("feats", shared)
        if "rgb" in heads:
            r = fast_sin(dense("rgb0", feats))
            out["rgb"] = jax.nn.sigmoid(dense("rgb1", r)) * 1.002 - 0.001
        if "sun" in heads:
            s = jnp.concatenate([feats, sun], axis=-1)
            s = fast_sin(dense("sun0", s))
            s = fast_sin(dense("sun1", s))
            s = fast_sin(dense("sun2", s))
            out["sun_v"] = jax.nn.sigmoid(dense("sun3", s))
        if "sky" in heads:
            k = jax.nn.relu(dense("sky0", sun))
            out["sky"] = jax.nn.sigmoid(dense("sky1", k))
        if cfg.sem and "sem" in heads:
            g = fast_sin(dense("sem0", shared))
            out["sem_logits"] = dense("sem1", g)
        return out

    return apply
