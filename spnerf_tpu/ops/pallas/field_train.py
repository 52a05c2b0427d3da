"""Training-path fused SPNeRF FIELD: forward and backward as Pallas kernels.

Round-1/2 measurements showed the flagship step is bandwidth-bound on the
(N, 512) trunk activations, and that fusing only the trunk
(ops/pallas/trunk_train.py) LOSES integrated (67.4 ms vs 51.4 ms XLA) despite
winning its standalone microbench: the (N, 512) `shared` / `dy` tensors at the
kernel boundary re-introduce the traffic the kernel saves, and XLA loses the
head-epilogue fusion it had around the trunk matmuls.

This module fuses the ENTIRE field — Siren trunk AND every head (sigma, feats,
albedo rgb, sun visibility, sky, optional beta, semantic logits) — into one
custom-VJP pair:

  * forward: ops/pallas/field_eval.py's kernel (the whole field per point
    tile, activations never leave VMEM; only x_in and the small per-point head
    outputs touch HBM);
  * backward: per point-tile, RECOMPUTE the field forward in VMEM, then
    backpropagate the incoming head cotangents through heads and trunk,
    accumulating every layer's dW/db in VMEM-resident output blocks (constant
    index_map => written back to HBM once, after the last tile).

HBM traffic per pass: x_in (N, ~72 f32) + head outputs/cotangents (N, ~11)
+ the parameters — instead of XLA's per-layer (N, 512) activation saves.
FLOP cost: 4x the forward (vs 3x for a store-activations backward); the step
is bandwidth-bound, so trading FLOPs for HBM bytes is the right direction on
this hardware (measured: the trunk-only version of this tradeoff ran at
150 TFLOP/s, 76% MFU, on the v5e).

Reference semantics being differentiated: /root/reference/models/spnerf.py
:162-369 (the field) under the training losses of main.py:141-187.
"""

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.spnerf import fast_sin
from .field_eval import (
    _active_outputs,
    _make_kernel,
    _positional_mapping,
    pack_params,
)

TILE_FWD = int(_os.environ.get("SPNERF_FT_TILE_FWD", 512))
TILE_BWD = int(_os.environ.get("SPNERF_FT_TILE_BWD", 512))


def _fast_cos(x):
    return fast_sin(x + 0.5 * np.pi)


def _layer_names(cfg, n_trunk):
    names = [f"trunk{k}" for k in range(n_trunk)]
    names += ["sigma", "feats", "rgb0", "rgb1", "sun0", "sun1", "sun2", "sun3",
              "sky0", "sky1"]
    if cfg.beta:
        names += ["beta0", "beta1"]
    if cfg.sem:
        names += ["sem0", "sem1"]
    return names


# ------------------------------------------------------------------ backward
def _make_bwd_kernel(cfg, names, compute_dtype, heads):
    """Backward kernel: recompute the forward per tile, backprop, accumulate
    dW/db for every layer in VMEM across grid steps.

    Ref order: x_in, sun, [t], ct_<out> for each active output, then w/b
    interleaved per layer; outputs: dW/db interleaved per layer, dx, dsun,
    [dt]."""
    n_trunk = cfg.fc_layers
    skip = cfg.skips[0] if cfg.skips else None
    name_pos = {n: i for i, n in enumerate(names)}
    outputs = _active_outputs(cfg, heads)
    out_names = [nm for nm, _ in outputs]
    has_t = bool(cfg.beta)

    want_rgb = "rgb" in out_names
    want_sun = "sun_v" in out_names
    want_sky = "sky" in out_names
    want_beta = "beta" in out_names
    want_sem = "sem_logits" in out_names
    want_feats = want_rgb or want_sun or want_beta

    def kernel(xin_ref, sun_ref, *refs):
        refs = list(refs)
        t_ref = refs.pop(0) if has_t else None
        cts = {nm: refs.pop(0) for nm in out_names}
        w = {n: refs[2 * name_pos[n]] for n in names}
        b = {n: refs[2 * name_pos[n] + 1] for n in names}
        n_wb = 2 * len(names)
        dw = {n: refs[n_wb + 2 * name_pos[n]] for n in names}
        db = {n: refs[n_wb + 2 * name_pos[n] + 1] for n in names}
        dx_ref = refs[n_wb + 2 * len(names)]
        dsun_ref = refs[n_wb + 2 * len(names) + 1]
        dt_ref = refs[n_wb + 2 * len(names) + 2] if has_t else None
        cd = compute_dtype

        @pl.when(pl.program_id(0) == 0)
        def _():
            for n in names:
                dw[n][:] = jnp.zeros_like(dw[n])
                db[n][:] = jnp.zeros_like(db[n])

        def pre(name, x):
            # matmul operands in compute dtype, f32 accumulate + f32 bias —
            # identical numerics policy to the forward kernel (field_eval)
            return jnp.dot(x.astype(cd), w[name][:].astype(cd),
                           preferred_element_type=jnp.float32) + b[name][:]

        def wgrad(name, x, dpre):
            # dW = x^T @ dpre as a TN dot_general (no transposed copy in VMEM)
            dw[name][:] += jax.lax.dot_general(
                x.astype(cd), dpre.astype(cd),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            db[name][:] += jnp.sum(dpre, axis=0, keepdims=True)

        def dgrad(name, dpre):
            # dx = dpre @ W^T as an NT dot_general
            return jax.lax.dot_general(
                dpre.astype(cd), w[name][:].astype(cd),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        # ---------------- forward recompute, stashing per-tile intermediates
        # matmul OPERANDS are stashed in compute dtype (VMEM halves vs f32;
        # they are cast to cd at the MXU anyway); activation-DERIVATIVE
        # factors and all gradient accumulators stay f32
        x_in = xin_ref[:].astype(jnp.float32)
        sun = sun_ref[:].astype(jnp.float32)

        hs, gs = [], []  # trunk layer inputs (cd) and activation derivatives
        h = x_in
        for i in range(n_trunk):
            if skip is not None and i == skip:
                h = jnp.concatenate([h, x_in], axis=-1)
            hs.append(h.astype(cd))
            p = pre(f"trunk{i}", h)
            w0 = 30.0 if i == 0 else 1.0
            gs.append(w0 * _fast_cos(w0 * p))
            h = fast_sin(w0 * p)
        shared = h
        shared_cd = shared.astype(cd)

        sig_sigma = jax.nn.sigmoid(pre("sigma", shared))  # softplus'

        feats = pre("feats", shared) if want_feats else None
        feats_cd = feats.astype(cd) if want_feats else None

        if want_rgb:
            p_r0 = pre("rgb0", feats)
            g_r0 = _fast_cos(p_r0)
            r0 = fast_sin(p_r0).astype(cd)
            s_r1 = jax.nn.sigmoid(pre("rgb1", r0))
        if want_sun:
            s0_in = jnp.concatenate([feats_cd, sun.astype(cd)], axis=-1)
            p_s0 = pre("sun0", s0_in)
            g_s0 = _fast_cos(p_s0)
            a_s0 = fast_sin(p_s0).astype(cd)
            p_s1 = pre("sun1", a_s0)
            g_s1 = _fast_cos(p_s1)
            a_s1 = fast_sin(p_s1).astype(cd)
            p_s2 = pre("sun2", a_s1)
            g_s2 = _fast_cos(p_s2)
            a_s2 = fast_sin(p_s2).astype(cd)
            s_s3 = jax.nn.sigmoid(pre("sun3", a_s2))
        if want_sky:
            p_k0 = pre("sky0", sun)
            a_k0 = jax.nn.relu(p_k0).astype(cd)
            s_k1 = jax.nn.sigmoid(pre("sky1", a_k0))
        if want_beta:
            t_in = t_ref[:].astype(jnp.float32)
            b_in = jnp.concatenate([feats_cd, t_in.astype(cd)], axis=-1)
            p_b0 = pre("beta0", b_in)
            g_b0 = _fast_cos(p_b0)
            a_b0 = fast_sin(p_b0).astype(cd)
            sig_b1 = jax.nn.sigmoid(pre("beta1", a_b0))
        if want_sem:
            p_m0 = pre("sem0", shared)
            g_m0 = _fast_cos(p_m0)
            a_m0 = fast_sin(p_m0).astype(cd)

        # ---------------------------------------------------- head backward
        dshared = jnp.zeros(shared.shape, jnp.float32)
        dfeats = jnp.zeros(feats.shape, jnp.float32) if want_feats else None
        dsun = jnp.zeros_like(sun)

        # sigma = softplus(pre)
        dp_sigma = cts["sigma"][:].astype(jnp.float32) * sig_sigma
        wgrad("sigma", shared_cd, dp_sigma)
        dshared += dgrad("sigma", dp_sigma)

        if want_rgb:
            # rgb = sigmoid(pre) * 1.002 - 0.001
            dp_r1 = (cts["rgb"][:].astype(jnp.float32) * 1.002
                     * s_r1 * (1.0 - s_r1))
            wgrad("rgb1", r0, dp_r1)
            dp_r0 = dgrad("rgb1", dp_r1) * g_r0
            wgrad("rgb0", feats_cd, dp_r0)
            dfeats += dgrad("rgb0", dp_r0)

        if want_sun:
            dp_s3 = (cts["sun_v"][:].astype(jnp.float32)
                     * s_s3 * (1.0 - s_s3))
            wgrad("sun3", a_s2, dp_s3)
            dp_s2 = dgrad("sun3", dp_s3) * g_s2
            wgrad("sun2", a_s1, dp_s2)
            dp_s1 = dgrad("sun2", dp_s2) * g_s1
            wgrad("sun1", a_s0, dp_s1)
            dp_s0 = dgrad("sun1", dp_s1) * g_s0
            wgrad("sun0", s0_in, dp_s0)
            ds0 = dgrad("sun0", dp_s0)
            dfeats += ds0[:, : feats.shape[-1]]
            dsun += ds0[:, feats.shape[-1]:]

        if want_sky:
            dp_k1 = cts["sky"][:].astype(jnp.float32) * s_k1 * (1.0 - s_k1)
            wgrad("sky1", a_k0, dp_k1)
            dp_k0 = dgrad("sky1", dp_k1) * (p_k0 > 0.0).astype(jnp.float32)
            wgrad("sky0", sun, dp_k0)
            dsun += dgrad("sky0", dp_k0)

        if want_beta:
            dp_b1 = cts["beta"][:].astype(jnp.float32) * sig_b1
            wgrad("beta1", a_b0, dp_b1)
            dp_b0 = dgrad("beta1", dp_b1) * g_b0
            wgrad("beta0", b_in, dp_b0)
            db_in = dgrad("beta0", dp_b0)
            dfeats += db_in[:, : feats.shape[-1]]
            dt_ref[:] = db_in[:, feats.shape[-1]:]
        elif has_t:
            dt_ref[:] = jnp.zeros_like(dt_ref)

        if want_sem:
            dp_m1 = cts["sem_logits"][:].astype(jnp.float32)
            wgrad("sem1", a_m0, dp_m1)
            dp_m0 = dgrad("sem1", dp_m1) * g_m0
            wgrad("sem0", shared_cd, dp_m0)
            dshared += dgrad("sem0", dp_m0)

        if want_feats:
            # feats has no activation: dpre == dfeats
            wgrad("feats", shared_cd, dfeats)
            dshared += dgrad("feats", dfeats)

        # --------------------------------------------------- trunk backward
        dh = dshared
        dx = jnp.zeros_like(x_in)
        for i in reversed(range(n_trunk)):
            dpre = dh * gs[i]
            wgrad(f"trunk{i}", hs[i], dpre)
            dh = dgrad(f"trunk{i}", dpre)
            if skip is not None and i == skip:
                dx += dh[:, -x_in.shape[-1]:]
                dh = dh[:, : -x_in.shape[-1]]
        dx_ref[:] = dx + dh
        dsun_ref[:] = dsun

    return kernel


# ---------------------------------------------------------------- impl calls
def _pad_rows(x, n_pad):
    pad = n_pad - x.shape[0]
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)
    return x


def _point_spec(tile, d):
    return pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("cfg", "names",
                                             "compute_dtype_name", "heads",
                                             "interpret"))
def _fwd_impl(x_in, sun, extras, ws, bs, cfg, names, compute_dtype_name,
              heads, interpret):
    cd = jnp.dtype(compute_dtype_name)
    n = x_in.shape[0]
    n_pad = -(-n // TILE_FWD) * TILE_FWD
    x = _pad_rows(x_in, n_pad)
    s = _pad_rows(sun, n_pad)
    extras = tuple(_pad_rows(e, n_pad) for e in extras)

    outputs = _active_outputs(cfg, heads)
    # weights enter VMEM in compute dtype (halves their VMEM + HBM traffic;
    # the kernels cast per-use anyway); biases stay f32 for the f32 bias add
    weight_args, weight_specs = [], []
    for wk, bk in zip(ws, bs):
        weight_args += [wk.astype(cd), bk]
        weight_specs += [_full_spec(wk.shape), _full_spec(bk.shape)]

    outs = pl.pallas_call(
        _make_kernel(cfg, names, cd, heads),
        grid=(n_pad // TILE_FWD,),
        in_specs=[_point_spec(TILE_FWD, x.shape[-1]), _point_spec(TILE_FWD, 3)]
        + [_point_spec(TILE_FWD, e.shape[-1]) for e in extras]
        + weight_specs,
        out_specs=[_point_spec(TILE_FWD, width) for _, width in outputs],
        out_shape=[jax.ShapeDtypeStruct((n_pad, width), jnp.float32)
                   for _, width in outputs],
        interpret=interpret,
    )(x, s, *extras, *weight_args)
    return {nm: o[:n] for (nm, _), o in zip(outputs, outs)}


@functools.partial(jax.jit, static_argnames=("cfg", "names",
                                             "compute_dtype_name", "heads",
                                             "interpret"))
def _bwd_impl(x_in, sun, extras, ws, bs, cts, cfg, names, compute_dtype_name,
              heads, interpret):
    cd = jnp.dtype(compute_dtype_name)
    n = x_in.shape[0]
    n_pad = -(-n // TILE_BWD) * TILE_BWD
    x = _pad_rows(x_in, n_pad)
    s = _pad_rows(sun, n_pad)
    extras = tuple(_pad_rows(e, n_pad) for e in extras)
    outputs = _active_outputs(cfg, heads)
    ct_args = [_pad_rows(cts[nm].astype(jnp.float32), n_pad)
               for nm, _ in outputs]

    # weights enter VMEM in compute dtype (halves their VMEM + HBM traffic;
    # the kernels cast per-use anyway); biases stay f32 for the f32 bias add
    weight_args, weight_specs = [], []
    for wk, bk in zip(ws, bs):
        weight_args += [wk.astype(cd), bk]
        weight_specs += [_full_spec(wk.shape), _full_spec(bk.shape)]

    out_specs, out_shapes = [], []
    for wk, bk in zip(ws, bs):
        out_specs += [_full_spec(wk.shape), _full_spec(bk.shape)]
        out_shapes += [jax.ShapeDtypeStruct(wk.shape, jnp.float32),
                       jax.ShapeDtypeStruct(bk.shape, jnp.float32)]
    out_specs += [_point_spec(TILE_BWD, x.shape[-1]), _point_spec(TILE_BWD, 3)]
    out_shapes += [jax.ShapeDtypeStruct((n_pad, x.shape[-1]), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, 3), jnp.float32)]
    for e in extras:
        out_specs.append(_point_spec(TILE_BWD, e.shape[-1]))
        out_shapes.append(jax.ShapeDtypeStruct((n_pad, e.shape[-1]),
                                               jnp.float32))

    outs = pl.pallas_call(
        _make_bwd_kernel(cfg, names, cd, heads),
        grid=(n_pad // TILE_BWD,),
        in_specs=[_point_spec(TILE_BWD, x.shape[-1]), _point_spec(TILE_BWD, 3)]
        + [_point_spec(TILE_BWD, e.shape[-1]) for e in extras]
        + [_point_spec(TILE_BWD, c.shape[-1]) for c in ct_args]
        + weight_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, s, *extras, *ct_args, *weight_args)

    k = 2 * len(ws)
    dws = tuple(outs[i] for i in range(0, k, 2))
    dbs = tuple(outs[i] for i in range(1, k, 2))
    dx = outs[k][:n]
    dsun = outs[k + 1][:n]
    dextras = tuple(o[:n] for o in outs[k + 2:])
    return dws, dbs, dx, dsun, dextras


# ---------------------------------------------------------------- custom vjp
@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _field_core(x_in, sun, extras, ws, bs, cfg, names, heads,
                compute_dtype_name, interpret):
    """Fused field: x_in (N, D), sun (N, 3), extras = () or (t_emb,) ->
    dict of active head outputs, all 2D (N, width)."""
    return _fwd_impl(x_in, sun, extras, ws, bs, cfg, names,
                     compute_dtype_name, heads, interpret)


def _core_fwd(x_in, sun, extras, ws, bs, cfg, names, heads,
              compute_dtype_name, interpret):
    out = _fwd_impl(x_in, sun, extras, ws, bs, cfg, names,
                    compute_dtype_name, heads, interpret)
    return out, (x_in, sun, extras, ws, bs)


def _core_bwd(cfg, names, heads, compute_dtype_name, interpret, res, cts):
    x_in, sun, extras, ws, bs = res
    outputs = _active_outputs(cfg, heads)
    # missing / symbolically-zero cotangents arrive as zeros arrays already
    cts = {nm: cts[nm] for nm, _ in outputs}
    dws, dbs, dx, dsun, dextras = _bwd_impl(
        x_in, sun, extras, ws, bs, cts, cfg, names, compute_dtype_name,
        heads, interpret)
    return dx, dsun, dextras, dws, dbs


_field_core.defvjp(_core_fwd, _core_bwd)


# ----------------------------------------------------- field_apply factory
def make_train_field(cfg, compute_dtype_name="bfloat16", interpret=False):
    """field_apply(params, xyz, sun_d, t_emb, sem_labels, heads=None) for the
    TRAINING path, evaluating the whole SPNeRF field through the fused
    fwd+bwd Pallas pair; differentiable w.r.t. every param (the semantic
    embedding and positional mapping stay XLA-side; their grads flow through
    the kernel's dx_in).

    Drop-in for SPNeRF.apply semantics (models/spnerf.py __call__), same param
    tree (pack_params naming)."""
    full_names = tuple(_layer_names(cfg, cfg.fc_layers))

    def apply(params, xyz, sun_d, t_emb=None, sem_labels=None, heads=None):
        if heads is None:
            heads = ("rgb", "sun", "sky", "beta", "sem")
        heads = tuple(h for h in heads
                      if h in ("rgb", "sun", "sky", "beta", "sem"))
        names, ws, bs, sem_table = pack_params(params, cfg)
        assert names == full_names

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

        extras = ()
        if cfg.beta:
            t = (t_emb.astype(jnp.float32) if t_emb is not None
                 else jnp.zeros((x_in.shape[0], cfg.t_embedding_dims),
                                jnp.float32))
            extras = (t,)

        out = _field_core(x_in, sun_d.astype(jnp.float32), extras,
                          tuple(ws), tuple(bs), cfg, full_names, heads,
                          compute_dtype_name, interpret)
        out = dict(out)
        out["sigma"] = out["sigma"][:, 0]
        return out

    return apply
