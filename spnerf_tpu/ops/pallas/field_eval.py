"""Fused SPNeRF field evaluation as a single Pallas TPU kernel.

One `pallas_call` evaluates the whole field — positional mapping, semantic
embedding concat, 8x512 Siren trunk with skip, and every head (sigma, feats,
albedo rgb, sun visibility, sky, semantic logits) — on a tile of points while
the activations stay in VMEM. The XLA path materializes each layer's (N, 512)
activation in HBM between matmuls; here only the raw inputs and the small head
outputs touch HBM.

All weights live in VMEM for the kernel's lifetime (~7 MB bf16 for the flagship
8x512 configuration, well under the ~16 MB/core budget); the grid tiles points.
Matmuls hit the MXU in bf16 with f32 accumulation — the same numerics policy as
the flax path (models/spnerf.py TorchDense).

This is the *forward* (inference/render) kernel: validation and DSM-extraction
rendering are forward-only, where a fused kernel pays directly. Training uses
the XLA path, whose fwd+bwd is MXU-bound already (see bench notes); a custom
VJP pair can reuse this kernel later.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import ModelConfig
from ...models.spnerf import fast_sin

TILE = 512  # points per grid step


def supports_config(cfg: ModelConfig) -> bool:
    """Covers the sp-nerf flagship family INCLUDING the beta/transient path;
    relu variants and hash encodings fall back to the XLA implementation."""
    return (cfg.siren and cfg.skips == (4,)
            and cfg.fc_layers >= 2 and cfg.encoding == "siren")


def pack_params(params, cfg: ModelConfig):
    """Flax params -> (names, weights, biases, sem_table).

    TorchDense call order (models/spnerf.py __call__): trunk fc_layers, sigma,
    feats, rgb x2, sun x4, sky x2, [beta x2 if cfg.beta], sem x2.
    """
    n_trunk = cfg.fc_layers
    idx = {}
    i = 0
    for k in range(n_trunk):
        idx[f"trunk{k}"] = i
        i += 1
    for name in ("sigma", "feats", "rgb0", "rgb1", "sun0", "sun1", "sun2",
                 "sun3", "sky0", "sky1"):
        idx[name] = i
        i += 1
    if cfg.beta:
        idx["beta0"] = i
        idx["beta1"] = i + 1
        i += 2
    if cfg.sem:
        idx["sem0"] = i
        idx["sem1"] = i + 1

    names = [f"trunk{k}" for k in range(n_trunk)]
    names += ["sigma", "feats", "rgb0", "rgb1", "sun0", "sun1", "sun2", "sun3",
              "sky0", "sky1"]
    if cfg.beta:
        names += ["beta0", "beta1"]
    if cfg.sem:
        names += ["sem0", "sem1"]

    ws, bs = [], []
    for n in names:
        d = params[f"TorchDense_{idx[n]}"]
        ws.append(jnp.asarray(d["kernel"]))
        bs.append(jnp.reshape(jnp.asarray(d["bias"]), (1, -1)))
    sem_table = jnp.asarray(params["semantic_embedding"]) if cfg.sem else None
    return tuple(names), ws, bs, sem_table


# the kernel's XLA-side preprocessing must match the trained flax model
# bit-for-bit — use the model's own mapping, not a local re-derivation
from ...models.spnerf import positional_mapping as _positional_mapping  # noqa: E402


def _active_outputs(cfg: ModelConfig, heads):
    """Ordered (name, width) list of kernel outputs for a head subset."""
    outs = [("sigma", 1)]
    if "rgb" in heads:
        outs.append(("rgb", 3))
    if "sun" in heads:
        outs.append(("sun_v", 1))
    if "sky" in heads:
        outs.append(("sky", 3))
    if cfg.beta and "beta" in heads:
        outs.append(("beta", 1))
    if cfg.sem and "sem" in heads:
        outs.append(("sem_logits", cfg.num_sem_classes))
    return outs


def _make_kernel(cfg: ModelConfig, names, compute_dtype, heads):
    n_trunk = cfg.fc_layers
    skip = cfg.skips[0] if cfg.skips else None
    name_pos = {n: i for i, n in enumerate(names)}
    outputs = _active_outputs(cfg, heads)

    has_t = cfg.beta

    def kernel(xin_ref, sun_ref, *refs):
        t_ref = refs[0] if has_t else None
        refs = refs[1:] if has_t else refs
        w = {n: refs[2 * name_pos[n]] for n in names}
        b = {n: refs[2 * name_pos[n] + 1] for n in names}
        n_wb = 2 * len(names)
        out = {nm: refs[n_wb + i] for i, (nm, _) in enumerate(outputs)}
        cd = compute_dtype

        def dense(name, x):
            # NOTE: activations stay f32 between layers. A bf16-activation
            # variant hangs the Mosaic compiler on the tunneled toolchain
            # (>30 min, no result); revisit when the toolchain updates.
            y = jnp.dot(x.astype(cd), w[name][:].astype(cd),
                        preferred_element_type=jnp.float32)
            return y + b[name][:]

        x_in = xin_ref[:].astype(jnp.float32)
        sun = sun_ref[:].astype(jnp.float32)

        h = fast_sin(30.0 * dense("trunk0", x_in))
        for i in range(1, n_trunk):
            if skip is not None and i == skip:
                h = jnp.concatenate([h, x_in], axis=-1)
            h = fast_sin(dense(f"trunk{i}", h))
        shared = h

        out["sigma"][:] = jax.nn.softplus(dense("sigma", shared))
        feats = (dense("feats", shared)
                 if ("rgb" in out or "sun_v" in out or "beta" in out) else None)

        if "rgb" in out:
            r = fast_sin(dense("rgb0", feats))
            out["rgb"][:] = jax.nn.sigmoid(dense("rgb1", r)) * 1.002 - 0.001

        if "sun_v" in out:
            s = jnp.concatenate([feats, sun], axis=-1)
            s = fast_sin(dense("sun0", s))
            s = fast_sin(dense("sun1", s))
            s = fast_sin(dense("sun2", s))
            out["sun_v"][:] = jax.nn.sigmoid(dense("sun3", s))

        if "sky" in out:
            k = jax.nn.relu(dense("sky0", sun))
            out["sky"][:] = jax.nn.sigmoid(dense("sky1", k))

        if "beta" in out:
            t_in = t_ref[:].astype(jnp.float32)
            bb = jnp.concatenate([feats, t_in], axis=-1)
            bb = fast_sin(dense("beta0", bb))
            out["beta"][:] = jax.nn.softplus(dense("beta1", bb))

        if "sem_logits" in out:
            g = fast_sin(dense("sem0", shared))
            out["sem_logits"][:] = dense("sem1", g)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "names", "compute_dtype_name", "interpret",
                     "heads"),
)
def _fused_apply(ws, bs, sem_table, xyz, sun_d, sem_labels, t_emb,
                 cfg: ModelConfig, names, compute_dtype_name="bfloat16",
                 interpret=False, heads=("rgb", "sun", "sky", "beta", "sem")):
    compute_dtype = jnp.dtype(compute_dtype_name)
    n = xyz.shape[0]
    n_pad = -(-n // TILE) * TILE
    pad = n_pad - n
    if pad:
        xyz = jnp.concatenate([xyz, jnp.zeros((pad, 3), xyz.dtype)], 0)
        sun_d = jnp.concatenate([sun_d, jnp.zeros((pad, 3), sun_d.dtype)], 0)
        if sem_labels is not None:
            sem_labels = jnp.concatenate(
                [sem_labels, jnp.zeros((pad,), sem_labels.dtype)], 0)
        if t_emb is not None:
            t_emb = jnp.concatenate(
                [t_emb, jnp.zeros((pad, t_emb.shape[-1]), t_emb.dtype)], 0)

    # XLA-side preprocessing: positional mapping + semantic embedding concat —
    # tiny next to the trunk, keeps the kernel's first matmul layout simple
    if cfg.mapping:
        x_in = _positional_mapping(xyz.astype(jnp.float32), cfg.mapping_sizes[0])
    else:
        x_in = xyz.astype(jnp.float32)
    if cfg.sem:
        labels = jnp.where(sem_labels < 0, cfg.num_sem_classes,
                           sem_labels).astype(jnp.int32)
        emb = jnp.take(sem_table, labels, axis=0)
        x_in = jnp.concatenate([x_in, emb.astype(x_in.dtype)], axis=-1)

    in_dim = x_in.shape[-1]
    grid = (n_pad // TILE,)

    def point_spec(d):
        return pl.BlockSpec((TILE, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def full_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    weight_specs, weight_args = [], []
    for wk, bk in zip(ws, bs):
        weight_specs.append(full_spec(wk.shape))
        weight_args.append(wk)
        weight_specs.append(full_spec(bk.shape))
        weight_args.append(bk)

    outputs = _active_outputs(cfg, heads)
    out_shapes = [jax.ShapeDtypeStruct((n_pad, width), jnp.float32)
                  for _, width in outputs]
    out_specs = [point_spec(width) for _, width in outputs]

    kernel = _make_kernel(cfg, names, compute_dtype, heads)
    extra_in, extra_specs = [], []
    if cfg.beta:
        t_in = (t_emb.astype(jnp.float32) if t_emb is not None
                else jnp.zeros((n_pad, cfg.t_embedding_dims), jnp.float32))
        extra_in.append(t_in)
        extra_specs.append(point_spec(t_in.shape[-1]))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[point_spec(in_dim), point_spec(3)] + extra_specs
        + weight_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(x_in, sun_d.astype(jnp.float32), *extra_in, *weight_args)

    result = {nm: o[:n] for (nm, _), o in zip(outputs, outs)}
    result["sigma"] = result["sigma"][:, 0]
    return result


class FusedField:
    """Callable field_apply (forward only) built from flax params."""

    def __init__(self, params, cfg: ModelConfig, compute_dtype="bfloat16",
                 interpret=False):
        assert supports_config(cfg), "config not covered by the fused kernel"
        names, ws, bs, sem_table = pack_params(params, cfg)
        self.names = names
        self.ws = ws
        self.bs = bs
        self.sem_table = sem_table
        self.cfg = cfg
        self.compute_dtype = compute_dtype
        self.interpret = interpret

    def __call__(self, xyz, sun_d, t_emb=None, sem_labels=None, heads=None):
        if heads is None:
            heads = ("rgb", "sun", "sky", "beta", "sem")
        return _fused_apply(self.ws, self.bs, self.sem_table, xyz, sun_d,
                            sem_labels, t_emb, self.cfg, self.names,
                            self.compute_dtype, self.interpret,
                            heads=tuple(heads))


def fused_field_apply(params, cfg: ModelConfig, compute_dtype="bfloat16",
                      interpret=False):
    return FusedField(params, cfg, compute_dtype, interpret)
