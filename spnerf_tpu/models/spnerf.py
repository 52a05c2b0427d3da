"""SPNeRF field as a flax module, TPU-first.

Re-implements the semantics of the reference network
(/root/reference/models/spnerf.py:162-369) — Shadow-NeRF MLP with sinusoidal
positional mapping, Siren activations and their dedicated inits, a semantic-label
embedding concatenated to the encoded position, skip connections, and heads for
sigma / albedo rgb / sun visibility / sky color / optional beta uncertainty /
optional semantic logits — but as a functional flax model designed for XLA:

  * one `apply` over a flat (N, ...) batch of points; no python chunk loops
    (the reference chunks at models/spnerf.py:93-107 purely for GPU memory);
  * matmuls run in a configurable compute dtype (bfloat16 on TPU, mirroring the
    reference's AMP fp16, main.py:334) with float32 params and accumulation;
  * initializers reproduce the reference's distributions: torch Linear default
    U(+-1/sqrt(fan_in)) everywhere, overridden by sine_init U(+-sqrt(6/fan_in))
    on the trunk/sun-branch and first_layer_sine_init U(+-1/fan_in) on their
    first layers (models/spnerf.py:49-60,251-255).
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import ModelConfig


def positional_mapping(x, n_freqs, logscale=True):
    """Sinusoidal mapping x -> (sin(2^k x), cos(2^k x))_k.

    Matches the reference `Mapping.forward` (/root/reference/models/spnerf.py:22-37):
    despite its docstring, the identity term is NOT included, and the concatenation
    order is [sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...].
    Output size: in_dims * 2 * n_freqs.
    """
    if logscale:
        freqs = 2.0 ** jnp.arange(n_freqs, dtype=x.dtype)
    else:
        freqs = jnp.linspace(1.0, 2.0 ** (n_freqs - 1), n_freqs, dtype=x.dtype)
    parts = []
    for k in range(n_freqs):
        parts.append(jnp.sin(freqs[k] * x))
        parts.append(jnp.cos(freqs[k] * x))
    return jnp.concatenate(parts, axis=-1)


def _uniform_init(bound_fn):
    """Uniform init with a bound that depends on fan_in = shape[0] (flax kernels
    are (fan_in, fan_out))."""

    def init(key, shape, dtype=jnp.float32):
        bound = bound_fn(shape[0])
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# torch.nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))
torch_linear_init = _uniform_init(lambda fan_in: 1.0 / np.sqrt(fan_in))
# Siren trunk init (reference sine_init, models/spnerf.py:49-53)
sine_init = _uniform_init(lambda fan_in: np.sqrt(6.0 / fan_in))
# Siren first-layer init (reference first_layer_sine_init, models/spnerf.py:56-60)
first_layer_sine_init = _uniform_init(lambda fan_in: 1.0 / fan_in)


class TorchDense(nn.Module):
    """Dense layer with torch-default bias init (U(+-1/sqrt(fan_in))) and a
    selectable kernel init; computes in `compute_dtype` with float32 params and
    float32 accumulation on the MXU."""

    features: int
    kernel_init_name: str = "torch"  # "torch" | "sine" | "first_sine"
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x2=None):
        """x2: optional second operand, semantically
        `concatenate([x, x2], -1) @ kernel`. On accelerators the concat is
        SPLIT into two dots sharing the one kernel
        (y = x@k[:d1] + x2@k[d1:]) so the (N, d1+d2) concat copy never
        materializes (the flagship skip concat alone profiled 0.72 ms/step
        as a standalone (131072, 575) bf16 copy). Param shapes and inits are
        IDENTICAL either way (fan_in = d1+d2). Not bit-identical to the
        concat path (the two partial dot products accumulate separately);
        SPNERF_SPLIT_CONCAT=0/1 overrides the auto accelerator-only gate."""
        import os

        fan_in = x.shape[-1] + (0 if x2 is None else x2.shape[-1])
        kernel_init = {
            "torch": torch_linear_init,
            "sine": sine_init,
            "first_sine": first_layer_sine_init,
        }[self.kernel_init_name]
        kernel = self.param("kernel", kernel_init, (fan_in, self.features))
        bias = self.param(
            "bias", _uniform_init(lambda _: 1.0 / np.sqrt(fan_in)), (self.features,)
        )
        sc = os.environ.get("SPNERF_SPLIT_CONCAT", "auto")
        split = x2 is not None and (
            sc == "1" or (sc == "auto"
                          and jax.default_backend() not in ("cpu",)))
        if x2 is not None and not split:
            x = jnp.concatenate([x, x2.astype(x.dtype)], axis=-1)
        if split:
            d1 = x.shape[-1]
            kc = kernel.astype(self.compute_dtype)
            y = jnp.dot(x.astype(self.compute_dtype), kc[:d1],
                        preferred_element_type=jnp.float32)
            y = y + jnp.dot(x2.astype(self.compute_dtype), kc[d1:],
                            preferred_element_type=jnp.float32)
        else:
            y = jnp.dot(
                x.astype(self.compute_dtype),
                kernel.astype(self.compute_dtype),
                preferred_element_type=jnp.float32,
            )
        # bias add in f32 (fused into the matmul epilogue), then activations
        # are carried in compute_dtype: with bf16 this halves the HBM traffic
        # of layer activations and their saved-for-backward copies — the step
        # is bandwidth-bound, not FLOP-bound (see bench notes). Mirrors the
        # reference's AMP fp16 activations (main.py:334).
        return (y + bias).astype(self.compute_dtype)


_SIN_C1 = 0.9999966
_SIN_C3 = -0.16664824
_SIN_C5 = 0.00830629
_SIN_C7 = -0.00018363


def fast_sin(x):
    """sin(x) via range reduction to [-pi/2, pi/2] + 7th-order minimax odd
    polynomial (max error ~7e-7).

    The Siren trunk spends ~3.4G transcendentals per flagship training step;
    the hardware sin sequence runs far below the VPU's mul/add rate, while this
    expansion is ~12 full-rate ops. Accuracy is far inside training noise (and
    inside the 2e-5 tolerance of the torch-parity tests).
    """
    inv_pi = 1.0 / np.pi
    k = jnp.round(x * inv_pi)
    r = x - k * np.pi  # r in [-pi/2, pi/2]
    # sign = (-1)^k without transcendentals: k mod 2 via k/2 - floor(k/2)
    sign = 1.0 - 2.0 * jnp.abs(k - 2.0 * jnp.floor(k * 0.5))
    r2 = r * r
    p = r * (_SIN_C1 + r2 * (_SIN_C3 + r2 * (_SIN_C5 + r2 * _SIN_C7)))
    return sign * p


def siren(x, w0=1.0):
    y = w0 * x if w0 != 1.0 else x
    return fast_sin(y.astype(jnp.float32)).astype(y.dtype)


def embed_lookup(table, labels):
    """`jnp.take(table, labels, axis=0)` for a SMALL embedding table whose
    BACKWARD would otherwise be a row-latency-bound scatter-add on TPU
    (profiled 0.57 ms/step each for the two (N=65536 -> 4 rows) semantic
    embedding gradients on the flagship step). As a one-hot f32 matmul at
    HIGHEST precision the lookup is exact (each output row sums exactly one
    table row) and its backward is the transposed matmul — MXU work instead
    of a scatter. CPU keeps the plain take (scatter is fine there);
    SPNERF_EMB_MATMUL=0/1 overrides (1 pins the matmul branch in CPU
    tests)."""
    import os

    mm = os.environ.get("SPNERF_EMB_MATMUL", "auto")
    if mm == "0" or (mm == "auto" and jax.default_backend() in ("cpu",)):
        return jnp.take(table, labels, axis=0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, table.shape[0]), 1)
    oh = (labels[:, None] == iota).astype(table.dtype)
    return jnp.matmul(oh, table, precision=jax.lax.Precision.HIGHEST)


class SPNeRF(nn.Module):
    """The SP-NeRF radiance/semantics field.

    __call__(xyz, sun_d, t_emb, sem_labels) -> dict with:
      rgb (N,3) in [-pad, 1+pad], sigma (N,), sun_v (N,1), sky (N,3),
      optionally beta (N,1) and sem_logits (N,C).

    xyz: (N, 3) normalized scene coordinates
    sun_d: (N, 3) sun direction unit vectors
    t_emb: (N, T) transient embedding (only used when cfg.beta)
    sem_labels: (N,) int32 semantic labels in [0, C) or IGNORE (-100)
    """

    cfg: ModelConfig
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, sun_d, t_emb=None, sem_labels=None, sigma_only=False,
                 heads=None, solar_tail=0):
        """heads: optional tuple naming which output heads to evaluate
        ("rgb", "sun", "sky", "beta", "sem"); None evaluates all configured
        heads. sigma is always computed. Pruning heads skips their compute but
        leaves parameter naming untouched (all submodules are constructed
        unconditionally, in the original creation order) — the solar-correction
        pass only consumes sigma and sun_v, so its rgb/sky/sem head matmuls are
        dead work (reference runs them anyway, models/spnerf.py:273-369).

        solar_tail: static int — the LAST `solar_tail` rows are
        solar-correction points needing only sigma and sun_v. The trunk,
        sigma and sun head run batched over all rows (one matmul stack over
        the union of passes — larger MXU tiles); the rgb/sky/beta/sem heads
        are sliced to the leading view rows, avoiding the dead solar-row head
        work that refuted the unpruned SPNERF_BATCH_SC path (ops/render.py)."""
        cfg = self.cfg
        act = (lambda v: siren(v)) if cfg.siren else jax.nn.relu
        dense = lambda feats, init="torch": TorchDense(
            feats, kernel_init_name=init, compute_dtype=self.compute_dtype
        )
        if heads is None:
            heads = ("rgb", "sun", "sky", "beta", "sem")
        nv = xyz.shape[0] - solar_tail  # leading view rows (all heads)
        view = (lambda v: v[:nv]) if solar_tail else (lambda v: v)

        if cfg.mapping:
            x_in = positional_mapping(xyz, cfg.mapping_sizes[0])
        else:
            x_in = xyz

        if cfg.sem:
            sem_size = cfg.num_sem_classes * cfg.s_embedding_factor
            # +1 row is the padding row for invalid labels (-100), kept at zero
            # like torch's padding_idx (reference models/spnerf.py:190-194).
            table = self.param(
                "semantic_embedding",
                lambda key, shape: jax.random.normal(key, shape)
                .at[cfg.num_sem_classes]
                .set(0.0),
                (cfg.num_sem_classes + 1, sem_size),
            )
            labels = jnp.where(
                sem_labels < 0, cfg.num_sem_classes, sem_labels
            ).astype(jnp.int32)
            sem_emb = embed_lookup(table, labels)
            x_in = jnp.concatenate([x_in, sem_emb.astype(x_in.dtype)], axis=-1)

        # trunk with skip connections (reference models/spnerf.py:202-209,323-330)
        first_init = "first_sine" if cfg.siren else "torch"
        trunk_init = "sine" if cfg.siren else "torch"
        h = dense(cfg.fc_units, first_init)(x_in)
        h = siren(h, 30.0) if cfg.siren else act(h)
        for i in range(1, cfg.fc_layers):
            # skip connection: the concat operand pair goes through
            # TorchDense's split-concat path (no materialized concat on TPU)
            skip_in = x_in if i in cfg.skips else None
            h = dense(cfg.fc_units, trunk_init)(h, skip_in)
            h = act(h)
        shared = h

        sigma = jax.nn.softplus(dense(1)(shared))[..., 0]
        if sigma_only:
            return {"sigma": sigma}

        # construct every head submodule unconditionally, in the original
        # creation order, so flax auto-naming (TorchDense_i) — and therefore
        # checkpoints and pack_params — is independent of `heads`
        d_feats = dense(cfg.fc_units)
        d_rgb0, d_rgb1 = dense(cfg.fc_units // 2), dense(3)
        d_sun = [dense(cfg.fc_units // 2, first_init),
                 dense(cfg.fc_units // 2, trunk_init),
                 dense(cfg.fc_units // 2, trunk_init),
                 dense(1, trunk_init)]
        d_sky0, d_sky1 = dense(cfg.fc_units // 2), dense(3)
        if cfg.beta:
            d_beta0, d_beta1 = dense(cfg.fc_units // 2), dense(1)
        if cfg.sem:
            d_sem0 = dense(cfg.fc_units // 2)
            d_sem1 = dense(cfg.num_sem_classes)

        out = {"sigma": sigma}
        feats = None
        if {"rgb", "sun", "beta"} & set(heads):
            feats = d_feats(shared)

        if "rgb" in heads:
            # albedo rgb head (no view-direction input in sp-nerf:
            # input_sizes[1]=0, reference models/spnerf.py:170,341-347)
            r = act(d_rgb0(view(feats)))
            rgb = jax.nn.sigmoid(d_rgb1(r))
            rgb_padding = 0.001
            out["rgb"] = rgb * (1 + 2 * rgb_padding) - rgb_padding

        if "sun" in heads:
            # sun visibility branch (3 hidden siren layers, reference :234-241)
            # — all rows: solar points need sun_v too (transparency term)
            s = act(d_sun[0](feats, sun_d))
            for layer in d_sun[1:-1]:
                s = act(layer(s))
            out["sun_v"] = jax.nn.sigmoid(d_sun[-1](s))

        if "sky" in heads:
            # ambient sky color from the sun direction alone (reference :244-249)
            k = jax.nn.relu(d_sky0(view(sun_d)))
            out["sky"] = jax.nn.sigmoid(d_sky1(k))

        if cfg.beta and "beta" in heads:
            b = act(d_beta0(view(feats), view(t_emb)))
            out["beta"] = jax.nn.softplus(d_beta1(b))

        if cfg.sem and "sem" in heads:
            g = act(d_sem0(view(shared)))
            out["sem_logits"] = d_sem1(g)

        return out


class TransientEmbedding(nn.Module):
    """Per-image transient embedding used by the beta/uncertainty path
    (reference main.py:56-57: torch.nn.Embedding(vocab, tau))."""

    vocab: int
    dims: int

    @nn.compact
    def __call__(self, ts):
        table = self.param(
            "embedding", lambda key, shape: jax.random.normal(key, shape),
            (self.vocab, self.dims),
        )
        return embed_lookup(table, jnp.asarray(ts, jnp.int32))


def init_spnerf(key, cfg: ModelConfig, compute_dtype=jnp.float32):
    """Create a model + params pair with dummy inputs."""
    model = SPNeRF(cfg=cfg, compute_dtype=compute_dtype)
    xyz = jnp.zeros((2, 3), jnp.float32)
    sun_d = jnp.zeros((2, 3), jnp.float32)
    t_emb = jnp.zeros((2, cfg.t_embedding_dims), jnp.float32) if cfg.beta else None
    sem = jnp.zeros((2,), jnp.int32) if cfg.sem else None
    params = model.init(key, xyz, sun_d, t_emb, sem)
    return model, params
