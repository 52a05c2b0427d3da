from .hashgrid import HashGridEncoding, HashSPNeRF, init_hash_spnerf
from .spnerf import (
    SPNeRF,
    TransientEmbedding,
    init_spnerf,
    positional_mapping,
)


def load_model(cfg, compute_dtype=None, hash_impl=None):
    """Model factory (reference models/__init__.py:4-16): returns the field
    module for the configuration. encoding='siren' is the SP-NeRF flagship;
    encoding='hash' is the Instant-NGP-style hash-grid variant.

    hash_impl: encoding implementation for the hash trunk; None resolves
    cfg.hash_impl ("auto" -> "matmul_vjp" on accelerators, "xla" on CPU).
    "matmul_vjp" replaces the backward's scatter-add with a factorized
    one-hot MXU matmul — the first restructured hash backward to WIN
    integrated on the v5e (158.8 vs 200.3 ms/step full sp-nerf config,
    6449 vs 5112 rays/s, round 3); on CPU the O(M*T*F) dense work loses to
    the scatter, so auto keeps plain autodiff there. "sorted_vjp" sorts the
    backward's cotangent rows before a sorted scatter-add (won standalone,
    lost integrated — round 2). "fused_vjp" (one flat scatter across levels,
    ops/pallas/hash_enc.py) measured SLOWER on the v5e (559 vs 385 ms/step,
    light config): XLA's per-level take-VJP scatters beat one flat scatter
    over the (L*T, F) table. Kept selectable for future toolchains."""
    import jax
    import jax.numpy as jnp

    dtype = compute_dtype or jnp.float32
    if getattr(cfg, "encoding", "siren") == "hash":
        impl = hash_impl or getattr(cfg, "hash_impl", "auto")
        if impl == "auto":
            impl = "xla" if jax.default_backend() == "cpu" else "matmul_vjp"
        return HashSPNeRF(cfg=cfg, compute_dtype=dtype,
                          n_levels=getattr(cfg, "hash_levels", 16),
                          n_features=getattr(cfg, "hash_features", 2),
                          log2_table_size=getattr(cfg, "hash_log2T", 19),
                          hidden=getattr(cfg, "hash_hidden", 64),
                          frames=getattr(cfg, "hash_frames", 1),
                          direct_coarse=getattr(cfg, "hash_direct_coarse",
                                                True),
                          flat_table=getattr(cfg, "hash_flat_table", True),
                          enc_impl=impl)
    return SPNeRF(cfg=cfg, compute_dtype=dtype)


__all__ = [
    "SPNeRF",
    "HashSPNeRF",
    "HashGridEncoding",
    "TransientEmbedding",
    "init_spnerf",
    "init_hash_spnerf",
    "positional_mapping",
    "load_model",
]
