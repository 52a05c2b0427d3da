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

    hash_impl: encoding implementation for the hash trunk — None picks the
    restructured-VJP lookup (one flat scatter-add backward) on accelerator
    backends and plain autodiff on CPU (see HashGridEncoding.impl)."""
    import jax
    import jax.numpy as jnp

    dtype = compute_dtype or jnp.float32
    if getattr(cfg, "encoding", "siren") == "hash":
        if hash_impl is None:
            hash_impl = ("fused_vjp" if jax.default_backend() != "cpu"
                         else "xla")
        return HashSPNeRF(cfg=cfg, compute_dtype=dtype, enc_impl=hash_impl)
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
