"""Backend selection helper.

The container's sitecustomize imports jax at interpreter startup and pins the
tunneled 'axon' TPU backend, which makes a later `JAX_PLATFORMS=cpu` env var
ineffective. Re-applying the env choice through `jax.config` before the first
backend use restores the expected behavior (backend init is lazy)."""

import os


def apply_platform_env():
    import jax

    want = os.environ.get("JAX_PLATFORMS", "")
    if want and "axon" not in want:
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass
    return jax
