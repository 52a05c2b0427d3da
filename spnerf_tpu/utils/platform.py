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
    enable_compilation_cache()
    return jax


def enable_compilation_cache():
    """Persistent XLA compilation cache for the CLI entry points.

    Remote compiles through the tunneled TPU runtime cost 100-1000 s per
    program and are NOT shared across processes; the on-disk cache makes a
    repeat run of the same configuration skip them. Opt out with
    SPNERF_NO_COMPILE_CACHE=1 or point SPNERF_COMPILE_CACHE elsewhere."""
    import jax

    if os.environ.get("SPNERF_NO_COMPILE_CACHE") == "1":
        return
    path = os.environ.get(
        "SPNERF_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "spnerf_jax"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache every program regardless of compile time — but only when an
        # accelerator platform is AFFIRMATIVELY selected: on CPU or when no
        # platform is pinned (tests, dev runs on a CPU-only box) the default
        # threshold stands, or sub-millisecond compiles would fill the cache
        # with thousands of useless entries
        want = str(os.environ.get("JAX_PLATFORMS", "")
                   or getattr(jax.config, "jax_platforms", None) or "").lower()
        if want and "cpu" not in want:
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              0.0)
    except Exception:
        pass
