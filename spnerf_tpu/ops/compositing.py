"""Volume compositing: sigma -> alpha -> transmittance -> weights -> rgb/depth.

Functional float32 version of the compositing block in the reference `inference`
(/root/reference/models/spnerf.py:115-157): NeRF eq. 3 alpha compositing with the
S-NeRF irradiance model irradiance = sun_v + (1 - sun_v) * sky (S-NeRF eq. 2).
"""

import jax
import jax.numpy as jnp


def composite(field_out, z_vals, noise_std=0.0, key=None):
    """Composite per-sample field outputs along rays.

    field_out: dict with per-sample arrays shaped (R, S, ...):
        rgb (R,S,3), sigma (R,S), sun_v (R,S,1), sky (R,S,3),
        optional beta (R,S,1), optional sem_logits (R,S,C)
    z_vals: (R, S) sample depths (sorted ascending)
    noise_std: scalar regularization noise on sigma (reference
        models/spnerf.py:121-123; decayed 0.9x per step by main.py:155)

    Returns the per-ray result dict matching the reference `inference` keys:
        rgb (R,3), depth (R,), weights (R,S), transparency (R,S),
        albedo (R,S,3), sun (R,S,1), sky (R,S,3), z_vals (R,S),
        [beta (R,S,1)], [sem_logits (R,C) mean-pooled over samples].
    """
    sigmas = field_out["sigma"].astype(jnp.float32)  # (R, S)
    z_vals = z_vals.astype(jnp.float32)

    deltas = z_vals[:, 1:] - z_vals[:, :-1]
    delta_inf = jnp.full_like(deltas[:, :1], 1e10)
    deltas = jnp.concatenate([deltas, delta_inf], axis=-1)  # (R, S)

    static_zero = isinstance(noise_std, (int, float)) and noise_std == 0.0
    if key is not None and not static_zero:
        noise = jax.random.normal(key, sigmas.shape, sigmas.dtype) * noise_std
    else:
        noise = 0.0
    alphas = 1.0 - jnp.exp(-deltas * jax.nn.relu(sigmas + noise))  # (R, S)

    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[:, :1]), 1.0 - alphas + 1e-10], axis=-1
    )
    transparency = jnp.cumprod(shifted, axis=-1)[:, :-1]  # T_i
    weights = alphas * transparency  # (R, S)

    depth = jnp.sum(weights * z_vals, axis=-1)  # (R,)
    result = {
        "depth": depth,
        "weights": weights,
        "transparency": transparency,
        "z_vals": z_vals,
    }
    # head-pruned field evaluations (e.g. the solar-correction pass, which
    # only consumes sigma and sun_v) composite only what they carry
    if "sun_v" in field_out:
        result["sun"] = field_out["sun_v"].astype(jnp.float32)  # (R, S, 1)
    if "rgb" in field_out:
        if "sun" not in result:
            raise ValueError(
                "composite() with an 'rgb' head requires 'sun_v': the S-NeRF "
                "irradiance model is rgb * (sun_v + (1 - sun_v) * sky) — "
                "evaluate heads including 'sun' (or drop 'rgb')")
        rgbs = field_out["rgb"].astype(jnp.float32)  # (R, S, 3)
        sun_v = result["sun"]
        sky = field_out["sky"].astype(jnp.float32)  # (R, S, 3)
        irradiance = sun_v + (1.0 - sun_v) * sky  # (R, S, 3)
        rgb = jnp.sum(weights[..., None] * rgbs * irradiance, axis=-2)  # (R, 3)
        result["rgb"] = jnp.clip(rgb, 0.0, 1.0)
        result["albedo"] = rgbs
        result["sky"] = sky
    if "beta" in field_out:
        result["beta"] = field_out["beta"].astype(jnp.float32)
    if "sem_logits" in field_out:
        # mean over samples, NOT weight-composited — documented reference choice
        # (models/spnerf.py:154-157, SURVEY.md section 7 quirks)
        result["sem_logits"] = jnp.mean(
            field_out["sem_logits"].astype(jnp.float32), axis=1
        )
    return result
