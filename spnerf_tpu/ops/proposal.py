"""Proposal-network sampling (mip-NeRF 360 style) for the NGP-class pipeline.

Not present in the reference (its hierarchy is the classic coarse/fine NeRF
pair, modules/rendering.py:186-216); this is the stretch configuration from
BASELINE.json (config 5): a small density-only proposal field places the main
field's samples, trained with the interlevel loss so its weight histogram
upper-bounds the main field's.

All pieces are shape-static and jit-safe:
  * `density_weights` — sigma -> compositing weights (no color);
  * `resample_from_weights` — inverse-CDF draw of the main samples;
  * `interlevel_loss` — outer-measure bound via cumulative-weight gathers
    (searchsorted with the TPU-friendly compare_all method).
"""

import jax
import jax.numpy as jnp

from .sampling import masked_take_along_axis, sample_pdf


def density_weights(sigmas, z_vals):
    """sigma (R, S), z_vals (R, S) -> compositing weights (R, S)
    (NeRF eq. 3, same discretization as ops.compositing.composite)."""
    deltas = z_vals[:, 1:] - z_vals[:, :-1]
    deltas = jnp.concatenate([deltas, jnp.full_like(deltas[:, :1], 1e10)], -1)
    alphas = 1.0 - jnp.exp(-deltas * jax.nn.relu(sigmas))
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[:, :1]), 1.0 - alphas + 1e-10], -1)
    trans = jnp.cumprod(shifted, axis=-1)[:, :-1]
    return alphas * trans


def resample_from_weights(key, z_vals, weights, n_samples, det=False):
    """Draw n_samples from the histogram defined on the z_vals midpoints
    (same contract as the reference's hierarchical step,
    modules/rendering.py:188-190), sorted ascending."""
    z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
    z = sample_pdf(key, z_mid, weights[:, 1:-1], n_samples, det=det)
    return jnp.sort(jax.lax.stop_gradient(z), axis=-1)


def _cum_weight_at(t_edges, w, t_query):
    """Piecewise-constant CDF of histogram (t_edges (R, S+1), w (R, S))
    evaluated at t_query (R, Q): sum of whole bins left of the query plus the
    partial bin the query lands in (linear within the bin)."""
    cw = jnp.concatenate(
        [jnp.zeros_like(w[:, :1]), jnp.cumsum(w, axis=-1)], axis=-1)  # (R,S+1)
    idx = jax.vmap(
        lambda e, q: jnp.searchsorted(e, q, side="right",
                                      method="compare_all")
    )(t_edges, t_query)
    s = w.shape[-1]
    lo = jnp.clip(idx - 1, 0, s - 1)
    # bin lookups as equality-masked sums (sampling.masked_take_along_axis):
    # gather rows + scatter backwards are row-latency-bound on TPU, and this
    # one IS differentiated (gradients flow to the proposal's w)
    left_edge = masked_take_along_axis(t_edges, lo)
    right_edge = masked_take_along_axis(t_edges, jnp.clip(idx, 1, s))
    frac = jnp.where(
        right_edge > left_edge,
        jnp.clip((t_query - left_edge) / jnp.maximum(right_edge - left_edge,
                                                     1e-12), 0.0, 1.0),
        1.0,
    )
    base = masked_take_along_axis(cw, lo)
    wbin = masked_take_along_axis(w, lo)
    out = base + frac * wbin
    out = jnp.where(t_query <= t_edges[:, :1], 0.0, out)  # before histogram
    out = jnp.where(t_query >= t_edges[:, -1:], cw[:, -1:], out)
    return out


def interlevel_loss(prop_z, prop_weights, main_z, main_weights, eps=1e-3):
    """mip-NeRF 360 proposal loss: penalize main-interval weights that exceed
    the proposal's mass over the same interval.

    prop_z (R, Sp), prop_weights (R, Sp); main_z (R, Sm), main_weights (R, Sm).
    Intervals are taken between successive samples (midpoint edges like the
    compositing discretization). Gradients flow to the proposal only.
    """
    main_w = jax.lax.stop_gradient(main_weights)
    main_zd = jax.lax.stop_gradient(main_z)

    def edges(z):
        mid = 0.5 * (z[:, :-1] + z[:, 1:])
        return jnp.concatenate([z[:, :1], mid, z[:, -1:]], axis=-1)

    pe = edges(prop_z)  # (R, Sp+1)
    me = edges(main_zd)  # (R, Sm+1)
    cdf_lo = _cum_weight_at(pe, prop_weights, me[:, :-1])
    cdf_hi = _cum_weight_at(pe, prop_weights, me[:, 1:])
    bound = cdf_hi - cdf_lo  # proposal mass over each main interval
    excess = jnp.maximum(main_w - bound, 0.0)
    return jnp.mean(jnp.sum(excess**2 / (main_w + eps), axis=-1))
