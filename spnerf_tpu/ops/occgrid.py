"""Occupancy-grid guided coarse sampling (opt-in, --occgrid).

An NGP-style density cache (Mueller et al. 2022 sec. 5.1, nerfstudio
practice) re-designed for TPU/XLA static shapes. The reference has no
occupancy grid; SP-NeRF's only sample placement is stratified + depth-guided
(/root/reference/modules/rendering.py:119-177). Satellite scenes are a thin
surface shell inside a tall [near, far] slab, so most stratified coarse
samples land in empty air — the grid concentrates the SAME static sample
count where density lives instead of culling (dynamic shapes don't exist
under jit; importance-redistribution is the shape-static equivalent of
skip-empty-space marching).

TPU-first choices:
  * The grid is one flat (frames * res^3,) f32 row of EMA'd densities.
    Updates touch a CONTIGUOUS slab of cells per step with a rotating
    offset — `lax.dynamic_slice` / `dynamic_update_slice`, zero gathers and
    zero scatters (the tunneled runtime budgets sparse ops per program;
    cli/train.py's window cap) — and every cell is refreshed once per
    `frames * res^3 / rows` steps.
  * Sampling reuses `sample_pdf` (ops/sampling.py) over `occ_bins` per-ray
    bins whose weights are one nearest-cell gather each — the inverse-CDF
    machinery already runs gather-free on accelerators (SPNERF_PDF_LOOKUP).
  * Everything is stop-gradient: sample PLACEMENT carries no gradient,
    exactly like the reference's detached guided samples.

Multi-AOI: frame k's scene box is translated to x in [k*S - 1, k*S + 1]
(S = data/multi.FRAME_SPACING); the grid stores one res^3 block per frame
and decomposes points with the same round(x/S) rule as the hash encoder
(models/hashgrid.py frame handling).

Measured on the v5e (round 4, CLAUDE.md): +1.1 ms/step on the flagship;
the 30k tuned-depth full-res flagship at --n_samples 32 --occgrid runs
47.1k rays/s (2.3x the 64-sample step) and lands the best flagship DSM MAE
to date (1.86/1.91 m vs 2.46). On the hash config it is a measured quality
NEGATIVE (the fast-moving table density fights the depth-guided sampler) —
documented in README; leave it off there.
"""

import jax
import jax.numpy as jnp


def init_grid(res: int, frames: int = 1) -> jnp.ndarray:
    """Optimistic all-ones grid: until a cell is visited by the sweep, its
    bins sample uniformly (the stratified prior)."""
    return jnp.ones((frames * res ** 3,), jnp.float32)


def _cell_centers01(lin, res):
    """LOCAL flat cell index -> (M, 3) integer cell coords, x-major ordering
    lin = (ix * res + iy) * res + iz (must match _lookup_lin)."""
    ix = lin // (res * res)
    iy = (lin // res) % res
    iz = lin % res
    return jnp.stack([ix, iy, iz], axis=-1)


def _frame_decompose(xyz, frames):
    """(N, 3) global points -> (frame index (N,), frame-local points (N, 3)).
    Same rule as the hash encoder's multi-AOI handling
    (models/hashgrid.py: round(x / FRAME_SPACING))."""
    from ..data.multi import FRAME_SPACING

    fidx = jnp.clip(jnp.round(xyz[..., 0] / FRAME_SPACING), 0, frames - 1)
    local = xyz - jnp.stack(
        [fidx * FRAME_SPACING, jnp.zeros_like(fidx), jnp.zeros_like(fidx)],
        axis=-1)
    return fidx.astype(jnp.int32), local


def _lookup_lin(xyz, res, frames: int = 1):
    """(N, 3) points -> flat nearest-cell indices into the (frames * res^3,)
    grid (frame-major, x-major within a frame). Points in frame k's
    translated box hit block k."""
    if frames > 1:
        fidx, xyz = _frame_decompose(xyz, frames)
    x01 = jnp.clip((xyz + 1.0) * 0.5, 0.0, 1.0)
    cell = jnp.minimum(jnp.floor(x01 * res), res - 1).astype(jnp.int32)
    lin = (cell[..., 0] * res + cell[..., 1]) * res + cell[..., 2]
    if frames > 1:
        lin = lin + fidx * (res ** 3)
    return lin


def update_grid(occ, sigma_fn, key, step, res, rows, decay, frames: int = 1):
    """One slab-sweep EMA update.

    occ: (frames * res^3,) current grid; sigma_fn: (M, 3) GLOBAL xyz -> (M,)
    density (sigma_only field apply, stop-gradient); step: scalar int
    (selects the rotating slab); rows: cells refreshed this step
    (frames * res^3 % rows == 0); decay: per-VISIT decay — each cell decays
    once per frames*res^3/rows steps.

    new[cell] = max(decay * old[cell], sigma(jittered point in cell)).
    """
    n_cells = frames * res ** 3
    assert n_cells % rows == 0, (res, frames, rows)
    n_slabs = n_cells // rows
    off = (step.astype(jnp.int32) % n_slabs) * rows
    lin = off + jnp.arange(rows, dtype=jnp.int32)
    fidx = lin // (res ** 3)
    cell = _cell_centers01(lin % (res ** 3), res)
    u = jax.random.uniform(key, (rows, 3), jnp.float32)
    xyz = ((cell.astype(jnp.float32) + u) / res) * 2.0 - 1.0
    if frames > 1:
        from ..data.multi import FRAME_SPACING

        xyz = xyz.at[:, 0].add(fidx.astype(jnp.float32) * FRAME_SPACING)
    sigma = jax.lax.stop_gradient(sigma_fn(xyz)).astype(jnp.float32)
    cur = jax.lax.dynamic_slice(occ, (off,), (rows,))
    new = jnp.maximum(cur * decay, sigma)
    return jax.lax.dynamic_update_slice(occ, new, (off,))


def occ_z_vals(key, occ, rays_o, rays_d, near, far, n_samples, res,
               n_bins=128, floor=0.01, det=False, frames: int = 1):
    """Grid-weighted coarse samples: (R, n_samples) ascending z values.

    Replaces `stratified_z_vals` when the grid is active: `n_bins` linear
    depth bins per ray are weighted by the grid density at their centers
    (normalized per ray to its max), plus a uniform exploration floor so no
    bin ever starves (empty-looking space keeps ~floor/(1+floor*K) of the
    mass per bin — wrong early grids recover). Inverse-CDF via sample_pdf.
    """
    from .sampling import sample_pdf

    near = near[:, None] if near.ndim == 1 else near
    far = far[:, None] if far.ndim == 1 else far
    t = jnp.linspace(0.0, 1.0, n_bins + 1, dtype=rays_o.dtype)
    z_edges = near * (1.0 - t) + far * t  # (R, K+1)
    z_mid = 0.5 * (z_edges[:, :-1] + z_edges[:, 1:])  # (R, K)
    xyz = rays_o[:, None, :] + rays_d[:, None, :] * z_mid[:, :, None]
    w = jnp.take(occ, _lookup_lin(xyz, res, frames).reshape(-1),
                 axis=0).reshape(z_mid.shape)
    w = w / (jnp.max(w, axis=-1, keepdims=True) + 1e-12) + floor
    w = jax.lax.stop_gradient(w)
    z = sample_pdf(key, z_edges, w, n_samples, det=det)
    # compositing needs ascending z (sample_pdf draws are unordered in train)
    return jax.lax.stop_gradient(jnp.sort(z, axis=-1))
