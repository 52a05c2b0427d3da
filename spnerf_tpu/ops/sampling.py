"""Ray sampling ops: stratified, inverse-CDF importance, and depth-guided 3-sigma.

Functional, shape-static JAX versions of /root/reference/modules/rendering.py:14-116.
The reference's data-dependent control flow (boolean-mask host round-trips in
`GenerateGuidedSamples`, modules/rendering.py:98-115) becomes mask-based `where`
selection so everything stays inside one jitted program.

All randomness is keyed: pass `key=None` for the deterministic variant.
"""

import math

import jax
import jax.numpy as jnp

INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def stratified_z_vals(key, near, far, n_samples, perturb=1.0):
    """Linear-in-depth stratified samples with jittering.

    Reference semantics: modules/rendering.py:131-144 (use_disp=False branch).
    near, far: (R, 1); returns (R, n_samples).
    """
    z_steps = jnp.linspace(0.0, 1.0, n_samples, dtype=near.dtype)
    z_vals = near * (1.0 - z_steps) + far * z_steps  # (R, S)
    if perturb > 0 and key is not None:
        z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        upper = jnp.concatenate([z_mid, z_vals[:, -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[:, :1], z_mid], axis=-1)
        u = perturb * jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
        z_vals = lower + (upper - lower) * u
    return z_vals


def masked_take_along_axis(x, idx):
    """`jnp.take_along_axis(x, idx, axis=-1)` as an equality-one-hot masked
    SUM: x (R, S), idx (R, n) -> (R, n). On TPU the (R, n)-from-(R, S) gather
    is row-latency-bound and its VJP is a row scatter; the masked sum is
    (R, n, S) fusable VPU work with an elementwise backward. Exact in the
    forward (exactly one term per output survives the mask); the backward
    accumulates duplicate-index cotangents in reduce order rather than
    scatter order (f32-sum-order difference only). CPU keeps the plain take;
    SPNERF_TAKE_REDUCE=0/1 overrides (1 pins the branch in CPU tests)."""
    import os

    mm = os.environ.get("SPNERF_TAKE_REDUCE", "auto")
    if mm == "0" or (mm == "auto" and jax.default_backend() in ("cpu",)):
        return jnp.take_along_axis(x, idx, axis=-1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, x.shape[-1]), 2)
    mask = idx[..., None] == iota  # (R, n, S)
    return jnp.sum(jnp.where(mask, x[:, None, :], jnp.zeros((), x.dtype)),
                   axis=-1)


def sample_pdf(key, bins, weights, n_importance, det=False, eps=1e-5):
    """Inverse-CDF sampling of `n_importance` points from per-ray histograms.

    bins: (R, M+1) bin edges; weights: (R, M). Returns (R, n_importance).
    Reference semantics: modules/rendering.py:14-55.
    """
    n_rays, m = weights.shape
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # (R, M+1)

    if det or key is None:
        u = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, n_importance, dtype=bins.dtype),
            (n_rays, n_importance),
        )
    else:
        u = jax.random.uniform(key, (n_rays, n_importance), dtype=bins.dtype)

    # 'compare_all' computes every bin comparison on the VPU in one shot; the
    # default 'scan' method lowers to a sequential O(log M) loop of dynamic
    # gathers, which is far slower on TPU for these small bin counts.
    inds = jax.vmap(
        lambda c, uu: jnp.searchsorted(c, uu, side="right", method="compare_all")
    )(cdf, u)
    below = jnp.clip(inds - 1, 0, m)
    above = jnp.clip(inds, 0, m)

    # On TPU the four (R, n)-from-(R, M+1) bin lookups are row-latency-bound
    # take_along_axis gathers — profiled 0.54 ms EACH on the flagship step
    # (R=1024, n=64: 4.3 ms/step over the two guided_samples calls). Both cdf
    # (cumsum of the non-negative pdf) and bins (sorted edges) are
    # NON-DECREASING along the bin axis, so take(x, below) == max over the
    # masked prefix x[..., :below+1] and take(x, above) == min over the
    # masked suffix — four (R, n, M+1) where+reduce chains, pure fusable VPU
    # work with no gather rows and no matmul (exact: max/min of a monotone
    # sequence SELECTS the boundary element; ties select an equal value).
    # SPNERF_PDF_LOOKUP selects take|reduce|matmul ("auto": reduce on
    # accelerators, take on CPU). "matmul" — one-hot einsum on the MXU — is a
    # measured REFUTATION kept for documentation: "rnm,rmc->rnc" lowers to R
    # independent (n, M+1)x(M+1, 2) matmuls, far too small for the 128x128
    # systolic array (241.1 vs 50.2 ms/step flagship, v5e round 3).
    import os

    mode = os.environ.get("SPNERF_PDF_LOOKUP", "auto")
    if mode == "auto":
        mode = "take" if jax.default_backend() in ("cpu",) else "reduce"
    if mode == "reduce":
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, m + 1), 2)
        lo_m = iota <= below[..., None]  # (R, n, M+1)
        hi_m = iota >= above[..., None]
        big = jnp.asarray(jnp.inf, bins.dtype)
        cdf_b, bins_b = cdf[:, None, :], bins[:, None, :]
        cdf_lo = jnp.max(jnp.where(lo_m, cdf_b, -big), axis=-1)
        bin_lo = jnp.max(jnp.where(lo_m, bins_b, -big), axis=-1)
        cdf_hi = jnp.min(jnp.where(hi_m, cdf_b, big), axis=-1)
        bin_hi = jnp.min(jnp.where(hi_m, bins_b, big), axis=-1)
    elif mode == "matmul":
        srcs = jnp.stack([cdf, bins], axis=-1)  # (R, M+1, 2)
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, m + 1), 2)
        oh_lo = (below[..., None] == iota).astype(bins.dtype)
        oh_hi = (above[..., None] == iota).astype(bins.dtype)
        lo = jnp.einsum("rnm,rmc->rnc", oh_lo, srcs,
                        precision=jax.lax.Precision.HIGHEST)
        hi = jnp.einsum("rnm,rmc->rnc", oh_hi, srcs,
                        precision=jax.lax.Precision.HIGHEST)
        cdf_lo, bin_lo = lo[..., 0], lo[..., 1]
        cdf_hi, bin_hi = hi[..., 0], hi[..., 1]
    else:
        cdf_lo = jnp.take_along_axis(cdf, below, axis=1)
        cdf_hi = jnp.take_along_axis(cdf, above, axis=1)
        bin_lo = jnp.take_along_axis(bins, below, axis=1)
        bin_hi = jnp.take_along_axis(bins, above, axis=1)

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < eps, 1.0, denom)
    return bin_lo + (u - cdf_lo) / denom * (bin_hi - bin_lo)


def sample_3sigma(key, low_3sigma, high_3sigma, n, det, near, far):
    """Gaussian-shaped sampling between per-ray [low, high] bounds clamped to
    [near, far]. Reference: modules/rendering.py:58-73.

    low_3sigma, high_3sigma: (R,); near, far: scalars OR per-ray (R,) arrays
    (multi-AOI batches mix scenes whose normalized near/far differ — clamping
    every ray to ray 0's bounds, as the single-AOI reference does, would pin
    guided samples to the wrong AOI's range). Returns (R, n).
    """
    near = jnp.broadcast_to(jnp.asarray(near, low_3sigma.dtype),
                            low_3sigma.shape)
    far = jnp.broadcast_to(jnp.asarray(far, low_3sigma.dtype),
                           low_3sigma.shape)
    t_vals = jnp.linspace(0.0, 1.0, n, dtype=low_3sigma.dtype)
    step_size = (high_3sigma - low_3sigma) / (n - 1)  # (R,)
    bin_edges = jnp.clip(
        low_3sigma[:, None] * (1.0 - t_vals) + high_3sigma[:, None] * t_vals,
        near[:, None],
        far[:, None],
    )  # (R, n)
    # guard degenerate (zero-width) ranges so masked-out rays stay finite
    safe_step = jnp.where(jnp.abs(step_size) < 1e-12, 1.0, step_size)
    factor = (bin_edges[:, 1:] - bin_edges[:, :-1]) / safe_step[:, None]
    x = jnp.linspace(-3.0, 3.0, n - 1, dtype=low_3sigma.dtype)
    gauss = INV_SQRT_2PI * jnp.exp(-0.5 * x**2)
    bin_weights = factor * gauss[None, :]
    return sample_pdf(key, bin_edges, bin_weights, n, det=det)


def compute_samples_around_depth(key, depth, weights, z_vals, n_samples, det, near, far):
    """Resample within 3 sigma of the *predicted* depth distribution.

    Reference: modules/rendering.py:76-89. depth: (R,), weights/z_vals: (R, S).
    """
    sampling_std = jnp.sqrt(
        jnp.sum((z_vals - depth[:, None]) ** 2 * weights, axis=-1)
    )
    return sample_3sigma(
        key, depth - 3.0 * sampling_std, depth + 3.0 * sampling_std,
        n_samples, det, near, far,
    )


def guided_samples(
    key,
    pred_depth,
    pred_weights,
    z_vals,
    n_samples,
    det,
    near,
    far,
    train,
    valid_depth=None,
    target_depth=None,
    target_std=None,
):
    """Depth-guided sampling (SpS-NeRF): sample around the predicted depth, and —
    in training, for rays with valid stereo depth — around the target depth's
    3-sigma interval instead. Mask-based version of modules/rendering.py:92-116.

    Returns (R, n_samples) z values (callers should stop_gradient them, as the
    reference detaches at modules/rendering.py:164).
    """
    k1, k2 = (None, None) if key is None else jax.random.split(key)
    z_pred = compute_samples_around_depth(
        k1, pred_depth, pred_weights, z_vals, n_samples, det, near, far
    )
    if not train:
        return z_pred
    assert valid_depth is not None and target_depth is not None
    valid = valid_depth > 0
    mid = jnp.broadcast_to(jnp.asarray(0.5 * (near + far),
                                       pred_depth.dtype), pred_depth.shape)
    # keep masked-out rows numerically safe (their samples are discarded below)
    safe_depth = jnp.where(valid, target_depth, mid)
    safe_std = jnp.where(valid, jnp.maximum(target_std, 1e-12), 1.0)
    z_gt = sample_3sigma(
        k2, safe_depth - 3.0 * safe_std, safe_depth + 3.0 * safe_std,
        n_samples, det, near, far,
    )
    return jnp.where(valid[:, None], z_gt, z_pred)
