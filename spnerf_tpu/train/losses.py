"""Training losses, functional and shape-static for jit.

Re-implements the semantics of the reference loss stack
(/root/reference/modules/metrics.py:10-194) as pure functions over the renderer
output dict. The reference filters rays with boolean indexing (dynamic shapes,
modules/metrics.py:90-123); here every subset rule becomes a mask-weighted sum so
a single XLA program covers all batches:

  * subset depth loss: the reference computes
        scaling * mean_over_applied(w * (pred - target)^2)
    with scaling = n_applied / n_batch — algebraically equal to
        sum(w * (pred - target)^2 * mask) / n_batch,
    which is what the masked implementation evaluates (exact, not approximate).
  * cross entropy ignores labels < 0 (torch ignore_index=-100) by masking.

Every loss returns (total, dict-of-terms); term keys match the reference logging
names ("coarse_color", "fine_sc_term2", "coarse_ds", "coarse_ss", ...).
"""

import jax
import jax.numpy as jnp

from ..config import LossConfig

_EPS_GNLL = 1e-6  # torch.nn.GaussianNLLLoss eps


def _mse(a, b):
    return jnp.mean((a - b) ** 2)


def solar_correction_terms(result, lambda_sc):
    """Shadow-NeRF solar terms 2 & 3 (reference modules/metrics.py:17-24).

    result: per-pass dict with weights_sc (R,S), transparency_sc (R,S),
    sun_sc (R,S,1) — the secondary pass along the sun direction.
    """
    sun_sc = result["sun_sc"][..., 0]  # (R, S)
    trans = jax.lax.stop_gradient(result["transparency_sc"])
    weights = jax.lax.stop_gradient(result["weights_sc"])
    term2 = jnp.sum((trans - sun_sc) ** 2, axis=-1)
    term3 = 1.0 - jnp.sum(weights * sun_sc, axis=-1)
    return lambda_sc / 3.0 * jnp.mean(term2), lambda_sc / 3.0 * jnp.mean(term3)


def snerf_loss(results, target_rgb, lc: LossConfig):
    """RGB MSE + optional solar correction, coarse then fine.

    Reference: SNerfLoss (modules/metrics.py:27-45).
    """
    loss_dict = {}
    for typ in ("coarse", "fine"):
        if f"rgb_{typ}" not in results:
            continue
        pass_result = {k[: -len(typ) - 1]: v for k, v in results.items()
                       if k.endswith(f"_{typ}")}
        loss_dict[f"{typ}_color"] = _mse(pass_result["rgb"], target_rgb)
        if lc.sc_lambda > 0:
            t2, t3 = solar_correction_terms(pass_result, lc.sc_lambda)
            loss_dict[f"{typ}_sc_term2"] = t2
            loss_dict[f"{typ}_sc_term3"] = t3
    total = sum(loss_dict.values())
    return total, loss_dict


def satnerf_loss(results, target_rgb, lc: LossConfig, beta_min=0.05):
    """Beta-uncertainty color loss + log-beta regularizer (+ solar terms).

    Reference: SatNerfLoss + uncertainty_aware_loss (modules/metrics.py:10-14,48-65).
    Deviation (documented): the reference indexes `beta_coarse` for BOTH passes
    (metrics.py:11), which shape-errors whenever n_importance > 0 adds samples —
    the beta+fine combination is unusable there. Here each pass composites its
    own beta (identical to the reference in every configuration that runs).
    """
    loss_dict = {}
    for typ in ("coarse", "fine"):
        if f"rgb_{typ}" not in results:
            continue
        pass_result = {k[: -len(typ) - 1]: v for k, v in results.items()
                       if k.endswith(f"_{typ}")}
        weights = pass_result["weights"]  # (R, S)
        beta_per_sample = results.get(f"beta_{typ}", results["beta_coarse"])
        beta = (
            jnp.sum(weights[..., None] * beta_per_sample, axis=-2) + beta_min
        )  # (R, 1)
        loss_dict[f"{typ}_color"] = jnp.mean(
            (pass_result["rgb"] - target_rgb) ** 2 / (2.0 * beta**2)
        )
        loss_dict[f"{typ}_logbeta"] = (3.0 + jnp.mean(jnp.log(beta))) / 2.0
        if lc.sc_lambda > 0:
            t2, t3 = solar_correction_terms(pass_result, lc.sc_lambda)
            loss_dict[f"{typ}_sc_term2"] = t2
            loss_dict[f"{typ}_sc_term3"] = t3
    total = sum(loss_dict.values())
    return total, loss_dict


def _pred_depth_std(z_vals, pred_depth, pred_weights):
    """sqrt(sum(w * (z - d)^2)): std of the depth distribution along a ray
    (reference modules/metrics.py:102).

    The sum is floored before the sqrt: a fully-transparent ray (all weights
    underflowed to 0) would otherwise produce sqrt(0), whose VJP is 0/0 = NaN
    even under a zero cotangent — one such ray in a GNLL depth batch would
    NaN-poison every parameter gradient."""
    return jnp.sqrt(jnp.maximum(
        jnp.sum((z_vals - pred_depth[:, None]) ** 2 * pred_weights, axis=-1),
        1e-12,
    ))


def depth_loss(
    results,
    target_depth,
    target_weight,
    valid_depth,
    target_std,
    lc: LossConfig,
):
    """Stereo-depth supervision, masked equivalent of the reference DepthLoss
    (modules/metrics.py:68-159).

    target_depth, target_weight, target_std: (R,); valid_depth: (R,) 0/1.
    Semantics per branch:
      usealldepth=True, MSE: lambda/3 * mean(w * (d_pred - d_t)^2) over ALL rays
        (the reference applies no valid mask in this branch — kept for parity).
      usealldepth=False: subset rule — only rays that are valid AND fail the
        expected-distribution test (|d_pred - d_t| > std_t or std_pred > std_t)
        contribute; the reference's scaling * subset-mean == masked-sum / R.
      GNLL: torch.nn.GaussianNLLLoss with var := pred_std (sic — the reference
        passes the std where torch expects a variance; kept for parity).
    """
    loss_dict = {}
    n_rays = target_depth.shape[0]
    lam = lc.ds_lambda / 3.0
    valid = valid_depth > 0

    for typ in ("coarse", "fine"):
        if f"depth_{typ}" not in results:
            continue
        pred_depth = results[f"depth_{typ}"]
        if lc.usealldepth and not lc.gnll:
            loss_dict[f"{typ}_ds"] = lam * jnp.mean(
                target_weight * (pred_depth - target_depth) ** 2
            )
            continue

        pred_std = _pred_depth_std(
            results[f"z_vals_{typ}"], pred_depth, results[f"weights_{typ}"]
        )
        if lc.usealldepth:
            apply_mask = valid
        else:
            off_distribution = jnp.logical_or(
                jnp.abs(pred_depth - target_depth) > target_std,
                pred_std > target_std,
            )
            apply_mask = jnp.logical_and(valid, off_distribution)
        maskf = apply_mask.astype(pred_depth.dtype)
        if lc.gnll:
            var = jnp.maximum(pred_std, _EPS_GNLL)
            nll = 0.5 * (jnp.log(var) + (pred_depth - target_depth) ** 2 / var)
            # scaling * mean_over_applied(nll) == sum(nll * mask) / R
            loss_dict[f"{typ}_ds"] = lam * jnp.sum(nll * maskf) / n_rays
        else:
            sq = target_weight * (pred_depth - target_depth) ** 2
            loss_dict[f"{typ}_ds"] = lam * jnp.sum(sq * maskf) / n_rays

    total = sum(loss_dict.values()) if loss_dict else jnp.float32(0.0)
    return total, loss_dict


def semantic_loss(results, target_labels, lc: LossConfig):
    """Cross entropy on the mean-pooled per-ray logits, ignoring labels < 0.

    Reference: SemanticLoss (modules/metrics.py:162-183) with torch
    CrossEntropyLoss(ignore_index=-100) — the mean is over non-ignored rays.
    target_labels: (R,) int32 with -100 for void.
    """
    loss_dict = {}
    labels = jnp.asarray(target_labels, jnp.int32)
    valid = labels >= 0
    safe_labels = jnp.where(valid, labels, 0)
    maskf = valid.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(maskf), 1.0)

    for typ in ("coarse", "fine"):
        if f"sem_logits_{typ}" not in results:
            continue
        logits = results[f"sem_logits_{typ}"]  # (R, C)
        logp = jax.nn.log_softmax(logits, axis=-1)
        # one-hot masked sum instead of take_along_axis: the (R, 1) gather
        # and its (R,)-row scatter backward are row-latency-bound on TPU;
        # the sum over C (= num classes, tiny) is fusable VPU work and its
        # backward is elementwise. Exact: one term per row survives the mask.
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, logp.shape[-1]), 1)
        nll = -jnp.sum(jnp.where(safe_labels[:, None] == iota_c, logp, 0.0),
                       axis=-1)
        loss_dict[f"{typ}_ss"] = lc.ss_lambda * jnp.sum(nll * maskf) / denom

    total = sum(loss_dict.values()) if loss_dict else jnp.float32(0.0)
    return total, loss_dict


def total_loss(
    results,
    batch,
    lc: LossConfig,
    step,
    ds_drop_step,
    ss_drop_step,
    use_beta_loss=False,
):
    """Full training objective with drop schedules, mirroring
    /root/reference/main.py:150-174.

    batch: dict with rgbs (R,3) and, when enabled, depths (R,2) [depth, weight],
    valid_depth (R,), depth_std (R,), sems (R,).
    use_beta_loss: traced bool — False uses the beta-free SNerfLoss even when the
    model emits beta (warmup, main.py:150-153); in jit both branches are traced
    and selected with where.
    """
    if lc.beta:
        base_beta, dict_beta = satnerf_loss(results, batch["rgbs"], lc)
        base_plain, dict_plain = snerf_loss(results, batch["rgbs"], lc)
        use_b = jnp.asarray(use_beta_loss)
        base = jnp.where(use_b, base_beta, base_plain)
        loss_dict = {
            k: jnp.where(use_b, dict_beta.get(k, 0.0), dict_plain.get(k, 0.0))
            for k in set(dict_beta) | set(dict_plain)
        }
    else:
        base, loss_dict = snerf_loss(results, batch["rgbs"], lc)

    total = base
    if lc.depth and lc.ds_lambda > 0:
        d_loss, d_dict = depth_loss(
            results,
            batch["depths"][:, 0],
            batch["depths"][:, 1],
            batch["valid_depth"],
            batch["depth_std"],
            lc,
        )
        total = total + jnp.where(step < ds_drop_step, d_loss, 0.0)
        loss_dict.update(d_dict)

    if lc.sem:
        s_loss, s_dict = semantic_loss(results, batch["sems"], lc)
        total = total + jnp.where(step < ss_drop_step, s_loss, 0.0)
        loss_dict.update(s_dict)

    return total, loss_dict
