"""The ray renderer: coarse stratified pass, optional depth-guided resampling,
optional solar-correction pass along the sun direction, optional fine
(hierarchical) pass. Functional JAX version of
/root/reference/modules/rendering.py:119-218.

The field is abstracted as `field_apply(xyz, sun_d, t_emb, sem_labels) -> dict`
over flat (N, ...) point batches (bind `model.apply` + params, or the fused
Pallas kernel). The whole renderer is shape-static and jit-safe; there is no
chunking — memory is managed by XLA and, at eval time, by the caller batching
rays (the reference's python chunk loops at main.py:60-73 and
models/spnerf.py:93-107 exist only to fit GPU memory).
"""

import os as _os

import jax
import jax.numpy as jnp

# perf-experiment escape hatches (measured on hardware; see CLAUDE.md):
# SPNERF_NO_MERGE=1 re-evaluates the field at all sorted guided samples
# (reference behavior); SPNERF_NO_PRUNE=1 runs every head in the solar pass;
# SPNERF_BATCH_SC=1 batches the solar-correction pass into the preceding
# field evaluation (one trunk call at 3x rows). MEASURED SLOWER on the v5e
# flagship step — 55.2 ms/step vs 51.0 with separate head-pruned passes
# (round 3): the rgb/sky/sem head compute forced onto the 2S solar rows
# outweighs the saved pass overhead, so separate passes stay the default.
# ALSO slower on the full HASH config (round 3, T=2^19, batch 1024): 230.1
# vs 215.0 ms/step — despite cutting the per-level table gathers from 24 to
# 16 per step (the hypothesis: each gather pays a ~2.6 ms table-layout
# conversion), the 3x-row encoding + unpruned heads cost more than the 8
# removed gather conversions recover. Refuted for both field families.
_NO_MERGE = _os.environ.get("SPNERF_NO_MERGE") == "1"
_NO_PRUNE = _os.environ.get("SPNERF_NO_PRUNE") == "1"


def _batch_sc_enabled():
    # read at trace time (not import time) so tests can cover both paths
    return _os.environ.get("SPNERF_BATCH_SC") == "1"


def _batch_solar_enabled(field_apply):
    """SPNERF_BATCH_SOLAR=1: batch the solar-correction pass into the
    preceding view-ray field evaluation WITH per-row head pruning (models'
    `solar_tail` kwarg): encoding + trunk + sigma + sun head run over the
    union of both passes' points, rgb/sky/beta/sem only over the view rows.
    This targets what refuted SPNERF_BATCH_SC — the unpruned-head compute on
    solar rows — while keeping its hash win (one table gather per level
    instead of one per pass; each gather fusion pays a ~2.6 ms operand-layout
    conversion on the v5e regardless of row count).

    MEASURED REFUTED on both families (v5e, this round), default OFF:
    hash T=2^19 integrated 155.8 vs 145.9 ms/step — cutting the gather
    fusions 24 -> 16 should save ~20 ms of operand conversion, but merging
    the guided and solar encodings serializes two INDEPENDENT per-level
    backward chains (sort -> window dtab kernel -> cond) that XLA previously
    overlapped, the same lesson as the batched cross-level dtab refutation
    (models/hashgrid.py); flagship 43.2 vs 42.7 ms/step — the emitter-bound
    matmul plateau gains nothing from a 3x-row stack. Numerics are
    parity-exact (tests/test_batch_solar.py), so the path stays selectable
    for toolchains whose scheduler handles the merged chain better."""
    if not getattr(field_apply, "supports_solar_tail", False):
        return False
    return _os.environ.get("SPNERF_BATCH_SOLAR") == "1"

from ..config import RenderConfig
from .compositing import composite
from .sampling import guided_samples, sample_pdf, stratified_z_vals


def _eval_field(field_apply, rays_o, ray_dirs, z_vals, sun_d, t_emb, sems,
                heads=None):
    """Evaluate the field on every (ray, sample) point.

    rays_o, ray_dirs, sun_d: (R, 3); z_vals: (R, S);
    t_emb: (R, T) or None; sems: (R,) int or None.
    heads: optional head subset forwarded to the field (None = all).
    Returns per-sample dict with arrays (R, S, ...).
    """
    n_rays, n_samples = z_vals.shape
    xyz = rays_o[:, None, :] + ray_dirs[:, None, :] * z_vals[:, :, None]
    xyz_flat = xyz.reshape(-1, 3)
    sun_flat = jnp.broadcast_to(sun_d[:, None, :], (n_rays, n_samples, 3)).reshape(-1, 3)
    t_flat = (
        None
        if t_emb is None
        else jnp.broadcast_to(
            t_emb[:, None, :], (n_rays, n_samples, t_emb.shape[-1])
        ).reshape(-1, t_emb.shape[-1])
    )
    sem_flat = (
        None
        if sems is None
        else jnp.broadcast_to(sems[:, None], (n_rays, n_samples)).reshape(-1)
    )
    if heads is None:
        out = field_apply(xyz_flat, sun_flat, t_flat, sem_flat)
    else:
        out = field_apply(xyz_flat, sun_flat, t_flat, sem_flat, heads=heads)
    return {k: v.reshape((n_rays, n_samples) + v.shape[1:]) for k, v in out.items()}


def _eval_field_cat(field_apply, xyz_sets, sun_d, t_emb, sems, heads=None):
    """ONE field evaluation over the concatenation of several (R, S_i, 3)
    point sets that share per-ray sun/t/sem inputs; returns one per-sample
    dict per set.

    This is the TPU-native fusion of passes whose point sets are known
    simultaneously (e.g. the guided second pass and the solar-correction
    pass): instead of two kernel stacks over 64k and 131k rows, XLA sees one
    matmul stack over the union — larger MXU tiles, half the pass overhead.
    The reference evaluates each pass separately
    (/root/reference/modules/rendering.py:166-177)."""
    n_rays = xyz_sets[0].shape[0]
    sizes = [x.shape[1] for x in xyz_sets]
    s_total = sum(sizes)
    xyz_flat = jnp.concatenate(xyz_sets, axis=1).reshape(-1, 3)
    sun_flat = jnp.broadcast_to(
        sun_d[:, None, :], (n_rays, s_total, 3)).reshape(-1, 3)
    t_flat = (
        None
        if t_emb is None
        else jnp.broadcast_to(
            t_emb[:, None, :], (n_rays, s_total, t_emb.shape[-1])
        ).reshape(-1, t_emb.shape[-1])
    )
    sem_flat = (
        None
        if sems is None
        else jnp.broadcast_to(sems[:, None], (n_rays, s_total)).reshape(-1)
    )
    if heads is None:
        out = field_apply(xyz_flat, sun_flat, t_flat, sem_flat)
    else:
        out = field_apply(xyz_flat, sun_flat, t_flat, sem_flat, heads=heads)
    out = {k: v.reshape((n_rays, s_total) + v.shape[1:]) for k, v in out.items()}
    result, ofs = [], 0
    for s in sizes:
        result.append({k: v[:, ofs:ofs + s] for k, v in out.items()})
        ofs += s
    return result


def _eval_field_tail(field_apply, xyz_view, xyz_sc, sun_d, t_emb, sems):
    """ONE field evaluation over a view point set (R, Sv, 3) and a solar
    point set (R, Ss, 3), with the solar rows head-pruned in-model
    (`solar_tail`). Rows are SET-major (all view rows, then all solar rows)
    so the solar set is a contiguous tail the model can slice statically.
    Returns (view_field, sc_field) with (R, S, ...) arrays; sc_field carries
    only sigma and sun_v (all the solar loss terms consume,
    /root/reference/modules/rendering.py:171-177)."""
    n_rays, sv = xyz_view.shape[:2]
    ss = xyz_sc.shape[1]

    def per_row(x, s, width=None):
        if width is None:
            return jnp.broadcast_to(x[:, None], (n_rays, s)).reshape(-1)
        return jnp.broadcast_to(
            x[:, None, :], (n_rays, s, width)).reshape(-1, width)

    xyz_flat = jnp.concatenate(
        [xyz_view.reshape(-1, 3), xyz_sc.reshape(-1, 3)], axis=0)
    sun_flat = jnp.concatenate(
        [per_row(sun_d, sv, 3), per_row(sun_d, ss, 3)], axis=0)
    t_flat = (
        None
        if t_emb is None
        else jnp.concatenate([per_row(t_emb, sv, t_emb.shape[-1]),
                              per_row(t_emb, ss, t_emb.shape[-1])], axis=0)
    )
    sem_flat = (
        None
        if sems is None
        else jnp.concatenate([per_row(sems, sv), per_row(sems, ss)], axis=0)
    )
    out = field_apply(xyz_flat, sun_flat, t_flat, sem_flat,
                      solar_tail=n_rays * ss)
    n_view = n_rays * sv
    view_field = {
        k: v[:n_view].reshape((n_rays, sv) + v.shape[1:])
        for k, v in out.items()
    }
    sc_field = {
        k: out[k][n_view:].reshape((n_rays, ss) + out[k].shape[1:])
        for k in ("sigma", "sun_v")
    }
    return view_field, sc_field


def _sort_perm(z_a, z_b):
    """Sort permutation for the concatenation of two per-ray z sets.

    Returns (perm, z_sorted, z_unsort) where perm is the (R, out, in) one-hot
    matrix that maps concatenation order to sorted order (see _merge_sorted
    for why a matmul rather than take_along_axis)."""
    z_unsort = jnp.concatenate([z_a, z_b], axis=-1)  # (R, S2)
    s2 = z_unsort.shape[-1]
    order = jnp.argsort(z_unsort, axis=-1)  # (R, S2)
    eye = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s2), 2)
    perm = jax.lax.stop_gradient(
        (order[:, :, None] == eye).astype(jnp.float32))  # (R, out, in)
    z_sorted = jnp.einsum("roi,ri->ro", perm, z_unsort,
                          precision=jax.lax.Precision.HIGHEST)
    return perm, z_sorted, z_unsort


def _apply_perm(field_a, field_b, perm):
    """Permute the concatenated per-sample channels of two field dicts into
    sorted order with one batched one-hot matmul (sem_logits exempt: the
    compositor mean-pools it, which is permutation-invariant)."""
    pack_keys = [k for k in field_a if k != "sem_logits"]
    parts, widths = [], []
    for k in pack_keys:
        v = jnp.concatenate([field_a[k], field_b[k]], axis=1)
        if v.ndim == 2:
            v = v[..., None]
        parts.append(v.astype(jnp.float32))
        widths.append(v.shape[-1])
    packed = jnp.concatenate(parts, axis=-1)
    sorted_packed = jnp.einsum("roi,ric->roc", perm, packed,
                               precision=jax.lax.Precision.HIGHEST)
    merged, ofs = {}, 0
    for k, w in zip(pack_keys, widths):
        v = sorted_packed[..., ofs:ofs + w]
        ofs += w
        merged[k] = v[..., 0] if field_a[k].ndim == 2 else v
    if "sem_logits" in field_a:
        merged["sem_logits"] = jnp.concatenate(
            [field_a["sem_logits"], field_b["sem_logits"]], axis=1)
    return merged


def _merge_sorted(field_a, z_a, field_b, z_b):
    """Merge two per-sample field dicts along the sample axis in z-sorted order.

    Returns (field_merged, z_sorted, z_unsorted). Field values at the original
    z positions are REUSED, not re-evaluated: the field is a deterministic
    function of the point, so permuting the pass-1 outputs into sorted order is
    numerically identical to re-evaluating them (the reference re-runs the full
    MLP on the concatenated sorted samples, modules/rendering.py:166-170 — 64
    of its 128 second-pass evaluations recompute values it already had).

    The permutation is applied as a one-hot MATMUL, not take_along_axis: the
    gather's backward is a scatter, which serializes on TPU and (measured)
    costs more than the field evaluations the merge saves. A one-hot f32
    matmul at HIGHEST precision is exact for 0/1 weights (each output row sums
    exactly one input row) and its backward is just the transposed matmul.
    sem_logits is exempt: the compositor mean-pools it over samples, which is
    permutation-invariant, so it stays in concatenation order.
    """
    perm, z_sorted, z_unsort = _sort_perm(z_a, z_b)
    return _apply_perm(field_a, field_b, perm), z_sorted, z_unsort


def _inference(field_apply, rays_o, ray_dirs, z_vals, sun_d, t_emb, sems,
               noise_std, key, heads=None):
    field_out = _eval_field(field_apply, rays_o, ray_dirs, z_vals, sun_d,
                            t_emb, sems, heads=heads)
    return composite(field_out, z_vals, noise_std=noise_std, key=key)


def render_rays(
    field_apply,
    rc: RenderConfig,
    rays,
    t_emb=None,
    sems=None,
    key=None,
    train=False,
    valid_depth=None,
    target_depths=None,
    target_std=None,
    noise_std=0.0,
    fine_field_apply=None,
    proposal_apply=None,
    occ=None,
):
    """Render a batch of rays.

    rays: (R, 11) float32 — columns 0:3 origin, 3:6 unit direction, 6 near,
      7 far, 8:11 sun direction (the reference ray layout,
      /root/reference/datasets/satellite_scene.py:167-171,217).
    t_emb: (R, T) transient embeddings (beta path) or None.
    sems: (R,) int semantic labels (or None).
    train: python bool (static) — enables guided sampling against target depths.
    valid_depth: (R,), target_depths: (R, 2) [depth, weight], target_std: (R,).
    noise_std: dynamic scalar sigma-noise (decayed per step by the caller).
    fine_field_apply: field for the fine pass (defaults to `field_apply`).

    Returns a dict with `_coarse` (and `_fine`) suffixed keys exactly like the
    reference renderer, e.g. rgb_coarse (R,3), depth_coarse (R,),
    weights_coarse (R,S'), sun_sc_coarse, ...
    """
    if fine_field_apply is None:
        fine_field_apply = field_apply
    keys = {}
    if key is not None:
        names = ["strat", "noise0", "guided", "noise1", "sc_noise", "pdf",
                 "noise_fine", "sc_noise_fine", "prop_pdf"]
        for name, k in zip(names, jax.random.split(key, len(names))):
            keys[name] = k
    get = keys.get

    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]
    sun_d = rays[:, 8:11]
    # per-ray bounds for the guided-sampling clamp: the reference uses
    # near[0,0]/far[0,0] (single-AOI, all rays identical); multi-AOI batches
    # mix scenes with different normalized far, so clamp each ray to its own
    near_r, far_r = near[:, 0], far[:, 0]

    prop_extras = {}
    if rc.proposal and proposal_apply is not None:
        # density-only proposal pass places the main samples
        # (ops/proposal.py; not in the reference — NGP-class stretch)
        from .proposal import density_weights, resample_from_weights

        z_prop = stratified_z_vals(get("strat"), near, far, rc.n_proposal,
                                   rc.perturb)
        xyz_prop = (rays_o[:, None, :]
                    + rays_d[:, None, :] * z_prop[:, :, None]).reshape(-1, 3)
        sigmas_prop = proposal_apply(xyz_prop).reshape(z_prop.shape)
        w_prop = density_weights(sigmas_prop, z_prop)
        z_vals = resample_from_weights(get("prop_pdf"), z_prop, w_prop,
                                       rc.n_samples, det=(rc.perturb == 0.0))
        prop_extras = {"z_prop": z_prop, "w_prop": w_prop}
    elif rc.occ_grid and occ is not None:
        # occupancy-grid guided coarse placement (--occgrid, ops/occgrid.py):
        # the static coarse budget is drawn from per-ray depth bins weighted
        # by the cached density grid instead of stratified-uniform
        from .occgrid import occ_z_vals

        z_vals = occ_z_vals(get("strat"), occ, rays_o, rays_d, near, far,
                            rc.n_samples, rc.occ_res, n_bins=rc.occ_bins,
                            floor=rc.occ_floor, det=(rc.perturb == 0.0),
                            frames=rc.occ_frames)
    else:
        z_vals = stratified_z_vals(get("strat"), near, far, rc.n_samples,
                                   rc.perturb)

    # solar-correction pass batching (opt-in, measured slower — see the
    # SPNERF_BATCH_SC note at the top): the solar pass evaluates the field at
    # rays_o + sun_d * z over the FINAL z set, which is known before the last
    # view-ray field evaluation runs — so both share one batched trunk call
    # (_eval_field_cat). When guided sampling is on, the final z set (the
    # sorted merge) depends only on the coarse composite, not on the second
    # pass's field outputs, so the guided-new points and the solar points
    # batch together; without guided sampling the coarse and solar points do.
    batch_solar = (rc.solar_correction and not _NO_PRUNE
                   and _batch_solar_enabled(field_apply))
    batch_sc = (rc.solar_correction and _batch_sc_enabled()
                and not _NO_PRUNE and not batch_solar)
    sc_field = None  # per-sample {sigma, sun_v} of the solar pass, when batched

    if rc.guidedsample or not (batch_sc or batch_solar):
        field1 = _eval_field(field_apply, rays_o, rays_d, z_vals, sun_d, t_emb,
                             sems)
    elif batch_solar:
        xyz1 = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[:, :, None]
        xyz_sc = rays_o[:, None, :] + sun_d[:, None, :] * z_vals[:, :, None]
        field1, sc_field = _eval_field_tail(field_apply, xyz1, xyz_sc, sun_d,
                                            t_emb, sems)
    else:
        xyz1 = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[:, :, None]
        xyz_sc = rays_o[:, None, :] + sun_d[:, None, :] * z_vals[:, :, None]
        field1, sc_all = _eval_field_cat(field_apply, [xyz1, xyz_sc], sun_d,
                                         t_emb, sems)
        sc_field = {"sigma": sc_all["sigma"], "sun_v": sc_all["sun_v"]}
    result = composite(field1, z_vals, noise_std=noise_std, key=get("noise0"))

    if rc.guidedsample:
        z_vals_2 = guided_samples(
            get("guided"),
            result["depth"],
            result["weights"],
            z_vals,
            rc.n_samples,
            det=(rc.perturb == 0.0),
            near=near_r,
            far=far_r,
            train=train,
            valid_depth=valid_depth,
            target_depth=None if target_depths is None else target_depths[:, 0],
            target_std=target_std,
        )
        z_vals_2 = jax.lax.stop_gradient(jnp.sort(z_vals_2, axis=-1))
        if _NO_MERGE:
            z_vals_unsort = jnp.concatenate([z_vals, z_vals_2], axis=-1)
            z_vals = jnp.sort(z_vals_unsort, axis=-1)
            result = _inference(
                field_apply, rays_o, rays_d, z_vals, sun_d, t_emb, sems,
                noise_std, get("noise1"),
            )
        elif batch_solar:
            # one field call over the new guided samples (all heads) AND the
            # solar points at the merged z set, with the solar rows pruned to
            # sigma+sun in-model (`solar_tail`): for the hash family this is
            # ONE table gather per level instead of two (the per-fusion
            # operand-layout conversion is the dominant hash-step cost), and
            # for the siren family one trunk matmul stack at 3x rows
            perm, z_sorted, z_vals_unsort = _sort_perm(result["z_vals"],
                                                       z_vals_2)
            xyz2 = (rays_o[:, None, :]
                    + rays_d[:, None, :] * z_vals_2[:, :, None])
            xyz_sc = (rays_o[:, None, :]
                      + sun_d[:, None, :] * z_sorted[:, :, None])
            field2, sc_field = _eval_field_tail(field_apply, xyz2, xyz_sc,
                                                sun_d, t_emb, sems)
            field_all = _apply_perm(field1, field2, perm)
            z_vals = z_sorted
            result = composite(field_all, z_vals, noise_std=noise_std,
                               key=get("noise1"))
        elif batch_sc:
            # evaluate the field once over BOTH the new guided samples
            # (view-ray points, all heads) and the solar points at the merged
            # z set (which needs only the coarse composite + the argsort) —
            # one trunk call at 3x the coarse row count instead of two
            perm, z_sorted, z_vals_unsort = _sort_perm(result["z_vals"],
                                                       z_vals_2)
            xyz2 = (rays_o[:, None, :]
                    + rays_d[:, None, :] * z_vals_2[:, :, None])
            xyz_sc = (rays_o[:, None, :]
                      + sun_d[:, None, :] * z_sorted[:, :, None])
            field2, sc_all = _eval_field_cat(field_apply, [xyz2, xyz_sc],
                                             sun_d, t_emb, sems)
            sc_field = {"sigma": sc_all["sigma"], "sun_v": sc_all["sun_v"]}
            field_all = _apply_perm(field1, field2, perm)
            z_vals = z_sorted
            result = composite(field_all, z_vals, noise_std=noise_std,
                               key=get("noise1"))
        else:
            # evaluate the field only at the NEW guided samples; the
            # coarse-pass outputs are merged in by sort permutation
            # (see _merge_sorted)
            field2 = _eval_field(field_apply, rays_o, rays_d, z_vals_2, sun_d,
                                 t_emb, sems)
            field_all, z_vals, z_vals_unsort = _merge_sorted(
                field1, result["z_vals"], field2, z_vals_2)
            result = composite(field_all, z_vals, noise_std=noise_std,
                               key=get("noise1"))
        result["z_vals_unsort"] = z_vals_unsort

    if rc.solar_correction:
        # secondary pass along the sun direction: only sigma (stop-gradient
        # through weights/transparency) and sun_v are consumed by the solar
        # loss terms (train/losses.py solar_correction_terms), so the rgb /
        # sky / sem / beta heads are pruned from this pass — unless the pass
        # was batched into the previous field call (sc_field), where pruning
        # is impossible but the kernel count halves
        if sc_field is not None:
            sc = composite(sc_field, z_vals, noise_std=noise_std,
                           key=get("sc_noise"))
        else:
            sc = _inference(
                field_apply, rays_o, sun_d, z_vals, sun_d, t_emb, sems,
                noise_std, get("sc_noise"),
                heads=None if _NO_PRUNE else ("sun",),
            )
        result["weights_sc"] = sc["weights"]
        result["transparency_sc"] = sc["transparency"]
        result["sun_sc"] = sc["sun"]

    out = {f"{k}_coarse": v for k, v in result.items()}
    out.update({f"{k}_coarse": v for k, v in prop_extras.items()})

    if rc.n_importance > 0:
        z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        z_extra = sample_pdf(
            get("pdf"), z_mid, out["weights_coarse"][:, 1:-1],
            rc.n_importance, det=(rc.perturb == 0.0),
        )
        z_extra = jax.lax.stop_gradient(z_extra)
        z_fine = jnp.sort(jnp.concatenate([z_vals, z_extra], axis=-1), axis=-1)
        batch_solar_fine = (rc.solar_correction and not _NO_PRUNE
                            and _batch_solar_enabled(fine_field_apply))
        if batch_solar_fine:
            # fine view points and fine solar points are both functions of
            # z_fine, so they batch into one field call (solar rows pruned
            # to sigma+sun in-model — see _batch_solar_enabled)
            xyz_f = (rays_o[:, None, :]
                     + rays_d[:, None, :] * z_fine[:, :, None])
            xyz_fsc = (rays_o[:, None, :]
                       + sun_d[:, None, :] * z_fine[:, :, None])
            fine_field, sc_f = _eval_field_tail(fine_field_apply, xyz_f,
                                                xyz_fsc, sun_d, t_emb, sems)
            fine = composite(fine_field, z_fine, noise_std=noise_std,
                             key=get("noise_fine"))
            sc = composite(sc_f, z_fine, noise_std=noise_std,
                           key=get("sc_noise_fine"))
        else:
            fine = _inference(
                fine_field_apply, rays_o, rays_d, z_fine, sun_d, t_emb, sems,
                noise_std, get("noise_fine"),
            )
            sc = None
            if rc.solar_correction:
                sc = _inference(
                    fine_field_apply, rays_o, sun_d, z_fine, sun_d, t_emb,
                    sems, noise_std, get("sc_noise_fine"),
                    heads=None if _NO_PRUNE else ("sun",),
                )
        if rc.solar_correction:
            fine["weights_sc"] = sc["weights"]
            fine["transparency_sc"] = sc["transparency"]
            fine["sun_sc"] = sc["sun"]
        out.update({f"{k}_fine": v for k, v in fine.items()})

    return out
