"""Model + rendering op tests: shapes, invariants, and numerical parity with the
reference PyTorch implementation (imported read-only from /root/reference — its
model/rendering modules depend only on numpy+torch)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spnerf_tpu.config import ModelConfig, RenderConfig
from spnerf_tpu.models import init_spnerf, positional_mapping
from spnerf_tpu.ops import (
    composite,
    render_rays,
    sample_3sigma,
    sample_pdf,
    stratified_z_vals,
)


def test_positional_mapping_shape_and_values():
    x = jnp.array([[0.1, -0.2, 0.3]])
    out = positional_mapping(x, 10)
    assert out.shape == (1, 60)
    # first block is sin(1*x), second cos(1*x), third sin(2*x) ...
    np.testing.assert_allclose(out[0, :3], np.sin([0.1, -0.2, 0.3]), rtol=1e-6)
    np.testing.assert_allclose(out[0, 3:6], np.cos([0.1, -0.2, 0.3]), rtol=1e-6)
    np.testing.assert_allclose(out[0, 6:9], np.sin([0.2, -0.4, 0.6]), rtol=1e-6)


def test_model_outputs_full_config():
    cfg = ModelConfig(mapping=True, sem=True, beta=True, num_sem_classes=3,
                      fc_units=64, t_embedding_dims=4)
    model, params = init_spnerf(jax.random.PRNGKey(0), cfg)
    n = 17
    xyz = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
    sun = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
    t_emb = jax.random.normal(jax.random.PRNGKey(3), (n, 4))
    sems = jnp.array([0, 1, 2, -100] * 5)[:n]
    out = model.apply(params, xyz, sun, t_emb, sems)
    assert out["rgb"].shape == (n, 3)
    assert out["sigma"].shape == (n,)
    assert out["sun_v"].shape == (n, 1)
    assert out["sky"].shape == (n, 3)
    assert out["beta"].shape == (n, 1)
    assert out["sem_logits"].shape == (n, 3)
    assert jnp.all(out["sigma"] >= 0)
    assert jnp.all(out["beta"] >= 0)
    assert jnp.all((out["rgb"] >= -0.001 - 1e-6) & (out["rgb"] <= 1.001 + 1e-6))
    assert jnp.all((out["sun_v"] >= 0) & (out["sun_v"] <= 1))


def test_invalid_semantic_label_uses_zero_padding_row():
    cfg = ModelConfig(sem=True, num_sem_classes=3, fc_units=32, fc_layers=2, skips=())
    model, params = init_spnerf(jax.random.PRNGKey(0), cfg)
    table = params["params"]["semantic_embedding"]
    assert np.allclose(np.asarray(table)[-1], 0.0)  # padding row
    xyz = jnp.zeros((2, 3))
    sun = jnp.zeros((2, 3))
    out_a = model.apply(params, xyz, sun, None, jnp.array([-100, -100]))
    out_b = model.apply(params, xyz, sun, None, jnp.array([3, 3]))
    np.testing.assert_allclose(out_a["rgb"], out_b["rgb"])  # -100 == pad index


def test_siren_init_bounds():
    cfg = ModelConfig(fc_units=128, mapping=True)
    _, params = init_spnerf(jax.random.PRNGKey(0), cfg)
    p = params["params"]
    first = np.asarray(p["TorchDense_0"]["kernel"])  # first trunk layer
    fan_in = first.shape[0]
    assert np.abs(first).max() <= 1.0 / fan_in + 1e-9  # first_layer_sine_init
    second = np.asarray(p["TorchDense_1"]["kernel"])
    bound = np.sqrt(6.0 / second.shape[0])
    assert np.abs(second).max() <= bound + 1e-9  # sine_init
    assert np.abs(second).max() > 0.5 * bound  # actually uses the range


def test_stratified_z_vals_bounds():
    near = jnp.zeros((5, 1))
    far = jnp.full((5, 1), 2.0)
    z = stratified_z_vals(jax.random.PRNGKey(0), near, far, 64)
    assert z.shape == (5, 64)
    assert jnp.all(z >= 0) and jnp.all(z <= 2.0)
    assert jnp.all(jnp.diff(z, axis=-1) > 0)  # stratification keeps order
    z_det = stratified_z_vals(None, near, far, 64)
    np.testing.assert_allclose(z_det[0], np.linspace(0, 2, 64), rtol=1e-6)


def test_sample_pdf_concentrates_mass():
    # all weight in bin [0.4, 0.5) -> samples must land there
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 11), (4, 11))
    weights = jnp.zeros((4, 10)).at[:, 4].set(1.0)
    s = sample_pdf(jax.random.PRNGKey(0), bins, weights, 100)
    frac_in = jnp.mean((s >= 0.4) & (s <= 0.5))
    assert frac_in > 0.95  # eps smoothing leaks a little mass


def test_sample_pdf_lookup_modes_match_take(monkeypatch):
    """The TPU bin-lookup variants in sample_pdf == take_along_axis:
    "reduce" (masked prefix-max / suffix-min over the monotone cdf/bins —
    the accelerator default) and "matmul" (one-hot einsum, measurement-only).
    Ties in bins (from sample_3sigma's clipping) are covered by duplicating
    edges."""
    import jax

    rng = np.random.default_rng(3)
    bins_np = np.sort(rng.uniform(0, 2, (16, 65)), axis=-1).astype(np.float32)
    bins_np[:4, 10:14] = bins_np[:4, 10:11]  # tied edges (clipped 3-sigma)
    bins = jnp.asarray(bins_np)
    weights = jnp.asarray(rng.uniform(0, 1, (16, 64)).astype(np.float32))
    key = jax.random.PRNGKey(1)
    monkeypatch.setenv("SPNERF_PDF_LOOKUP", "take")
    ref = sample_pdf(key, bins, weights, 32)
    ref_det = sample_pdf(None, bins, weights, 32, det=True)
    for mode in ("reduce", "matmul"):
        monkeypatch.setenv("SPNERF_PDF_LOOKUP", mode)
        out = sample_pdf(key, bins, weights, 32)
        out_det = sample_pdf(None, bins, weights, 32, det=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        np.testing.assert_array_equal(np.asarray(out_det), np.asarray(ref_det))


def test_masked_take_along_axis_matches_take(monkeypatch):
    """ops/sampling.masked_take_along_axis == take_along_axis, values AND
    gradient wrt x (the proposal interlevel loss differentiates through it)."""
    import jax

    from spnerf_tpu.ops.sampling import masked_take_along_axis

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(9, 33)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 33, (9, 17)).astype(np.int32))
    ct = jnp.asarray(rng.normal(size=(9, 17)).astype(np.float32))

    def loss(xx, env):
        monkeypatch.setenv("SPNERF_TAKE_REDUCE", env)
        return jnp.sum(masked_take_along_axis(xx, idx) * ct)

    v0, g0 = jax.value_and_grad(lambda t: loss(t, "0"))(x)
    v1, g1 = jax.value_and_grad(lambda t: loss(t, "1"))(x)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-5)
    monkeypatch.setenv("SPNERF_TAKE_REDUCE", "1")
    out = masked_take_along_axis(x, idx)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(jnp.take_along_axis(x, idx, axis=-1)))


def test_split_concat_dense_matches_concat(monkeypatch):
    """TorchDense(x, x2) split-dot path == concatenate-then-dot (same params;
    accumulation-order difference only, so allclose not array_equal)."""
    import jax

    from spnerf_tpu.config import ModelConfig
    from spnerf_tpu.models.spnerf import init_spnerf

    cfg = ModelConfig(mapping=True, sem=True, num_sem_classes=3, beta=True,
                      fc_units=64, fc_layers=4, skips=(2,), siren=True)
    rng = np.random.default_rng(11)
    xyz = jnp.asarray(rng.uniform(-1, 1, (64, 3)).astype(np.float32))
    sun = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    t_emb = jnp.asarray(rng.normal(size=(64, cfg.t_embedding_dims))
                        .astype(np.float32))
    sem = jnp.asarray(rng.integers(-1, 3, 64).astype(np.int32))

    monkeypatch.setenv("SPNERF_SPLIT_CONCAT", "0")
    model, params = init_spnerf(jax.random.PRNGKey(0), cfg)
    ref = model.apply(params, xyz, sun, t_emb, sem)
    monkeypatch.setenv("SPNERF_SPLIT_CONCAT", "1")
    model2, params2 = init_spnerf(jax.random.PRNGKey(0), cfg)
    chex = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: a.shape == b.shape and np.allclose(a, b),
        params, params2))
    assert chex  # identical param shapes AND values either way
    out = model.apply(params, xyz, sun, t_emb, sem)
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=2e-5, atol=2e-6, err_msg=k)


def test_embed_lookup_matmul_matches_take(monkeypatch):
    """models/spnerf.embed_lookup one-hot matmul == take, values AND table
    gradient (the backward is the whole point: matmul instead of scatter)."""
    import jax

    from spnerf_tpu.models.spnerf import embed_lookup

    rng = np.random.default_rng(4)
    table = jnp.asarray(rng.normal(size=(5, 7)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 5, 333).astype(np.int32))
    ct = jnp.asarray(rng.normal(size=(333, 7)).astype(np.float32))

    def loss(tab, env):
        monkeypatch.setenv("SPNERF_EMB_MATMUL", env)
        return jnp.sum(embed_lookup(tab, labels) * ct)

    v0, g0 = jax.value_and_grad(lambda t: loss(t, "0"))(table)
    v1, g1 = jax.value_and_grad(lambda t: loss(t, "1"))(table)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-5)
    e0 = embed_lookup(table, labels)
    np.testing.assert_array_equal(np.asarray(e0),
                                  np.asarray(jnp.take(table, labels, axis=0)))


def test_sample_3sigma_bounds():
    low = jnp.array([0.2, 0.0, -1.0])
    high = jnp.array([0.8, 1.0, 2.0])
    s = sample_3sigma(jax.random.PRNGKey(0), low, high, 33, det=False,
                      near=0.0, far=1.0)
    assert s.shape == (3, 33)
    assert jnp.all((s >= 0.0) & (s <= 1.0))  # clamped to [near, far]
    # gaussian-shaped: samples cluster near the center of each range
    center = 0.5 * (jnp.clip(low, 0, 1) + jnp.clip(high, 0, 1))
    assert jnp.all(jnp.abs(jnp.median(s, axis=1) - center) < 0.15)


def test_composite_invariants():
    r, s = 8, 16
    key = jax.random.PRNGKey(0)
    z = jnp.sort(jax.random.uniform(key, (r, s)), axis=-1)
    field = {
        "sigma": jax.random.uniform(key, (r, s)) * 5,
        "rgb": jax.random.uniform(key, (r, s, 3)),
        "sun_v": jax.random.uniform(key, (r, s, 1)),
        "sky": jax.random.uniform(key, (r, s, 3)),
    }
    out = composite(field, z)
    w = out["weights"]
    assert jnp.all((w >= 0) & (w <= 1))
    assert jnp.all(jnp.sum(w, axis=-1) <= 1 + 1e-5)
    assert jnp.all((out["rgb"] >= 0) & (out["rgb"] <= 1))
    assert jnp.all(out["depth"] >= 0)
    assert jnp.all(out["depth"] <= z[:, -1] + 1e-5)
    # transmittance is monotonically non-increasing
    assert jnp.all(jnp.diff(out["transparency"], axis=-1) <= 1e-6)


def test_composite_opaque_sample():
    # one fully opaque sample at depth 0.5 -> depth == 0.5, rgb == albedo*irr
    z = jnp.array([[0.25, 0.5, 0.75]])
    sigma = jnp.array([[0.0, 1e8, 0.0]])
    rgb = jnp.full((1, 3, 3), 0.6)
    sun_v = jnp.full((1, 3, 1), 1.0)  # fully lit -> irradiance = 1
    sky = jnp.zeros((1, 3, 3))
    out = composite({"sigma": sigma, "rgb": rgb, "sun_v": sun_v, "sky": sky}, z)
    np.testing.assert_allclose(out["depth"][0], 0.5, atol=1e-6)
    np.testing.assert_allclose(out["rgb"][0], 0.6, atol=1e-6)


def _make_rays(n, key=0):
    k = jax.random.PRNGKey(key)
    o = jax.random.normal(k, (n, 3)) * 0.1
    d = jnp.tile(jnp.array([[0.2, 0.1, -0.97]]), (n, 1))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    near = jnp.zeros((n, 1))
    far = jnp.full((n, 1), 1.4)
    sun = jnp.tile(jnp.array([[0.3, 0.3, 0.9]]), (n, 1))
    sun = sun / jnp.linalg.norm(sun, axis=-1, keepdims=True)
    return jnp.concatenate([o, d, near, far, sun], axis=-1).astype(jnp.float32)


@pytest.mark.slow
def test_render_rays_full_pipeline_shapes_and_grads():
    cfg = ModelConfig(mapping=True, sem=True, num_sem_classes=3, fc_units=32,
                      fc_layers=2, skips=(1,))
    rc = RenderConfig(n_samples=8, n_importance=4, guidedsample=True,
                      solar_correction=True, sem=True)
    model, params = init_spnerf(jax.random.PRNGKey(0), cfg)
    n = 6
    rays = _make_rays(n)
    sems = jnp.array([0, 1, 2, 0, 1, -100])
    valid = jnp.array([1, 0, 1, 0, 1, 0])
    tdepths = jnp.stack([jnp.full((n,), 0.7), jnp.ones((n,))], axis=-1)
    tstd = jnp.full((n,), 0.05)

    def loss_fn(p):
        apply = lambda xyz, sun, t, s, heads=None: model.apply(
            p, xyz, sun, t, s, heads=heads)
        out = render_rays(apply, rc, rays, sems=sems, key=jax.random.PRNGKey(1),
                          train=True, valid_depth=valid, target_depths=tdepths,
                          target_std=tstd)
        return jnp.mean(out["rgb_fine"]) + jnp.mean(out["rgb_coarse"]), out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    # coarse pass doubled by guided sampling: 16 samples; fine adds 4 more
    assert out["weights_coarse"].shape == (n, 16)
    assert out["z_vals_unsort_coarse"].shape == (n, 16)
    assert out["weights_fine"].shape == (n, 20)
    assert out["rgb_coarse"].shape == (n, 3)
    assert out["sun_sc_coarse"].shape == (n, 16, 1)
    assert out["sem_logits_coarse"].shape == (n, 3)
    assert jnp.isfinite(loss)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(jnp.all(jnp.isfinite(g)) for g in flat)
    assert any(jnp.any(g != 0) for g in flat)


# --------------------------------------------------------------------------
# numerical parity with the reference torch implementation
# --------------------------------------------------------------------------


def _torch_reference():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    from models import spnerf as ref_spnerf  # noqa: F401

    return torch, ref_spnerf


def _copy_params_to_torch(torch, tmodel, params, cfg):
    """Load flax params into the reference torch module (transposing kernels)."""
    p = params["params"]
    order = []  # torch parameter path for each TorchDense_i in call order
    order += ["fc_net.0"] + [f"fc_net.{2*i}" for i in range(1, cfg.fc_layers)]
    order += ["sigma_from_xyz.0", "feats_from_xyz"]
    order += ["rgb_from_xyzdir.0", "rgb_from_xyzdir.2"]
    order += ["sun_v_net.0", "sun_v_net.2", "sun_v_net.4", "sun_v_net.6"]
    order += ["sky_color.0", "sky_color.2"]
    if cfg.beta:
        order += ["beta_from_xyz.0", "beta_from_xyz.2"]
    if cfg.sem:
        order += ["logit_from_label.0", "logit_from_label.2"]
    sd = tmodel.state_dict()
    for i, path in enumerate(order):
        dense = p[f"TorchDense_{i}"]
        sd[f"{path}.weight"] = torch.from_numpy(
            np.asarray(dense["kernel"], dtype=np.float32).T.copy()
        )
        sd[f"{path}.bias"] = torch.from_numpy(
            np.asarray(dense["bias"], dtype=np.float32).copy()
        )
    if cfg.sem:
        sd["semantic_embedding.weight"] = torch.from_numpy(
            np.asarray(p["semantic_embedding"], dtype=np.float32).copy()
        )
    tmodel.load_state_dict(sd)


@pytest.mark.parametrize("sem", [False, True])
def test_model_matches_torch_reference(sem):
    torch, ref_spnerf = _torch_reference()
    cfg = ModelConfig(mapping=True, sem=sem, num_sem_classes=3, fc_units=64,
                      fc_layers=4, skips=(2,))
    model, params = init_spnerf(jax.random.PRNGKey(0), cfg)
    tmodel = ref_spnerf.SPNeRF(
        num_sem_classes=3, layers=4, feat=64, mapping=True, skips=[2],
        siren=True, sem=sem,
    )
    _copy_params_to_torch(torch, tmodel, params, cfg)

    n = 64
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(n, 3)).astype(np.float32) * 0.3
    sun = rng.normal(size=(n, 3)).astype(np.float32)
    sun /= np.linalg.norm(sun, axis=-1, keepdims=True)
    sems = rng.integers(-1, 3, size=(n,)).astype(np.int64)
    sems[sems < 0] = -100

    out = model.apply(params, jnp.asarray(xyz), jnp.asarray(sun), None,
                      jnp.asarray(sems) if sem else None)
    with torch.no_grad():
        tout = tmodel(
            torch.from_numpy(xyz),
            input_sun_dir=torch.from_numpy(sun),
            input_s=torch.from_numpy(sems).unsqueeze(-1) if sem else None,
        ).numpy()

    np.testing.assert_allclose(np.asarray(out["rgb"]), tout[:, :3], atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["sigma"]), tout[:, 3], atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["sun_v"][:, 0]), tout[:, 4], atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["sky"]), tout[:, 5:8], atol=2e-5)
    if sem:
        np.testing.assert_allclose(
            np.asarray(out["sem_logits"]), tout[:, 8:11], atol=2e-5
        )


def test_composite_matches_torch_reference():
    torch, ref_spnerf = _torch_reference()
    rng = np.random.default_rng(1)
    r, s = 16, 24
    z = np.sort(rng.uniform(0, 1.5, size=(r, s)).astype(np.float32), axis=-1)
    sigma = rng.uniform(0, 8, size=(r, s)).astype(np.float32)
    rgb = rng.uniform(0, 1, size=(r, s, 3)).astype(np.float32)
    sun_v = rng.uniform(0, 1, size=(r, s, 1)).astype(np.float32)
    sky = rng.uniform(0, 1, size=(r, s, 3)).astype(np.float32)

    out = composite(
        {"sigma": jnp.asarray(sigma), "rgb": jnp.asarray(rgb),
         "sun_v": jnp.asarray(sun_v), "sky": jnp.asarray(sky)},
        jnp.asarray(z),
    )

    # reference compositing block, re-derived with torch ops
    tz = torch.from_numpy(z)
    deltas = torch.cat([tz[:, 1:] - tz[:, :-1],
                        1e10 * torch.ones(r, 1)], dim=-1)
    alphas = 1 - torch.exp(-deltas * torch.relu(torch.from_numpy(sigma)))
    shifted = torch.cat([torch.ones(r, 1), 1 - alphas + 1e-10], dim=-1)
    transparency = torch.cumprod(shifted, -1)[:, :-1]
    weights = alphas * transparency
    depth = torch.sum(weights * tz, -1)
    irr = torch.from_numpy(sun_v) + (1 - torch.from_numpy(sun_v)) * torch.from_numpy(sky)
    rgb_final = torch.clamp(
        torch.sum(weights.unsqueeze(-1) * torch.from_numpy(rgb) * irr, -2), 0.0, 1.0
    )
    np.testing.assert_allclose(np.asarray(out["weights"]), weights.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]), depth.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["rgb"]), rgb_final.numpy(), atol=1e-5)
