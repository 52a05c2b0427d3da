"""End-to-end renderer parity: our render_rays vs the reference torch
render_rays (/root/reference/modules/rendering.py) on shared weights.

Randomness on both sides is pinned to zero (torch.rand* and jax.random.uniform
monkeypatched), making stratified jitter, guided sampling, and PDF sampling
deterministic and identical; sigma noise is off (noise_std=0). The reference
model/rendering modules import cleanly (torch + numpy only).
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spnerf_tpu.config import ModelConfig, RenderConfig
from spnerf_tpu.models import init_spnerf
from spnerf_tpu.ops import render_rays

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")
from models import spnerf as ref_spnerf  # noqa: E402
from modules import rendering as ref_rendering  # noqa: E402

# mirrors tests/test_model_ops._copy_params_to_torch
from test_model_ops import _copy_params_to_torch  # noqa: E402


@pytest.fixture
def zero_randomness(monkeypatch):
    monkeypatch.setattr(torch, "rand_like", lambda t: torch.zeros_like(t))
    monkeypatch.setattr(
        torch, "rand",
        lambda *shape, **kw: torch.zeros(*shape, **{k: v for k, v in kw.items()
                                                    if k != "requires_grad"}))
    real_uniform = jax.random.uniform

    def zero_uniform(key, shape=(), dtype=jnp.float32, minval=0.0, maxval=1.0):
        del key, maxval
        return jnp.zeros(shape, dtype) + minval * 0
    monkeypatch.setattr(jax.random, "uniform", zero_uniform)
    yield
    monkeypatch.setattr(jax.random, "uniform", real_uniform)


def _make_rays(n, rng):
    o = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    sun = rng.normal(size=(n, 3)).astype(np.float32)
    sun /= np.linalg.norm(sun, axis=-1, keepdims=True)
    near = np.zeros((n, 1), np.float32)
    far = np.full((n, 1), 1.4, np.float32)
    return np.concatenate([o, d, near, far, sun], -1)


@pytest.mark.parametrize("guided,sc", [(False, False), (True, True)])
def test_render_rays_matches_reference(zero_randomness, rng, guided, sc):
    n, n_samples = 16, 12
    cfg = ModelConfig(mapping=True, sem=True, num_sem_classes=3, fc_units=64,
                      fc_layers=4, skips=(2,))
    rc = RenderConfig(n_samples=n_samples, guidedsample=guided,
                      solar_correction=sc, sem=True, compute_dtype="float32")
    model, params = init_spnerf(jax.random.PRNGKey(0), cfg)

    tmodel = ref_spnerf.SPNeRF(num_sem_classes=3, layers=4, feat=64,
                               mapping=True, skips=[2], siren=True, sem=True)
    _copy_params_to_torch(torch, tmodel, params, cfg)

    rays = _make_rays(n, rng)
    sems = rng.integers(0, 3, n).astype(np.int64)
    valid = (rng.uniform(size=n) > 0.5).astype(np.float32)
    tdepth = rng.uniform(0.4, 1.0, n).astype(np.float32)
    tweight = rng.uniform(size=n).astype(np.float32)
    tstd = rng.uniform(0.02, 0.1, n).astype(np.float32)
    target_depths = np.stack([tdepth, tweight], -1)

    args = types.SimpleNamespace(
        n_samples=n_samples, n_importance=0, model="sp-nerf", beta=False,
        guidedsample=guided, sc_lambda=0.1 if sc else 0.0, chunk=999999,
        noise_std=0.0, margin=1e-4, stdscale=1.0,
    )
    with torch.no_grad():
        ref = ref_rendering.render_rays(
            {"coarse": tmodel}, args, torch.from_numpy(rays), None,
            semantics=torch.from_numpy(sems), mode="train",
            valid_depth=torch.from_numpy(valid),
            target_depths=torch.from_numpy(target_depths),
            target_std=torch.from_numpy(tstd),
        )

    def apply(xyz, sun_d, t_emb, sem_labels, heads=None):
        return model.apply(params, xyz, sun_d, t_emb, sem_labels, heads=heads)

    ours = render_rays(
        apply, rc, jnp.asarray(rays), sems=jnp.asarray(sems.astype(np.int32)),
        key=jax.random.PRNGKey(7), train=True,
        valid_depth=jnp.asarray(valid),
        target_depths=jnp.asarray(target_depths),
        target_std=jnp.asarray(tstd), noise_std=0.0,
    )

    for key in ("rgb_coarse", "depth_coarse", "weights_coarse",
                "transparency_coarse", "sem_logits_coarse", "z_vals_coarse"):
        a = np.asarray(ours[key])
        b = ref[key].numpy()
        np.testing.assert_allclose(a, b, atol=2e-4, err_msg=key)
    if sc:
        for key in ("weights_sc_coarse", "transparency_sc_coarse",
                    "sun_sc_coarse"):
            np.testing.assert_allclose(np.asarray(ours[key]),
                                       ref[key].numpy(), atol=2e-4,
                                       err_msg=key)
