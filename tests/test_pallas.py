"""Fused Pallas field-evaluation kernel vs the flax reference (interpret mode
on CPU; on-TPU compilation is exercised by the bench/validation paths)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spnerf_tpu.config import ModelConfig
from spnerf_tpu.models import init_spnerf
from spnerf_tpu.ops.pallas import fused_field_apply, supports_config


@pytest.mark.parametrize("sem", [True, False])
def test_fused_field_matches_flax(sem, rng):
    cfg = ModelConfig(mapping=True, sem=sem, num_sem_classes=3, fc_units=128,
                      fc_layers=8, skips=(4,))
    assert supports_config(cfg)
    model, params = init_spnerf(jax.random.PRNGKey(0), cfg)
    n = 700  # not a multiple of the tile: exercises padding
    xyz = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.3)
    sun = rng.normal(size=(n, 3)).astype(np.float32)
    sun /= np.linalg.norm(sun, axis=-1, keepdims=True)
    sun = jnp.asarray(sun)
    sems = jnp.asarray(rng.integers(-1, 3, size=(n,)).astype(np.int32))
    sems = jnp.where(sems < 0, -100, sems)

    ref = model.apply(params, xyz, sun, None, sems if sem else None)
    fused = fused_field_apply(params["params"], cfg, compute_dtype="float32",
                              interpret=True)
    out = fused(xyz, sun, None, sems if sem else None)
    keys = ["rgb", "sigma", "sun_v", "sky"] + (["sem_logits"] if sem else [])
    for k in keys:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=1e-5, err_msg=k)


def test_unsupported_configs_fall_back():
    assert not supports_config(ModelConfig(beta=True))
    assert not supports_config(ModelConfig(siren=False))
    assert not supports_config(ModelConfig(skips=()))
