"""4/5-class and ignore-label semantic supervision (SEMANTIC_CONFIG tables,
reference modules/opt.py:160-239). The 3-class dense/sparse paths are covered
by tests/test_data.py; these pin the wider class tables end-to-end: bundled
CLS raster -> label mapping -> train step with the matching head width."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spnerf_tpu.config import (IGNORE_LABEL, SEMANTIC_CONFIG, LossConfig,
                               ModelConfig, RenderConfig)
from spnerf_tpu.train.loop import Trainer
from spnerf_tpu.utils.synth import fake_batch


@pytest.mark.parametrize("k", [4, 5])
@pytest.mark.slow
def test_load_semantics_wider_class_tables(dfc269_root, k):
    """Loading the bundled scene with the 4/5-class tables maps the DFC CLS
    raster into [0, k) + IGNORE and keeps per-ray alignment."""
    from spnerf_tpu.data import load_scene

    scene = load_scene(
        os.path.join(dfc269_root, "JSON"),
        os.path.join(dfc269_root, "RGB/JAX_269"),
        os.path.join(dfc269_root, "Depth"),
        os.path.join(dfc269_root, "Semantic"),
        "JAX_269", img_downscale=4.0, sem=True, num_sem_classes=k,
        dense_ss=True, load_depth=False, verbose=False,
    )
    labels = scene.sems[scene.valid_sem > 0]
    uniq = set(np.unique(labels).tolist())
    assert uniq.issubset(set(range(k))), uniq
    # the supervised label distribution must use >1 class (the AOI has
    # ground + buildings at minimum) and every invalid row is IGNORE
    assert len(uniq) >= 2
    assert np.all(scene.sems[scene.valid_sem == 0] == IGNORE_LABEL)
    # 4/5-class tables extend 3-class (ground/buildings/water keep names)
    names = SEMANTIC_CONFIG[k]["semantic_names"]
    assert names[0] == "Ground" and "Buildings" in names.values()


@pytest.mark.parametrize("k", [4, 5])
def test_train_step_wider_semantic_head(k):
    """One hash-family train step with a k-class semantic head: finite loss,
    step advances, and the semantic CE actually sees all k classes."""
    mc = ModelConfig(fc_units=32, fc_layers=2, skips=(), encoding="hash",
                     hash_levels=4, hash_features=2, hash_log2T=10,
                     sem=True, num_sem_classes=k)
    rc = RenderConfig(n_samples=4, sem=True, compute_dtype="float32")
    lc = LossConfig(sem=True, ss_lambda=1.0)
    tr = Trainer(mc, rc, lc, steps_per_epoch=10, max_steps=100)
    state = tr.init_state(jax.random.PRNGKey(0))
    batch = fake_batch(np.random.default_rng(0), 64)
    batch["sems"] = np.arange(64, dtype=np.int32) % k  # all k classes present
    data = {kk: jnp.asarray(v) for kk, v in batch.items()}
    step = tr.build_train_step(64)
    state, ld = step(state, data, jax.random.PRNGKey(1))
    assert np.isfinite(float(ld["loss"]))
    assert int(state.step) == 1


def test_train_step_ignore_labels_finite():
    """Sparse supervision: rows labelled IGNORE (-100) are masked out of the
    CE mean (reference ignore_index semantics) — loss stays finite even when
    most rays carry no semantic supervision."""
    mc = ModelConfig(fc_units=32, fc_layers=2, skips=(), encoding="hash",
                     hash_levels=4, hash_features=2, hash_log2T=10,
                     sem=True, num_sem_classes=3)
    rc = RenderConfig(n_samples=4, sem=True, compute_dtype="float32")
    lc = LossConfig(sem=True, ss_lambda=1.0)
    tr = Trainer(mc, rc, lc, steps_per_epoch=10, max_steps=100)
    state = tr.init_state(jax.random.PRNGKey(0))
    batch = fake_batch(np.random.default_rng(0), 64)
    sems = np.full(64, IGNORE_LABEL, np.int32)
    sems[::8] = np.arange(8) % 3  # 1-in-8 rays supervised (sparse stride)
    batch["sems"] = sems
    data = {kk: jnp.asarray(v) for kk, v in batch.items()}
    step = tr.build_train_step(64)
    state, ld = step(state, data, jax.random.PRNGKey(1))
    assert np.isfinite(float(ld["loss"]))
