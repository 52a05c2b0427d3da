"""LPIPS(alex) graph tests with synthetic weights (pretrained constants are an
external artifact; the computation graph itself is pinned here)."""

import numpy as np
import pytest

from spnerf_tpu.evaluation import lpips as lp


@pytest.fixture(scope="module")
def synth_weights(tmp_path_factory):
    rng = np.random.default_rng(0)
    d = {}
    in_ch = 3
    for i, (out_ch, k, _, _) in enumerate(lp._ALEX):
        d[f"conv{i}_w"] = rng.normal(size=(out_ch, in_ch, k, k)).astype(
            np.float32) * 0.05
        d[f"conv{i}_b"] = np.zeros(out_ch, np.float32)
        d[f"lin{i}_w"] = np.abs(rng.normal(size=(1, out_ch, 1, 1))).astype(
            np.float32)
        in_ch = out_ch
    path = tmp_path_factory.mktemp("lpips") / "w.npz"
    np.savez(path, **d)
    return str(path)


def test_lpips_identity_is_zero(synth_weights, rng):
    img = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    assert lp.lpips(img, img, weights_path=synth_weights) == pytest.approx(0.0,
                                                                           abs=1e-6)


def test_lpips_positive_and_monotone(synth_weights, rng):
    img = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    small = np.clip(img + rng.normal(size=img.shape) * 0.02, 0, 1)
    large = np.clip(img + rng.normal(size=img.shape) * 0.3, 0, 1)
    d_small = lp.lpips(img, small, weights_path=synth_weights)
    d_large = lp.lpips(img, large, weights_path=synth_weights)
    assert 0 < d_small < d_large


def test_lpips_nan_without_weights(rng, monkeypatch):
    monkeypatch.delenv("SPNERF_LPIPS_WEIGHTS", raising=False)
    img = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    with pytest.warns(UserWarning):
        assert np.isnan(lp.lpips(img, img))
