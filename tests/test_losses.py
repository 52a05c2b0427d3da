"""Loss parity tests against the reference formulas, re-derived with torch.

The reference loss module itself cannot be imported (it needs kornia), so each
test re-implements the exact reference computation (/root/reference/modules/
metrics.py) inline with torch and compares the masked JAX version on random
batches, including the dynamic-shape subset rules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spnerf_tpu.config import LossConfig
from spnerf_tpu.train import losses

torch = pytest.importorskip("torch")


def _rand_results(rng, r=64, s=16, sem_classes=3, fine=False, beta=False):
    res = {}
    for typ in (("coarse", "fine") if fine else ("coarse",)):
        res[f"rgb_{typ}"] = rng.uniform(size=(r, 3)).astype(np.float32)
        w = rng.uniform(size=(r, s)).astype(np.float32)
        res[f"weights_{typ}"] = w / w.sum(-1, keepdims=True) * 0.9
        res[f"z_vals_{typ}"] = np.sort(
            rng.uniform(0, 1.5, size=(r, s)).astype(np.float32), axis=-1)
        res[f"depth_{typ}"] = np.sum(
            res[f"weights_{typ}"] * res[f"z_vals_{typ}"], -1)
        res[f"transparency_sc_{typ}"] = np.cumprod(
            1 - res[f"weights_{typ}"] + 1e-10, -1).astype(np.float32)
        res[f"weights_sc_{typ}"] = res[f"weights_{typ}"]
        res[f"sun_sc_{typ}"] = rng.uniform(size=(r, s, 1)).astype(np.float32)
        res[f"sem_logits_{typ}"] = rng.normal(size=(r, sem_classes)).astype(
            np.float32)
    if beta:
        res["beta_coarse"] = rng.uniform(0.01, 1.0, size=(r, s, 1)).astype(
            np.float32)
    return res


def _to_jax(res):
    return {k: jnp.asarray(v) for k, v in res.items()}


def _torch_solar(res, typ, lambda_sc):
    sun_sc = torch.from_numpy(res[f"sun_sc_{typ}"]).squeeze()
    t2 = torch.sum((torch.from_numpy(res[f"transparency_sc_{typ}"]) - sun_sc) ** 2, -1)
    t3 = 1 - torch.sum(torch.from_numpy(res[f"weights_sc_{typ}"]) * sun_sc, -1)
    return lambda_sc / 3 * t2.mean(), lambda_sc / 3 * t3.mean()


@pytest.mark.parametrize("fine", [False, True])
def test_snerf_loss_parity(rng, fine):
    res = _rand_results(rng, fine=fine)
    target = rng.uniform(size=(64, 3)).astype(np.float32)
    lc = LossConfig(sc_lambda=0.07)
    total, ld = losses.snerf_loss(_to_jax(res), jnp.asarray(target), lc)

    exp = 0.0
    for typ in (("coarse", "fine") if fine else ("coarse",)):
        color = torch.mean(
            (torch.from_numpy(res[f"rgb_{typ}"]) - torch.from_numpy(target)) ** 2)
        t2, t3 = _torch_solar(res, typ, 0.07)
        np.testing.assert_allclose(float(ld[f"{typ}_color"]), color.item(),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(ld[f"{typ}_sc_term2"]), t2.item(),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(ld[f"{typ}_sc_term3"]), t3.item(),
                                   rtol=1e-5)
        exp += color.item() + t2.item() + t3.item()
    np.testing.assert_allclose(float(total), exp, rtol=1e-5)


def test_satnerf_beta_loss_parity(rng):
    res = _rand_results(rng, beta=True)
    target = rng.uniform(size=(64, 3)).astype(np.float32)
    lc = LossConfig(sc_lambda=0.0, beta=True)
    total, ld = losses.satnerf_loss(_to_jax(res), jnp.asarray(target), lc)

    w = torch.from_numpy(res["weights_coarse"])
    beta = torch.sum(w.unsqueeze(-1) * torch.from_numpy(res["beta_coarse"]),
                     -2) + 0.05
    color = (((torch.from_numpy(res["rgb_coarse"]) - torch.from_numpy(target))
              ** 2) / (2 * beta ** 2)).mean()
    logb = (3 + torch.log(beta).mean()) / 2
    np.testing.assert_allclose(float(ld["coarse_color"]), color.item(), rtol=1e-5)
    np.testing.assert_allclose(float(ld["coarse_logbeta"]), logb.item(), rtol=1e-5)


def _torch_subset_depth(res, typ, t_depth, t_weight, valid, t_std, lc):
    """Reference ComputeSubsetDepthLoss (modules/metrics.py:82-132) re-derived."""
    lam = lc.ds_lambda / 3
    vm = torch.from_numpy(valid) > 0
    z = torch.from_numpy(res[f"z_vals_{typ}"])[vm]
    pd = torch.from_numpy(res[f"depth_{typ}"])[vm]
    pw = torch.from_numpy(res[f"weights_{typ}"])[vm]
    p_std = (((z - pd.unsqueeze(-1)) ** 2 * pw).sum(-1)).sqrt()
    tw = torch.from_numpy(t_weight)[vm]
    td = torch.from_numpy(t_depth)[vm]
    ts = torch.from_numpy(t_std)[vm]
    if not lc.usealldepth:
        apply = torch.logical_or((pd - td).abs() > ts, p_std > ts)
    else:
        apply = torch.ones_like(td, dtype=torch.bool)
    pd, p_std, td, tw = pd[apply], p_std[apply], td[apply], tw[apply]
    if pd.shape[0] == 0:
        return torch.tensor(0.0)
    scaling = pd.shape[0] / valid.shape[0]
    if lc.gnll:
        var = torch.clamp(p_std, min=1e-6)
        nll = 0.5 * (torch.log(var) + (pd - td) ** 2 / var)
        return lam * torch.mean(scaling * nll.mean())
    return lam * torch.mean(scaling * tw * (pd - td) ** 2)


@pytest.mark.parametrize("gnll", [False, True])
def test_subset_depth_loss_parity(rng, gnll):
    res = _rand_results(rng, r=128)
    t_depth = rng.uniform(0.1, 1.4, 128).astype(np.float32)
    t_weight = rng.uniform(size=128).astype(np.float32)
    valid = (rng.uniform(size=128) > 0.4).astype(np.float32)
    t_std = rng.uniform(0.01, 0.4, 128).astype(np.float32)
    lc = LossConfig(depth=True, ds_lambda=1.0, gnll=gnll, usealldepth=False)

    total, ld = losses.depth_loss(
        _to_jax(res), jnp.asarray(t_depth), jnp.asarray(t_weight),
        jnp.asarray(valid), jnp.asarray(t_std), lc)
    ref = _torch_subset_depth(res, "coarse", t_depth, t_weight, valid, t_std, lc)
    np.testing.assert_allclose(float(ld["coarse_ds"]), ref.item(), rtol=1e-4)


def test_usealldepth_loss_parity(rng):
    res = _rand_results(rng, r=128)
    t_depth = rng.uniform(0.1, 1.4, 128).astype(np.float32)
    t_weight = rng.uniform(size=128).astype(np.float32)
    valid = np.ones(128, np.float32)
    t_std = rng.uniform(0.01, 0.4, 128).astype(np.float32)
    lc = LossConfig(depth=True, ds_lambda=1.0, usealldepth=True)
    total, ld = losses.depth_loss(
        _to_jax(res), jnp.asarray(t_depth), jnp.asarray(t_weight),
        jnp.asarray(valid), jnp.asarray(t_std), lc)
    # reference usealldepth branch: lambda/3 * mean(weights * mse_elementwise)
    ref = (1.0 / 3.0) * torch.mean(
        torch.from_numpy(t_weight)
        * (torch.from_numpy(res["depth_coarse"]) - torch.from_numpy(t_depth)) ** 2)
    np.testing.assert_allclose(float(ld["coarse_ds"]), ref.item(), rtol=1e-5)


def test_semantic_loss_parity(rng):
    res = _rand_results(rng, r=128, sem_classes=3)
    labels = rng.integers(0, 3, 128).astype(np.int64)
    labels[rng.uniform(size=128) < 0.3] = -100
    lc = LossConfig(sem=True, ss_lambda=0.04)
    total, ld = losses.semantic_loss(_to_jax(res), jnp.asarray(labels), lc)
    ce = torch.nn.CrossEntropyLoss(ignore_index=-100)(
        torch.from_numpy(res["sem_logits_coarse"]), torch.from_numpy(labels))
    np.testing.assert_allclose(float(ld["coarse_ss"]), 0.04 * ce.item(),
                               rtol=1e-5)


def test_total_loss_drop_schedules(rng):
    res = _rand_results(rng, r=32)
    batch = {
        "rgbs": jnp.asarray(rng.uniform(size=(32, 3)).astype(np.float32)),
        "depths": jnp.asarray(
            np.stack([rng.uniform(0.1, 1.4, 32), rng.uniform(size=32)],
                     -1).astype(np.float32)),
        "valid_depth": jnp.ones(32, jnp.float32),
        "depth_std": jnp.full((32,), 0.05, jnp.float32),
        "sems": jnp.asarray(rng.integers(0, 3, 32).astype(np.int32)),
    }
    lc = LossConfig(depth=True, ds_lambda=1.0, sem=True, ss_lambda=1.0)
    jres = _to_jax(res)
    before, _ = losses.total_loss(jres, batch, lc, jnp.int32(10), 100.0, 100.0)
    after_ds, _ = losses.total_loss(jres, batch, lc, jnp.int32(150), 100.0, 200.0)
    after_all, _ = losses.total_loss(jres, batch, lc, jnp.int32(250), 100.0, 200.0)
    base, _ = losses.snerf_loss(jres, batch["rgbs"], lc)
    assert float(before) > float(after_ds) > float(after_all)
    np.testing.assert_allclose(float(after_all), float(base), rtol=1e-6)
