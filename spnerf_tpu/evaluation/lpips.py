"""LPIPS perceptual distance (AlexNet backbone), pure JAX.

The reference uses the `lpips` pip package with pretrained torch AlexNet weights
(/root/reference/eval.py:20,128-135). This environment has no network egress and
no bundled weights, so:

  * the full LPIPS(alex) computation graph is implemented here in JAX
    (AlexNet feature extractor -> unit-normalize -> squared diff -> learned 1x1
    linear heads -> spatial+layer mean);
  * weights load from an .npz whose path is given by `weights_path` or the
    SPNERF_LPIPS_WEIGHTS env var. `convert_torch_lpips_to_npz` converts the
    torch checkpoints of the lpips package into that format on any machine that
    has them;
  * without weights, `lpips()` returns NaN and warns once — the metric is
    defined, the constant is absent.

Architecture constants follow lpips v0.1 'alex': input scaled by
(x - shift) / scale with shift=(-.030,-.088,-.188), scale=(.458,.448,.450);
taps after each of the five ReLUs; maxpool 3x3 stride 2 between stages 1-2-3.
"""

import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet conv stack: (out_ch, kernel, stride, pad), tap after each relu
_ALEX = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}  # maxpool follows stages 0 and 1 (and 2 in torch, before 3)


_weights_cache = {}


def weight_spec():
    """The exact .npz contract for LPIPS v0.1 'alex' weights: key -> shape.

    conv{i}_{w,b}: torchvision AlexNet `features` conv weights, OIHW / (O,);
    lin{i}_w: the lpips-package learned 1x1 linear heads (lins[i].model[-1]),
    shape (1, C_i, 1, 1), non-negative. Vendoring the actual values is
    environment-blocked here (no egress; the lpips pip package carries them
    under a BSD-2-Clause license) — run `convert_torch_lpips_to_npz` on any
    machine with torch+lpips and point SPNERF_LPIPS_WEIGHTS at the result;
    `load_weights` validates the file against this spec."""
    spec = {}
    in_ch = 3
    for i, (out_ch, k, _, _) in enumerate(_ALEX):
        spec[f"conv{i}_w"] = (out_ch, in_ch, k, k)
        spec[f"conv{i}_b"] = (out_ch,)
        spec[f"lin{i}_w"] = (1, out_ch, 1, 1)
        in_ch = out_ch
    return spec


def load_weights(weights_path=None):
    path = weights_path or os.environ.get("SPNERF_LPIPS_WEIGHTS")
    if not path or not os.path.exists(path):
        return None
    if path not in _weights_cache:
        with np.load(path) as z:
            w = {k: jnp.asarray(z[k]) for k in z.files}
        spec = weight_spec()
        missing = sorted(set(spec) - set(w))
        if missing:
            raise ValueError(f"LPIPS weights {path} missing keys {missing}; "
                             f"expected contract: {spec}")
        for k, shape in spec.items():
            if tuple(w[k].shape) != shape:
                raise ValueError(
                    f"LPIPS weight {k} in {path} has shape "
                    f"{tuple(w[k].shape)}, expected {shape}")
        _weights_cache[path] = w
    return _weights_cache[path]


def _conv(x, w, b, stride, pad):
    """x: (N, C, H, W); w: (O, I, kh, kw) torch layout."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + b[None, :, None, None]


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
    )


def _alex_features(x, weights):
    feats = []
    h = x
    for i, (_, _, stride, pad) in enumerate(_ALEX):
        h = _conv(h, weights[f"conv{i}_w"], weights[f"conv{i}_b"], stride, pad)
        h = jax.nn.relu(h)
        feats.append(h)
        if i in _POOL_AFTER:
            h = _maxpool(h)
    return feats


def _unit_normalize(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x**2, axis=1, keepdims=True))
    return x / (norm + eps)


def lpips(pred, gt, weights_path=None):
    """LPIPS(alex) between two (H, W, 3) images in [0, 1]. NaN if no weights."""
    weights = load_weights(weights_path)
    if weights is None:
        warnings.warn(
            "LPIPS weights unavailable (set SPNERF_LPIPS_WEIGHTS to an .npz "
            "converted with convert_torch_lpips_to_npz); returning NaN",
            stacklevel=2,
        )
        return float("nan")

    def prep(img):
        img = jnp.asarray(img, jnp.float32) * 2.0 - 1.0  # [0,1] -> [-1,1]
        img = (img - _SHIFT) / _SCALE
        return jnp.moveaxis(img, -1, 0)[None]  # (1, 3, H, W)

    f0 = _alex_features(prep(pred), weights)
    f1 = _alex_features(prep(gt), weights)
    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
        lin = weights[f"lin{i}_w"]  # (1, C, 1, 1) non-negative
        total = total + jnp.mean(jnp.sum(d * lin, axis=1))
    return float(total)


def convert_torch_lpips_to_npz(out_path):
    """Offline helper: convert the `lpips` package's torch weights into the .npz
    this module loads. Run on a machine with torch + lpips installed."""
    import lpips as lpips_pkg  # noqa: F401
    import torch

    net = lpips_pkg.LPIPS(net="alex")
    out = {}
    convs = [m for m in net.net.slice1] + [m for m in net.net.slice2] + \
            [m for m in net.net.slice3] + [m for m in net.net.slice4] + \
            [m for m in net.net.slice5]
    conv_idx = 0
    for m in convs:
        if isinstance(m, torch.nn.Conv2d):
            out[f"conv{conv_idx}_w"] = m.weight.detach().numpy()
            out[f"conv{conv_idx}_b"] = m.bias.detach().numpy()
            conv_idx += 1
    for i, lin in enumerate(net.lins):
        out[f"lin{i}_w"] = lin.model[-1].weight.detach().numpy()
    np.savez(out_path, **out)
    return out_path
