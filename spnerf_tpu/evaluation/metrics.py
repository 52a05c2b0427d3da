"""Image metrics: PSNR, SSIM, mIoU, overall accuracy — pure JAX.

Definitions follow the reference exactly (so numbers are comparable):
  * PSNR with max_pixel = 1.0 (/root/reference/modules/metrics.py:197-207).
  * SSIM with kornia-0.5.3 semantics (/root/reference/modules/metrics.py:210-215):
    window 3x3 Gaussian (sigma 1.5, normalized), reflect padding, C1=(0.01)^2,
    C2=(0.03)^2, returning the mean of the SSIM index map.
  * mIoU / OA as in /root/reference/modules/metrics.py:218-246 (classes with empty
    union contribute IoU 0).
"""

import jax.numpy as jnp
import numpy as np


def mse(pred, gt, valid_mask=None):
    err = (pred - gt) ** 2
    if valid_mask is not None:
        maskf = valid_mask.astype(err.dtype)
        return jnp.sum(err * maskf) / jnp.maximum(jnp.sum(maskf) * err[0].size, 1.0)
    return jnp.mean(err)


def psnr(pred, gt, valid_mask=None):
    return -10.0 * jnp.log10(mse(pred, gt, valid_mask))


def _gaussian_kernel2d(window_size: int, sigma: float, dtype=jnp.float32):
    half = (window_size - 1) / 2.0
    x = np.arange(window_size, dtype=np.float64) - half
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    g = g / g.sum()
    k2d = np.outer(g, g)
    return jnp.asarray(k2d, dtype)


def _filter2d_reflect(img, kernel):
    """Depthwise 2-D filtering with reflect padding (kornia filter2D default).

    img: (C, H, W); kernel: (k, k). Returns (C, H, W).

    Implemented as k*k shifted slice-adds instead of a grouped
    `conv_general_dilated`: the tunneled 'axon' TPU platform miscompiles the
    depthwise convolution (observed SSIM > 1), while shifted adds are plain
    fused elementwise ops that are correct on every backend — and for a 3x3
    window they are also faster than a grouped conv at these sizes.
    """
    k = kernel.shape[0]
    pad = k // 2
    h, w = img.shape[1], img.shape[2]
    padded = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad)), mode="reflect")
    out = jnp.zeros_like(img)
    for dy in range(k):
        for dx in range(k):
            out = out + kernel[dy, dx] * padded[:, dy:dy + h, dx:dx + w]
    return out


def ssim(pred, gt, window_size=3, max_val=1.0):
    """Mean SSIM index between two (C, H, W) or (H, W, C) images in [0, 1].

    kornia-0.5.3 `ssim` semantics: 3x3 Gaussian window, sigma 1.5, reflect
    padding, biased (non-sample) local moments.
    """
    pred = jnp.asarray(pred, jnp.float32)
    gt = jnp.asarray(gt, jnp.float32)
    if pred.ndim == 3 and pred.shape[-1] in (1, 3) and pred.shape[0] not in (1, 3):
        pred = jnp.moveaxis(pred, -1, 0)
        gt = jnp.moveaxis(gt, -1, 0)

    kernel = _gaussian_kernel2d(window_size, 1.5)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2

    mu1 = _filter2d_reflect(pred, kernel)
    mu2 = _filter2d_reflect(gt, kernel)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2d_reflect(pred * pred, kernel) - mu1_sq
    sigma2_sq = _filter2d_reflect(gt * gt, kernel) - mu2_sq
    sigma12 = _filter2d_reflect(pred * gt, kernel) - mu1_mu2

    ssim_map = ((2.0 * mu1_mu2 + c1) * (2.0 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)


def miou(pred_labels, gt_labels, num_classes):
    """Mean IoU over classes; empty-union classes count as IoU 0
    (reference behavior, modules/metrics.py:229-232)."""
    pred = jnp.asarray(pred_labels).ravel()
    gt = jnp.asarray(gt_labels).ravel()
    ious = []
    for cls in range(num_classes):
        p = pred == cls
        g = gt == cls
        inter = jnp.sum(jnp.logical_and(p, g).astype(jnp.float32))
        union = jnp.sum(jnp.logical_or(p, g).astype(jnp.float32))
        ious.append(jnp.where(union == 0, 0.0, inter / jnp.maximum(union, 1.0)))
    return jnp.mean(jnp.stack(ious))


def overall_accuracy(pred_labels, gt_labels):
    pred = jnp.asarray(pred_labels).ravel()
    gt = jnp.asarray(gt_labels).ravel()
    return jnp.mean((pred == gt).astype(jnp.float32))
