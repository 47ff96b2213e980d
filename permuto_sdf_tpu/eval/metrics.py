"""Image quality metrics — PSNR / SSIM.

Equivalent of the reference's ``experiments/evaluation/evaluate_psnr.py``
which uses the external ``piq`` package; implemented natively (piq is not
available) with the standard formulations (SSIM: Wang et al. 2004 with the
11x11 Gaussian window, matching piq/skimage defaults).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import jax


def psnr(pred, gt, data_range: float = 1.0):
    """Peak signal-to-noise ratio; inputs [..., H, W, C] in [0, data_range]."""
    pred = jnp.asarray(pred)
    gt = jnp.asarray(gt)
    mse = jnp.mean((pred - gt) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = np.arange(size) - size // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


def ssim(pred, gt, data_range: float = 1.0):
    """Mean SSIM over channels; inputs [H, W, C] in [0, data_range]."""
    pred = jnp.asarray(pred, jnp.float32)
    gt = jnp.asarray(gt, jnp.float32)
    if pred.ndim == 2:
        pred = pred[..., None]
        gt = gt[..., None]
    k = _gaussian_kernel()[:, :, None, None]  # [11, 11, 1, 1]

    def filt(img):
        # depthwise conv per channel
        img_ = jnp.moveaxis(img, -1, 0)[:, None]  # [C, 1, H, W]
        out = jax.lax.conv_general_dilated(
            img_, jnp.moveaxis(k, (0, 1), (2, 3)),  # [1, 1, 11, 11]
            window_strides=(1, 1), padding="VALID",
        )
        return jnp.moveaxis(out[:, 0], 0, -1)

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_p, mu_g = filt(pred), filt(gt)
    mu_p2, mu_g2, mu_pg = mu_p ** 2, mu_g ** 2, mu_p * mu_g
    s_p = filt(pred * pred) - mu_p2
    s_g = filt(gt * gt) - mu_g2
    s_pg = filt(pred * gt) - mu_pg
    num = (2 * mu_pg + c1) * (2 * s_pg + c2)
    den = (mu_p2 + mu_g2 + c1) * (s_p + s_g + c2)
    return jnp.mean(num / den)
