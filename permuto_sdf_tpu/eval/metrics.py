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


def _ssim_components(pred, gt, data_range: float = 1.0):
    """Per-pixel (luminance*contrast*structure, contrast*structure) maps —
    the MS-SSIM building blocks (Wang et al. 2003 eq. 7)."""
    k = _gaussian_kernel()[:, :, None, None]

    def filt(img):
        img_ = jnp.moveaxis(img, -1, 0)[:, None]
        out = jax.lax.conv_general_dilated(
            img_, jnp.moveaxis(k, (0, 1), (2, 3)),
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
    lum = (2 * mu_pg + c1) / (mu_p2 + mu_g2 + c1)
    cs = (2 * s_pg + c2) / (s_p + s_g + c2)
    return lum * cs, cs


_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def ms_ssim(pred, gt, data_range: float = 1.0, weights=_MSSSIM_WEIGHTS):
    """Multi-scale SSIM (Wang, Simoncelli & Bovik 2003) — the standard
    5-scale formulation with the published weights, 2x average-pool
    between scales. Unlike LPIPS this perceptual metric is FULLY
    specified by its formula (no pretrained weights), so values are
    directly comparable to other implementations (piq/tf.image defaults).
    Inputs [H, W, C] in [0, data_range]; needs min(H, W) >= 11 * 2^(S-1).
    """
    pred = jnp.asarray(pred, jnp.float32)
    gt = jnp.asarray(gt, jnp.float32)
    if pred.ndim == 2:
        pred = pred[..., None]
        gt = gt[..., None]

    def pool2(img):
        H, W, C = img.shape
        img = img[: H - H % 2, : W - W % 2]
        return 0.25 * (img[0::2, 0::2] + img[1::2, 0::2]
                       + img[0::2, 1::2] + img[1::2, 1::2])

    vals = []
    for i, w in enumerate(weights):
        lcs, cs = _ssim_components(pred, gt, data_range)
        # last scale uses the full product, earlier scales only cs
        vals.append(jnp.mean(lcs if i == len(weights) - 1 else cs))
        if i < len(weights) - 1:
            pred, gt = pool2(pred), pool2(gt)
    vals = jnp.stack(vals)
    # ReLU guard (standard practice): cs can be slightly negative
    vals = jnp.maximum(vals, 0.0)
    return jnp.prod(vals ** jnp.asarray(weights))


# ---------------------------------------------------------------------------
# LPIPS — perceptual distance (documented substitute)
# ---------------------------------------------------------------------------
#
# The reference computes LPIPS via piq's pretrained-VGG implementation
# (evaluate_psnr.py). Pretrained VGG weights are not obtainable in this
# environment (no package, no network egress), so `lpips` below is a
# RANDOM-FEATURE perceptual distance: the exact LPIPS formula (channel-
# unit-normalized deep features, squared differences, spatial + layer
# averaging; Zhang et al. 2018, arXiv 1801.03924) over a fixed-seed,
# randomly initialized VGG-16-topology feature stack. Zhang et al. report
# that even randomly initialized networks track human perceptual
# similarity far better than pixel metrics (their Table 5); absolute
# values are NOT comparable to pretrained-VGG LPIPS numbers, but the
# metric orders image pairs consistently. Swap in calibrated weights via
# the `params` argument when they are available.

_VGG_LAYOUT = (  # VGG-16 conv blocks: (out_channels, nr_convs)
    (64, 2), (128, 2), (256, 3), (512, 3), (512, 3),
)


def _lpips_params(key=None, seed: int = 0):
    import jax

    key = key if key is not None else jax.random.PRNGKey(seed)
    params = []
    c_in = 3
    for c_out, nr in _VGG_LAYOUT:
        block = []
        for _ in range(nr):
            key, k = jax.random.split(key)
            w = jax.random.normal(k, (3, 3, c_in, c_out)) * np.sqrt(2.0 / (9 * c_in))
            block.append(w)
            c_in = c_out
        params.append(block)
    return params


def _lpips_features(params, img):
    """img [H, W, 3] in [0,1] -> list of block outputs (pre-pool)."""
    x = (jnp.asarray(img, jnp.float32) - 0.5) * 2.0
    x = x[None]  # NHWC
    feats = []
    for block in params:
        for w in block:
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            x = jax.nn.relu(x)
        feats.append(x)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )
    return feats


def lpips(pred, gt, params=None, seed: int = 0):
    """Perceptual distance in the LPIPS form (see module note: random
    VGG-topology features unless calibrated ``params`` are provided)."""
    params = params if params is not None else _lpips_params(seed=seed)
    fa = _lpips_features(params, pred)
    fb = _lpips_features(params, gt)
    total = 0.0
    for a, b in zip(fa, fb):
        a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
        b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
        total = total + jnp.mean(jnp.sum((a - b) ** 2, axis=-1))
    return total / len(fa)
