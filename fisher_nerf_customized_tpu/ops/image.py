"""Image losses/metrics: SSIM (11x11 Gaussian window) and PSNR.

Constants match the reference (reference models/SLAM/utils/
slam_external.py:80-140 calc_ssim/_ssim: window 11, sigma 1.5, C1=0.01²,
C2=0.03²) so mapping losses and eval metrics are comparable.  Layout is
(H, W, C) channels-last (TPU-friendly); the reference uses (C, H, W).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=4)
def _gaussian_window_np(window_size: int = 11, sigma: float = 1.5):
    # cache numpy (never jnp: a device constant created inside a jit trace
    # would leak a tracer out of the cache)
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs ** 2) / (2 * sigma ** 2))
    g = (g / g.sum()).astype(np.float32)
    return np.outer(g, g)


def _gaussian_window(window_size: int = 11, sigma: float = 1.5):
    return jnp.asarray(_gaussian_window_np(window_size, sigma))


def _filter2d(img, window):
    """Depthwise 2D filter with SAME padding; img (H, W, C)."""
    c = img.shape[-1]
    kernel = jnp.tile(window[:, :, None, None], (1, 1, 1, c))  # (kh, kw, 1, C)
    x = img[None]  # NHWC
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return out[0]


def calc_ssim(img1, img2, window_size: int = 11):
    """Mean SSIM over the image; img (H, W, C) in [0, 1]."""
    window = _gaussian_window(window_size)
    mu1 = _filter2d(img1, window)
    mu2 = _filter2d(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2d(img1 * img1, window) - mu1_sq
    sigma2_sq = _filter2d(img2 * img2, window) - mu2_sq
    sigma12 = _filter2d(img1 * img2, window) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return jnp.mean(ssim_map)


def calc_psnr(img1, img2):
    mse = jnp.mean((img1 - img2) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


def l1_loss(x, y):
    return jnp.mean(jnp.abs(x - y))
