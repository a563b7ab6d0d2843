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
    return g


def _filter_sep(img, g1d):
    """Depthwise separable Gaussian filter with SAME padding; img (H, W,
    C).  The 11x11 window is outer(g, g), so two 11-tap 1D passes replace
    the 121-tap 2D conv — 3x faster through forward AND grad on the chip
    (the mapping loss runs this every Adam iteration).

    Precision HIGHEST is load-bearing: TPU convs default to bf16 inputs,
    and the SSIM variance `E[x^2] - mu^2` cancellation under bf16 yields
    variances as negative as -0.008 — past the c2=9e-4 stabilizer — so
    the SSIM denominator flips sign and per-view SSIM lands anywhere in
    [-4, +11] (observed).  f32 accumulation keeps the error ~1e-7."""
    c = img.shape[-1]
    kh = jnp.tile(g1d[:, None, None, None], (1, 1, 1, c))
    kw = jnp.tile(g1d[None, :, None, None], (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    x = img[None].astype(jnp.float32)  # NHWC
    x = jax.lax.conv_general_dilated(
        x, kh, window_strides=(1, 1), padding="SAME",
        dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)
    x = jax.lax.conv_general_dilated(
        x, kw, window_strides=(1, 1), padding="SAME",
        dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)
    return x[0]


def calc_ssim(img1, img2, window_size: int = 11):
    """Mean SSIM over the image; img (H, W, C) in [0, 1].

    All five filtered moments ride ONE stacked 5C-channel separable pass
    (fewer conv launches for XLA to schedule; identical math up to f32
    summation order vs the reference's per-moment 2D convs)."""
    g = jnp.asarray(_gaussian_window_np(window_size))
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    stack = jnp.concatenate([img1, img2, img1 * img1, img2 * img2,
                             img1 * img2], axis=-1)
    f = _filter_sep(stack, g)
    c = img1.shape[-1]
    mu1, mu2, m11, m22, m12 = [f[..., i * c:(i + 1) * c] for i in range(5)]
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    # Numerical guards, both exact in infinite precision: windowed
    # variances are nonnegative, and |cov| <= sigma1*sigma2
    # (Cauchy-Schwarz).  The E[x^2]-mu^2 cancellation under f32 violates
    # both once mu^2 is large enough (error ~eps*mu^2; at pixel scale
    # ~190 it exceeds c2=9e-4), which flips the structure term's
    # denominator / inflates its numerator and unbounds the score
    # (per-view SSIM ~9-11 observed).  With both guards SSIM <= 1 holds
    # for any nonnegative inputs at any scale.  stop_gradient on the
    # Cauchy-Schwarz bound: in exact math the clip never binds, so it
    # must not contribute a backward term (sqrt'(0) is inf).
    sigma1_sq = jnp.maximum(m11 - mu1_sq, 0.0)
    sigma2_sq = jnp.maximum(m22 - mu2_sq, 0.0)
    cs_bound = jax.lax.stop_gradient(jnp.sqrt(sigma1_sq * sigma2_sq))
    sigma12 = jnp.clip(m12 - mu1_mu2, -cs_bound, cs_bound)
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return jnp.mean(ssim_map)


def calc_psnr(img1, img2):
    mse = jnp.mean((img1 - img2) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


def l1_loss(x, y):
    return jnp.mean(jnp.abs(x - y))
