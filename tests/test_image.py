"""SSIM/PSNR unit tests (ops/image.py).

The SSIM here is the mapping-loss term AND the eval metric (reference
slam_external.py:80-140 calc_ssim: window 11, sigma 1.5, C1=0.01^2,
C2=0.03^2).  Pinned against an independent f64 numpy implementation, and
regression-tested for the two numerical failure modes seen on hardware:
bf16 variance cancellation (fixed by Precision.HIGHEST) and
negative-variance denominator flips that unbound the score (fixed by the
variance clamp — per-view SSIM up to ~11 was observed in an eval run).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fisher_nerf_customized_tpu.ops.image import (
    _gaussian_window_np, calc_psnr, calc_ssim)


def _np_filter_sep(img, g):
    """f64 separable filter, zero-padded SAME (matches conv semantics)."""
    pad = len(g) // 2
    h = img.shape[0]
    x = np.pad(img, ((pad, pad), (0, 0), (0, 0)))
    img = sum(g[k] * x[k:k + h] for k in range(len(g)))
    w = img.shape[1]
    x = np.pad(img, ((0, 0), (pad, pad), (0, 0)))
    return sum(g[k] * x[:, k:k + w] for k in range(len(g)))


def _np_ssim(a, b, window_size=11):
    g = _gaussian_window_np(window_size).astype(np.float64)
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mu1 = _np_filter_sep(a, g)
    mu2 = _np_filter_sep(b, g)
    s11 = _np_filter_sep(a * a, g) - mu1 * mu1
    s22 = _np_filter_sep(b * b, g) - mu2 * mu2
    s12 = _np_filter_sep(a * b, g) - mu1 * mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 * mu1 + mu2 * mu2 + c1) * (s11 + s22 + c2))
    return float(m.mean())


def test_ssim_matches_f64_reference():
    rng = np.random.default_rng(3)
    a = rng.random((48, 40, 3), np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    got = float(calc_ssim(jnp.asarray(a), jnp.asarray(b)))
    want = _np_ssim(a, b)
    assert got == pytest.approx(want, abs=1e-5)


def test_ssim_identity_and_ordering():
    rng = np.random.default_rng(4)
    a = rng.random((32, 32, 3), np.float32)
    near = np.clip(a + rng.normal(0, 0.01, a.shape), 0, 1).astype(np.float32)
    far = rng.random((32, 32, 3), np.float32)
    s_self = float(calc_ssim(a, a))
    s_near = float(calc_ssim(a, near))
    s_far = float(calc_ssim(a, far))
    assert s_self == pytest.approx(1.0, abs=1e-5)
    assert s_self >= s_near >= s_far


@pytest.mark.parametrize("scale", [1.0, 255.0])
def test_ssim_bounded_for_nonneg_inputs(scale):
    """SSIM <= 1 mathematically for nonnegative inputs; at scale 255 the
    f32 E[x^2]-mu^2 cancellation error (~5e-3) exceeds c2=9e-4 and flipped
    the denominator before the variance clamp."""
    rng = np.random.default_rng(5)
    cases = []
    a = rng.random((64, 64, 3), np.float32)
    cases.append((a, rng.random((64, 64, 3), np.float32)))
    cases.append((a, np.clip(a + rng.normal(0, 0.003, a.shape),
                             0, 1).astype(np.float32)))  # near-identical
    flat = np.full((64, 64, 3), 0.731, np.float32)
    cases.append((flat, flat + np.float32(1e-4)))        # flat (sigma ~ 0)
    cases.append((np.zeros_like(a), a))                  # empty render
    if scale > 1:
        # the exact blowup signature: flat pair at value 190 with a 1e-3
        # delta gives UNCLAMPED mean SSIM ~9.2 (f32 variance cancellation
        # error ~5e-3 > c2 flips the denominator); the clamp must hold
        # the bound
        f190 = np.full((32, 32, 3), 190.0 / scale, np.float32)
        cases.append((f190, f190 + np.float32(1e-3 / scale)))
    for x, y in cases:
        v = float(calc_ssim(jnp.asarray(x * scale), jnp.asarray(y * scale)))
        assert v <= 1.001, (scale, v)
        assert v >= -1.001


def test_ssim_loss_grad_finite():
    rng = np.random.default_rng(6)
    gt = jnp.asarray(rng.random((32, 32, 3), np.float32))

    def loss(x):
        return 1.0 - calc_ssim(x, gt)

    x0 = jnp.asarray(np.clip(
        np.asarray(gt) + rng.normal(0, 0.1, gt.shape), 0, 1).astype(
            np.float32))
    g = jax.grad(loss)(x0)
    assert bool(jnp.isfinite(g).all())
    # the clamp must not kill gradients in the benign regime
    assert float(jnp.abs(g).max()) > 0


def test_render_metrics_guards_input_range():
    """render_metrics clips BOTH images: a sim handing back [0,255] (or a
    render past 1) cannot unbound the metric."""
    from fisher_nerf_customized_tpu.engine.eval import render_metrics
    rng = np.random.default_rng(7)
    render = rng.random((32, 32, 3)).astype(np.float32) * 3.0
    gt = rng.random((32, 32, 3)).astype(np.float32) * 255.0
    m = render_metrics(render, gt)
    assert -1.0 <= m["ssim"] <= 1.001


def test_psnr_basic():
    a = np.zeros((8, 8, 3), np.float32)
    b = np.full((8, 8, 3), 0.1, np.float32)
    assert float(calc_psnr(a, b)) == pytest.approx(20.0, abs=1e-4)
    assert float(calc_psnr(a, a)) >= 60.0
