"""SH -> RGB color parity with the reference CUDA formula
(forward.cu:20-71 computeColorFromSH) + gradient flow through render_sh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fisher_nerf_customized_tpu.ops.camera import Camera
from fisher_nerf_customized_tpu.ops.rasterize import RenderSettings, render_sh
from fisher_nerf_customized_tpu.ops.sh import num_sh_coeffs, sh_to_rgb

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
         -1.0925484305920792, 0.5462742152960396]
SH_C3 = [-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
         0.3731763325901154, -0.4570457994644658, 1.445305721320277,
         -0.5900435899266435]


def _ref_sh(sh, means, campos, deg):
    """Direct numpy port of forward.cu computeColorFromSH."""
    out = []
    for i in range(len(means)):
        d = means[i] - campos
        d = d / np.linalg.norm(d)
        x, y, z = d
        res = SH_C0 * sh[i, 0]
        if deg > 0:
            res = res - SH_C1 * y * sh[i, 1] + SH_C1 * z * sh[i, 2] \
                - SH_C1 * x * sh[i, 3]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            res = (res + SH_C2[0] * xy * sh[i, 4] + SH_C2[1] * yz * sh[i, 5]
                   + SH_C2[2] * (2 * zz - xx - yy) * sh[i, 6]
                   + SH_C2[3] * xz * sh[i, 7]
                   + SH_C2[4] * (xx - yy) * sh[i, 8])
        if deg > 2:
            res = (res + SH_C3[0] * y * (3 * xx - yy) * sh[i, 9]
                   + SH_C3[1] * xy * z * sh[i, 10]
                   + SH_C3[2] * y * (4 * zz - xx - yy) * sh[i, 11]
                   + SH_C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[i, 12]
                   + SH_C3[4] * x * (4 * zz - xx - yy) * sh[i, 13]
                   + SH_C3[5] * z * (xx - yy) * sh[i, 14]
                   + SH_C3[6] * x * (xx - 3 * yy) * sh[i, 15])
        out.append(np.maximum(res + 0.5, 0.0))
    return np.asarray(out)


@pytest.mark.parametrize("deg", [0, 1, 2, 3])
def test_sh_to_rgb_matches_cuda_formula(deg):
    rng = np.random.default_rng(deg)
    n, m = 64, num_sh_coeffs(3)
    sh = rng.normal(scale=0.4, size=(n, m, 3)).astype(np.float32)
    means = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    campos = np.array([0.3, -0.2, -1.0], np.float32)
    got = np.asarray(sh_to_rgb(jnp.asarray(sh), jnp.asarray(means),
                               jnp.asarray(campos), deg=deg))
    ref = _ref_sh(sh.astype(np.float64), means, campos, deg)
    np.testing.assert_allclose(got, ref, atol=2e-5)
    assert got.min() >= 0.0


def test_sh_view_dependence_and_deg0_constancy():
    rng = np.random.default_rng(1)
    sh = rng.normal(scale=0.4, size=(8, 16, 3)).astype(np.float32)
    means = rng.uniform(-2, 2, (8, 3)).astype(np.float32)
    c_a = sh_to_rgb(sh, means, jnp.asarray([0.0, 0.0, -3.0]), deg=3)
    c_b = sh_to_rgb(sh, means, jnp.asarray([3.0, 0.0, 0.0]), deg=3)
    assert not np.allclose(np.asarray(c_a), np.asarray(c_b))
    # deg 0 is view-independent
    c0a = sh_to_rgb(sh, means, jnp.asarray([0.0, 0.0, -3.0]), deg=0)
    c0b = sh_to_rgb(sh, means, jnp.asarray([3.0, 0.0, 0.0]), deg=0)
    np.testing.assert_allclose(np.asarray(c0a), np.asarray(c0b), atol=1e-7)


def test_render_sh_end_to_end_with_grads():
    cam = Camera(fx=32.0, fy=32.0, cx=16.0, cy=16.0, width=32, height=32)
    st = RenderSettings(tile_size=8, max_per_tile=64, chunk=16)
    rng = np.random.default_rng(3)
    n = 40
    means_w = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                        rng.uniform(2.0, 5.0, n)], -1).astype(np.float32)
    scales = rng.uniform(0.05, 0.2, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.3, 0.9, n).astype(np.float32)
    sh = rng.normal(scale=0.3, size=(n, 16, 3)).astype(np.float32)
    w2c = jnp.eye(4, dtype=jnp.float32)

    out = render_sh(cam, jnp.asarray(means_w), w2c, jnp.asarray(scales),
                    jnp.asarray(quats), jnp.asarray(opac),
                    jnp.asarray(sh), deg=3, settings=st)
    img = np.asarray(out["color"])
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all() and img.max() > 0.01

    def loss(sh_c):
        o = render_sh(cam, jnp.asarray(means_w), w2c, jnp.asarray(scales),
                      jnp.asarray(quats), jnp.asarray(opac), sh_c, deg=3,
                      settings=st)
        return jnp.sum(o["color"] ** 2)

    g = np.asarray(jax.grad(loss)(jnp.asarray(sh)))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0          # gradients reach the SH coeffs
    # deg-0 coefficient must carry gradient for every visible gaussian
    vis = np.asarray(out["radii"]) > 0
    assert np.abs(g[vis, 0]).sum() > 0
