"""Per-Gaussian preprocessing: EWA projection, culling, screen-space extent.

Re-derivation of the reference CUDA preprocess (reference
cuda_rasterizer/forward.cu:74-260) as vectorized jnp over a fixed-capacity
Gaussian array.  Differences from the CUDA version are deliberate:

  * Projection is done directly with pinhole intrinsics instead of the
    OpenGL projmatrix round-trip (same pixel mapping; see ops/camera.py).
  * The view matrix is identity: like the reference's SLAM layer, Gaussian
    means are pre-transformed into the camera frame by the caller while
    rotations stay world-frame (reference slam_helpers.py:282
    transform_to_frame — the quirk is preserved for behavioral parity).
  * Everything is masked rather than early-returned: invalid Gaussians get
    radius 0 and never enter a tile list.
"""
from __future__ import annotations

import functools

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .camera import Camera


class Preprocessed(NamedTuple):
    mean2d: jnp.ndarray      # (N, 2) pixel coords of the projected center
    conic: jnp.ndarray       # (N, 3) inverse 2D covariance (a, b, c) packed
    cov2d: jnp.ndarray       # (N, 3) 2D covariance (for backward chains)
    depth: jnp.ndarray       # (N,)   camera-frame z
    radius: jnp.ndarray      # (N,)   screen-space extent in pixels (0 = culled)
    valid: jnp.ndarray       # (N,)   bool


def _cov3d_cols(scales, quats):
    """Σ = R diag(s²) Rᵀ as SIX (N,) columns [xx, xy, xz, yy, yz, zz].

    Structure-of-arrays on purpose: (N, 3, 3) intermediates put the
    batch axis on sublanes and a 3x3 matrix on the 128-wide lane axis —
    ~3% lane utilization; measured 6.25 ms for preprocess at N=131k on
    v5e.  Scalar column math keeps every op (N,)-shaped and fully
    lane-parallel.  (reference forward.cu:119 computeCov3D; quaternions
    wxyz, normalized first as in slam_external.py:25.)
    """
    w, x, y, z = (quats[:, 0], quats[:, 1], quats[:, 2], quats[:, 3])
    inv = 1.0 / jnp.sqrt(w * w + x * x + y * y + z * z)
    w, x, y, z = w * inv, x * inv, y * inv, z * inv
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    s0 = scales[:, 0] * scales[:, 0]
    s1 = scales[:, 1] * scales[:, 1]
    s2 = scales[:, 2] * scales[:, 2]
    # Σ_ij = Σ_k s_k² R_ik R_jk
    c_xx = s0 * r00 * r00 + s1 * r01 * r01 + s2 * r02 * r02
    c_xy = s0 * r00 * r10 + s1 * r01 * r11 + s2 * r02 * r12
    c_xz = s0 * r00 * r20 + s1 * r01 * r21 + s2 * r02 * r22
    c_yy = s0 * r10 * r10 + s1 * r11 * r11 + s2 * r12 * r12
    c_yz = s0 * r10 * r20 + s1 * r11 * r21 + s2 * r12 * r22
    c_zz = s0 * r20 * r20 + s1 * r21 * r21 + s2 * r22 * r22
    return c_xx, c_xy, c_xz, c_yy, c_yz, c_zz


def build_cov3d(scales, quats):
    """Σ = R diag(s²) Rᵀ, packed (N, 6) as [xx, xy, xz, yy, yz, zz]."""
    return jnp.stack(_cov3d_cols(scales, quats), axis=-1)


def project_cov2d(means_cam, cov3d, camera: Camera):
    """EWA: cov2d = J Σ Jᵀ + 0.3 I (reference forward.cu:74 computeCov2D).

    J is the Jacobian of the perspective projection at the (fov-clamped)
    camera-frame mean; the 0.3 low-pass keeps every splat >= ~1 px.
    Returns (cov2d (N,3) packed [a, b, c], t (N,3) the clamped mean actually
    used — needed by the backward chain).
    """
    x, y, z = means_cam[:, 0], means_cam[:, 1], means_cam[:, 2]
    z = jnp.maximum(z, 1e-6)
    tan_fovx = camera.width / (2.0 * camera.fx)
    tan_fovy = camera.height / (2.0 * camera.fy)
    limx, limy = 1.3 * tan_fovx, 1.3 * tan_fovy
    tx = jnp.clip(x / z, -limx, limx) * z
    ty = jnp.clip(y / z, -limy, limy) * z

    fx, fy = camera.fx, camera.fy
    # J rows: du/d(x,y,z), dv/d(x,y,z)
    j00 = fx / z
    j02 = -fx * tx / (z * z)
    j11 = fy / z
    j12 = -fy * ty / (z * z)

    if isinstance(cov3d, tuple):
        c0, c1, c2, c3, c4, c5 = cov3d               # SoA columns
    else:
        c0, c1, c2, c3, c4, c5 = [cov3d[:, i] for i in range(6)]
    # rows of (Σ Jᵀ) needed: Σ has rows (c0,c1,c2),(c1,c3,c4),(c2,c4,c5)
    # a = J0 Σ J0ᵀ, b = J0 Σ J1ᵀ, c = J1 Σ J1ᵀ
    s00 = c0 * j00 + c2 * j02          # (Σ J0ᵀ)_x
    s01 = c1 * j00 + c4 * j02          # (Σ J0ᵀ)_y
    s02 = c2 * j00 + c5 * j02          # (Σ J0ᵀ)_z
    a = j00 * s00 + j02 * s02 + camera.dilation
    b = j11 * s01 + j12 * s02
    s11 = c3 * j11 + c4 * j12
    s12 = c4 * j11 + c5 * j12
    c_ = j11 * s11 + j12 * s12 + camera.dilation
    return (a, b, c_), (tx, ty, z)


def project_cov2d_packed(means_cam, cov3d, camera: Camera):
    """project_cov2d with (N, 3)-packed outputs (compat wrapper)."""
    (a, b, c_), (tx, ty, z) = project_cov2d(means_cam, cov3d, camera)
    return jnp.stack([a, b, c_], axis=-1), jnp.stack([tx, ty, z], axis=-1)


def conic_mean_jac(means_cam, cov3d, camera: Camera, valid=None):
    """Per-Gaussian Jacobian d(conic)/d(mean_cam): (N, 3, 3) rows = conic
    entries (a, b, c), cols = camera-frame mean components.

    This is the cov2D-through-mean chain of the reference backward
    (backward.cu:144-270 computeCov2DCUDA): the 2D covariance depends on
    the mean through the projection Jacobian J(t), so per-pixel conic
    cotangents flow back into the mean gradient.  The reference's
    half-then-double off-diagonal convention cancels, so this exact
    Jacobian contracted with the TRUE conic cotangent reproduces
    cur_dL_dmeans bit-for-bit (modulo fp order).  The fov-clamp quirk is
    preserved: when |x/z| exceeds 1.3 tan_fov the whole tx path is
    gradient-stopped (x_grad_mul = 0 AND no dtx/dz term — backward.cu
    only zeroes, never re-chains the clamped branch).

    cov3d: (N, 6) packed or 6-tuple of SoA columns.  Rows for invalid
    Gaussians are zeroed (their det may be degenerate)."""
    if isinstance(cov3d, tuple):
        cov = jnp.stack(cov3d, axis=-1)
    else:
        cov = cov3d
    fx, fy = camera.fx, camera.fy
    tan_fovx = camera.width / (2.0 * fx)
    tan_fovy = camera.height / (2.0 * fy)
    limx, limy = 1.3 * tan_fovx, 1.3 * tan_fovy

    def conic_of_mean(m, cv):
        x, y, z = m[0], m[1], m[2]
        z = jnp.maximum(z, 1e-6)
        # unclamped: tx == x exactly (dtx/dx = 1, dtx/dz = 0); clamped:
        # fully stop-gradded (matches x_grad_mul and the missing z-chain)
        tx = jnp.where(jnp.abs(x / z) > limx,
                       jax.lax.stop_gradient(jnp.clip(x / z, -limx, limx)
                                             * z), x)
        ty = jnp.where(jnp.abs(y / z) > limy,
                       jax.lax.stop_gradient(jnp.clip(y / z, -limy, limy)
                                             * z), y)
        j00 = fx / z
        j02 = -fx * tx / (z * z)
        j11 = fy / z
        j12 = -fy * ty / (z * z)
        c0, c1, c2, c3, c4, c5 = (cv[0], cv[1], cv[2], cv[3], cv[4], cv[5])
        a = j00 * (c0 * j00 + c2 * j02) + j02 * (c2 * j00 + c5 * j02) \
            + camera.dilation
        b = j11 * (c1 * j00 + c4 * j02) + j12 * (c2 * j00 + c5 * j02)
        c_ = j11 * (c3 * j11 + c4 * j12) + j12 * (c4 * j11 + c5 * j12) \
            + camera.dilation
        det = a * c_ - b * b
        det = jnp.where(det > 0, det, 1.0)
        return jnp.stack([c_ / det, -b / det, a / det])

    jac = jax.vmap(jax.jacfwd(conic_of_mean))(means_cam, cov)   # (N, 3, 3)
    if valid is not None:
        jac = jnp.where(valid[:, None, None], jac, 0.0)
    return jac


def preprocess(means_cam, scales, quats, camera: Camera,
               active=None) -> Preprocessed:
    """Full per-Gaussian forward preprocess.

    Args:
      means_cam: (N, 3) Gaussian centers in the camera frame.
      scales:    (N, 3) world-space standard deviations (already exp'd).
      quats:     (N, 4) wxyz rotations (world frame; see module docstring).
      active:    (N,) bool slot mask for the fixed-capacity state.
    """
    n = means_cam.shape[0]
    z = means_cam[:, 2]
    in_front = z > camera.near

    cov3d = _cov3d_cols(scales, quats)               # SoA: stays (N,)-shaped
    (a, b, c), _t = project_cov2d(means_cam, cov3d, camera)
    cov2d = jnp.stack([a, b, c], axis=-1)
    det = a * c - b * b
    det_ok = det > 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)

    # screen-space radius = ceil(3 sqrt(λmax)) (forward.cu:229-233)
    mid = 0.5 * (a + c)
    lam_max = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam_max))

    zs = jnp.maximum(z, 1e-6)
    u = camera.fx * means_cam[:, 0] / zs + camera.cx - 0.5
    v = camera.fy * means_cam[:, 1] / zs + camera.cy - 0.5
    mean2d = jnp.stack([u, v], axis=-1)

    # on-screen check with radius margin (getRect would produce an empty
    # tile rect otherwise)
    on_screen = ((u + radius >= 0) & (u - radius < camera.width)
                 & (v + radius >= 0) & (v - radius < camera.height))

    valid = in_front & det_ok & on_screen
    if active is not None:
        valid = valid & active
    radius = jnp.where(valid, radius, 0.0)

    return Preprocessed(mean2d=mean2d, conic=conic, cov2d=cov2d,
                        depth=z, radius=radius, valid=valid)


@jax.jit
def mark_visible(means_world, w2c):
    """Standalone frustum-visibility test WITHOUT rendering — the
    reference rasterizer's third binding (`markVisible`,
    rasterizer_impl.cu markVisible -> checkFrustum -> in_frustum,
    auxiliary.h:139-161; exposed at diff_gaussian_rasterization
    __init__.py:159).  The CUDA test reduces to `z_view > 0.001` (the
    NDC bounds check is commented out upstream); matched exactly here.

    Args:
      means_world: (N, 3) world-frame centers.
      w2c:         (4, 4) world->camera.
    Returns (N,) bool.
    """
    z = means_world @ w2c[2, :3] + w2c[2, 3]
    return z > 0.001
