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

from typing import NamedTuple

import jax.numpy as jnp

from .camera import Camera
from ..utils.geometry import quat_to_rotmat


class Preprocessed(NamedTuple):
    mean2d: jnp.ndarray      # (N, 2) pixel coords of the projected center
    conic: jnp.ndarray       # (N, 3) inverse 2D covariance (a, b, c) packed
    cov2d: jnp.ndarray       # (N, 3) 2D covariance (for backward chains)
    depth: jnp.ndarray       # (N,)   camera-frame z
    radius: jnp.ndarray      # (N,)   screen-space extent in pixels (0 = culled)
    valid: jnp.ndarray       # (N,)   bool


def build_cov3d(scales, quats):
    """Σ = R diag(s²) Rᵀ, packed (N, 6) as [xx, xy, xz, yy, yz, zz].

    (reference forward.cu:119 computeCov3D; quaternions are wxyz and get
    normalized inside quat_to_rotmat.)
    """
    R = quat_to_rotmat(quats)                       # (N, 3, 3)
    S2 = scales * scales                            # (N, 3)
    # Σ_ij = Σ_k R_ik s_k² R_jk
    M = R * S2[:, None, :]
    cov = jnp.einsum("nik,njk->nij", M, R)
    return jnp.stack(
        [cov[:, 0, 0], cov[:, 0, 1], cov[:, 0, 2],
         cov[:, 1, 1], cov[:, 1, 2], cov[:, 2, 2]], axis=-1)


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

    c0, c1, c2, c3, c4, c5 = [cov3d[:, i] for i in range(6)]
    # rows of (Σ Jᵀ) needed: Σ has rows (c0,c1,c2),(c1,c3,c4),(c2,c4,c5)
    # a = J0 Σ J0ᵀ, b = J0 Σ J1ᵀ, c = J1 Σ J1ᵀ
    s00 = c0 * j00 + c2 * j02          # (Σ J0ᵀ)_x
    s01 = c1 * j00 + c4 * j02          # (Σ J0ᵀ)_y
    s02 = c2 * j00 + c5 * j02          # (Σ J0ᵀ)_z
    a = j00 * s00 + j02 * s02 + 0.3
    b = j11 * s01 + j12 * s02
    s11 = c3 * j11 + c4 * j12
    s12 = c4 * j11 + c5 * j12
    c_ = j11 * s11 + j12 * s12 + 0.3
    cov2d = jnp.stack([a, b, c_], axis=-1)
    t = jnp.stack([tx, ty, z], axis=-1)
    return cov2d, t


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

    cov3d = build_cov3d(scales, quats)
    cov2d, _t = project_cov2d(means_cam, cov3d, camera)
    a, b, c = cov2d[:, 0], cov2d[:, 1], cov2d[:, 2]
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
