"""Quaternion / SE(3) utilities (pure jnp, jit-safe).

Conventions (match the reference so config YAMLs and recorded poses carry
over; see reference models/SLAM/utils/slam_external.py:25 build_rotation and
slam_helpers.py:85 quat math):
  * quaternions are (w, x, y, z)
  * camera-to-world / world-to-camera are 4x4 row-major matrices
  * the camera frame is +z forward, +x right, +y down (pinhole)
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def normalize(v, axis=-1, eps=1e-12):
    return v / (jnp.linalg.norm(v, axis=axis, keepdims=True) + eps)


def quat_to_rotmat(q):
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation matrix.

    Normalizes the quaternion first (the reference keeps unnormalized
    quaternions as the optimized parameter; reference slam_external.py:25).
    """
    q = normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rotmat_to_quat(m):
    """(..., 3, 3) rotation matrix -> (..., 4) wxyz quaternion.

    Branchless variant of the standard conversion (reference uses the
    pytorch3d version at slam_helpers.py:106); selects the numerically best
    of the four candidate quaternions.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    def _sqrt_pos(x):
        return jnp.sqrt(jnp.maximum(x, 0.0))

    q_abs = jnp.stack(
        [
            _sqrt_pos(1.0 + m00 + m11 + m22),
            _sqrt_pos(1.0 + m00 - m11 - m22),
            _sqrt_pos(1.0 - m00 + m11 - m22),
            _sqrt_pos(1.0 - m00 - m11 + m22),
        ],
        axis=-1,
    )
    # candidate quaternions (each scaled by 4*q_abs[i])
    cand = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m01 + m10, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )  # (..., 4, 4)
    denom = jnp.maximum(2.0 * q_abs[..., None], 0.1 * jnp.finfo(m.dtype).tiny + 1e-8)
    cand = cand / denom
    best = jnp.argmax(q_abs, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    return normalize(q)


def quat_mult(q1, q2):
    """Hamilton product of wxyz quaternions (reference slam_helpers.py:85)."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def pose_matrix(rot_q, trans):
    """(...,4) quat + (...,3) translation -> (...,4,4) homogeneous matrix."""
    R = quat_to_rotmat(rot_q)
    batch = R.shape[:-2]
    M = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    M = M.at[..., :3, :3].set(R)
    M = M.at[..., :3, 3].set(trans)
    M = M.at[..., 3, 3].set(1.0)
    return M


def invert_se3(M):
    """Invert a rigid 4x4 transform without a general solve."""
    R = M[..., :3, :3]
    t = M[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t)
    out = jnp.zeros_like(M)
    out = out.at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3].set(ti)
    out = out.at[..., 3, 3].set(1.0)
    return out


def transform_points(M, pts):
    """Apply (...,4,4) rigid transform to (...,N,3) points."""
    R = M[..., :3, :3]
    t = M[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


# ---------------------------------------------------------------------------
# Discrete agent kinematics (host-side; numpy).  Reference:
# models/SLAM/utils/slam_external.py:44 compute_next_campos.  Action ids:
# 1 = forward (+z in camera frame), 2 = turn left, 3 = turn right.
# ---------------------------------------------------------------------------

def compute_next_campos(cam_H: np.ndarray, action_id: int,
                        forward_step_size: float = 0.065,
                        turn_angle: float = 10.0) -> np.ndarray:
    next_H = np.array(cam_H, dtype=np.float64, copy=True)
    if action_id == 1:
        next_H[:3, 3] = cam_H[:3, 3] + cam_H[:3, :3] @ np.array([0.0, 0.0, forward_step_size])
    elif action_id in (2, 3):
        a = np.deg2rad(turn_angle)
        s = -np.sin(a) if action_id == 2 else np.sin(a)
        R = np.array([[np.cos(a), 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, np.cos(a)]])
        next_H[:3, :3] = cam_H[:3, :3] @ R
    return next_H


def compute_next_campos_jax(cam_H, action_id, forward_step_size=0.065, turn_angle=10.0):
    """Jit-safe variant of compute_next_campos: action_id is a traced int.

    Used by the path-EIG rollout (`lax.scan` over a planned action sequence);
    the reference loops this on the host (tester_gaussians_navigation.py:1684).
    """
    a = jnp.deg2rad(jnp.asarray(turn_angle, jnp.float32))
    fwd = cam_H[:3, 3] + cam_H[:3, :3] @ jnp.array([0.0, 0.0, 1.0]) * forward_step_size
    c, s = jnp.cos(a), jnp.sin(a)
    R_left = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    R_left = jnp.stack([
        jnp.stack([c, 0.0 * c, -s]),
        jnp.array([0.0, 1.0, 0.0]),
        jnp.stack([s, 0.0 * c, c]),
    ])
    R_right = jnp.stack([
        jnp.stack([c, 0.0 * c, s]),
        jnp.array([0.0, 1.0, 0.0]),
        jnp.stack([-s, 0.0 * c, c]),
    ])
    new_t = jnp.where(action_id == 1, fwd, cam_H[:3, 3])
    rot = jnp.where(action_id == 2, cam_H[:3, :3] @ R_left,
                    jnp.where(action_id == 3, cam_H[:3, :3] @ R_right, cam_H[:3, :3]))
    out = cam_H.at[:3, 3].set(new_t)
    out = out.at[:3, :3].set(rot)
    return out
