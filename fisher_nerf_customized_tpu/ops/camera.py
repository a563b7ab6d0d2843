"""Pinhole camera model for the splatting pipeline.

The reference wraps its camera in OpenGL-style view/projection matrices
(reference models/SLAM/utils/recon_helpers.py:4 setup_camera) only because
the CUDA rasterizer wants NDC; projecting directly with (fx, fy, cx, cy)
yields the identical pixel mapping: u = fx*x/z + cx - 0.5 (the -0.5 matches
ndc2Pix's half-pixel shift against integer pixel indices).  Camera frame is
+z forward, +x right, +y down.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Camera(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float
    width: int      # static
    height: int     # static
    near: float = 0.2    # matches in_frustum's 0.2 near cull (auxiliary.h)
    far: float = 100.0
    # EWA low-pass added to cov2d's diagonal (reference forward.cu:74
    # computeCov2D's +0.3).  A downsampled Fisher camera scales this by
    # 1/s² so the pixel-space math stays exactly self-similar (cov2d,
    # dx, conic all scale consistently) — without it the fixed floor
    # dominates small splats at reduced resolution and distorts EIG.
    dilation: float = 0.3

    @property
    def intrinsics(self):
        # HOST array: consumers read it per step; a jnp constant here
        # costs a device round trip on every np.asarray of it
        return np.array([[self.fx, 0.0, self.cx],
                         [0.0, self.fy, self.cy],
                         [0.0, 0.0, 1.0]], dtype=np.float32)


def camera_from_intrinsics(K, width: int, height: int, near: float = 0.2,
                           far: float = 100.0) -> Camera:
    K = jnp.asarray(K)
    return Camera(fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]),
                  cy=float(K[1, 2]), width=int(width), height=int(height),
                  near=near, far=far)
