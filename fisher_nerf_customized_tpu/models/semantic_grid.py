"""Geocentric occupancy grid with pose-conditioned ego registration.

Reference: models/semantic_grid.py:7-161 SemanticGrid — per-step
ego-centric grids are rotated/translated into the geocentric frame by a
spatial transformer and Bayes-fused into the running map.  Here the
transformer is a jitted bilinear warp (map_coordinates) and the fusion is
the same odds-style probability update.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=())
def _warp_ego_to_geo(ego, rel_xy_cells, rel_yaw, out_shape_grid):
    """Warp (C, h, w) ego grid into the (C, H, W) geocentric frame: the
    ego center maps to grid center + rel_xy (cells) rotated by rel_yaw."""
    c, h, w = ego.shape
    gh, gw = out_shape_grid.shape[-2], out_shape_grid.shape[-1]
    ys = jnp.arange(gh, dtype=jnp.float32) - gh / 2.0
    xs = jnp.arange(gw, dtype=jnp.float32) - gw / 2.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    # inverse transform: geocentric -> ego coords
    tx, ty = rel_xy_cells[0], rel_xy_cells[1]
    ca, sa = jnp.cos(-rel_yaw), jnp.sin(-rel_yaw)
    ex = ca * (gx - tx) - sa * (gy - ty) + w / 2.0
    ey = sa * (gx - tx) + ca * (gy - ty) + h / 2.0
    coords = jnp.stack([ey, ex])

    def warp_ch(ch):
        return jax.scipy.ndimage.map_coordinates(ch, coords, order=1,
                                                 mode="constant", cval=0.0)
    return jax.vmap(warp_ch)(ego)


class SemanticGrid:
    def __init__(self, grid_dim=(192, 192), n_classes: int = 3,
                 cell_size: float = 0.1):
        self.cell_size = float(cell_size)
        self.n_classes = n_classes
        self.grid_dim = tuple(grid_dim)
        # uniform prior
        self.proj_grid = np.full((n_classes,) + self.grid_dim,
                                 1.0 / n_classes, np.float32)
        self.origin_pose = None     # (x, z, yaw) of grid center

    def set_origin(self, pose_xzyaw):
        self.origin_pose = np.asarray(pose_xzyaw, np.float64)

    def register_ego(self, ego_probs: np.ndarray, pose_xzyaw):
        """Fuse an ego grid observed at pose (x, z, yaw) into the map
        (reference spatialTransformGrid + probability update)."""
        assert self.origin_pose is not None, "call set_origin first"
        pose = np.asarray(pose_xzyaw, np.float64)
        rel = pose - self.origin_pose
        rel_cells = jnp.asarray([rel[0] / self.cell_size,
                                 rel[1] / self.cell_size], jnp.float32)
        warped = np.asarray(_warp_ego_to_geo(
            jnp.asarray(ego_probs, jnp.float32), rel_cells,
            jnp.asarray(rel[2], jnp.float32),
            jnp.zeros(self.grid_dim)))
        observed = warped.sum(axis=0) > 1e-3
        # Bayes fusion: multiply likelihoods where observed, renormalize
        fused = self.proj_grid * np.where(observed, warped + 1e-4, 1.0)
        fused /= fused.sum(axis=0, keepdims=True) + 1e-12
        self.proj_grid = fused.astype(np.float32)
        return self.proj_grid

    def crop_at(self, pose_xzyaw, crop: int = 64) -> np.ndarray:
        """Ego-centered crop of the geocentric map (for the predictor)."""
        pose = np.asarray(pose_xzyaw, np.float64)
        rel = pose - self.origin_pose
        cx = int(self.grid_dim[1] / 2 + rel[0] / self.cell_size)
        cz = int(self.grid_dim[0] / 2 + rel[1] / self.cell_size)
        out = np.full((self.n_classes, crop, crop), 1.0 / self.n_classes,
                      np.float32)
        z0, z1 = cz - crop // 2, cz + crop // 2
        x0, x1 = cx - crop // 2, cx + crop // 2
        sz0, sx0 = max(z0, 0), max(x0, 0)
        sz1 = min(z1, self.grid_dim[0])
        sx1 = min(x1, self.grid_dim[1])
        if sz1 > sz0 and sx1 > sx0:
            out[:, sz0 - z0:sz1 - z0, sx0 - x0:sx1 - x0] = \
                self.proj_grid[:, sz0:sz1, sx0:sx1]
        return out
