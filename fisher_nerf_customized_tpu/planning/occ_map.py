"""Standalone occupancy map + grid utilities.

Reference: planning/occupancy.py:13-303 OccupancyMap (lighter standalone
vote map with ego crops) and datasets/util/map_utils.py (est_occ_from_pcd,
crop_grid, get_explored_grid).  Wraps the same jitted vote update as
AstarPlanner (planning/occupancy.py here) without the planner state.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.camera import Camera
from .occupancy import occ_update


class OccupancyMap:
    def __init__(self, camera: Camera, grid_dim=(768, 768),
                 cell_size: float = 0.1, map_center=(0.0, 0.0),
                 height_lower: float = 0.1, height_upper: float = 1.3,
                 pcd_far: float = 7.0):
        self.camera = camera
        self.cell_size = float(cell_size)
        self.map_center = np.asarray(map_center, np.float32)
        self.height_lower = float(height_lower)
        self.height_upper = float(height_upper)
        self.pcd_far = float(pcd_far)
        occ = np.zeros((3, grid_dim[1], grid_dim[0]), np.float32)
        occ[0] = 1.0
        self.occ_map = jnp.asarray(occ)

    def update(self, depth, c2w):
        self.occ_map, _ = occ_update(
            self.occ_map, jnp.asarray(np.asarray(depth, np.float32)),
            jnp.asarray(np.asarray(c2w, np.float32)), self.camera,
            self.cell_size, jnp.asarray(self.map_center), self.height_lower,
            self.height_upper, self.pcd_far)
        return self.occ_map

    def labels(self) -> np.ndarray:
        """0 unknown / 1 occupied / 2 free."""
        return np.asarray(self.occ_map).argmax(axis=0)

    def explored_ratio(self) -> float:
        """Fraction of cells no longer unknown (get_explored_grid role)."""
        lab = self.labels()
        return float((lab != 0).mean())

    def ego_crop(self, c2w, crop: int = 64) -> np.ndarray:
        """Agent-centered crop of the probability grid (OccupancyMap's
        ego-map save path)."""
        occ = np.asarray(self.occ_map)
        gz, gx = occ.shape[1], occ.shape[2]
        c2w = np.asarray(c2w)
        cx = int((c2w[0, 3] - self.map_center[0]) / self.cell_size + gx // 2)
        cz = int((c2w[2, 3] - self.map_center[1]) / self.cell_size + gz // 2)
        out = np.zeros((3, crop, crop), np.float32)
        out[0] = 1.0
        z0, x0 = cz - crop // 2, cx - crop // 2
        sz0, sx0 = max(z0, 0), max(x0, 0)
        sz1, sx1 = min(z0 + crop, gz), min(x0 + crop, gx)
        if sz1 > sz0 and sx1 > sx0:
            out[:, sz0 - z0:sz1 - z0, sx0 - x0:sx1 - x0] = \
                occ[:, sz0:sz1, sx0:sx1]
        return out

    def save(self, path: str):
        np.savez_compressed(path, occ_map=np.asarray(self.occ_map),
                            map_center=self.map_center,
                            cell_size=self.cell_size)

    def load(self, path: str):
        d = np.load(path)
        self.occ_map = jnp.asarray(d["occ_map"])
        self.map_center = d["map_center"]
        self.cell_size = float(d["cell_size"])


def est_occ_from_pcd(points: np.ndarray, grid_dim, cell_size: float,
                     map_center, height_band=(0.1, 1.3)) -> np.ndarray:
    """Occupancy label grid from a world point cloud (reference
    datasets/util/map_utils.py:70 est_occ_from_pcd)."""
    gx, gz = int(grid_dim[0]), int(grid_dim[1])
    occ = np.zeros((3, gz, gx), np.float32)
    occ[0] = 1.0
    pts = np.asarray(points)
    band = (pts[:, 1] >= height_band[0]) & (pts[:, 1] <= height_band[1])
    pts = pts[band]
    if len(pts) == 0:
        return occ
    ix = np.clip(np.floor((pts[:, 0] - map_center[0]) / cell_size)
                 + (gx - 1) // 2, 0, gx - 1).astype(np.int64)
    iz = np.clip(np.floor((pts[:, 2] - map_center[1]) / cell_size)
                 + (gz - 1) // 2, 0, gz - 1).astype(np.int64)
    np.add.at(occ[1], (iz, ix), 1.0)
    return occ


def crop_grid(grid: np.ndarray, center_cell, crop: int) -> np.ndarray:
    """Center crop with zero padding (map_utils.crop_grid role)."""
    c, h, w = grid.shape
    out = np.zeros((c, crop, crop), grid.dtype)
    z0 = int(center_cell[0]) - crop // 2
    x0 = int(center_cell[1]) - crop // 2
    sz0, sx0 = max(z0, 0), max(x0, 0)
    sz1, sx1 = min(z0 + crop, h), min(x0 + crop, w)
    if sz1 > sz0 and sx1 > sx0:
        out[:, sz0 - z0:sz1 - z0, sx0 - x0:sx1 - x0] = grid[:, sz0:sz1,
                                                            sx0:sx1]
    return out
