"""Point-cloud bookkeeping: back-projection, subsampled accumulation, PLY IO.

Reference: tester_gaussians_navigation.py:401-506 backproj_depth_to_pcl /
store_filtered_pointcloud (5%-keep subsampling, periodic
pointcloud/global_pcl_{t}.ply export via open3d).  open3d is unavailable
offline, so PLY IO is hand-rolled (binary little-endian).
"""
from __future__ import annotations

import os
import struct

import numpy as np


def backproject_depth(depth: np.ndarray, intrinsics: np.ndarray,
                      c2w: np.ndarray, max_depth: float = 10.0,
                      color: np.ndarray | None = None):
    h, w = depth.shape
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    z = depth.reshape(-1)
    valid = (z > 0) & (z < max_depth)
    px = ((xs.reshape(-1) - cx) / fx * z)
    py = ((ys.reshape(-1) - cy) / fy * z)
    pts_cam = np.stack([px, py, z], -1)[valid]
    pts_w = pts_cam @ c2w[:3, :3].T + c2w[:3, 3]
    if color is not None:
        return pts_w, color.reshape(-1, 3)[valid]
    return pts_w


class GlobalPointCloud:
    """Running scene point cloud with keep-ratio subsampling
    (reference store_filtered_pointcloud keep_ratio=0.05)."""

    def __init__(self, keep_ratio: float = 0.05, seed: int = 0):
        self.keep_ratio = keep_ratio
        self.rng = np.random.default_rng(seed)
        self.points: list[np.ndarray] = []
        self.colors: list[np.ndarray] = []

    def add_frame(self, depth, intrinsics, c2w, color=None,
                  max_depth: float = 10.0):
        if color is not None:
            pts, cols = backproject_depth(depth, intrinsics, c2w, max_depth,
                                          color)
        else:
            pts = backproject_depth(depth, intrinsics, c2w, max_depth)
            cols = None
        n = len(pts)
        if n == 0:
            return
        keep = self.rng.random(n) < self.keep_ratio
        self.points.append(pts[keep].astype(np.float32))
        if cols is not None:
            self.colors.append(cols[keep].astype(np.float32))

    def get(self) -> np.ndarray:
        if not self.points:
            return np.zeros((0, 3), np.float32)
        return np.concatenate(self.points)

    def save_ply(self, path: str):
        cols = np.concatenate(self.colors) if self.colors else None
        write_ply(path, self.get(), cols)


def write_ply(path: str, points: np.ndarray,
              colors: np.ndarray | None = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    n = len(points)
    with open(path, "wb") as f:
        header = ["ply", "format binary_little_endian 1.0",
                  f"element vertex {n}",
                  "property float x", "property float y", "property float z"]
        if colors is not None:
            header += ["property uchar red", "property uchar green",
                       "property uchar blue"]
        header.append("end_header")
        f.write(("\n".join(header) + "\n").encode())
        pts = np.asarray(points, "<f4")
        if colors is not None:
            cols = np.clip(np.asarray(colors) * 255, 0, 255).astype(np.uint8)
            rec = np.zeros(n, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                                     ("r", "u1"), ("g", "u1"), ("b", "u1")])
            rec["x"], rec["y"], rec["z"] = pts[:, 0], pts[:, 1], pts[:, 2]
            rec["r"], rec["g"], rec["b"] = cols[:, 0], cols[:, 1], cols[:, 2]
            f.write(rec.tobytes())
        else:
            f.write(pts.tobytes())


def read_ply(path: str) -> np.ndarray:
    """Minimal reader for the files write_ply produces (+ascii fallback)."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode().strip()
            header.append(line)
            if line == "end_header":
                break
        n = next(int(l.split()[-1]) for l in header if l.startswith("element vertex"))
        has_color = any("uchar" in l for l in header)
        binary = any("binary_little_endian" in l for l in header)
        if binary:
            if has_color:
                rec = np.frombuffer(
                    f.read(n * 15),
                    dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                           ("r", "u1"), ("g", "u1"), ("b", "u1")])
                return np.stack([rec["x"], rec["y"], rec["z"]], -1).copy()
            data = np.frombuffer(f.read(n * 12), dtype="<f4")
            return data.reshape(n, 3).copy()
        rows = [f.readline().decode().split()[:3] for _ in range(n)]
        return np.asarray(rows, np.float32)
