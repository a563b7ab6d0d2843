"""Point-cloud bookkeeping: back-projection, subsampled accumulation, PLY IO.

Reference: tester_gaussians_navigation.py:401-506 backproj_depth_to_pcl /
store_filtered_pointcloud (5%-keep subsampling, periodic
pointcloud/global_pcl_{t}.ply export via open3d).  open3d is unavailable
offline, so PLY IO is hand-rolled (binary little-endian).
"""
from __future__ import annotations

import functools
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


_SUBSAMPLE_JIT = None


def _subsample_jit():
    """Lazy module-level jit (built once; jax import stays optional).
    Batched over a frame axis — one dispatch covers a whole window of
    deferred frames (per-step dispatches cost ~20 ms of host time each on
    tunneled TPUs)."""
    global _SUBSAMPLE_JIT
    if _SUBSAMPLE_JIT is not None:
        return _SUBSAMPLE_JIT
    import jax
    import jax.numpy as jnp

    def one(depth, rgb, c2w, intr, key, keep_ratio, max_depth,
            max_pts: int, with_color: bool):
        h, w = depth.shape
        fx, fy = intr[0, 0], intr[1, 1]
        cx, cy = intr[0, 2], intr[1, 2]
        ys = jnp.arange(h, dtype=jnp.float32)
        xs = jnp.arange(w, dtype=jnp.float32)
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        z = depth.reshape(-1)
        valid = (z > 0) & (z < max_depth)
        keep = jax.random.uniform(key, z.shape) < keep_ratio
        mask = valid & keep
        idx = jnp.nonzero(mask, size=max_pts, fill_value=0)[0]
        ok = jnp.arange(max_pts) < jnp.sum(mask)
        zk = z[idx]
        px = (gx.reshape(-1)[idx] - cx) / fx * zk
        py = (gy.reshape(-1)[idx] - cy) / fy * zk
        pts_cam = jnp.stack([px, py, zk], -1)
        pts_w = pts_cam @ c2w[:3, :3].T + c2w[:3, 3]
        cols = rgb.reshape(-1, 3)[idx] if with_color else jnp.zeros(
            (max_pts, 3), jnp.float32)
        return pts_w, cols, ok, jnp.sum(mask)

    @functools.partial(jax.jit, static_argnames=("max_pts", "with_color"))
    def impl(depths, rgbs, c2ws, intr, keys, keep_ratio, max_depth,
             max_pts: int, with_color: bool):
        return jax.vmap(
            lambda d, r, c, k: one(d, r, c, intr, k, keep_ratio, max_depth,
                                   max_pts, with_color))(
            depths, rgbs, c2ws, keys)

    _SUBSAMPLE_JIT = impl
    return impl


class GlobalPointCloud:
    """Running scene point cloud with keep-ratio subsampling
    (reference store_filtered_pointcloud keep_ratio=0.05).

    Frames arriving as JAX device arrays take a device path: the
    backprojection + subsample is jitted and only the fixed-capacity
    result handles are stored; the host pull is ONE batched device_get at
    `get()` time instead of a blocking per-step round trip."""

    def __init__(self, keep_ratio: float = 0.05, seed: int = 0,
                 window: int = 64):
        self.keep_ratio = keep_ratio
        self.rng = np.random.default_rng(seed)
        self.points: list[np.ndarray] = []
        self.colors: list[np.ndarray] = []
        self.window = int(window)
        self._raw: list = []         # (depth_dev, rgb_dev|None, c2w, seed)
        self._pending: list = []     # (pts_dev, cols_dev|None, valid_dev,
                                     #  truncated_dev)
        self.truncated_points = 0    # capacity-dropped keeps (audited)
        self._truncated_logged = 0

    def add_frame(self, depth, intrinsics, c2w, color=None,
                  max_depth: float = 10.0):
        if type(depth).__module__.startswith("jax"):
            # defer: keep the device handles, dispatch one batched
            # subsample per `window` frames (and pull only at get())
            self._raw.append((depth, color, np.asarray(c2w, np.float32),
                              int(self.rng.integers(0, 2**31 - 1)),
                              np.asarray(intrinsics, np.float32),
                              float(max_depth)))
            if len(self._raw) >= self.window:
                self._dispatch_raw()
            return
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

    def _dispatch_raw(self):
        if not self._raw:
            return
        import jax
        import jax.numpy as jnp
        batch = self._raw
        self._raw = []
        n_real = len(batch)
        # pad partial windows (one compiled batch size for the episode);
        # padding rows are dropped via a zeroed depth -> ok all-False
        while len(batch) < self.window:
            b0 = batch[-1]
            batch.append((jnp.zeros_like(b0[0]),) + b0[1:])
        h, w = batch[0][0].shape[-2], batch[0][0].shape[-1]
        # capacity with ~4 sigma headroom over the binomial keep count
        mean = h * w * self.keep_ratio
        cap = int(-(-(mean + 4.0 * np.sqrt(mean)) // 256) * 256)
        with_color = batch[0][1] is not None
        depths = jnp.stack([jnp.reshape(b[0], (h, w)) for b in batch])
        rgbs = (jnp.stack([b[1] for b in batch]) if with_color
                else jnp.zeros((len(batch), h, w, 3), jnp.float32))
        c2ws = jnp.asarray(np.stack([b[2] for b in batch]))
        import jax.random as jrandom
        keys = jax.vmap(jrandom.key)(
            jnp.asarray([b[3] for b in batch], jnp.uint32))
        intr = jnp.asarray(batch[0][4], jnp.float32)
        pts, cols, ok, n_kept = _subsample_jit()(
            depths, rgbs, c2ws, intr, keys, float(self.keep_ratio),
            float(batch[0][5]), cap, with_color)
        real = jnp.arange(len(batch)) < n_real
        ok = ok & real[:, None]
        # truncation audit: kept draws beyond the fixed capacity are
        # silently dropped by the fill — count them so coverage metrics
        # aren't silently biased over long episodes
        truncated = jnp.sum(jnp.where(real, jnp.maximum(n_kept - cap, 0), 0))
        self._pending.append((pts, cols if with_color else None, ok,
                              truncated))

    def _drain_pending(self):
        self._dispatch_raw()
        if not self._pending:
            return
        import jax
        pulled = jax.device_get(self._pending)   # ONE batched round trip
        self._pending = []
        for pts, cols, ok, truncated in pulled:
            pts, ok = np.asarray(pts), np.asarray(ok)
            self.truncated_points += int(truncated)
            for i in range(len(pts)):
                self.points.append(pts[i][ok[i]].astype(np.float32))
                if cols is not None:
                    self.colors.append(
                        np.asarray(cols[i])[ok[i]].astype(np.float32))
        if self.truncated_points > self._truncated_logged:
            import logging
            logging.getLogger("fnc_tpu.pcl").warning(
                "global point cloud: %d subsampled points dropped at the "
                "fixed per-frame capacity so far", self.truncated_points)
            self._truncated_logged = self.truncated_points

    def get(self) -> np.ndarray:
        self._drain_pending()
        if not self.points:
            return np.zeros((0, 3), np.float32)
        return np.concatenate(self.points)

    def get_new(self, cursor: int):
        """Points appended since `cursor` (a chunk index from a previous
        call) and the new cursor — the append-only feed for incremental
        reconstruction metrics (engine/eval.IncrementalReconMetric)."""
        self._drain_pending()
        chunks = self.points[cursor:]
        pts = (np.concatenate(chunks) if chunks
               else np.zeros((0, 3), np.float32))
        return pts, len(self.points)

    def save_ply(self, path: str):
        cols = np.concatenate(self.colors) if self.colors else None
        write_ply(path, self.get(), cols)

    # checkpoint hooks (the reference restores the global cloud on resume,
    # tester:2745-2800; losing it under-reports coverage after preemption)
    def save(self, path: str):
        pts = self.get()                       # drains pending device work
        cols = np.concatenate(self.colors) if self.colors else None
        # uncompressed: in-loop checkpoints pay this write synchronously
        from .io import atomic_savez
        atomic_savez(path, points=pts,
                     colors=(cols if cols is not None
                             else np.zeros((0, 3), np.float32)),
                     truncated=self.truncated_points)

    def load(self, path: str):
        d = np.load(path)
        self._raw, self._pending = [], []
        self.points = [np.asarray(d["points"], np.float32)] \
            if len(d["points"]) else []
        self.colors = [np.asarray(d["colors"], np.float32)] \
            if len(d["colors"]) else []
        self.truncated_points = int(d["truncated"])
        self._truncated_logged = self.truncated_points


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
