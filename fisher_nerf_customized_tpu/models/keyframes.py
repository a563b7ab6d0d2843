"""Keyframe buffer + overlap-based selection.

The reference keeps a python list of keyframe dicts on the GPU (reference
models/SLAM/gaussian.py:810-826) and ranks them by reprojection overlap of
1600 sampled pixels (reference models/SLAM/utils/keyframe_selection.py:40
keyframe_selection_overlap).  Here the buffer is host-side numpy (images
only travel to the device as the gathered mapping window) and the overlap
ranking is vectorized over all keyframes at once.
"""
from __future__ import annotations

import numpy as np


class KeyframeBuffer:
    def __init__(self, height: int, width: int):
        self.colors: list[np.ndarray] = []   # (H, W, 3) float32 in [0,1]
        self.depths: list[np.ndarray] = []   # (H, W) float32
        self.w2cs: list[np.ndarray] = []     # (4, 4)
        self.ids: list[int] = []
        # device-resident copies, uploaded ONCE at append (async) — the
        # mapping window is then stacked on device instead of re-uploading
        # ~25 MB of keyframes per mapping event (H2D latency dominates on
        # tunneled TPUs)
        self._colors_dev: list = []
        self._depths_dev: list = []
        self.height, self.width = height, width

    def __len__(self):
        return len(self.ids)

    def append(self, color, depth, w2c, frame_id: int,
               color_dev=None, depth_dev=None):
        # device-resident frames keep only the device copy; host copies
        # (needed for checkpoints) materialize lazily in state_dict()
        if type(color).__module__.startswith("jax"):
            color_dev = color if color_dev is None else color_dev
            depth_dev = depth if depth_dev is None else depth_dev
            self.colors.append(None)
            self.depths.append(None)
        else:
            self.colors.append(np.asarray(color, np.float32))
            self.depths.append(np.asarray(depth, np.float32))
        self.w2cs.append(np.asarray(w2c, np.float32))
        self.ids.append(int(frame_id))
        self._colors_dev.append(color_dev)
        self._depths_dev.append(depth_dev)

    def color_dev(self, i: int):
        import jax.numpy as jnp
        if self._colors_dev[i] is None:
            self._colors_dev[i] = jnp.asarray(self.colors[i])
        return self._colors_dev[i]

    def depth_dev(self, i: int):
        import jax.numpy as jnp
        if self._depths_dev[i] is None:
            self._depths_dev[i] = jnp.asarray(self.depths[i])
        return self._depths_dev[i]

    def stacked_w2cs(self) -> np.ndarray:
        if not self.w2cs:
            return np.zeros((0, 4, 4), np.float32)
        return np.stack(self.w2cs)

    def _materialize_host(self):
        """Pull any device-only frames to host (ONE batched device_get)."""
        missing = [i for i, c in enumerate(self.colors) if c is None]
        if not missing:
            return
        import jax
        pulled = jax.device_get([(self._colors_dev[i], self._depths_dev[i])
                                 for i in missing])
        for i, (c, d) in zip(missing, pulled):
            self.colors[i] = np.asarray(c, np.float32)
            self.depths[i] = np.asarray(d, np.float32)

    def state_dict(self):
        self._materialize_host()
        return dict(colors=self.colors, depths=self.depths, w2cs=self.w2cs,
                    ids=self.ids)

    def load_state_dict(self, d):
        self.colors = [np.asarray(c, np.float32) for c in d["colors"]]
        self.depths = [np.asarray(c, np.float32) for c in d["depths"]]
        self.w2cs = [np.asarray(c, np.float32) for c in d["w2cs"]]
        self.ids = [int(i) for i in d["ids"]]
        self._colors_dev = [None] * len(self.ids)
        self._depths_dev = [None] * len(self.ids)


def select_keyframes_overlap(gt_depth: np.ndarray, w2c: np.ndarray,
                             intrinsics: np.ndarray, buffer: KeyframeBuffer,
                             k: int, pixels: int = 1600,
                             rng: np.random.Generator | None = None,
                             exclude_last: bool = True) -> list[int]:
    """Indices (into the buffer, excluding its last entry) of up to k
    keyframes ranked by reprojection overlap with the current view.

    Mirrors keyframe_selection.py:40-134: sample `pixels` valid-depth
    pixels, backproject with the current w2c, project into every keyframe,
    count the fraction landing >20 px inside the image with positive depth,
    then take a random permutation of all keyframes with overlap > 0.
    """
    rng = rng or np.random.default_rng()
    kf_w2cs = buffer.stacked_w2cs()
    if exclude_last:
        kf_w2cs = kf_w2cs[:-1]
    if len(kf_w2cs) == 0:
        return []

    h, w = gt_depth.shape[-2], gt_depth.shape[-1]
    d = gt_depth.reshape(h, w)
    vy, vx = np.nonzero(d > 0)
    if len(vy) == 0:
        return []
    sel = rng.integers(0, len(vy), size=min(pixels, len(vy)))
    py, px = vy[sel], vx[sel]
    z = d[py, px]

    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    pts_cam = np.stack([(px - cx) / fx * z, (py - cy) / fy * z, z], axis=-1)
    c2w = np.linalg.inv(w2c)
    pts_w = pts_cam @ c2w[:3, :3].T + c2w[:3, 3]

    # project into all keyframes at once: (K, P, 3)
    pts_k = np.einsum("kij,pj->kpi", kf_w2cs[:, :3, :3], pts_w) + kf_w2cs[:, None, :3, 3]
    zk = pts_k[..., 2] + 1e-5
    u = fx * pts_k[..., 0] / zk + cx
    v = fy * pts_k[..., 1] / zk + cy
    edge = 20
    inside = ((u > edge) & (u < w - edge) & (v > edge) & (v < h - edge)
              & (zk > 0))
    percent = inside.mean(axis=1)

    ranked = np.argsort(-percent, kind="stable")
    candidates = [int(i) for i in ranked if percent[i] > 0.0]
    return [int(i) for i in rng.permutation(candidates)[:k]]
