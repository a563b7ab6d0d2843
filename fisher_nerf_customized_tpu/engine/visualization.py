"""Top-down episode visualization: map, fog-of-war, trajectories.

Reference: visualization/habitat_viz.py:48-427 HabitatVisualizer — GT
top-down map + fog-of-war mask revealed by the agent's FOV, agent/object
trails, robot sprite, periodic PNG export; the fow mask doubles as the 2D
coverage numerator in eval (tester:1498-1513).  This implementation draws
with cv2 onto a grid aligned with the planner's occupancy map and exposes
the same save/load-with-checkpoint hooks.
"""
from __future__ import annotations

import os

import cv2
import numpy as np


class MapVisualizer:
    def __init__(self, gt_free_map: np.ndarray, cell_size: float,
                 map_center: np.ndarray, fov_deg: float = 90.0,
                 vis_range: float = 4.0):
        """gt_free_map: (Gz, Gx) bool GT navigable mask (FakeSim:
        BoxScene.gt_free_map; habitat: draw_map equivalent)."""
        self.gt_free = np.asarray(gt_free_map, bool)
        self.cell_size = float(cell_size)
        self.map_center = np.asarray(map_center, np.float64)
        self.fov = np.deg2rad(fov_deg)
        self.vis_range = float(vis_range)
        self.fow_mask = np.zeros_like(self.gt_free, bool)
        self.traj: list[tuple[int, int]] = []
        self.obj_traj: list[tuple[int, int]] = []

    def _to_cell(self, x, z):
        gz, gx = self.gt_free.shape
        cx = int((x - self.map_center[0]) / self.cell_size + gx // 2)
        cz = int((z - self.map_center[1]) / self.cell_size + gz // 2)
        return np.clip(cx, 0, gx - 1), np.clip(cz, 0, gz - 1)

    def update_fow_sim(self, c2w: np.ndarray):
        """Reveal the FOV wedge ahead of the camera (reference
        habitat_viz.py update_fow_sim)."""
        c2w = np.asarray(c2w, np.float64)
        cx, cz = self._to_cell(c2w[0, 3], c2w[2, 3])
        self.traj.append((cx, cz))
        fwd = c2w[:3, :3] @ np.array([0.0, 0.0, 1.0])
        yaw = np.arctan2(fwd[0], fwd[2])
        wedge = np.zeros(self.gt_free.shape, np.uint8)
        r_cells = int(self.vis_range / self.cell_size)
        pts = [(cx, cz)]
        for a in np.linspace(yaw - self.fov / 2, yaw + self.fov / 2, 24):
            pts.append((int(cx + r_cells * np.sin(a)),
                        int(cz + r_cells * np.cos(a))))
        cv2.fillPoly(wedge, [np.asarray(pts, np.int32)], 1)
        self.fow_mask |= (wedge > 0) & self.gt_free

    def update_object(self, pos_xz):
        self.obj_traj.append(self._to_cell(pos_xz[0], pos_xz[-1]))

    def coverage_2d(self) -> float:
        """% of GT free space revealed (the eval denominator/numerator
        pair at tester:1498-1516)."""
        total = self.gt_free.sum()
        return float(self.fow_mask.sum() / max(total, 1) * 100.0)

    def render(self) -> np.ndarray:
        img = np.full(self.gt_free.shape + (3,), 30, np.uint8)
        img[self.gt_free] = (200, 200, 200)
        img[self.fow_mask] = (120, 180, 120)
        for i in range(1, len(self.traj)):
            cv2.line(img, self.traj[i - 1], self.traj[i], (200, 60, 60), 1)
        for i in range(1, len(self.obj_traj)):
            cv2.line(img, self.obj_traj[i - 1], self.obj_traj[i],
                     (60, 60, 200), 1)
        if self.traj:
            cv2.circle(img, self.traj[-1], 3, (255, 0, 0), -1)
        return img

    def save_vis_seen(self, out_dir: str, t: int):
        os.makedirs(out_dir, exist_ok=True)
        cv2.imwrite(os.path.join(out_dir, f"topdown_{t:05d}.png"),
                    self.render()[..., ::-1])

    # checkpoint hooks (reference saves visualizer state with the SLAM ckpt)
    def state_dict(self):
        return dict(fow_mask=self.fow_mask, traj=np.asarray(self.traj),
                    obj_traj=np.asarray(self.obj_traj))

    def load_state_dict(self, d):
        self.fow_mask = np.asarray(d["fow_mask"], bool)
        self.traj = [tuple(p) for p in np.asarray(d["traj"]).reshape(-1, 2)]
        self.obj_traj = [tuple(p) for p in
                         np.asarray(d["obj_traj"]).reshape(-1, 2)]


def write_trajectory_video(frames: list, path: str, fps: int = 10):
    """Episode RGB frames -> mp4 (reference saves a trajectory video every
    100 steps; tester:782-789)."""
    if not frames:
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    h, w = frames[0].shape[:2]
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for f in frames:
        img = np.asarray(f)
        if img.dtype != np.uint8:
            img = np.clip(img * 255, 0, 255).astype(np.uint8)
        vw.write(img[..., ::-1])
    vw.release()


def save_occ_map_png(occ_map, path: str, candidates=None, scores=None,
                     agent_cell=None, frontier=None):
    """Occupancy map PNG with candidate-pose score heatmap (reference
    astar.py:932-989 global_planning visualize block)."""
    occ = np.asarray(occ_map)
    index = occ.argmax(axis=0)
    img = np.zeros(index.shape + (3,), np.uint8)
    img[index == 1] = (255, 255, 255)
    img[index == 2] = (80, 80, 80)
    if frontier is not None and np.asarray(frontier).sum() > 0:
        f = cv2.dilate(np.asarray(frontier, np.uint8),
                       np.ones((3, 3), np.uint8))
        img[f > 0] = (0, 255, 0)
    if candidates is not None and scores is not None and len(scores) > 0:
        s = np.asarray(scores, np.float64)
        rng = s.max() - s.min()
        s = (s - s.min()) / (rng if rng > 0 else 1.0)
        for (x, z), v in zip(np.asarray(candidates), s):
            color = (int(255 * v), 0, int(255 * (1 - v)))
            cv2.circle(img, (int(x), int(z)), 1, color, -1)
    if agent_cell is not None:
        cv2.circle(img, (int(agent_cell[0]), int(agent_cell[1])), 2,
                   (255, 0, 0), -1)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, img[..., ::-1])
