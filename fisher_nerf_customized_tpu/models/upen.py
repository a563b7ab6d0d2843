"""UPEN — uncertainty-driven exploration baseline policy.

Reference: models/UPEN.py:22-371 — an ensemble of occupancy predictors
drives exploration: per step the depth-derived ego grid registers into a
geocentric SemanticGrid; the ensemble predicts the map ahead; either (a)
FBE picks the nearest frontier on the mean prediction, or (b) RRT*
exploration paths are scored by ensemble disagreement (information gain)
and the best path's first waypoint becomes the goal.  The reference's
DD-PPO local policy needs a pretrained checkpoint (planning/
ddppo_policy.py:11-82) which is unavailable offline — waypoints are
followed with the discrete-action compiler instead (engine/actions.py).
"""
from __future__ import annotations

import numpy as np

from ..planning.frontier_search import FrontierSearch
from ..planning.rrt import RRTStar
from .predictors import PredictorEnsemble
from .semantic_grid import SemanticGrid


def ego_grid_from_depth(depth: np.ndarray, intrinsics: np.ndarray,
                        grid_dim: int = 64, cell_size: float = 0.1,
                        height_band=(0.1, 1.3), cam_height: float = 1.25,
                        far: float = 6.0) -> np.ndarray:
    """Label-pooled ego occupancy from one depth image (reference
    datasets/util/map_utils.py:20 est_occ_from_depth): per cell, counts of
    free ray samples vs obstacle hits -> (3, g, g) probabilities with the
    agent at the bottom-center looking +z."""
    h, w = depth.shape
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    z = depth.reshape(-1)
    valid = (z > 0) & (z < far)
    px = (xs.reshape(-1) - cx) / fx * z
    py = (ys.reshape(-1) - cy) / fy * z          # camera y (down)
    pts = np.stack([px, py, z], -1)[valid]

    counts = np.zeros((3, grid_dim, grid_dim), np.float32)

    def splat(p_xz, ch):
        gx = (p_xz[:, 0] / cell_size + grid_dim / 2).astype(np.int64)
        gz = (p_xz[:, 1] / cell_size).astype(np.int64)
        ok = (gx >= 0) & (gx < grid_dim) & (gz >= 0) & (gz < grid_dim)
        np.add.at(counts[ch], (gz[ok], gx[ok]), 1.0)

    # world height = cam_height - py (camera y is down)
    hgt = cam_height - pts[:, 1]
    obstacle = (hgt >= height_band[0]) & (hgt <= height_band[1])
    splat(pts[obstacle][:, [0, 2]], 1)
    # free: samples along each ray before the hit
    for f in (0.25, 0.5, 0.75, 0.92):
        free_pts = pts * f
        splat(free_pts[:, [0, 2]], 2)
    total = counts.sum(axis=0, keepdims=True)
    probs = np.where(total > 0, counts / np.maximum(total, 1e-6),
                     np.array([1.0, 0.0, 0.0], np.float32).reshape(3, 1, 1))
    return probs


class UPEN:
    def __init__(self, options, cfg=None, n_members: int = 4, seed: int = 0,
                 grid_dim: tuple = (192, 192), crop: int = 64,
                 cell_size: float = 0.1, use_rrt: bool = True,
                 ensemble_dir: str | None = None):
        self.options = options
        self.cfg = cfg
        self.ensemble = PredictorEnsemble(n_members=n_members, seed=seed)
        if ensemble_dir:
            # trained checkpoints from scripts/train_predictors.py
            # (reference loads its ensemble ckpts, models/UPEN.py:34-48)
            self.ensemble.load(ensemble_dir)
        self.sgrid = SemanticGrid(grid_dim=grid_dim, cell_size=cell_size)
        self.crop = crop
        self.cell_size = cell_size
        self.use_rrt = use_rrt
        self.rng = np.random.default_rng(seed)
        self.step_count = 0

    def init(self, pose_xzyaw):
        self.sgrid.set_origin(pose_xzyaw)
        self.step_count = 0

    def observe(self, depth, intrinsics, pose_xzyaw, cam_height=1.25):
        ego = ego_grid_from_depth(np.asarray(depth), np.asarray(intrinsics),
                                  grid_dim=self.crop,
                                  cell_size=self.cell_size,
                                  cam_height=cam_height)
        self.sgrid.register_ego(ego, pose_xzyaw)
        self.step_count += 1
        return ego

    def _predict(self, pose_xzyaw):
        crop = self.sgrid.crop_at(pose_xzyaw, self.crop)     # (3, c, c)
        inp = np.moveaxis(crop, 0, -1)[None]                 # NHWC
        mean, var, _all = self.ensemble.predict(inp)
        return np.moveaxis(np.asarray(mean[0]), -1, 0), \
            np.asarray(var[0]).mean(axis=-1)

    def predict_action(self, pose_xzyaw):
        """Next goal in MAP cells of the geocentric grid (reference
        UPEN.predict_action:111-220: RRT* ensemble-information paths or FBE
        fallback).  Returns (goal_cell (x, z) in geo-grid coords or None,
        info dict)."""
        mean_pred, uncertainty = self._predict(pose_xzyaw)
        rel = np.asarray(pose_xzyaw, np.float64) - self.sgrid.origin_pose
        gh, gw = self.sgrid.grid_dim
        agent = np.array([gw / 2 + rel[0] / self.cell_size,
                          gh / 2 + rel[1] / self.cell_size])

        geo = self.sgrid.proj_grid
        occ_binary = (geo.argmax(axis=0) == 1).astype(np.uint8)

        if self.use_rrt:
            # RRT goal sampled ∝ info² over the crop, where info =
            # ensemble disagreement x predicted unknown-class prob (the
            # reference aims its RRT at ensemble-information maxima,
            # models/UPEN.py:111-160).  STOCHASTIC sampling, not argmax: a
            # deterministic max-info goal fixates on one (often
            # unreachable) cell across replans and measurably degrades
            # coverage (round-3 A/B: argmax 45.2% cov2d vs random-goal
            # 54.0%); sampling keeps the pull toward information while
            # breaking fixation.  Near cells are suppressed so the goal
            # actually moves the agent.
            ch, cw = uncertainty.shape
            yy, xx = np.mgrid[0:ch, 0:cw]
            dist = np.hypot(xx - cw / 2, yy - ch / 2)
            info = uncertainty * (0.25 + mean_pred[0]) \
                * (dist >= min(10.0, cw / 4))
            w = (info.reshape(-1) ** 2).astype(np.float64)
            goal = agent + self.rng.uniform(-20, 20, 2)
            if np.isfinite(w).all() and w.sum() > 0:
                cell = int(self.rng.choice(len(w), p=w / w.sum()))
                iy, ix = np.unravel_index(cell, info.shape)
                goal = agent + np.array([ix - cw / 2, iy - ch / 2],
                                        np.float64)
            rrt = RRTStar(start=tuple(agent), goal=tuple(goal),
                          occupancy_map=occ_binary,
                          rand_area=(0, min(gh, gw) - 1),
                          expand_dis=6.0, max_iter=300,
                          search_until_max_iter=True, rng=self.rng)
            paths = rrt.planning(exploration=True, horizon=5)
            if paths:
                # score by summed ensemble disagreement along each path
                # (crop-local uncertainty resampled at path cells)
                scores = []
                ch, cw = uncertainty.shape
                for p in paths:
                    s = 0.0
                    for x, y in p:
                        ux = int(np.clip(x - agent[0] + cw / 2, 0, cw - 1))
                        uy = int(np.clip(y - agent[1] + ch / 2, 0, ch - 1))
                        s += float(uncertainty[uy, ux])
                    scores.append(s)
                best = paths[int(np.argmax(scores))]
                return np.asarray(best[0]), dict(mode="rrt",
                                                 n_paths=len(paths))
        # FBE fallback on the fused map
        fs = FrontierSearch(self.step_count, geo, min_frontier_size=4)
        goal = fs.nextGoal(np.array([[agent]]), np.zeros((1, 3)))
        return goal.reshape(-1), dict(mode="fbe")
