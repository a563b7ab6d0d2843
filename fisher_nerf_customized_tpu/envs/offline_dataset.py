"""Stored-episode dataset for predictor training.

Reference: datasets/dataloader.py:23-75 HabitatDataOffline (stored episode
grids for UPEN predictor training) and :277-376 __getitem__ replaying
shortest-path episodes into ego grids.  Here episodes are generated from
FakeSim random walks: each sample is (partial ego grid input, complete GT
ego grid label) so the predictor learns to complete maps.
"""
from __future__ import annotations

import os

import numpy as np

from ..models.upen import ego_grid_from_depth
from .fake_sim import BoxScene, FakeSim


def generate_offline_dataset(camera, n_scenes: int = 4,
                             steps_per_scene: int = 30, grid_dim: int = 64,
                             cell_size: float = 0.1, seed: int = 0,
                             traj_policy: str = "frontier"):
    """Returns (inputs (N, g, g, 3) partial ego probs NHWC,
    labels (N, g, g) GT class ids).

    traj_policy: "frontier" drives each recording episode with the
    frontier-exploration navigator (the reference trains its predictors on
    stored *shortest-path pointnav* episodes, dataloader.py:277-376 — i.e.
    goal-directed coverage trajectories, not random walks; FBE is the
    closest offline analog here and visits far more distinct viewpoints
    than a random walk, which bumps along walls).  "random" keeps the
    round-2 random-walk floor for comparison.
    """
    rng = np.random.default_rng(seed)
    inputs, labels = [], []

    def record(scene):
        def on_frame(obs):
            ego = ego_grid_from_depth(obs["depth"], sim.intrinsics,
                                      grid_dim=grid_dim, cell_size=cell_size)
            gt = _gt_ego_grid(scene, obs["c2w"], grid_dim, cell_size)
            inputs.append(np.moveaxis(ego, 0, -1))
            labels.append(gt)
        return on_frame

    for s in range(n_scenes):
        scene = BoxScene.default(seed=seed * 100 + s)
        sim = FakeSim(scene, camera, forward_step=0.15, turn_angle=30.0,
                      seed=s)
        on_frame = record(scene)
        if traj_policy == "frontier":
            from ..config import get_cfg_defaults
            from ..engine.navigator import FrontierNavigator
            cfg = get_cfg_defaults()
            cfg.workdir = "/tmp/fnc_offline_ds"
            cfg.run_name = f"rec_{s}"
            cfg.policy.name = "frontier"
            cfg.policy.planning_queue_size = 10
            cfg.num_frames = steps_per_scene
            cfg.forward_step_size = 0.15
            cfg.turn_angle = 30.0
            cfg.explore.cell_size = cell_size
            nav = FrontierNavigator(cfg, sim, scene=scene, seed=s)
            nav.frontier_test_navigation(
                on_step=lambda obs, t: on_frame(obs))
        else:
            obs = sim.reset()
            for _t in range(steps_per_scene):
                a = int(rng.choice([1, 1, 1, 2, 3]))
                obs = sim.step(a)
                on_frame(obs)
    return np.stack(inputs).astype(np.float32), np.stack(labels)


def _gt_ego_grid(scene: BoxScene, c2w: np.ndarray, grid_dim: int,
                 cell_size: float) -> np.ndarray:
    """GT ego occupancy labels: agent at bottom-center looking +z."""
    R, t = c2w[:3, :3], c2w[:3, 3]
    fwd = R @ np.array([0.0, 0.0, 1.0])
    yaw = np.arctan2(fwd[0], fwd[2])
    c, s = np.cos(yaw), np.sin(yaw)
    labels = np.zeros((grid_dim, grid_dim), np.int64)
    for gz in range(grid_dim):
        for gx in range(grid_dim):
            ex = (gx - grid_dim / 2) * cell_size
            ez = gz * cell_size
            wx = t[0] + c * ex + s * ez
            wz = t[2] - s * ex + c * ez
            labels[gz, gx] = 2 if scene.is_navigable((wx, 0.0, wz)) else 1
    return labels


def save_dataset(path: str, inputs, labels):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, inputs=inputs, labels=labels)


def load_dataset(path: str):
    d = np.load(path)
    return d["inputs"], d["labels"]
