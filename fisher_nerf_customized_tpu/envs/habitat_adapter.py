"""Habitat simulator adapter (gated import).

The reference binds episodes to habitat-sim through HabitatDataScene
(reference datasets/dataloader.py:79-376: Hydra config mutation, per-dataset
scene path logic, sensor overrides, episode json.gz loading, intrinsics
from hfov).  habitat-sim is not installed in this environment; this adapter
exposes the same observation dict as FakeSim (`rgb`, `depth`, `c2w`,
optional `semantic`) when habitat IS available, so the episode drivers are
simulator-agnostic.
"""
from __future__ import annotations

import os

import numpy as np

try:
    import habitat  # type: ignore
    HABITAT_AVAILABLE = True
except Exception:  # pragma: no cover - optional dependency
    habitat = None
    HABITAT_AVAILABLE = False


def _require_habitat():
    if not HABITAT_AVAILABLE:
        raise ImportError(
            "habitat-sim is not installed in this environment; use "
            "`--sim fake` (FakeSim) or install habitat-lab/habitat-sim to "
            "run MP3D/HM3D/Gibson scenes.")


class HabitatSim:
    """habitat.Env wrapper with the FakeSim observation interface.

    Scene-path conventions follow the reference (dataloader.py:87-106):
      mp3d:   {root}/mp3d/{scene}/{scene}.glb
      gibson: {root}/gibson/{scene}.glb
      hm3d:   {root}/hm3d/{split}/{scene}/{scene}.basis.glb
    """

    ACTION_MAP = {1: "move_forward", 2: "turn_left", 3: "turn_right"}

    def __init__(self, args, cfg, scene_id: str):
        _require_habitat()
        import habitat  # noqa: F811
        config_path = os.path.join(
            "configs", f"my_pointnav_{args.dataset.lower()}_val.yaml")
        config = habitat.get_config(config_path)
        # the reference mutates turn_angle / forward_step / max steps and
        # sensor resolutions here (dataloader.py:108-122)
        self._env = habitat.Env(config=config)
        self.turn_angle = float(cfg.turn_angle)
        self.forward_step = float(cfg.forward_step_size)
        h = int(cfg.SLAM.Dataset.Calibration.height)
        w = int(cfg.SLAM.Dataset.Calibration.width)
        hfov = np.deg2rad(90.0)
        fx = w / (2.0 * np.tan(hfov / 2.0))
        self._K = np.array([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1]],
                           np.float32)
        self._env.reset()

    @property
    def intrinsics(self):
        return self._K

    def _obs_dict(self, obs):
        state = self._env.sim.get_agent_state()
        c2w = _sensor_c2w(state)
        out = dict(rgb=np.asarray(obs["rgb"], np.float32) / 255.0,
                   depth=np.asarray(obs["depth"], np.float32).squeeze(),
                   c2w=c2w)
        if "semantic" in obs:
            out["semantic"] = np.asarray(obs["semantic"], np.int32)
        return out

    def get_observations(self):
        return self._obs_dict(self._env.sim.get_sensor_observations())

    def reset(self):
        return self._obs_dict(self._env.reset())

    def step(self, action_id: int):
        return self._obs_dict(self._env.step(self.ACTION_MAP[int(action_id)]))

    def is_navigable(self, pos) -> bool:
        p = np.asarray(pos, np.float32).reshape(-1)
        point = [float(p[0]), 0.0, float(p[-1])] if len(p) == 2 else \
            [float(p[0]), float(p[1]), float(p[2])]
        return bool(self._env.sim.pathfinder.is_navigable(point))

    @property
    def c2w(self):
        return _sensor_c2w(self._env.sim.get_agent_state())


def _sensor_c2w(agent_state) -> np.ndarray:
    """Agent/sensor state -> CV-frame c2w (reference datasets/util/
    utils.py:85 get_cam_transform: habitat's y-up/-z-forward sensor frame
    flipped into x-right/y-down/z-forward)."""
    import quaternion  # habitat dependency
    rot = quaternion.as_rotation_matrix(
        agent_state.sensor_states["rgb"].rotation)
    pos = np.asarray(agent_state.sensor_states["rgb"].position)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = rot @ np.diag([1.0, -1.0, -1.0])
    c2w[:3, 3] = pos
    return c2w
