"""Habitat data-layer contract tests — run WITHOUT habitat installed.

The adapter's pure helpers (scene paths, episode json.gz loading, config
overrides, intrinsics, noise, c2w math) are exercised directly, and the
full HabitatSim wiring runs against a mock habitat.Env via the injectable
env_factory (reference datasets/dataloader.py:79-376 HabitatDataScene).
"""
import gzip
import json
import types

import numpy as np
import pytest

from fisher_nerf_customized_tpu.config import get_cfg_defaults
from fisher_nerf_customized_tpu.envs.habitat_adapter import (
    HabitatSim, PoseNoiseModel, add_difficulty, apply_sensor_overrides,
    episode_file_path, intrinsics_from_hfov, load_pointnav_episodes,
    quat_wxyz_to_rotmat, scene_asset_path, sensor_c2w, unnormalize_depth)

IMG = 32


def test_scene_asset_paths():
    p = scene_asset_path("MP3D", "/data", "SceneA")
    assert p["scene"] == "/data/MP3D/SceneA/SceneA.glb"
    assert "mp3d_annotated_basis" in p["scene_dataset"]
    p = scene_asset_path("gibson", "/data", "Adrian")
    assert p["scene"] == "/data/gibson/Adrian/Adrian.glb"
    assert p["scene_dataset"] is None
    p = scene_asset_path("hm3d", "/data", "00800-TEEsavR23oF", split="val")
    assert p["scene"].endswith("TEEsavR23oF.basis.glb")
    with pytest.raises(ValueError):
        scene_asset_path("nope", "/data", "x")


def test_episode_file_paths():
    assert episode_file_path("MP3D", "/d", "val", "S").endswith(
        "pointnav_mp3d_v1/val/content/S.json.gz")
    assert episode_file_path("gibson", "/d", "val", "S").endswith(
        "pointnav_gibson_v2/val/content/S.json.gz")


def _write_episode_gz(path, scene="SceneA"):
    eps = {"episodes": [
        {"scene_id": f"mp3d/{scene}/{scene}.glb", "episode_id": "0",
         "start_position": [0, 0, 0], "start_rotation": [0, 0, 0, 1],
         "goals": [{"position": [1, 0, 1]}],
         "info": {"geodesic_distance": 8.2}},
        {"scene_id": "mp3d/Other/Other.glb", "episode_id": "1",
         "start_position": [0, 0, 0], "start_rotation": [0, 0, 0, 1],
         "goals": [{"position": [2, 0, 2]}],
         "info": {"geodesic_distance": 2.0}},
    ]}
    with gzip.open(path, "wt") as f:
        json.dump(eps, f)


def test_load_pointnav_episodes_filters_scene(tmp_path):
    p = str(tmp_path / "SceneA.json.gz")
    _write_episode_gz(p)
    data = load_pointnav_episodes(p, "SceneA")
    assert len(data["episodes"]) == 1
    assert data["episodes"][0]["episode_id"] == "0"
    # missing file -> empty list, no raise
    assert load_pointnav_episodes(str(tmp_path / "nope.json.gz"),
                                  "X") == {"episodes": []}


def test_add_difficulty_thresholds():
    eps = [{"info": {"geodesic_distance": d}} for d in (2.0, 8.0, 14.0)]
    add_difficulty(eps)
    assert [e["info"]["difficulty"] for e in eps] == \
        ["easy", "medium", "hard"]


def test_intrinsics_from_hfov():
    K = intrinsics_from_hfov(256, 256, 90.0)
    assert K[0, 0] == pytest.approx(128.0)   # fx = (w/2)/tan(45deg)
    assert K[0, 2] == pytest.approx(128.0)
    d = unnormalize_depth(np.array([0.0, 0.5, 1.0]), 0.5, 10.0)
    np.testing.assert_allclose(d, [0.5, 5.25, 10.0])


def _attr_tree(d):
    ns = types.SimpleNamespace()
    for k, v in d.items():
        setattr(ns, k, _attr_tree(v) if isinstance(v, dict) else v)
    return ns


def _mock_config():
    return _attr_tree(dict(habitat=dict(
        environment=dict(max_episode_steps=500),
        dataset=dict(type="PointNav-v1", split="train"),
        simulator=dict(
            turn_angle=30, forward_step_size=0.25, scene="", scene_dataset="",
            agents=dict(main_agent=dict(sim_sensors=dict(
                rgb_sensor=dict(width=640, height=480),
                depth_sensor=dict(width=640, height=480),
                semantic_sensor=dict(width=640, height=480))))))))


def test_apply_sensor_overrides():
    cfg = _mock_config()
    apply_sensor_overrides(cfg, turn_angle=10, forward_step=0.065,
                           max_steps=1000, img_width=256, img_height=256,
                           scene="/x/S.glb", scene_dataset="/x/ds.json",
                           split="val")
    sim = cfg.habitat.simulator
    assert sim.turn_angle == 10
    assert sim.forward_step_size == pytest.approx(0.065)
    assert cfg.habitat.environment.max_episode_steps == 1000
    assert cfg.habitat.dataset.type == ""
    for s in ("rgb_sensor", "depth_sensor", "semantic_sensor"):
        sen = getattr(sim.agents.main_agent.sim_sensors, s)
        assert (sen.width, sen.height) == (256, 256)
    assert sim.scene == "/x/S.glb"


def test_pose_noise_model_fallback():
    nm = PoseNoiseModel(noise_dir="/nonexistent", noise_level=1.0, seed=0)
    rel = nm.add_pose_noise(np.zeros(3), 1)
    assert rel.shape == (3,)
    assert np.any(rel != 0)
    # unknown action -> no noise
    np.testing.assert_allclose(nm.add_pose_noise(np.zeros(3), 0), 0.0)
    # deterministic per seed
    a = PoseNoiseModel(noise_dir="/x", seed=3).sample(2)
    b = PoseNoiseModel(noise_dir="/x", seed=3).sample(2)
    assert a == b


def test_sensor_c2w_math():
    # identity rotation: habitat sensor frame flips y and z
    c2w = sensor_c2w([1.0, 2.0, 3.0], (1.0, 0.0, 0.0, 0.0))
    np.testing.assert_allclose(c2w[:3, :3], np.diag([1.0, -1.0, -1.0]),
                               atol=1e-7)
    np.testing.assert_allclose(c2w[:3, 3], [1, 2, 3], atol=1e-7)
    # quat->rotmat sanity: 90deg about +y maps +z to +x
    R = quat_wxyz_to_rotmat(np.cos(np.pi / 4), 0.0, np.sin(np.pi / 4), 0.0)
    np.testing.assert_allclose(R @ [0, 0, 1], [1, 0, 0], atol=1e-7)


# -- full wiring against a mock habitat.Env ---------------------------------

class _Quat:
    def __init__(self, w, x, y, z):
        self.w, self.x, self.y, self.z = w, x, y, z


class _MockSim:
    def __init__(self):
        st = types.SimpleNamespace()
        st.sensor_states = {"rgb": types.SimpleNamespace(
            position=np.array([0.0, 1.25, 0.0]),
            rotation=_Quat(1.0, 0.0, 0.0, 0.0))}
        self._state = st
        self.pathfinder = types.SimpleNamespace(
            is_navigable=lambda p: True)

    def get_agent_state(self):
        return self._state

    def get_sensor_observations(self):
        return dict(rgb=np.full((IMG, IMG, 3), 128, np.uint8),
                    depth=np.full((IMG, IMG, 1), 2.0, np.float32),
                    semantic=np.zeros((IMG, IMG), np.int32))


class _MockEnv:
    def __init__(self, config):
        self.config = config
        self.sim = _MockSim()
        self.seeded = None
        self.reset_count = 0
        self.steps = []

    def seed(self, s):
        self.seeded = s

    def reset(self):
        self.reset_count += 1
        return self.sim.get_sensor_observations()

    def step(self, action):
        self.steps.append(action)
        return self.sim.get_sensor_observations()


def _args(tmp_path):
    return types.SimpleNamespace(dataset_type="MP3D",
                                 root_path=str(tmp_path), dataset_split="val",
                                 noisy_pose=False)


def _slam_cfg():
    cfg = get_cfg_defaults()
    cfg.SLAM.Dataset.Calibration.merge_from_other(dict(
        fx=float(IMG), fy=float(IMG), cx=IMG / 2, cy=IMG / 2,
        width=IMG, height=IMG))
    cfg.turn_angle = 10.0
    cfg.forward_step_size = 0.065
    cfg.num_frames = 77
    return cfg


def test_habitat_sim_full_wiring(tmp_path):
    # synthetic episode file at the reference's expected path
    ep_dir = tmp_path / "MP3D" / "pointnav_mp3d_v1" / "val" / "content"
    ep_dir.mkdir(parents=True)
    _write_episode_gz(str(ep_dir / "SceneA.json.gz"), scene="SceneA")

    made = {}

    def factory(config):
        made["env"] = _MockEnv(config)
        return made["env"]

    sim = HabitatSim(_args(tmp_path), _slam_cfg(), "SceneA",
                     env_factory=factory, config=_mock_config(), seed=5)
    env = made["env"]
    # config overrides reached the env config
    assert env.config.habitat.simulator.turn_angle == 10
    assert env.config.habitat.environment.max_episode_steps == 77
    assert env.config.habitat.simulator.scene.endswith("SceneA.glb")
    assert env.seeded == 5
    assert env.reset_count == 1
    # episode data layer
    assert len(sim) == 1
    info = sim.get_episode_info(0)
    assert info["goals"][0]["position"] == [1, 0, 1]
    # observation contract
    obs = sim.get_observations()
    assert obs["rgb"].shape == (IMG, IMG, 3)
    assert obs["rgb"].max() <= 1.0
    assert obs["depth"].shape == (IMG, IMG)
    assert obs["c2w"].shape == (4, 4)
    assert "semantic" in obs
    # stepping maps action ids to habitat action names
    sim.step(1)
    sim.step(2)
    assert env.steps == ["move_forward", "turn_left"]
    assert sim.is_navigable((0.0, 0.0))
    # intrinsics from hfov at the slam resolution
    assert sim.intrinsics[0, 2] == pytest.approx(IMG / 2)
