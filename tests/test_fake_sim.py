import numpy as np

from fisher_nerf_customized_tpu.envs.fake_sim import BoxScene, FakeSim
from fisher_nerf_customized_tpu.ops.camera import Camera

CAM = Camera(fx=32.0, fy=32.0, cx=32.0, cy=32.0, width=64, height=64)


def test_depth_matches_room_geometry():
    scene = BoxScene(room_lo=(-2, 0, -2), room_hi=(2, 2.5, 2), obstacles=[])
    sim = FakeSim(scene, CAM, cam_height=1.25)
    obs = sim.reset(start_xz=(0.0, 0.0), yaw=0.0)
    d = obs["depth"]
    # center pixel looks straight at a wall 2 m away
    assert abs(d[32, 32] - 2.0) < 0.05
    assert np.all(d > 0)
    assert obs["rgb"].shape == (64, 64, 3)
    assert obs["rgb"].min() >= 0 and obs["rgb"].max() <= 1


def test_forward_step_reduces_wall_distance():
    scene = BoxScene(room_lo=(-2, 0, -2), room_hi=(2, 2.5, 2), obstacles=[])
    sim = FakeSim(scene, CAM, forward_step=0.25)
    d0 = sim.reset()["depth"][32, 32]
    d1 = sim.step(1)["depth"][32, 32]
    assert abs((d0 - d1) - 0.25) < 0.02
    assert not sim.collided_last


def test_turn_left_right_roundtrip():
    scene = BoxScene.default(seed=1)
    sim = FakeSim(scene, CAM)
    p0 = sim.reset()["c2w"].copy()
    sim.step(2)
    sim.step(3)
    np.testing.assert_allclose(sim.c2w, p0, atol=1e-5)


def test_collision_blocks_forward():
    scene = BoxScene(room_lo=(-1, 0, -1), room_hi=(1, 2.5, 1), obstacles=[])
    sim = FakeSim(scene, CAM, forward_step=0.5)
    sim.reset(start_xz=(0.0, 0.5), yaw=0.0)
    # camera yaw 0 faces +z; one 0.5 m step would leave the room
    sim.step(1)
    assert sim.collided_last
    np.testing.assert_allclose(sim.c2w[:3, 3], [0.0, 1.25, 0.5], atol=1e-6)


def test_backprojection_consistency():
    """Depth + pose + intrinsics reconstruct points on the room walls."""
    scene = BoxScene(room_lo=(-2, 0, -2), room_hi=(2, 2.5, 2), obstacles=[])
    sim = FakeSim(scene, CAM)
    obs = sim.reset(start_xz=(0.3, -0.4), yaw=0.7)
    d, c2w = obs["depth"], obs["c2w"]
    ys, xs = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    px = (xs - CAM.cx) / CAM.fx
    py = (ys - CAM.cy) / CAM.fy
    pts_cam = np.stack([px * d, py * d, d], -1).reshape(-1, 3)
    pts_w = pts_cam @ c2w[:3, :3].T + c2w[:3, 3]
    # every point lies on one of the 6 wall planes (within tolerance)
    on_wall = (
        (np.abs(pts_w[:, 0] - -2) < 1e-3) | (np.abs(pts_w[:, 0] - 2) < 1e-3)
        | (np.abs(pts_w[:, 1] - 0) < 1e-3) | (np.abs(pts_w[:, 1] - 2.5) < 1e-3)
        | (np.abs(pts_w[:, 2] - -2) < 1e-3) | (np.abs(pts_w[:, 2] - 2) < 1e-3))
    assert on_wall.mean() > 0.999


def test_navigability_and_surface_sampling():
    scene = BoxScene.default(seed=0)
    assert scene.is_navigable((0.0, 0.0, 0.0))
    assert not scene.is_navigable((10.0, 0.0, 0.0))
    pts = scene.sample_surface_points(2000)
    assert pts.shape == (2000, 3)
    rng = np.random.default_rng(0)
    nav = scene.sample_navigable(rng, 50)
    assert all(scene.is_navigable((x, 0.0, z)) for x, z in nav)


def _mk():
    scene = BoxScene(room_lo=(-2, 0, -2), room_hi=(2, 2.5, 2), obstacles=[])
    return FakeSim(scene, CAM, forward_step=0.1, turn_angle=30.0)


def test_prefetch_matches_plain_step():
    """sim.prefetch(a) followed by step(a) must produce identical
    observations and pose to a plain step(a)."""
    sim_a = _mk()
    sim_b = _mk()
    sim_a.reset(start_xz=(0.2, -0.1), yaw=0.3)
    sim_b.reset(start_xz=(0.2, -0.1), yaw=0.3)
    for action in (2, 1, 1, 3, 1):
        sim_a.prefetch(action)
        oa = sim_a.step(action)
        ob = sim_b.step(action)
        np.testing.assert_allclose(oa["c2w"], ob["c2w"], atol=1e-6)
        np.testing.assert_allclose(oa["depth"], ob["depth"], atol=1e-5)
        np.testing.assert_allclose(oa["rgb"], ob["rgb"], atol=1e-5)
        assert sim_a.collided_last == sim_b.collided_last


def test_prefetch_mismatched_action_falls_back():
    """A stale prefetch (different action executed) must not leak into
    the step result."""
    sim_a = _mk()
    sim_b = _mk()
    sim_a.reset(); sim_b.reset()
    sim_a.prefetch(1)          # prefetch forward...
    oa = sim_a.step(2)         # ...but turn left instead
    ob = sim_b.step(2)
    np.testing.assert_allclose(oa["c2w"], ob["c2w"], atol=1e-6)
    np.testing.assert_allclose(oa["depth"], ob["depth"], atol=1e-5)
