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


def test_multi_room_connectivity():
    """Every room center of the multi-room generator is reachable from
    the spawn (0,0) through the doorway graph, and the scene offers far
    more surface than the single-room default (the non-saturating bench
    scene, VERDICT r3 next-#3)."""
    from collections import deque
    from fisher_nerf_customized_tpu.envs.fake_sim import BoxScene
    for seed in (0, 7, 123):
        scene = BoxScene.multi_room(seed=seed, rooms_x=3, rooms_z=3)
        assert scene.is_navigable((0.0, 0.0, 0.0)), seed
        # BFS flood fill over a 0.2 m grid of navigable cells
        step = 0.2
        lo, hi = scene.room_lo, scene.room_hi
        nx = int((hi[0] - lo[0]) / step) + 1
        nz = int((hi[2] - lo[2]) / step) + 1
        def cell(x, z):
            return (int(round((x - lo[0]) / step)),
                    int(round((z - lo[2]) / step)))
        def xz(c):
            return (lo[0] + c[0] * step, lo[2] + c[1] * step)
        start = cell(0.0, 0.0)
        seen = {start}
        q = deque([start])
        while q:
            c = q.popleft()
            for d in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                n = (c[0] + d[0], c[1] + d[1])
                if n in seen or not (0 <= n[0] < nx and 0 <= n[1] < nz):
                    continue
                x, z = xz(n)
                if scene.is_navigable((x, 0.0, z)):
                    seen.add(n)
                    q.append(n)
        # each room center reachable (within a grid cell)
        room = 4.0
        wx, wz = 3 * room / 2, 3 * room / 2
        for i in range(3):
            for j in range(3):
                cx = -wx + (i + 0.5) * room
                cz = -wz + (j + 0.5) * room
                # clutter may sit on the exact center; accept any seen
                # cell within 0.8 m of it
                near = any(abs(xz(c)[0] - cx) < 0.8 and abs(xz(c)[1] - cz) < 0.8
                           for c in seen)
                assert near, (seed, i, j)
        # surface area: >= 2.5x the default single room's
        pts_multi = scene.sample_surface_points(1000)
        assert len(scene.obstacles) > 20
        default = BoxScene.default(seed=0)
        import numpy as _np
        def total_area(s):
            faces_area = 0.0
            for lo_, hi_ in [(s.room_lo, s.room_hi)] + list(s.obstacles):
                d = _np.asarray(hi_) - _np.asarray(lo_)
                faces_area += 2 * (d[0]*d[1] + d[1]*d[2] + d[0]*d[2])
            return faces_area
        assert total_area(scene) > 2.5 * total_area(default)
