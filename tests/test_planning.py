"""Planning layer: occupancy votes, frontiers, A* on toy mazes."""
import numpy as np
import pytest

from fisher_nerf_customized_tpu.config import get_cfg_defaults
from fisher_nerf_customized_tpu.envs.fake_sim import BoxScene, FakeSim
from fisher_nerf_customized_tpu.ops.camera import Camera
from fisher_nerf_customized_tpu.planning import AstarPlanner, LocalizationError
from fisher_nerf_customized_tpu.planning.astar import AstarSearch

CAM = Camera(fx=32.0, fy=32.0, cx=32.0, cy=32.0, width=64, height=64)


def make_planner(cell=0.1):
    cfg = get_cfg_defaults()
    cfg.explore.cell_size = cell
    cfg.policy.height_lower = 0.1
    cfg.policy.height_upper = 2.0
    cfg.policy.pcd_far_distance = 7.0
    return AstarPlanner(cfg, seed=0)


def run_occ_updates(planner, sim, n_spin=12):
    obs = sim.reset()
    planner.init(obs["c2w"], sim.intrinsics, img_size=(64, 64))
    planner.update_occ_map(obs["depth"], obs["c2w"], 0)
    for t in range(n_spin):
        obs = sim.step(2)
        planner.update_occ_map(obs["depth"], obs["c2w"], t + 1)
    return obs


def test_occ_map_marks_walls_and_free():
    scene = BoxScene(room_lo=(-2, 0, -2), room_hi=(2, 2.5, 2), obstacles=[])
    sim = FakeSim(scene, CAM, turn_angle=30.0, cam_height=1.25)
    planner = make_planner()
    run_occ_updates(planner, sim)

    occ = np.asarray(planner.occ_map)
    index = occ.argmax(axis=0)
    # agent cell free
    cz, cx = planner.cam_pos
    assert index[cz, cx] == 2
    # wall cells along +z from the center should be occupied: the wall at
    # z=2 maps to grid row center + 2/cell
    gx0, gz0 = planner.grid_dim[0] // 2, planner.grid_dim[1] // 2
    wall_band = index[gz0 + 18:gz0 + 22, gx0 - 5:gx0 + 5]
    assert (wall_band == 1).any()
    # cells between agent and wall are free
    free_band = index[gz0 + 2:gz0 + 15, gx0 - 2:gx0 + 2]
    assert (free_band == 2).mean() > 0.8
    # far outside the room stays unknown
    assert index[10, 10] == 0


def test_frontiers_exist_after_partial_scan():
    scene = BoxScene(room_lo=(-3, 0, -3), room_hi=(3, 2.5, 3), obstacles=[])
    sim = FakeSim(scene, CAM, turn_angle=30.0)
    planner = make_planner()
    obs = sim.reset()
    planner.init(obs["c2w"], sim.intrinsics, img_size=(64, 64))
    planner.update_occ_map(obs["depth"], obs["c2w"], 0)
    # single view -> most of the room is unknown -> frontier must exist
    pts, free = planner.build_frontiers(None)
    assert pts is not None and len(pts) >= 1
    # FBE mode returns exactly one target point in world coords
    assert pts.shape[1] == 2


def test_astar_simple_corridor():
    h, w = 64, 64
    occ = np.zeros((h, w), np.uint8)
    occ[:, :4] = 1
    occ[:, -4:] = 1
    occ[:4, :] = 1
    occ[-4:, :] = 1
    free = 1 - occ
    search = AstarSearch(occ, free, start=(10, 10))
    path = search.plan(np.array([50, 50]))
    assert len(path) >= 2
    # path endpoints: starts at start cell (x, z order), ends near goal
    assert np.linalg.norm(path[0] - np.array([10, 10])) < 3
    assert np.linalg.norm(path[-1] - np.array([50, 50])) < 3
    # every path cell is free
    for x, z in path:
        assert occ[z, x] == 0


def test_astar_routes_around_wall():
    h, w = 64, 64
    occ = np.zeros((h, w), np.uint8)
    occ[:2, :] = 1; occ[-2:, :] = 1; occ[:, :2] = 1; occ[:, -2:] = 1
    occ[20:24, 5:55] = 1          # wall with a gap on the right
    free = 1 - occ
    search = AstarSearch(occ, free, start=(10, 30))
    path = search.plan(np.array([40, 30]))
    assert len(path) >= 2
    # must pass through the gap (x > 52) at some point
    assert (path[:, 0] > 50).any()
    for x, z in path:
        assert occ[z, x] == 0


def test_astar_unreachable_returns_empty():
    occ = np.zeros((32, 32), np.uint8)
    occ[14:18, :] = 1             # full-width wall
    free = 1 - occ
    search = AstarSearch(occ, free, start=(5, 16))
    path = search.plan(np.array([28, 16]))
    assert len(path) == 0


def test_setup_start_and_plan_world_goal():
    scene = BoxScene(room_lo=(-3, 0, -3), room_hi=(3, 2.5, 3), obstacles=[])
    sim = FakeSim(scene, CAM, turn_angle=30.0)
    planner = make_planner()
    obs = run_occ_updates(planner, sim, n_spin=12)

    agent_pos = obs["c2w"][:3, 3]
    start = planner.convert_to_map(agent_pos[[0, 2]])[[1, 0]]
    planner.setup_start(start, None, 0)
    goal_world = np.array([0.0, 1.2])     # 1.2 m ahead in z
    goal = planner.convert_to_map(goal_world)[[1, 0]]
    path = planner.planning(goal)
    assert len(path) >= 1


def test_localization_error_when_enclosed():
    planner = make_planner()
    planner.grid_dim = np.array([32, 32])
    planner.map_center = np.zeros(2, np.float32)
    planner.cam_height = 1.25
    import jax.numpy as jnp
    occ = np.zeros((3, 32, 32), np.float32)
    occ[1] = 10.0                  # everything occupied
    planner.occ_map = jnp.asarray(occ)
    planner.cam_pos = np.array([16, 16])
    with pytest.raises(LocalizationError):
        planner.setup_start(np.array([16, 16]), None, 0)


def test_global_planning_frontier_returns_goal():
    scene = BoxScene(room_lo=(-3, 0, -3), room_hi=(3, 2.5, 3), obstacles=[])
    sim = FakeSim(scene, CAM, turn_angle=30.0)
    planner = make_planner()
    obs = sim.reset()
    planner.init(obs["c2w"], sim.intrinsics, img_size=(64, 64))
    planner.update_occ_map(obs["depth"], obs["c2w"], 0)
    goal, free = planner.global_planning_frontier(agent_pose=obs["c2w"][:3, 3])
    assert goal is not None and goal.shape == (1, 2)


def test_global_planning_with_stub_scores():
    scene = BoxScene(room_lo=(-3, 0, -3), room_hi=(3, 2.5, 3), obstacles=[])
    sim = FakeSim(scene, CAM, turn_angle=30.0)
    planner = make_planner()
    planner.K = 32
    obs = run_occ_updates(planner, sim, n_spin=12)
    poses, scores, rg = planner.global_planning(
        pose_evaluation_fn=None, gaussian_points=None,
        agent_pose=obs["c2w"][:3, 3])
    assert poses is not None
    assert poses.shape[0] <= 20 and poses.shape[1:] == (4, 4)
    # candidates are level CV cameras: y axis points down
    assert np.all(np.asarray(poses)[:, 1, 1] < 0)


# ---------------------------------------------------------------------------
# SweepSearch (jitted whole-grid relaxation) — must agree with host A*
# ---------------------------------------------------------------------------

def _sweep(occ, free, start):
    from fisher_nerf_customized_tpu.planning.sweep import SweepSearch
    return SweepSearch(occ, free, start)


def test_sweep_simple_corridor():
    h, w = 64, 64
    occ = np.zeros((h, w), np.uint8)
    occ[:, :4] = 1; occ[:, -4:] = 1; occ[:4, :] = 1; occ[-4:, :] = 1
    free = 1 - occ
    search = _sweep(occ, free, start=(10, 10))
    path = search.plan(np.array([50, 50]))
    assert len(path) >= 2
    assert np.linalg.norm(path[0] - np.array([10, 10])) < 3
    assert np.linalg.norm(path[-1] - np.array([50, 50])) < 3
    for x, z in path:
        assert occ[z, x] == 0


def test_sweep_routes_around_wall_matches_astar_cost():
    h, w = 64, 64
    occ = np.zeros((h, w), np.uint8)
    occ[:2, :] = 1; occ[-2:, :] = 1; occ[:, :2] = 1; occ[:, -2:] = 1
    occ[20:24, 5:55] = 1
    free = 1 - occ
    sweep = _sweep(occ, free, start=(10, 30))
    path = sweep.plan(np.array([40, 30]), shortcut=False)
    assert len(path) >= 2
    assert (path[:, 0] > 50).any()       # through the gap
    for x, z in path:
        assert occ[z, x] == 0
    # optimality: sweep's converged cost at the goal is <= the A* path cost
    astar = AstarSearch(occ, free, start=(10, 30))
    apath = astar.plan(np.array([40, 30]), shortcut=False)
    assert len(apath) >= 2
    a_cost = astar.tree[40, 30, 0] + astar.tree[40, 30, 3]
    s_cost = sweep.cost[40, 30]
    assert s_cost <= a_cost + 1e-3


def test_sweep_unreachable_returns_empty():
    occ = np.zeros((32, 32), np.uint8)
    occ[14:18, :] = 1
    free = 1 - occ
    search = _sweep(occ, free, start=(5, 16))
    path = search.plan(np.array([28, 16]))
    assert len(path) == 0


def test_sweep_multi_goal_reuses_field():
    """One sweep answers many goals (the planning-event access pattern)."""
    occ = np.zeros((64, 64), np.uint8)
    occ[:2, :] = 1; occ[-2:, :] = 1; occ[:, :2] = 1; occ[:, -2:] = 1
    free = 1 - occ
    search = _sweep(occ, free, start=(32, 32))
    for goal in [(10, 10), (10, 50), (50, 10), (50, 50), (32, 8)]:
        path = search.plan(np.array(goal))
        assert len(path) >= 2
        assert np.linalg.norm(path[-1] - np.array(goal)[::-1]) < 3


# -- round-5 clearance-aware C-space planning -------------------------------

def _synthetic_planner(cell=0.05, dim=64):
    """Planner with a hand-built occupancy map (no sim needed)."""
    import jax.numpy as jnp
    planner = make_planner(cell)
    planner.grid_dim = np.array([dim, dim])
    planner.map_center = np.zeros(2, np.float32)
    planner.cam_height = 1.25
    planner.cam_pos = np.array([dim // 2, dim // 2])
    occ = np.zeros((3, dim, dim), np.float32)
    occ[2] = 10.0                          # everything observed free
    # wall across the middle with a 7-cell doorway
    occ[2, 30:33, :] = 0.0
    occ[1, 30:33, :] = 10.0
    occ[1, 30:33, 28:35] = 0.0
    occ[2, 30:33, 28:35] = 10.0
    planner.occ_map = jnp.asarray(occ)
    return planner


def test_clearance_inflation_blocks_narrow_doorway():
    """With C-space inflation wider than the doorway half-width the path
    through the gap must disappear; with no clearance it exists."""
    start = np.array([10, 31])
    goal = np.array([54, 31])

    p0 = _synthetic_planner()
    p0.clearance_cells = 0
    p0.setup_start(start, None, 0)
    path0 = p0.planning(goal)
    assert len(path0) > 0                  # passable without inflation

    p4 = _synthetic_planner()
    p4.clearance_cells = 4                 # 7-cell door < 2*4+path width
    p4.setup_start(start, None, 0)
    path4 = p4.planning(goal)
    assert len(path4) == 0                 # C-space closes the doorway


def test_clearance_passable_wide_doorway_keeps_margin():
    """A 20-cell doorway stays passable under inflation and the path
    keeps >= clearance cells away from observed obstacles."""
    import jax.numpy as jnp
    dim = 64
    planner = make_planner(0.05)
    planner.grid_dim = np.array([dim, dim])
    planner.map_center = np.zeros(2, np.float32)
    planner.cam_height = 1.25
    planner.cam_pos = np.array([dim // 2, dim // 2])
    occ = np.zeros((3, dim, dim), np.float32)
    occ[2] = 10.0
    occ[2, 30:33, :] = 0.0
    occ[1, 30:33, :] = 10.0
    occ[1, 30:33, 22:42] = 0.0             # 20-cell doorway
    occ[2, 30:33, 22:42] = 10.0
    planner.occ_map = jnp.asarray(occ)
    planner.clearance_cells = 3
    start = np.array([10, 31])
    planner.setup_start(start, None, 0)
    path = planner.planning(np.array([54, 31]))
    assert len(path) > 0
    occ_idx = np.asarray(jnp.argmax(planner.occ_map, 0))
    wall_cells = np.argwhere(occ_idx == 1)
    for x, z in path:                      # path rows are [x, z]
        d = np.abs(wall_cells - np.array([z, x])).max(axis=1).min()
        assert d >= 3, f"path cell ({x},{z}) within {d} of a wall"


def test_goal_snapping_recovers_inflated_goal():
    """A goal inside the inflated band (e.g. a frontier at the wall)
    snaps to the nearest navigable cell instead of failing."""
    planner = _synthetic_planner()
    planner.clearance_cells = 3
    planner.setup_start(np.array([10, 31]), None, 0)
    # goal one cell from the wall: inside the inflated C-space band
    path = planner.planning(np.array([27, 10]))
    assert len(path) > 0
    end = path[-1]                          # [x, z]
    assert abs(int(end[1]) - 27) <= 8 and abs(int(end[0]) - 10) <= 8


def test_surface_distance_exact_vs_dense_nn():
    from fisher_nerf_customized_tpu.envs.fake_sim import BoxScene
    s = BoxScene()
    pts = s.sample_surface_points(2000)
    assert s.surface_distance(pts).max() < 1e-5
    gt = s.sample_surface_points(300000)
    q = s.sample_navigable(np.random.default_rng(0), 32)
    q3 = np.stack([q[:, 0], np.full(32, 1.2), q[:, 1]], 1)
    from scipy.spatial import cKDTree
    nn = cKDTree(gt).query(q3)[0]
    assert np.abs(s.surface_distance(q3) - nn).max() < 5e-3
    assert s.surface_area() > 0
