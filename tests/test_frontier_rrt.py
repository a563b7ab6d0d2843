"""Yamauchi frontier search, RRT/RRT*, maximin selection."""
import numpy as np

from fisher_nerf_customized_tpu.planning.frontier_search import (
    FREE, OCCUPIED, VOID, FrontierSearch, approx_min_dist_center,
    labels_from_probs, select_maximin_points)
from fisher_nerf_customized_tpu.planning.rrt import RRT, RRTStar


def make_probs(labels):
    """labels (H, W) -> fake (3, H, W) one-hot probability grid."""
    h, w = labels.shape
    probs = np.zeros((3, h, w), np.float32)
    for c in range(3):
        probs[c][labels == c] = 0.9
    return probs


def test_labels_from_probs_void_threshold():
    probs = np.zeros((3, 4, 4), np.float32)
    probs[2, 0, 0] = 0.9          # confident FREE
    probs[1, 1, 1] = 0.3          # low confidence -> VOID
    labels = labels_from_probs(probs)
    assert labels[0, 0] == FREE
    assert labels[1, 1] == VOID


def test_frontier_search_finds_free_void_boundary():
    labels = np.full((32, 32), VOID, np.int64)
    labels[8:24, 8:24] = FREE                  # free room inside unknown
    labels[8:24, 8] = OCCUPIED                 # one wall
    fs = FrontierSearch(0, make_probs(labels), min_frontier_size=3)
    frontiers = fs.searchFrom(np.array([[[16, 16]]]))
    assert len(frontiers) >= 1
    # all frontier cells are FREE and adjacent to VOID
    for f in frontiers:
        for x, y in f.points[:10]:
            assert labels[y, x] == FREE


def test_frontier_next_goal_and_backward_fallback():
    labels = np.full((32, 32), VOID, np.int64)
    labels[8:24, 8:24] = FREE
    fs = FrontierSearch(0, make_probs(labels))
    goal = fs.nextGoal(np.array([[[16, 16]]]), np.zeros((1, 3)))
    assert goal.shape == (1, 1, 2)
    # fully-explored map (all FREE, no VOID): backward fallback
    labels2 = np.full((32, 32), FREE, np.int64)
    fs2 = FrontierSearch(0, make_probs(labels2))
    goal2 = fs2.nextGoal(np.array([[[16, 16]]]), np.zeros((1, 3)))
    assert goal2.shape == (1, 1, 2)
    assert not np.allclose(goal2, [[[16, 16]]])


def _corridor_map(h=64, w=64):
    occ = np.zeros((h, w), np.uint8)
    occ[:4, :] = 1; occ[-4:, :] = 1; occ[:, :4] = 1; occ[:, -4:] = 1
    occ[28:36, 4:48] = 1                        # wall with gap on the right
    return occ


def test_rrt_finds_path():
    occ = _corridor_map()
    rng = np.random.default_rng(0)
    rrt = RRT(start=(10, 10), goal=(10, 54), occupancy_map=occ,
              rand_area=(4, 60), expand_dis=6.0, max_iter=2000, rng=rng)
    path = rrt.planning()
    assert path is not None
    path = np.asarray(path)
    # endpoints correct (path is goal->start)
    assert np.linalg.norm(path[0] - [10, 54]) < 1e-6
    assert np.linalg.norm(path[-1] - [10, 10]) < 1e-6
    # no path point on an obstacle
    for x, y in path:
        assert occ[int(round(y)), int(round(x))] == 0


def test_rrt_star_finds_path_and_exploration_paths():
    occ = _corridor_map()
    rng = np.random.default_rng(1)
    rrt = RRTStar(start=(10, 10), goal=(10, 54), occupancy_map=occ,
                  rand_area=(4, 60), expand_dis=6.0, max_iter=1500, rng=rng)
    path = rrt.planning()
    assert path is not None
    # exploration mode: horizon-length candidate paths from the root
    rrt2 = RRTStar(start=(10, 10), goal=(10, 54), occupancy_map=occ,
                   rand_area=(4, 60), expand_dis=6.0, max_iter=400,
                   search_until_max_iter=True,
                   rng=np.random.default_rng(2))
    paths = rrt2.planning(exploration=True, horizon=3)
    assert isinstance(paths, list) and len(paths) > 0
    assert all(len(p) == 3 for p in paths)


def test_rrt_blocked_returns_none():
    occ = np.zeros((32, 32), np.uint8)
    occ[14:18, :] = 1       # full wall
    rrt = RRT(start=(16, 5), goal=(16, 28), occupancy_map=occ,
              rand_area=(0, 31), expand_dis=4.0, max_iter=300,
              rng=np.random.default_rng(0))
    assert rrt.planning() is None


def test_maximin_selection_spreads_points():
    groups = [np.array([[0.0, 0], [5, 0]]),
              np.array([[0.0, 1], [5, 1]]),
              np.array([[0.0, 2], [2.5, 5]])]
    idx = select_maximin_points(groups)
    pts = np.array([groups[i][j] for i, j in enumerate(idx)])
    d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    assert d.min() > 2.0        # spread selection beats all-left (d=1)


def test_approx_min_dist_center():
    pts = np.array([[0.0, 0], [1, 0], [0.5, 0.1], [10, 10]])
    c = approx_min_dist_center(pts)
    assert not np.allclose(c, [10, 10])
