"""AstarPlanner — occupancy mapping + frontier exploration + A* facade.

Host-side orchestrator with the reference AstarPlanner's public API
(reference planning/astar.py:22-1801): init / update_occ_map / setup_start
/ build_frontiers / global_planning / global_planning_frontier / planning /
convert_to_map / convert_to_world / save / load / pose_eval (uniform stub).
The per-step vote update runs as one jitted XLA launch
(planning/occupancy.py); the planning-time morphology (dilation, connected
components, distance transforms) stays on the host — it runs once per
replanning event on a 768² grid.
"""
from __future__ import annotations

import os

import cv2
import jax.numpy as jnp
import numpy as np

from ..ops.camera import Camera, camera_from_intrinsics
from .astar import AstarSearch, check_collision_free
from .candidates import (generate_candidates, generate_candidates_object,
                         generate_random_gaussians,
                         sample_random_candidates)
from .occupancy import occ_update


class LocalizationError(RuntimeError):
    """Start cell enclosed by obstacles (reference astar.py:479-482)."""


class NoFrontierError(RuntimeError):
    """Exploration exhausted (reference tester:878-880)."""


class AstarPlanner:
    def __init__(self, slam_config, eval_dir: str = "", seed: int = 0):
        self.cfg = slam_config
        ex = slam_config["explore"]
        pol = slam_config["policy"]
        self.cell_size = float(ex["cell_size"])
        self.height_upper = float(pol["height_upper"])
        self.height_lower = float(pol["height_lower"])
        self.add_random_gaussians = bool(ex["add_random_gaussians"])
        self.K = int(ex["sample_view_num"])
        self.K_object = int(slam_config["explore_object"]["sample_view_num"])
        self.radius = float(ex["sample_range"])
        self.radius_object = float(slam_config["explore_object"]["sample_range"])
        self.min_range = float(ex["min_range"])
        self.min_range_object = float(slam_config["explore_object"]["min_range"])
        self.centering = bool(ex["centering"])
        self.frontier_select_method = str(ex["frontier_select_method"])
        self.shortcut_path = bool(ex["shortcut_path"])
        # "sweep" = one jitted whole-grid relaxation serving every goal of a
        # planning event (planning/sweep.py); "astar" = per-goal host A*
        self.planner_backend = str(ex.get("planner_backend", "sweep"))
        # C-space clearance: the reference rides habitat's navmesh, which
        # bakes the agent radius into traversability; our vote grid does
        # not, so paths could hug walls within one cell and the embodied
        # agent (radius ~0.18 m) clipped doorframes until the stuck budget
        # died (r4 config-4 failure at step 207/2000).  clearance_m < 0 =
        # auto: the driver calls set_clearance(sim agent radius); 0 = off.
        self.clearance_m = float(ex.get("clearance_m", -1.0))
        self.clearance_cells = (int(round(self.clearance_m / self.cell_size))
                                if self.clearance_m > 0 else 0)
        self.pcd_far_distance = float(pol["pcd_far_distance"])
        self.eval_dir = eval_dir
        self.rng = np.random.default_rng(seed)

        self.occ_map = None          # jnp (3, Gz, Gx)
        self.occ_map_np = None       # dilated binary obstacle map
        self.free_space_np = None
        self.frontier = None
        self.target_frontier = None
        self.cam_pos = None          # [z, x] grid cell
        self.map_center = None       # np (2,) world xz
        self.grid_dim = None         # np (2,) [gx, gz]
        self.cam_height = None
        self.frame_idx = 0
        self.previous_candidates = None
        self._search = None
        self.covered = None          # known-env coverage (init_known_env)
        self.camera: Camera | None = None

    # -- lifecycle ----------------------------------------------------------
    def init(self, pose, intrinsic, scene_bounds=None,
             img_size: tuple[int, int] = (256, 256)):
        """(reference astar.py:65-106) 768² grid centered at the start pose,
        or scene-bounds-sized when bounds are known."""
        pose = np.asarray(pose, np.float64)
        self.cam_height = float(pose[1, 3])
        self.camera = camera_from_intrinsics(np.asarray(intrinsic),
                                             img_size[1], img_size[0])
        self.grid_dim = np.array([768, 768])
        if scene_bounds is not None:
            lo, hi = np.asarray(scene_bounds[0]), np.asarray(scene_bounds[1])
            map_center = (hi[[0, 2]] + lo[[0, 2]]) / 2
            self.grid_dim = np.array([
                int((hi[0] - lo[0]) / self.cell_size + 1),
                int((hi[2] - lo[2]) / self.cell_size + 1)])
        else:
            map_center = pose[[0, 2], 3]
        self.map_center = np.asarray(map_center, np.float32)

        occ = np.zeros((3, self.grid_dim[1], self.grid_dim[0]), np.float32)
        occ[0] = 1.0
        cx = int((pose[0, 3] - map_center[0]) / self.cell_size + self.grid_dim[0] // 2)
        cz = int((pose[2, 3] - map_center[1]) / self.cell_size + self.grid_dim[1] // 2)
        occ[2, cz - 1:cz + 2, cx - 1:cx + 2] = 2.0
        self.cam_pos = np.array([cz, cx])
        self.occ_map = jnp.asarray(occ)
        self._occ_np_cache = None
        self._occ_idx_cache = None
        self._search_key = None
        self.covered = None          # known-env coverage mask (set by
        self.frame_idx = 0           # init_known_env)

    def init_known_env(self, pose, env_pcd_world, intrinsic=None,
                       img_size: tuple[int, int] = (256, 256),
                       max_lines: int = 20000, seed: int = 0):
        """Known-environment init: seed the occupancy map from a GT point
        cloud instead of exploration (reference astar.py:108-183
        init_known_env_from_known_env) and start a coverage mask for the
        cover_fov_2d probes.

        Occupied votes: height-band points count-voted into cells; free:
        rays from the robot to (up to max_lines) occupied cells."""
        pose = np.asarray(pose, np.float64)
        self.cam_height = float(pose[1, 3])
        if intrinsic is not None:
            self.camera = camera_from_intrinsics(np.asarray(intrinsic),
                                                 img_size[1], img_size[0])
        self.grid_dim = np.array([768, 768])
        self.map_center = np.asarray(pose[[0, 2], 3], np.float32)
        h, w = int(self.grid_dim[1]), int(self.grid_dim[0])

        occ = np.zeros((3, h, w), np.float32)
        occ[0] = 1.0
        cx = int((pose[0, 3] - self.map_center[0]) / self.cell_size + w // 2)
        cz = int((pose[2, 3] - self.map_center[1]) / self.cell_size + h // 2)
        self.cam_pos = np.array([cz, cx])
        occ[2, cz - 1:cz + 2, cx - 1:cx + 2] = 2.0

        pc = np.asarray(env_pcd_world, np.float32)
        sel = (pc[:, 1] >= self.height_lower) & (pc[:, 1] <= self.height_upper)
        pts = pc[sel]
        vote = np.zeros((3, h, w), np.float32)
        if len(pts):
            gx, gz = self._discretize(pts[:, 0], pts[:, 2])
            flat = gz * w + gx
            uniq, counts = np.unique(flat, return_counts=True)
            grid = np.zeros((h * w,), np.float32)
            grid[uniq] = counts + 1e-5
            # all height-band GT points vote "occupied" (label 2 in the
            # reference is its free channel index; here ch1 = occupied)
            vote[1] = 0.01 * grid.reshape(h, w)
            # free: rays robot -> occupied cells (reference's cv2.line loop)
            occ_z, occ_x = uniq // w, uniq % w
            if len(occ_z) > max_lines:
                idx = np.random.default_rng(seed).choice(
                    len(occ_z), size=max_lines, replace=False)
                occ_z, occ_x = occ_z[idx], occ_x[idx]
            canvas = np.zeros((h, w), np.uint8)
            for z, x in zip(occ_z, occ_x):
                cv2.line(canvas, (int(x), int(z)), (cx, cz), 1, 1)
            vote[2][canvas > 0] += 1.0
            vote[2][occ_z, occ_x] = 0.0        # endpoint stays occupied
            denom = vote.sum(axis=0, keepdims=True) + 1e-5
            occ += vote / denom
        self.occ_map = jnp.asarray(occ)
        self._occ_np_cache = None
        self._occ_idx_cache = None
        self._search_key = None
        self.covered = np.zeros((h, w), bool)
        # static free map for the coverage probes (the known map doesn't
        # change; re-pulling the device occ map per step would cost a full
        # round trip each)
        self._known_free = occ.argmax(axis=0) == 2
        self.frame_idx = 0

    def cover_fov_2d(self, c2w, fov_deg: float = 90.0,
                     max_range: float = 4.0, ang_step_deg: float = 2.0):
        """Mark the free cells visible in the camera's FOV wedge as covered
        (reference astar.py:328-345 cover_fov_2d): per angle, walk the ray
        until a non-free cell blocks it."""
        assert self.covered is not None, "call init_known_env first"
        free = self._known_free
        h, w = free.shape
        c2w = np.asarray(c2w, np.float64)
        x, z = float(c2w[0, 3]), float(c2w[2, 3])
        gx = int((x - self.map_center[0]) / self.cell_size + w // 2)
        gz = int((z - self.map_center[1]) / self.cell_size + h // 2)
        if not (0 <= gx < w and 0 <= gz < h):
            return
        fwd = c2w[:3, :3] @ np.array([0.0, 0.0, 1.0])
        yaw = np.arctan2(fwd[2], fwd[0])       # angle in the xz plane
        half = np.deg2rad(fov_deg) / 2
        n_cells = int(max_range / self.cell_size)
        for a in np.arange(-half, half + 1e-6, np.deg2rad(ang_step_deg)):
            ca, sa = np.cos(yaw + a), np.sin(yaw + a)
            for r in range(n_cells):
                i = int(round(gx + r * ca))
                j = int(round(gz + r * sa))
                if not (0 <= i < w and 0 <= j < h):
                    break
                if free[j, i]:
                    self.covered[j, i] = True
                else:
                    break

    def build_frontier_cells(self) -> np.ndarray:
        """Coverage frontier: free & !covered & 4-adjacent to covered
        (reference astar.py:347-363 build_frontier_cells).  Returns (M, 2)
        [j, i] cells."""
        assert self.covered is not None, "call init_known_env first"
        free = self._known_free
        cov = self.covered
        adj = np.zeros_like(cov)
        adj[:-1] |= cov[1:]
        adj[1:] |= cov[:-1]
        adj[:, :-1] |= cov[:, 1:]
        adj[:, 1:] |= cov[:, :-1]
        fr = (~cov) & free & adj
        return np.stack(np.where(fr), axis=1)

    def update_occ_map(self, depth, c2w, t: int, downsample: int = 1):
        self.frame_idx = int(t)
        if not type(depth).__module__.startswith("jax"):
            depth = np.asarray(depth, np.float32)   # host path: stage once
        if depth.ndim == 3:
            depth = depth.reshape(depth.shape[-2], depth.shape[-1])
        c2w = np.asarray(c2w, np.float32)
        # cam_pos computed on the host: the device update stays fully async
        # (no per-step device round-trip; crucial when dispatch latency is
        # high, e.g. remote-attached TPUs)
        cx = int(np.floor((c2w[0, 3] - self.map_center[0]) / self.cell_size)
                 + (self.grid_dim[0] - 1) // 2)
        cz = int(np.floor((c2w[2, 3] - self.map_center[1]) / self.cell_size)
                 + (self.grid_dim[1] - 1) // 2)
        self.cam_pos = np.array([cz, cx])
        # map_center is fixed per episode: cache its device copy instead of
        # paying one H2D upload RPC per step
        mc = getattr(self, "_map_center_dev", None)
        if mc is None or mc[0] is not self.map_center:
            mc = (self.map_center, jnp.asarray(self.map_center))
            self._map_center_dev = mc
        self.occ_map, _ = occ_update(
            self.occ_map, jnp.asarray(depth), jnp.asarray(c2w), self.camera,
            self.cell_size, mc[1], self.height_lower,
            self.height_upper, self.pcd_far_distance)

    # -- conversions (reference astar.py:1372-1381) -------------------------
    def convert_to_map(self, coord):
        cx = int((coord[0] - self.map_center[0]) / self.cell_size
                 + self.grid_dim[0] // 2)
        cz = int((coord[1] - self.map_center[1]) / self.cell_size
                 + self.grid_dim[1] // 2)
        return np.array([cx, cz])

    def convert_to_world(self, coord):
        return (np.asarray(coord) - self.grid_dim / 2) * self.cell_size + \
            self.map_center

    # -- free space / frontiers --------------------------------------------
    def _occ_np(self):
        """Host copy of the occupancy map, cached per frame: a planning
        event reads it 3+ times (frontiers, setup_start, free space) and
        each device pull costs a full round trip on tunneled TPUs."""
        cached = getattr(self, "_occ_np_cache", None)
        if cached is not None and cached[0] == self.frame_idx:
            return cached[1]
        occ = np.asarray(self.occ_map)
        self._occ_np_cache = (self.frame_idx, occ)
        return occ

    def _occ_index_np(self):
        """Host copy of the occupancy LABEL map (argmax over channels),
        cached per frame.  Planning only ever consumes the labels; pulling
        the uint8 label map moves ~0.6 MB over the tunnel instead of the
        6.8 MB float occupancy (the single largest per-event transfer)."""
        cached = getattr(self, "_occ_idx_cache", None)
        if cached is not None and cached[0] == self.frame_idx:
            return cached[1]
        idx = np.asarray(jnp.argmax(self.occ_map, axis=0).astype(jnp.uint8))
        self._occ_idx_cache = (self.frame_idx, idx)
        return idx

    def build_connected_freespace(self, gaussian_points=None) -> np.ndarray:
        """Connected-to-robot free region; Gaussian columns block cells
        (reference astar.py:401-447)."""
        index = self._occ_index_np()
        free = (index == 2)

        if free.sum() > 18 and gaussian_points is not None:
            pts = np.asarray(gaussian_points)
            sel = (pts[:, 1] >= self.height_lower) & (pts[:, 1] <= self.height_upper)
            pts = pts[sel]
            if len(pts):
                gx, gz = self._discretize(pts[:, 0], pts[:, 2])
                flat = gz.astype(np.int64) * self.grid_dim[0] + gx
                uniq, counts = np.unique(flat, return_counts=True)
                uniq = uniq[counts > 25]
                free[uniq // self.grid_dim[0], uniq % self.grid_dim[0]] = False

        kernel = np.ones((3, 3), np.uint8)
        free = cv2.morphologyEx(free.astype(np.uint8), cv2.MORPH_OPEN, kernel)
        n, labels, stats, _ = cv2.connectedComponentsWithStats(free)
        if n <= 1:
            return free
        order = np.argsort(stats[:, 4])
        robot_label = order[-1] if order[-1] != 0 else order[-2]
        return (labels == robot_label).astype(np.uint8)

    def _discretize(self, x, z):
        gx = np.floor((x - self.map_center[0]) / self.cell_size) + \
            (self.grid_dim[0] - 1) // 2
        gz = np.floor((z - self.map_center[1]) / self.cell_size) + \
            (self.grid_dim[1] - 1) // 2
        gx = np.clip(gx, 0, self.grid_dim[0] - 1).astype(np.int64)
        gz = np.clip(gz, 0, self.grid_dim[1] - 1).astype(np.int64)
        return gx, gz

    def build_frontiers(self, gaussian_points=None):
        """Frontier cells (free boundary ∧ unknown) in world coords
        (reference astar.py:540-683).  Returns (frontier_points, free_space);
        frontier_points is None when exploration is exhausted."""
        free_space = self.build_connected_freespace(gaussian_points)
        kernel = np.ones((3, 3), np.uint8)
        if self.covered is not None:
            # known-env mode: the map is complete, so "unknown" is replaced
            # by NOT-YET-OBSERVED free space (cover_fov_2d probes;
            # reference astar.py:328-363)
            cells = self.build_frontier_cells()
            frontier = np.zeros(free_space.shape, bool)
            if len(cells):
                frontier[cells[:, 0], cells[:, 1]] = True
            frontier &= free_space.astype(bool)
        else:
            unknown = (self._occ_index_np() == 0)
            free_dil = cv2.dilate(free_space.astype(np.uint8), kernel)
            boundary = free_dil - free_space
            frontier = np.bitwise_and(boundary.astype(bool), unknown)
        self.frontier = frontier.astype(np.uint8)
        if frontier.sum() == 0:
            self.target_frontier = None
            return None, free_space

        frontier = cv2.dilate(frontier.astype(np.uint8), kernel)
        n_labels, labels = cv2.connectedComponents(frontier)
        uniq, counts = np.unique(labels, return_counts=True)
        uniq, counts = uniq[1:], counts[1:]
        keep = counts > 10
        uniq, counts = uniq[keep], counts[keep]
        if len(uniq) == 0:
            return None, free_space

        target_label = -1
        if self.frontier_select_method == "largest":
            target_label = uniq[np.argmax(counts)]
        else:
            # one bincount pass for every label's mean agent distance
            # (replaces a per-label np.where over the full grid — ~25x
            # faster at 768^2 with tens of components; same selection
            # because labels were scanned in ascending order)
            ys, xs = np.nonzero(labels)
            labs = labels[ys, xs]
            d = np.hypot(ys - self.cam_pos[0], xs - self.cam_pos[1])
            n_all = int(labels.max()) + 1
            cnt_all = np.bincount(labs, minlength=n_all)
            mean_d = np.bincount(labs, weights=d, minlength=n_all) \
                / np.maximum(cnt_all, 1)
            eligible = np.zeros(n_all, bool)
            eligible[uniq] = True
            eligible &= cnt_all >= 4
            if eligible.any():
                if self.frontier_select_method == "combined":
                    score = np.where(eligible,
                                     cnt_all / (mean_d + 20.0), -np.inf)
                    if score.max() > 0.0:
                        target_label = int(np.argmax(score))
                else:                     # "closest"
                    dist_m = np.where(eligible, mean_d, np.inf)
                    if dist_m.min() < 1e4:
                        target_label = int(np.argmin(dist_m))
        if target_label == -1:
            return None, free_space

        self.target_frontier = (labels == target_label).astype(np.uint8)
        pix = np.stack(np.where(self.target_frontier), axis=1)[:, [1, 0]]
        world = (pix - np.array([[self.grid_dim[0] // 2,
                                  self.grid_dim[1] // 2]])) * self.cell_size \
            + self.map_center[None, :]

        if gaussian_points is None:
            # FBE: closest frontier at least 0.5 m away, else backward
            # (reference astar.py:658-679)
            agent = self.cam_pos[[1, 0]]          # to x, z cell coords
            agent_w = self.convert_to_world(agent)
            dist = np.linalg.norm(world - agent_w[None, :], axis=1)
            valid = np.where(dist >= 0.5)[0]
            if len(valid) > 0:
                best_i = valid[np.argmin(dist[valid])]
                return world[best_i:best_i + 1], free_space
            ang = np.pi * 5 / 4
            return (agent_w[None, :]
                    + np.array([[-np.cos(ang), -np.sin(ang)]]) * 0.5,
                    free_space)
        return world, free_space

    # -- start / A* ---------------------------------------------------------
    def setup_start(self, start, gaussian_points=None, frame_idx: int = 0):
        """(reference astar.py:449-538) binarize + inject Gaussian columns,
        dilate, verify the start cell is reachable.

        Idempotent per (frame, start): the driver dispatches it EARLY in a
        planning event — while the device scores candidate poses — and
        action_planning's later call becomes a no-op, so the sweep field
        computes concurrently with the Fisher batch instead of after it."""
        key = (self.frame_idx, int(start[0]), int(start[1]))
        if self._search is not None and \
                getattr(self, "_search_key", None) == key:
            return
        # invalidate BEFORE building: if the build raises (enclosed start)
        # a retry must not silently reuse a stale search
        self._search_key = None
        self._search = None
        occupied = (self._occ_index_np() == 1)
        self.start = np.asarray(start, np.int64)

        if gaussian_points is not None:
            pts = np.asarray(gaussian_points)
            lower_y, upper_y = self.cam_height - 1.0, self.cam_height
            sel = (pts[:, 1] >= lower_y) & (pts[:, 1] <= upper_y)
            pts = pts[sel]
            if len(pts):
                gx, gz = self._discretize(pts[:, 0], pts[:, 2])
                flat = gz * self.grid_dim[0] + gx
                uniq, counts = np.unique(flat, return_counts=True)
                uniq = uniq[counts > 50]
                occupied[uniq // self.grid_dim[0], uniq % self.grid_dim[0]] = True

        binarymap = cv2.dilate(occupied.astype(np.uint8),
                               np.ones((3, 3), np.uint8))
        y, x = self.start
        patch = binarymap[max(y - 1, 0):y + 2, max(x - 1, 0):x + 2].copy()
        if patch.size == 9:
            patch[1, 1] = 0
            if patch.sum() >= 8:
                raise LocalizationError("start cell is enclosed")
        free = self.build_connected_freespace(gaussian_points)
        clr = self.clearance_cells
        if clr > 0:
            # configuration-space obstacles: inflate observed-occupied by
            # the agent radius so every plannable cell admits the full
            # footprint (habitat navmesh analog; the tiered collision
            # costs alone only *discourage* wall-hugging)
            k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE,
                                          (2 * clr + 1, 2 * clr + 1))
            binarymap = np.maximum(
                binarymap, cv2.dilate(occupied.astype(np.uint8), k))
            # the agent physically occupies the start disk: traversable in
            # C-space regardless of vote noise around it
            start_disk = np.zeros_like(binarymap)
            cv2.circle(start_disk, (int(x), int(y)), clr, 1, -1)
            binarymap[start_disk > 0] = 0
            nav = (((free > 0) | (start_disk > 0))
                   & (binarymap == 0)).astype(np.uint8)
            # component connected to the start (largest-component choice
            # can pick a region the inflated walls cut the agent off from)
            _n, labels = cv2.connectedComponents(nav)
            lab = labels[y, x]
            if lab > 0:
                nav = (labels == lab).astype(np.uint8)
            free = nav
        binarymap[y, x] = 0
        self.occ_map_np = binarymap
        self.free_space_np = free
        if self.planner_backend == "sweep":
            from .sweep import SweepSearch
            self._search = SweepSearch(self.occ_map_np, self.free_space_np,
                                       self.start)
        else:
            self._search = AstarSearch(self.occ_map_np, self.free_space_np,
                                       self.start)
        self._search_key = key

    def add_obstacle(self, world_xy):
        """Mark one cell as hard-occupied (reference tester:1144-1172:
        after a stuck forward action, the cell ahead of the agent is
        injected as an obstacle so the next replan routes around it)."""
        gx, gz = self._discretize(np.asarray([world_xy[0]]),
                                  np.asarray([world_xy[1]]))
        gx, gz = int(gx[0]), int(gz[0])
        occ = self.occ_map
        self.occ_map = occ.at[:, gz, gx].set(
            jnp.asarray([0.0, occ[:, gz, gx].max() + 100.0, 0.0]))
        self._occ_np_cache = None
        self._occ_idx_cache = None
        self._search_key = None

    def set_clearance(self, radius_m: float):
        """Driver hook: resolve clearance_m = -1 (auto) from the embodied
        agent radius the simulator reports."""
        if self.clearance_m < 0 and radius_m > 0:
            self.clearance_cells = int(round(float(radius_m)
                                             / self.cell_size))
            self._search_key = None

    def _snap_goal(self, goal):
        """Nearest navigable cell to `goal` [y, x] (habitat's
        pathfinder.snap_point analog): with C-space inflation frontier
        goals sit at the free/unknown boundary, inside the inflated band —
        the agent should approach them from a safe standoff, not fail."""
        gy, gx = int(goal[0]), int(goal[1])
        nav = self.free_space_np
        h, w = nav.shape
        if 0 <= gy < h and 0 <= gx < w and nav[gy, gx]:
            return goal
        r = self.clearance_cells + 6
        y0, y1 = max(gy - r, 0), min(gy + r + 1, h)
        x0, x1 = max(gx - r, 0), min(gx + r + 1, w)
        win = nav[y0:y1, x0:x1]
        ys, xs = np.nonzero(win)
        if len(ys) == 0:
            return None
        d2 = (ys + y0 - gy) ** 2 + (xs + x0 - gx) ** 2
        i = int(np.argmin(d2))
        return np.array([ys[i] + y0, xs[i] + x0], np.int64)

    def planning(self, goal) -> np.ndarray:
        assert self._search is not None, "call setup_start first"
        if self.clearance_cells > 0:
            goal = self._snap_goal(goal)
            if goal is None:
                return np.array([])
        return self._search.plan(goal, shortcut=self.shortcut_path)

    def CheckCollision(self, pt1, pt2, occ_map):
        return check_collision_free(pt1, pt2, occ_map)

    # -- global planning ----------------------------------------------------
    def pose_eval(self, poses, *args):
        """Uniform-score stub so planning runs without a SLAM backend
        (reference astar.py:839-841)."""
        return jnp.ones((poses.shape[0],)), poses

    def global_planning(self, pose_evaluation_fn=None, gaussian_points=None,
                        goal_proposal_fn=None, expansion=1, visualize=False,
                        agent_pose=None, last_goal=None, slam=None,
                        defer_scores=False):
        """Frontier-driven candidate generation + EIG scoring + top-20
        (reference astar.py:843-1000).

        With `defer_scores=True`, `pose_evaluation_fn` must be the ASYNC
        variant (returns a resolve closure); the method then returns a
        single `finish()` closure producing the usual
        (top-20 poses, scores, random_gaussian_params) — the device scores
        candidates while the episode keeps executing."""
        candidate_pos, free_space = self.build_frontiers(gaussian_points)
        use_frontier = candidate_pos is not None
        if pose_evaluation_fn is None and not use_frontier:
            return None, None, None

        random_gaussian_params = None
        if self.add_random_gaussians:
            random_gaussian_params = generate_random_gaussians(
                candidate_pos, self.cell_size, self.cam_height, self.rng)

        if candidate_pos is None and goal_proposal_fn is not None:
            candidate_pos = goal_proposal_fn(self.K, self.cam_height)

        candidate_pose = np.zeros((0, 4, 4), np.float32)
        if candidate_pos is not None:
            candidate_pos = np.asarray(candidate_pos)
            if self.centering:
                candidate_pos = candidate_pos.mean(axis=0, keepdims=True)
            exp = float(expansion)
            while len(candidate_pose) == 0:
                candidate_pose = generate_candidates(
                    candidate_pos, self.K, self.radius, self.min_range,
                    self.cam_height, self.rng, expansion=exp)
                exp *= 1.5
                eroded = cv2.erode(free_space.astype(np.uint8),
                                   np.ones((10, 10), np.uint8))
                if eroded.sum() > 40:
                    xy = candidate_pose[:, [0, 2], 3]
                    gx = ((xy[:, 0] - self.map_center[0]) / self.cell_size
                          + self.grid_dim[0] // 2).astype(np.int64)
                    gz = ((xy[:, 1] - self.map_center[1]) / self.cell_size
                          + self.grid_dim[1] // 2).astype(np.int64)
                    gx = np.clip(gx, 0, self.grid_dim[0] - 1)
                    gz = np.clip(gz, 0, self.grid_dim[1] - 1)
                    candidate_pose = candidate_pose[eroded[gz, gx] > 0]
                if exp > 100:
                    break

        if not use_frontier and agent_pose is not None:
            random_pose = sample_random_candidates(
                agent_pose, free_space, self.grid_dim, self.cell_size,
                self.map_center, self.rng)
            candidate_pose = (random_pose if len(candidate_pose) == 0 else
                              np.concatenate([candidate_pose, random_pose]))

        if len(candidate_pose) == 0:
            if defer_scores:
                return None
            return None, None, random_gaussian_params

        if pose_evaluation_fn is None:
            resolve = lambda: self.pose_eval(candidate_pose)  # noqa: E731
        else:
            resolve = pose_evaluation_fn(candidate_pose,
                                         random_gaussian_params)
            if not callable(resolve):     # sync evaluator returned scores
                _r = resolve
                resolve = lambda: _r      # noqa: E731

        def finish():
            scores, poses = resolve()
            scores = np.asarray(scores)
            poses = np.asarray(poses)
            if visualize and self.eval_dir:
                self._save_planning_vis(poses, scores)
            topk = 20
            order = np.argsort(-scores, kind="stable")[:topk]
            poses, scores = poses[order], scores[order]
            self.previous_candidates = poses
            return (jnp.asarray(poses), jnp.asarray(scores),
                    random_gaussian_params)

        if defer_scores:
            return finish
        return finish()

    def _save_planning_vis(self, candidate_poses, scores):
        """Occ-map PNG with the candidate EIG heatmap (the reference's main
        planning observability channel, astar.py:932-989)."""
        from ..engine.visualization import save_occ_map_png
        xy = np.asarray(candidate_poses)[:, [0, 2], 3]
        gx = np.clip(((xy[:, 0] - self.map_center[0]) / self.cell_size
                      + self.grid_dim[0] // 2).astype(np.int64),
                     0, self.grid_dim[0] - 1)
        gz = np.clip(((xy[:, 1] - self.map_center[1]) / self.cell_size
                      + self.grid_dim[1] // 2).astype(np.int64),
                     0, self.grid_dim[1] - 1)
        out = os.path.join(self.eval_dir, "planning_vis",
                           f"plan_{self.frame_idx:05d}.png")
        save_occ_map_png(self._occ_np(), out,
                         candidates=np.stack([gx, gz], axis=1),
                         scores=np.asarray(scores),
                         agent_cell=(self.cam_pos[1], self.cam_pos[0]),
                         frontier=self.target_frontier)

    def build_object_frontiers(self, gaussian_points):
        """The object's 2D footprint cells in world coords (reference
        astar.py:686 build_object_frontiers): discretize the object's
        Gaussians, keep cells hit by >3 points.  Candidate rings anchor on
        these cells rather than the bare centroid, so large/elongated
        objects get viewpoints distributed around their whole extent."""
        if gaussian_points is None:
            return None
        pts = np.asarray(gaussian_points)
        if len(pts) == 0:
            return None
        gx, gz = self._discretize(pts[:, 0], pts[:, 2])
        flat = gz * self.grid_dim[0] + gx
        uniq, counts = np.unique(flat, return_counts=True)
        uniq = uniq[counts > 3]
        if len(uniq) == 0:
            return None
        cells = np.stack([uniq % self.grid_dim[0],
                          uniq // self.grid_dim[0]], axis=1)   # [x, z]
        return (cells - np.array([[self.grid_dim[0] // 2,
                                   self.grid_dim[1] // 2]])) \
            * self.cell_size + self.map_center[None, :]

    def global_object_planning(self, pose_evaluation_fn=None,
                               gaussian_points=None, gaussian_points_scene=None,
                               expansion=1, visualize=False, agent_pose=None,
                               criterion: str | None = None):
        """Candidate poses on a sorted angular/radial grid anchored on the
        object's footprint cells, scored by the object SLAM's pose_eval /
        P-opt criteria (reference astar.py:1151 global_object_planning +
        :1471 generate_candidate_adv_object mode='sorted').
        gaussian_points: object Gaussians; gaussian_points_scene: scene
        Gaussians (for free-space blocking)."""
        if gaussian_points is None or len(np.asarray(gaussian_points)) == 0:
            return None, None, None
        obj_pts = np.asarray(gaussian_points)
        free_space = self.build_connected_freespace(gaussian_points_scene)

        anchors = self.build_object_frontiers(obj_pts)
        if anchors is None:
            anchors = obj_pts[:, [0, 2]]
        if self.centering:
            anchors = anchors.mean(axis=0, keepdims=True)
        exp = float(expansion)
        candidate_pose = np.zeros((0, 4, 4), np.float32)
        while len(candidate_pose) == 0 and exp < 100:
            candidate_pose = generate_candidates_object(
                anchors, self.K_object, self.radius_object,
                self.min_range_object, self.cam_height, self.rng,
                expansion=exp)
            exp *= 1.5
            eroded = cv2.erode(free_space.astype(np.uint8),
                               np.ones((10, 10), np.uint8))
            if eroded.sum() > 40:
                xy = candidate_pose[:, [0, 2], 3]
                gx = np.clip(((xy[:, 0] - self.map_center[0]) / self.cell_size
                              + self.grid_dim[0] // 2).astype(np.int64),
                             0, self.grid_dim[0] - 1)
                gz = np.clip(((xy[:, 1] - self.map_center[1]) / self.cell_size
                              + self.grid_dim[1] // 2).astype(np.int64),
                             0, self.grid_dim[1] - 1)
                candidate_pose = candidate_pose[eroded[gz, gx] > 0]
        if len(candidate_pose) == 0:
            return None, None, None

        if pose_evaluation_fn is None:
            scores, poses = self.pose_eval(candidate_pose)
        elif criterion in ("topt", "dopt"):
            scores, poses = pose_evaluation_fn(candidate_pose,
                                               criterion=criterion)
        else:
            scores, poses = pose_evaluation_fn(candidate_pose)
        scores, poses = np.asarray(scores), np.asarray(poses)
        order = np.argsort(-scores, kind="stable")[:20]
        return jnp.asarray(poses[order]), jnp.asarray(scores[order]), None

    def global_planning_frontier(self, expansion=1, visualize=False,
                                 agent_pose=None):
        """Frontier-only (FBE) global goal: no Hessian scoring (reference
        astar.py:1027-1149)."""
        candidate_pos, free_space = self.build_frontiers(None)
        if candidate_pos is None:
            return None, None
        return np.asarray(candidate_pos), free_space

    def render_bev(self, slam):
        """Top-down render through the SLAM map (reference astar.py:1779)."""
        bev_c2w = np.array([[1.0, 0, 0, 0], [0, 0, -1, 0],
                            [0, 1, 0, 0], [0, 0, 0, 1]], np.float32)
        bev_c2w[:3, 3] = [self.map_center[0], 7.0, self.map_center[1]]
        xyz = slam.gaussian_points
        mask = xyz[:, 1] < self.cam_height
        return slam.render_at_pose(bev_c2w, white_bg=True, mask=mask)

    def occ_coord_to_3d(self, occ_coord):
        pts = np.asarray(occ_coord)[:, [1, 0]]
        world = (pts - np.array([[self.grid_dim[0] // 2,
                                  self.grid_dim[1] // 2]])) * self.cell_size \
            + self.map_center[None, :]
        out = np.zeros((len(world), 3))
        out[:, [0, 2]] = world
        out[:, 1] = self.cam_height
        return out

    def get_map(self):
        return self.occ_map

    # -- persistence (reference astar.py:185-199) ---------------------------
    def save(self, path: str):
        from ..utils.io import atomic_savez
        atomic_savez(path, compressed=True, occ_map=self._occ_np(),
                     map_center=self.map_center,
                     grid_dim=self.grid_dim, frame_idx=self.frame_idx,
                     cam_pos=self.cam_pos, cam_height=self.cam_height)

    def load(self, path: str):
        d = np.load(path)
        self.occ_map = jnp.asarray(d["occ_map"])
        self._occ_np_cache = None
        self._occ_idx_cache = None
        self._search_key = None
        self.map_center = d["map_center"]
        self.grid_dim = d["grid_dim"]
        self.frame_idx = int(d["frame_idx"])
        self.cam_pos = d["cam_pos"]
        self.cam_height = float(d["cam_height"])
