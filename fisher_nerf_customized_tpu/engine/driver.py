"""ActiveMapper — the active-mapping episode driver.

Re-architecture of the reference's NavTester
(tester_gaussians_navigation.py:199-2949, test_navigation at :553):
a host-side loop that feeds a simulator's RGB-D into the jitted SLAM /
occupancy updates, and replans whenever the action queue drains —
frontier-driven candidate poses scored by batched Fisher EIG, A* action
compilation, and path-level EIG evaluation in a single XLA launch
(engine/path_eval.py, vs the reference's per-pose python loops).

Policies: 'gaussians_based' (FisherRF active mapping), 'frontier' (same
planning without Hessian scores), 'random_walk', 'traj_reader' (pose
replay, the deterministic test fixture).
"""
from __future__ import annotations

import logging
import os
from collections import deque

import jax.numpy as jnp
import numpy as np

from ..models.slam import GaussianSLAM
from ..planning import AstarPlanner, LocalizationError, NoFrontierError
from ..utils.cluster import get_cluster_manager
from ..utils.logging_utils import MetricsLogger, StepTimer
from ..utils.pointcloud import GlobalPointCloud, backproject_depth
from .actions import action_planning, rollout_path_poses
from .eval import (MetricsRecorder, accuracy_comp_ratio_from_pcl,
                   eval_navigation)
from .path_eval import acc_step_indices, path_eig_scores

logger = logging.getLogger("fnc_tpu.driver")


class ActiveMapper:
    def __init__(self, cfg, sim, scene=None, policy_name: str | None = None,
                 eval_dir: str | None = None, seed: int = 0,
                 traj_actions=None, object_scene: bool = False,
                 dynamic_scene: bool = False, known_env_points=None,
                 dino_gate: bool = False, dino_weights: str | None = None,
                 scene_id: str | None = None):
        self.cfg = cfg
        self.sim = sim
        self.scene = scene                    # BoxScene (GT access) or None
        # recorded artifact header (reference metric_data YAML settings
        # block carries the real scene name, FisherRF.yaml:1-5)
        self.scene_id = scene_id or os.path.basename(eval_dir or "") \
            or "fake_scene"
        self.policy_name = policy_name or str(cfg.policy.name)
        self.eval_dir = eval_dir or os.path.join(cfg.workdir, cfg.run_name)
        os.makedirs(self.eval_dir, exist_ok=True)
        # object branch (reference tester:331-399 dynamic-object spawn,
        # :831-845 mask-triggered object tracking, §3.5/§3.6)
        self.object_scene = bool(object_scene)
        self.dynamic_scene = bool(dynamic_scene)
        self.known_env_points = known_env_points   # GT cloud -> novelty mask
        self._known_env_dev = None                 # device copy, cached
        self.obj_slam = None
        self.object_tracking = False
        # DINO keyframe-distinctiveness gate (reference tester:628-768):
        # frames whose masked patch descriptors are too similar to the
        # accepted bank are skipped for object MAPPING (tracking continues).
        # Opt-in to preserve prior artifacts; with --dino_weights the real
        # ViT descriptors run, else the self-contained histogram extractor.
        self.dino_bank = None
        self._dino_extractor = None
        if object_scene and (dino_gate or dino_weights):
            from .dino_gate import DinoBank, PatchDescriptorExtractor
            self.dino_bank = DinoBank()
            if dino_weights:
                from ..models.perceptual import ViTPatchExtractor
                self._dino_extractor = \
                    ViTPatchExtractor.from_checkpoint(dino_weights)
            else:
                self._dino_extractor = PatchDescriptorExtractor()
        self.criterion = str(cfg.criterion)
        self.object_metrics = MetricsRecorder(f"{cfg.criterion}_OA",
                                              self.scene_id)

        self.slam = GaussianSLAM(cfg, eval_dir=self.eval_dir)
        self.planner = AstarPlanner(cfg, eval_dir=self.eval_dir, seed=seed)
        # C-space clearance from the embodied agent radius (clearance_m=-1
        # auto mode; see planning/planner.py) — the sim scene knows it
        agent_r = getattr(scene, "agent_radius",
                          getattr(sim, "agent_radius", 0.0))
        if agent_r:
            self.planner.set_clearance(float(agent_r))
        self.queue: deque[int] = deque()
        self.rng = np.random.default_rng(seed)
        self.global_pcl = GlobalPointCloud(keep_ratio=0.05, seed=seed)
        self._obj_pcl_parts: list[np.ndarray] = []
        self.metrics = MetricsRecorder(self.policy_name, self.scene_id)
        self.traj_actions = list(traj_actions) if traj_actions else None

        self.forward_step = float(cfg.forward_step_size)
        self.turn_angle = float(cfg.turn_angle)
        self.queue_size = int(cfg.policy.planning_queue_size)
        self.max_steps = int(cfg.num_frames)
        self.checkpoint_interval = int(cfg.checkpoint_interval)
        self.stuck_count = 0      # consecutive blocked forwards
        self.stuck_total = 0      # lifetime blocked forwards (recorded)
        self.last_goal = None
        # pipelined planning (stage-1 dispatch at a queue-low watermark)
        self.pipeline_planning = bool(cfg.tpu.get("pipeline_planning", False))
        self.plan_watermark = int(cfg.tpu.get("plan_watermark", 2))
        self._plan_prep = None
        self._inc_recon = None
        self._inc_recon_saved = None   # checkpointed running-metric state
        self._pcl_skip = 0             # points already in restored state
        self._pcl_cursor = 0
        self._pcl_1000_saved = False   # mid-protocol PCL export latch
        self._eval_curve = None
        self.step_log: list[dict] = []
        self.cm = get_cluster_manager()
        self.timer = StepTimer()
        self.mlog = MetricsLogger(self.eval_dir, cfg.run_name,
                                  use_wandb=bool(cfg.use_wandb))
        # UPEN baseline policy (reference models/UPEN.py; policy dispatch
        # at tester:290-306)
        self.upen = None
        if self.policy_name.lower().startswith("upen"):
            from ..models.upen import UPEN
            self.upen = UPEN(options=None, cfg=cfg, seed=seed,
                             cell_size=float(cfg.explore.cell_size) * 2,
                             use_rrt=bool(cfg.policy.with_rrt_planning)
                             or "rrt" in self.policy_name.lower(),
                             ensemble_dir=str(getattr(
                                 cfg.policy, "ensemble_dir", "")) or None)

    # -- setup --------------------------------------------------------------
    def _init_episode(self):
        obs = self.sim.get_observations()
        c2w = obs["c2w"]
        self.slam.init(obs["rgb"], obs["depth"], np.linalg.inv(c2w))
        img_size = (self.slam.camera.height, self.slam.camera.width)
        if self.known_env_points is not None:
            # known-env mode: seed the planner's map from the GT cloud and
            # plan by coverage probes (reference astar.py:108-183, 328-363)
            self.planner.init_known_env(c2w, self.known_env_points,
                                        intrinsic=self.sim.intrinsics,
                                        img_size=img_size)
        else:
            self.planner.init(c2w, self.sim.intrinsics, img_size=img_size)
        self.planner.update_occ_map(obs["depth"], c2w, 0)
        self._make_habvis()
        # init scan: 90° of turn-left steps (reference init_local_policy,
        # tester:2803-2876 queues 9 x turn-left at 10°)
        for _ in range(max(int(90.0 // self.turn_angle), 1)):
            self.queue.append(2)
        return obs

    def _make_habvis(self):
        # top-down fog-of-war visualizer (reference HabitatVisualizer;
        # its fow_mask is the 2D coverage numerator, tester:1498-1516)
        self.habvis = None
        if self.scene is not None:
            from .visualization import MapVisualizer
            vis_dim = (192, 192)
            gt_free = self.scene.gt_free_map(self.planner.cell_size * 2,
                                             vis_dim,
                                             self.planner.map_center)
            self.habvis = MapVisualizer(gt_free, self.planner.cell_size * 2,
                                        self.planner.map_center)

    # -- object branch --------------------------------------------------------
    def _object_mask(self, obs):
        """Semantic object mask, or known-env novelty mask (reference
        tester:690-725, §3.6)."""
        if not self.object_scene:
            return None
        if self.known_env_points is not None:
            import jax.numpy as jnp
            from ..ops.knn import novelty_mask_from_pcd_nn
            if self._known_env_dev is None:
                # upload the GT cloud ONCE (400k x 3 would otherwise ride
                # host->device every step)
                self._known_env_dev = jnp.asarray(self.known_env_points)
            inv_k = np.linalg.inv(self.sim.intrinsics).astype(np.float32)
            mask, _n = novelty_mask_from_pcd_nn(
                self._known_env_dev,
                jnp.asarray(obs["depth"]), jnp.asarray(inv_k),
                jnp.asarray(obs["c2w"]))
            return np.asarray(mask)
        if "semantic" in obs:
            sem = np.asarray(obs["semantic"])
            obj = getattr(self.sim, "dynamic_object", None)
            if obj is not None and getattr(obj, "semantic_id", None) is not None:
                # the reference masks the SPAWNED object's instance id
                # (tester:719 semantic == sim_obj.get_semantic_id()); a
                # real habitat semantic sensor labels every scene pixel
                # with an instance id, so `> 0` would select the whole
                # frame there
                return sem == int(obj.semantic_id)
            return sem > 0
        return None

    def _accumulate_object_pcl(self, obs, mask):
        """Masked depth back-projection accumulated in the object's
        CANONICAL frame (reference tester:508-550
        store_filtered_obj_pointcloud: world points are mapped through
        inv(object_pose) before accumulation, so a moving object's
        observations stay registered)."""
        obj = getattr(self.sim, "dynamic_object", None)
        if obj is None:
            return
        depth = np.asarray(obs["depth"])
        d_masked = np.where(mask, depth, 0.0).astype(np.float32)
        pts_w = backproject_depth(d_masked, self.sim.intrinsics, obs["c2w"])
        if len(pts_w) == 0:
            return
        T_wo = obj.object_pose()
        pts_obj = (pts_w - T_wo[:3, 3]) @ T_wo[:3, :3]
        # subsample: the mask covers few pixels, but over a long episode
        # the accumulation is capped to keep the KD queries bounded
        if len(pts_obj) > 4096:
            idx = self.rng.choice(len(pts_obj), 4096, replace=False)
            pts_obj = pts_obj[idx]
        self._obj_pcl_parts.append(pts_obj.astype(np.float32))
        n_total = sum(len(p) for p in self._obj_pcl_parts)
        if n_total > 400_000:
            # bound memory by VOXEL DEDUP (0.5 cm - half the 1 cm object
            # metric scale), not random subsampling: random halving drops
            # local density below the metric scale and the completeness
            # curve dips ~3% at every cap event (observed on the r3
            # 1000-step OA run), while dedup preserves coverage exactly
            # at >= voxel resolution and is naturally bounded by the
            # object's surface area
            merged = np.concatenate(self._obj_pcl_parts)
            q = np.round(merged / 0.005).astype(np.int64)
            _, first = np.unique(q, axis=0, return_index=True)
            merged = merged[first]
            if len(merged) > 400_000:       # last resort for huge objects
                keep = self.rng.choice(len(merged), 300_000, replace=False)
                merged = merged[keep]
            self._obj_pcl_parts = [merged]

    @property
    def global_obj_pcl(self) -> np.ndarray:
        if not self._obj_pcl_parts:
            return np.zeros((0, 3), np.float32)
        return np.concatenate(self._obj_pcl_parts)

    def _object_step(self, obs, mask, t):
        from ..models.object_slam import GaussianObjectSLAM
        from .object_planning import init_object_policy
        w2c = np.linalg.inv(obs["c2w"])
        self._accumulate_object_pcl(obs, mask)
        # device-resident rgb/depth pass straight through (the mask is
        # host-side either way); object SLAM pulls host copies only at
        # keyframe-selection time, once per mapping event
        if self.obj_slam is None:
            self.obj_slam = GaussianObjectSLAM(self.cfg,
                                               eval_dir=self.eval_dir,
                                               start_frame_idx=t)
            self.obj_slam.init(obs["rgb"], obs["depth"], w2c, mask)
            # mask-centering init actions (reference init_object_policy)
            centering = init_object_policy(mask, self.turn_angle,
                                           mask.shape[1])
            self.queue.clear()
            self.queue.extend(centering)
            self.object_tracking = True
            if self.dino_bank is not None:
                self.dino_bank.add_if_distinct(
                    self._dino_extractor(np.asarray(obs["rgb"]), mask),
                    force=True)                 # init frame always accepted
            return
        allow_map = True
        if self.dino_bank is not None:
            descs = self._dino_extractor(np.asarray(obs["rgb"]), mask)
            allow_map = self.dino_bank.add_if_distinct(descs)
        self.obj_slam.track_rgbd(obs["rgb"], obs["depth"], gt_w2c=w2c,
                                 obj_mask_2d=mask, step=t,
                                 allow_map=allow_map)
        self.object_tracking = True

    def record_object_metrics(self, t, gt_object_points,
                              dist_thresh: float = 0.01):
        """Per-step object reconstruction curve + AUC (reference
        tester:1212-1289 evaluate_3d_object_reconstruction).

        Compares the accumulated CANONICAL-frame masked-depth cloud (the
        reference's global_obj_pcd, tester:508-550) against GT object
        surface points sampled in the object's canonical frame — NOT the
        object-SLAM gaussian means: the reference's metric is observation
        coverage of the object, registered through inv(object_pose) so a
        moving object scores consistently."""
        est = self.global_obj_pcl
        if len(est) == 0:
            # pre-detection fallback: keep the reference's 0-row shape
            if self.obj_slam is None or self.obj_slam.n_active == 0:
                return None
            est = self.obj_slam.gaussian_points
        m = accuracy_comp_ratio_from_pcl(est, gt_object_points, dist_thresh)
        self.object_metrics.record(t, **m)
        return m

    # -- planning -----------------------------------------------------------
    def prepare_planning(self, current_agent_pose: np.ndarray, t: int):
        """Pipelined planning stage 1 (no reference analog — the reference
        plans synchronously when its action queue empties): at a queue-low
        watermark, generate frontier candidates and DISPATCH their Fisher
        scoring; the device computes while the remaining queued actions
        execute.  plan_best_path consumes the finish closure when the
        queue actually empties."""
        if self.policy_name == "frontier" or self._plan_prep is not None:
            return
        slam, planner = self.slam, self.planner
        if bool(self.cfg.explore.prune_invisible):
            slam.prune_invisible()
        try:
            finish = planner.global_planning(
                slam.pose_eval_async, slam.gaussian_points, None,
                expansion=1, agent_pose=current_agent_pose[:3, 3],
                last_goal=self.last_goal, defer_scores=True)
        except (LocalizationError, NoFrontierError):
            return
        if finish is not None:
            self._plan_prep = (t, finish)

    def plan_best_path(self, current_agent_pose: np.ndarray, expansion: int,
                       t: int):
        """(reference tester:1596-1736) global candidates -> A* + actions ->
        batched path EIG -> best action sequence."""
        slam, planner = self.slam, self.planner

        prep = self._plan_prep
        self._plan_prep = None
        snap = getattr(self, "_points_snapshot", None)
        points = (snap[1] if snap is not None and snap[0] == t
                  else None)
        with self.timer.phase("plan.global"):
            if (prep is not None and expansion == 1
                    and t - prep[0] <= self.plan_watermark + 2):
                finish = prep[1]
            else:
                if bool(self.cfg.explore.prune_invisible):
                    # drop Gaussians invisible from every keyframe before
                    # planning (gaussian.py:1318-1326, explore.prune_invisible)
                    slam.prune_invisible()
                pose_fn = None if self.policy_name == "frontier" \
                    else slam.pose_eval_async
                finish = planner.global_planning(
                    pose_fn,
                    points if points is not None else slam.gaussian_points,
                    None, expansion=expansion,
                    visualize=bool(self.cfg.policy.save_nav_images),
                    agent_pose=current_agent_pose[:3, 3],
                    last_goal=self.last_goal, defer_scores=True)
            gaussian_points = (points if points is not None
                               else slam.gaussian_points)
            if finish is None or isinstance(finish, tuple):
                return None, None
        # the candidate Fisher batch is now in flight — dispatch the sweep
        # field for THIS frame's map so it computes concurrently on device
        # (action_planning's own setup_start call becomes a no-op)
        with self.timer.phase("plan.sweep"):
            start = planner.convert_to_map(
                current_agent_pose[[0, 2], 3])[[1, 0]]
            try:
                planner.setup_start(start, gaussian_points, t)
            except LocalizationError:
                return None, None
        # separate phase: this is the BLOCKING pull on the in-flight
        # candidate Fisher batch (device-bound wait, not host work)
        with self.timer.phase("plan.global.wait"):
            global_points, eigs, _rgp = finish()
            if global_points is None:
                return None, None
            global_points = np.asarray(global_points)
            eigs = np.asarray(eigs)

        try:
            with self.timer.phase("plan.actions"):
                goals, path_actions, paths_arr, goal_idx = action_planning(
                    global_points, current_agent_pose, planner,
                    gaussian_points, t, self.forward_step, self.turn_angle,
                    self.queue_size)
        except LocalizationError:
            return None, None
        if not path_actions:
            return None, None
        goals, path_actions, paths_arr, goal_idx = (
            goals[:20], path_actions[:20], paths_arr[:20], goal_idx[:20])

        if self.policy_name == "frontier":
            best = 0       # FBE: first (closest-frontier) valid path
        else:
            with self.timer.phase("plan.h_train"):
                h_train = slam.compute_H_train()
            a_max = self.queue_size
            n_paths = len(path_actions)
            # only the acc-step Hessians affect scores (exact skip of the
            # reference's wasted per-action Hessians; see path_eval)
            acc_idx = acc_step_indices(a_max,
                                       int(self.cfg.acc_H_train_every))
            # pad the path axis to a fixed 20 so path_eig_scores compiles
            # once per episode (padding rows get -inf final EIG); in
            # sharded mode the path axis is sharded over 'data', so round
            # up to a multiple of the mesh axis
            p_max = 20
            if slam.mesh is not None:
                p_max = slam.mesh_data * -(-p_max // slam.mesh_data)
            w2cs = np.tile(np.eye(4, dtype=np.float32),
                           (p_max, len(acc_idx), 1, 1))
            valid = np.zeros((p_max, len(acc_idx)), bool)
            lengths = np.ones((p_max,), np.int32)
            with self.timer.phase("plan.rollout"):
                for i, acts in enumerate(path_actions):
                    poses = rollout_path_poses(current_agent_pose, acts,
                                               planner.cam_height,
                                               self.forward_step,
                                               self.turn_angle)
                    for j, s in enumerate(acc_idx):
                        if s < len(acts):
                            w2cs[i, j] = np.linalg.inv(poses[s])
                            valid[i, j] = True
                    lengths[i] = len(acts)
                final_eigs = np.full((p_max,), -np.inf, np.float32)
                for i, gi in enumerate(goal_idx):
                    # log of the endpoint EIG (reference mixes log-EIGs)
                    final_eigs[i] = np.log(max(float(eigs[gi]), 1e-30))
            with self.timer.phase("plan.path_eig"):
                if slam.mesh is not None:
                    from ..parallel.sharding import sharded_path_eig
                    eig_fn = sharded_path_eig(
                        slam.mesh, slam.fisher_camera, slam.fisher_settings,
                        bool(self.cfg.vol_weighted_H), slam.fisher_engine,
                        slam.fisher_grad_value)
                    scores = eig_fn(
                        slam.state, h_train, jnp.asarray(w2cs),
                        jnp.asarray(valid), jnp.asarray(lengths),
                        jnp.asarray(final_eigs),
                        float(self.cfg.H_reg_lambda),
                        float(self.cfg.path_pose_weight),
                        float(self.cfg.path_point_weight),
                        float(self.cfg.path_end_weight),
                        float(slam.gs_pts_cnt()))
                else:
                    scores = path_eig_scores(
                        slam.state, h_train, jnp.asarray(w2cs),
                        jnp.asarray(valid), jnp.asarray(lengths),
                        jnp.asarray(final_eigs), slam.fisher_camera,
                        slam.fisher_settings,
                        float(self.cfg.H_reg_lambda),
                        float(self.cfg.path_pose_weight),
                        float(self.cfg.path_point_weight),
                        float(self.cfg.path_end_weight),
                        bool(self.cfg.vol_weighted_H),
                        float(slam.gs_pts_cnt()), slam.fisher_engine,
                        slam.fisher_grad_value)
                best = int(np.argmax(np.asarray(scores)[:n_paths]))

        self.last_goal = goals[best]
        return path_actions[best], paths_arr[best]

    @staticmethod
    def _pose_xzyaw(c2w):
        fwd = c2w[:3, :3] @ np.array([0.0, 0.0, 1.0])
        return (float(c2w[0, 3]), float(c2w[2, 3]),
                float(np.arctan2(fwd[0], fwd[2])))

    def _replan_upen(self, c2w, t) -> bool:
        goal_cell, _info = self.upen.predict_action(self._pose_xzyaw(c2w))
        if goal_cell is None:
            return False
        # UPEN geo-grid cell -> world xz -> A* actions
        gh, gw = self.upen.sgrid.grid_dim
        origin = self.upen.sgrid.origin_pose
        wx = (float(goal_cell[0]) - gw / 2) * self.upen.cell_size + origin[0]
        wz = (float(goal_cell[1]) - gh / 2) * self.upen.cell_size + origin[1]
        start = self.planner.convert_to_map(c2w[[0, 2], 3])[[1, 0]]
        try:
            self.planner.setup_start(start, self.slam.gaussian_points, t)
        except LocalizationError:
            return False
        finish = self.planner.convert_to_map((wx, wz))[[1, 0]]
        paths = self.planner.planning(finish)
        if len(paths) == 0:
            return False
        from .actions import compile_actions
        actions = compile_actions(paths, c2w, c2w, self.planner.cam_height,
                                  self.planner.convert_to_world,
                                  self.forward_step, self.turn_angle,
                                  self.queue_size)
        if not actions:
            return False
        self.queue.extend(actions)
        return True

    def _replan(self, c2w: np.ndarray, t: int):
        expansion = 1
        for _attempt in range(10):
            if self.policy_name == "random_walk":
                self.queue.extend(self._random_walk_actions())
                return
            if self.upen is not None:
                if self._replan_upen(c2w, t):
                    return
                self.queue.extend(self._random_walk_actions()[:5])
                return
            if self.object_tracking and self.obj_slam is not None:
                # object-observing path takes over while an object is
                # tracked (reference tester:1098-1132)
                from .object_planning import plan_best_object_path
                actions, _p = plan_best_object_path(
                    self.obj_slam, self.slam, self.planner, c2w, expansion,
                    t, self.cfg, self.forward_step, self.turn_angle,
                    self.queue_size, criterion=self.criterion)
                if actions:
                    self.queue.extend(actions)
                    return
            actions, _path = self.plan_best_path(c2w, expansion, t)
            if actions:
                self.queue.extend(actions)
                return
            expansion += 1
        raise NoFrontierError("no plan found after 10 expansions")

    def _random_walk_actions(self):
        acts = []
        for _ in range(self.queue_size):
            acts.append(int(self.rng.choice([1, 1, 1, 2, 3])))
        return acts

    # -- main loop ----------------------------------------------------------
    def test_navigation(self, n_eval_poses: int | None = None,
                        recon_gt_points=None, on_step=None) -> dict:
        # heartbeat watchdog (FNC_STEP_WATCHDOG_S): arms here, beats each
        # loop iteration below — a tunnel wedge at ANY blocked device op
        # (including episode init) exits WEDGE_EXIT_CODE within the
        # timeout so the resumable runner recycles in seconds
        from ..utils.platform import progress_beat
        progress_beat("episode:start")
        if getattr(self, "_resume_t", None) is not None:
            # resumed episode: state restored by resume(); continue mid-run
            obs = self.sim.get_observations()
            t = self._resume_t
            self._resume_t = None
        else:
            obs = self._init_episode()
            t = 0
        c2w = obs["c2w"]
        done_reason = "max_steps"
        while t < self.max_steps:
            progress_beat(f"step:{t}")
            if self.cm.should_exit():
                # graceful preemption: checkpoint then requeue
                # (reference tester:804-805 + cluster_manager.py:60-65).
                # Step t has NOT been processed yet -> resume at t with the
                # sim still at this step's pose.
                self.save_checkpoint(max(t - 1, 0), sim_c2w=obs["c2w"],
                                     resume_t=t)
                self.cm.requeue()
            c2w = obs["c2w"]
            # dynamic object kinematics (reference tester:657-671)
            if self.dynamic_scene and getattr(self.sim, "dynamic_object",
                                              None) is not None:
                self.sim.dynamic_object.moving_randomly()
                obs = self.sim.get_observations()
            obj_mask = self._object_mask(obs)
            # opportunistic prefetch: when the action queue is non-empty
            # the next action is already decided, so the next frame's
            # raycast is dispatched BEFORE the heavy mapping dispatches
            # and computes concurrently with them (sim.step then only
            # pays the pull)
            with self.timer.phase("prefetch"):
                if (self.traj_actions is None and self.queue
                        and hasattr(self.sim, "prefetch")):
                    self.sim.prefetch(self.queue[0])
                elif (self.traj_actions is not None
                        and t < len(self.traj_actions)
                        and hasattr(self.sim, "prefetch")):
                    self.sim.prefetch(int(self.traj_actions[t]))
            # pipelined planning stage 1 runs BEFORE this step's
            # tracking/mapping dispatch: its host pulls (occ labels,
            # gaussian means) then wait only on prior small work, and the
            # candidate Fisher chunks land on the device stream AHEAD of
            # the mapping event — both compute while the remaining queued
            # actions execute (the device stream is in-order, so ordering
            # the dispatches IS the schedule)
            if (self.pipeline_planning and self.upen is None
                    and self.traj_actions is None
                    and 0 < len(self.queue) <= self.plan_watermark):
                with self.timer.phase("planning"):
                    self.prepare_planning(c2w, t)
            # planning runs this step iff the action queue is empty:
            # snapshot the Gaussian means BEFORE the mapping dispatch so
            # the planner's geometry pull doesn't park the host behind
            # ~0.8 s of queued mapping compute (profiled: 870 ms/event).
            # Staleness is only THIS event's densify — the occupancy map
            # stays fully current and candidate SCORING still uses the
            # post-mapping params (dispatched after, in stream order).
            if (not self.queue and self.traj_actions is None
                    and self.upen is None
                    and self.policy_name not in ("random_walk", "frontier")
                    and not bool(self.cfg.explore.prune_invisible)):
                self._points_snapshot = (t, self.slam.gaussian_points)
            with self.timer.phase("tracking_mapping"):
                self.slam.track_rgbd(obs["rgb"], obs["depth"],
                                     gt_w2c=np.linalg.inv(c2w))
            if obj_mask is not None and obj_mask.sum() > 20:
                with self.timer.phase("object_tracking"):
                    self._object_step(obs, obj_mask, t)
            with self.timer.phase("occupancy"):
                self.planner.update_occ_map(obs["depth"], c2w, t)
                if self.planner.covered is not None:
                    self.planner.cover_fov_2d(c2w)
            if self.upen is not None:
                pose = self._pose_xzyaw(c2w)
                if t == 0:
                    self.upen.init(pose)
                self.upen.observe(obs["depth"], self.sim.intrinsics, pose,
                                  cam_height=float(c2w[1, 3]))
            with self.timer.phase("pcl"):
                self.global_pcl.add_frame(obs["depth"], self.sim.intrinsics,
                                          c2w, color=obs["rgb"])

            if self.traj_actions is not None:
                if t >= len(self.traj_actions):
                    done_reason = "traj_end"
                    break
                action = int(self.traj_actions[t])
            else:
                if (self.policy_name == "gaussians_based" and self.upen is None
                        and len(self.queue) <= max(self.plan_watermark + 2,
                                                   int(self.cfg.map_every)
                                                   + 2)):
                    # dispatch H_train ahead of the planning event (device
                    # handle cached; zero staleness — same keyframes/params).
                    # The window spans a full map_every so the re-dispatch
                    # lands right after the LAST mapping event before the
                    # queue drains; the cache-key check itself is pull-free
                    with self.timer.phase("prewarm"):
                        self.slam.prewarm_H_train()
                try:
                    while not self.queue:
                        with self.timer.phase("planning"):
                            self._replan(c2w, t)
                except NoFrontierError:
                    done_reason = "no_frontier"
                    break
                action = self.queue.popleft()

            prev_pos = self.sim.c2w[:3, 3].copy() if hasattr(self.sim, "c2w") \
                else c2w[:3, 3].copy()
            with self.timer.phase("sim_step"):
                obs = self.sim.step(action)
            # stuck detection (reference tester:1144-1172): inject an
            # obstacle cell one step ahead so the replan routes around the
            # unseen blocker instead of re-planning the same path.
            # The fatal budget counts CONSECUTIVE blocked forwards (a
            # successful move resets it): the reference's cumulative
            # budget assumes habitat's navmesh-clearance paths where
            # collisions are rare, but a long episode in doorway-heavy
            # scenes legitimately clips a few frames over 2000 steps and
            # must not die at 10 lifetime collisions (r4 config-4 failure).
            # stuck_total is recorded for parity visibility.
            if action == 1:
                moved = np.linalg.norm(obs["c2w"][:3, 3] - prev_pos)
                if moved < 1e-3:
                    self.stuck_count += 1
                    self.stuck_total += 1
                    fwd = obs["c2w"][:3, :3] @ np.array([0.0, 0.0, 1.0])
                    ahead = (obs["c2w"][:3, 3]
                             + fwd * max(self.forward_step,
                                         self.planner.cell_size * 1.5))
                    self.planner.add_obstacle((ahead[0], ahead[2]))
                    self.queue.clear()
                    if self.stuck_count > 10:
                        done_reason = "stuck"
                        break
                else:
                    self.stuck_count = 0

            # held-out PSNR/depth-MAE curve on a fixed seeded pose set
            # (cfg.eval_every > 0 enables it; diagnoses late-episode map
            # quality over time — VERDICT r3 weak #5)
            ev_every = int(self.cfg.eval_every)
            if (ev_every > 0 and t > 0 and t % ev_every == 0
                    and self.scene is not None
                    and hasattr(self.sim, "render_at")):
                with self.timer.phase("eval_curve"):
                    if self._eval_curve is None:
                        from .eval import EvalPoseCurve
                        self._eval_curve = EvalPoseCurve(
                            self.scene, self.sim,
                            cam_height=float(c2w[1, 3]))
                    em = self._eval_curve.update(self.slam)
                    self.metrics.record(t, **em)
                    self.mlog.log(t, **em)
            if recon_gt_points is not None and t % 25 == 0:
                with self.timer.phase("recon_metric"):
                    m = self._recon_update(recon_gt_points)
                    self.metrics.record(t, **m)
                    self.mlog.log(t, **m, n_gaussians=self.slam.n_active)
            if (self.obj_slam is not None and t % 25 == 0
                    and getattr(self.sim, "dynamic_object", None) is not None):
                # per-episode object reconstruction curve (reference
                # tester:1212-1289 records object completeness per step;
                # every 25 matches the scene-metric cadence above)
                with self.timer.phase("obj_recon_metric"):
                    # 20k samples: at the 1 cm object protocol a 2k cloud
                    # on a ~1 m^2 box is sampling-limited (~2 cm NN
                    # spacing inflates acc/fpr); the reference compares
                    # against the dense GLB model cloud
                    gt_obj = self.sim.dynamic_object.sample_surface_points(
                        20000, frame="object")
                    if gt_obj is not None:   # object spawned without a
                        self.record_object_metrics(t, gt_obj)  # GT cloud
            if self.habvis is not None:
                with self.timer.phase("habvis"):
                    self.habvis.update_fow_sim(obs["c2w"])
                if self.dynamic_scene and getattr(self.sim, "dynamic_object",
                                                  None) is not None:
                    self.habvis.update_object(
                        self.sim.dynamic_object.translation)
                if bool(self.cfg.policy.save_nav_images) and t % 20 == 0:
                    self.habvis.save_vis_seen(
                        os.path.join(self.eval_dir, "nav_images"), t)
            # checkpoint cadence is OFFSET to the middle of the mapping
            # window: at t % interval == 0 the save landed exactly one step
            # after a mapping dispatch and its state pull blocked on the
            # whole ~0.8 s event (profiled ~5 s/episode); mid-window the
            # device is idle and the same pull is just a transfer
            ck_off = (int(self.cfg.map_every) // 2) % self.checkpoint_interval
            if t > ck_off and t % self.checkpoint_interval == ck_off:
                # post-step site: the sim already moved to step t+1's pose
                self.save_checkpoint(t, sim_c2w=obs["c2w"], resume_t=t + 1)
            if t >= 1000 and not self._pcl_1000_saved:
                # mid-protocol PCL export (reference exports the global
                # cloud at steps 1000 AND 2000, tester:504-506)
                self._pcl_1000_saved = True
                with self.timer.phase("pcl_export"):
                    self.global_pcl.save_ply(os.path.join(
                        self.eval_dir, "pointcloud", "global_pcl_1000.ply"))
            if on_step is not None:
                on_step(t, obs)
            t += 1

        result = dict(scene=self.scene_id, policy=self.policy_name,
                      max_steps=self.max_steps,
                      steps=t, done_reason=done_reason,
                      stuck_total=self.stuck_total,
                      n_gaussians=self.slam.n_active,
                      n_keyframes=len(self.slam.keyframes),
                      timing=self.timer.summary())
        if self.habvis is not None:
            result["coverage_2d_pct"] = self.habvis.coverage_2d()
        if n_eval_poses != 0 and self.scene is not None and \
                hasattr(self.sim, "render_at"):
            # reference protocol: 2000 uniform navigable poses
            # (tester:1372-1393) + PSNR scatter map (tester:1531-1556)
            seen_fn = None
            if self.habvis is not None:
                hv = self.habvis

                def seen_fn(x, z, _hv=hv):
                    cx, cz = _hv._to_cell(x, z)
                    gz, gx = _hv.fow_mask.shape
                    return bool(0 <= cz < gz and 0 <= cx < gx
                                and _hv.fow_mask[cz, cx])
            nav_eval = eval_navigation(self.slam, self.sim, self.scene,
                                       n_poses=n_eval_poses or 2000,
                                       cam_height=float(c2w[1, 3]),
                                       out_dir=self.eval_dir,
                                       seen_fn=seen_fn)
            result["eval"] = {k: v for k, v in nav_eval.items()
                              if k != "per_pose"}
            # per-pose dump + results txt (reference tester:1320-1325
            # {policy}_results.txt and :1494-1496 eval.json)
            import json as _json
            with open(os.path.join(self.eval_dir, "eval.json"), "w") as f:
                _json.dump(nav_eval["per_pose"], f)
            with open(os.path.join(self.eval_dir,
                                   f"{self.policy_name}_results.txt"),
                      "w") as f:
                for k, v in result["eval"].items():
                    f.write(f"{k}: {v}\n")
        if recon_gt_points is not None:
            if self._inc_recon is not None or \
                    self._inc_recon_saved is not None:
                # running metric state == one-shot over the full cloud
                # (exact decomposition, tests/test_engine.py); finishing
                # from it keeps the end-of-episode phase SHORT — the
                # full-cloud recompute here was a multi-minute unbeatable
                # window that tunnel wedges kept killing (r5 attempts 2-3)
                result["recon"] = self._recon_update(recon_gt_points)
            else:
                est = self.global_pcl.get()
                result["recon"] = accuracy_comp_ratio_from_pcl(
                    est, recon_gt_points, 0.05,
                    surface_dist_fn=getattr(self.scene, "surface_distance",
                                            None))
            result["auc"] = self.metrics.auc()
        # final curve dump (reference tester:1233-1289 writes the metric
        # yaml as it goes; here once at episode end + at checkpoints) —
        # the golden-curve harness (scripts/compare_curves.py) reads these
        if self.metrics.steps:
            self.metrics.dump(os.path.join(self.eval_dir,
                                           "metrics_curve.yaml"))
        if self.object_metrics.steps:
            self.object_metrics.dump(
                os.path.join(self.eval_dir, "object_metrics_curve.yaml"))
        return result

    def _recon_update(self, recon_gt_points) -> dict:
        """Feed the incremental recon metric the pcl's new points; on a
        resumed episode the restored running state stands in for the
        already-consumed prefix of the loaded cloud (append-only and
        deterministic order, so the skip is exact)."""
        if self._inc_recon is None:
            from .eval import IncrementalReconMetric
            self._inc_recon = IncrementalReconMetric(
                recon_gt_points, 0.05,
                surface_dist_fn=getattr(self.scene, "surface_distance",
                                        None))
            if self._inc_recon_saved is not None:
                if self._inc_recon.load_state_dict(self._inc_recon_saved):
                    self._pcl_skip = self._inc_recon.n_est
                self._inc_recon_saved = None
        new_pts, self._pcl_cursor = self.global_pcl.get_new(
            self._pcl_cursor)
        if self._pcl_skip:
            k = min(self._pcl_skip, len(new_pts))
            new_pts = new_pts[k:]
            self._pcl_skip -= k
        return self._inc_recon.update(new_pts)

    # -- checkpoint/resume (reference tester:2745-2800 load_3d_gaussian,
    # :824-828 habvis-with-ckpt, :2824-2829 astar, :2871-2874 habvis) ----
    def save_checkpoint(self, t: int, sim_c2w=None, resume_t: int | None = None):
        """sim_c2w: the simulator's CURRENT pose (at the periodic in-loop
        checkpoint the sim has already stepped past the last tracked
        frame); resume_t: the step index the resumed loop starts at
        (default t+1 — step t is fully processed)."""
        self.slam.save(t)
        self.planner.save(os.path.join(self.eval_dir, "astar.npz"))
        self.global_pcl.save(os.path.join(self.eval_dir, "global_pcl.npz"))
        self.metrics.dump(os.path.join(self.eval_dir, "metrics_curve.yaml"))
        if self.object_metrics.steps:
            self.object_metrics.dump(
                os.path.join(self.eval_dir, "object_metrics_curve.yaml"))
        extra = dict(t=int(t), stuck_count=int(self.stuck_count),
                     stuck_total=int(self.stuck_total),
                     # incremental-recon running state: a resumed attempt
                     # must not re-scan the full loaded cloud (minutes of
                     # beat-less host compute per resume; r5 attempt log)
                     **({"inc_recon_d_gt_min":
                         self._inc_recon.state_dict()["d_gt_min"],
                         "inc_recon_acc":
                         self._inc_recon.state_dict()["acc"]}
                        if self._inc_recon is not None else {}),
                     obj_pcl=self.global_obj_pcl,
                     resume_t=int(t + 1 if resume_t is None else resume_t),
                     sim_c2w=(np.zeros((0, 4, 4), np.float32)
                              if sim_c2w is None
                              else np.asarray(sim_c2w, np.float32)[None]),
                     queue=np.asarray(list(self.queue), np.int64),
                     last_goal=(np.zeros((0, 4, 4), np.float32)
                                if self.last_goal is None
                                else np.asarray(self.last_goal)[None]))
        if self.habvis is not None:
            hv = self.habvis.state_dict()
            extra.update(habvis_fow=hv["fow_mask"],
                         habvis_traj=np.asarray(hv["traj"]).reshape(-1, 2),
                         habvis_obj=np.asarray(hv["obj_traj"]).reshape(-1, 2))
        # RNG states: without these a resumed episode's planning draws
        # diverge from the uninterrupted run's
        from ..utils.io import atomic_pickle, atomic_savez
        atomic_pickle(os.path.join(self.eval_dir, "episode_rng.pkl"), dict(
            driver=self.rng.bit_generator.state,
            planner=self.planner.rng.bit_generator.state,
            slam=self.slam.rng.bit_generator.state,
            pcl=self.global_pcl.rng.bit_generator.state))
        # episode_state is written LAST and atomically: it is the commit
        # record of the checkpoint group.  resume() trusts ep["t"] to pick
        # the params file, so a kill anywhere earlier in this function
        # leaves the previous consistent group in force (advisor r4:
        # non-atomic checkpoint-group finding, driver.py:758).
        atomic_savez(os.path.join(self.eval_dir, "episode_state.npz"),
                     **extra)

    def resume(self, slam_ckpt: str):
        """Restore the FULL episode state and replay the last tracked pose
        into the simulator; the next test_navigation() continues from the
        checkpointed step with identical coverage accounting.

        episode_state.npz is the commit record: when present and it names
        a step t whose params{t}.npz exists and loads, that file wins over
        the caller-supplied (typically newest-by-name) checkpoint — a kill
        between slam.save(t) and the episode_state write must not pair
        params at t with episode state at t-interval."""
        from ..utils.io import valid_npz
        ep_path_early = os.path.join(self.eval_dir, "episode_state.npz")
        if os.path.exists(ep_path_early) and valid_npz(ep_path_early):
            with np.load(ep_path_early) as ep0:
                committed = os.path.join(self.eval_dir,
                                         f"params{int(ep0['t'])}.npz")
            if os.path.exists(committed) and valid_npz(committed):
                slam_ckpt = committed
        self.slam.load(slam_ckpt)
        astar_path = os.path.join(self.eval_dir, "astar.npz")
        if os.path.exists(astar_path):
            self.planner.load(astar_path)
            self.planner.camera = self.slam.camera
        pcl_path = os.path.join(self.eval_dir, "global_pcl.npz")
        if os.path.exists(pcl_path):
            self.global_pcl.load(pcl_path)
        curve = os.path.join(self.eval_dir, "metrics_curve.yaml")
        if os.path.exists(curve):
            self.metrics.load(curve)
        obj_curve = os.path.join(self.eval_dir, "object_metrics_curve.yaml")
        if os.path.exists(obj_curve):
            self.object_metrics.load(obj_curve)
        ep_path = os.path.join(self.eval_dir, "episode_state.npz")
        if os.path.exists(ep_path):
            ep = np.load(ep_path)
            self.stuck_count = int(ep["stuck_count"])
            self.stuck_total = int(ep["stuck_total"]) \
                if "stuck_total" in ep else self.stuck_count
            if "inc_recon_d_gt_min" in ep:
                self._inc_recon_saved = dict(
                    d_gt_min=np.asarray(ep["inc_recon_d_gt_min"]),
                    acc=np.asarray(ep["inc_recon_acc"]))
            if "obj_pcl" in ep and len(ep["obj_pcl"]):
                self._obj_pcl_parts = [np.asarray(ep["obj_pcl"], np.float32)]
            self.queue = deque(int(a) for a in ep["queue"])
            if len(ep["last_goal"]):
                self.last_goal = ep["last_goal"][0]
            self._make_habvis()
            if self.habvis is not None and "habvis_fow" in ep:
                self.habvis.load_state_dict(dict(
                    fow_mask=ep["habvis_fow"], traj=ep["habvis_traj"],
                    obj_traj=ep["habvis_obj"]))
            self._resume_t = int(ep["resume_t"]) if "resume_t" in ep \
                else int(ep["t"]) + 1
            if hasattr(self.sim, "set_pose"):
                if "sim_c2w" in ep and len(ep["sim_c2w"]):
                    self.sim.set_pose(ep["sim_c2w"][0])
                else:
                    self.sim.set_pose(self.slam.get_latest_frame())
        elif hasattr(self.sim, "set_pose"):
            self.sim.set_pose(self.slam.get_latest_frame())
        rng_path = os.path.join(self.eval_dir, "episode_rng.pkl")
        if os.path.exists(rng_path):
            import pickle
            with open(rng_path, "rb") as f:
                states = pickle.load(f)
            self.rng.bit_generator.state = states["driver"]
            self.planner.rng.bit_generator.state = states["planner"]
            self.slam.rng.bit_generator.state = states["slam"]
            self.global_pcl.rng.bit_generator.state = states["pcl"]
