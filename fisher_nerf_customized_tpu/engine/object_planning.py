"""Object-centric path planning + P-optimality path evaluation.

Reference: tester_gaussians_navigation.py:1738-1818 plan_best_object_path
(criterion fisher | topt | dopt), :1977-2107 path_object_evaluation and
:2109-2204 path_evaluation_popgs — roll the camera through each candidate
action sequence, accumulate the object SLAM's information (Fisher H or
Hutchinson diag JᵀJ) every acc_H_train_every actions, and mix the path
score with the endpoint EIG via object_path_end_weight.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .actions import action_planning, rollout_path_poses
from .path_eval import acc_step_indices


def path_evaluation_batched(obj_slam, h_train11, path_actions, current_pose,
                            cam_height, forward_step, turn_angle, final_eigs,
                            cfg, criterion: str = "fisher", probes: int = 2,
                            p_max: int = 8):
    """ALL object paths scored in one XLA launch (reference
    path_object_evaluation / path_evaluation_popgs are sequential python
    loops with one render+backward and a blocking pull per action;
    models/object_slam.object_path_scores is the batched device program).

    Only the acc-step poses contribute (the reference computes a Hessian
    per action but folds in/scores every acc_H_train_every-th — the rest
    is skipped exactly, see path_eval.acc_step_indices).
    """
    from ..models.object_slam import object_path_scores
    lam = float(cfg.H_reg_lambda) if criterion == "fisher" else 1e-6
    acc_every = int(cfg.acc_H_train_every)
    w_end = float(cfg.object_path_end_weight)
    w_point = float(cfg.path_point_weight)

    n_paths = len(path_actions)
    a_max = max(len(a) for a in path_actions)
    acc_idx = acc_step_indices(a_max, acc_every) or [0]
    w2cs = np.tile(np.eye(4, dtype=np.float32),
                   (p_max, len(acc_idx), 1, 1))
    valid = np.zeros((p_max, len(acc_idx)), bool)
    lengths = np.ones((p_max,), np.int32)
    for i, acts in enumerate(path_actions[:p_max]):
        poses = rollout_path_poses(current_pose, acts, cam_height,
                                   forward_step, turn_angle)
        for j, s in enumerate(acc_idx):
            if s < len(acts):
                w2cs[i, j] = np.linalg.inv(poses[s])
                valid[i, j] = True
        lengths[i] = len(acts)
    fe = np.full((p_max,), -np.inf, np.float32)
    fe[:n_paths] = np.asarray(final_eigs, np.float32)[:p_max]
    keys = obj_slam._pose_keys(len(acc_idx) * p_max).reshape(
        len(acc_idx), p_max, 2)
    scores = object_path_scores(
        obj_slam.state.params(), obj_slam.state.n_active, h_train11,
        jnp.asarray(w2cs), jnp.asarray(valid), jnp.asarray(lengths),
        jnp.asarray(fe), keys, lam, w_point, w_end, obj_slam.camera,
        obj_slam.settings, int(probes), criterion)
    return np.asarray(scores)[:n_paths]


def plan_best_object_path(obj_slam, slam, planner, current_agent_pose,
                          expansion, t, cfg, forward_step, turn_angle,
                          queue_size, criterion: str = "fisher"):
    """(reference tester:1738 plan_best_object_path)  Returns (actions,
    paths) of the best-scoring object-observing path, or (None, None)."""
    obj_pts = obj_slam.gaussian_points
    if len(obj_pts) == 0:
        return None, None
    if criterion in ("topt", "dopt"):
        def pose_fn(poses, criterion=criterion):
            return obj_slam.pose_eval_popgs(poses, criterion=criterion, K=2)
    else:
        pose_fn = obj_slam.pose_eval

    global_points, eigs, _ = planner.global_object_planning(
        pose_fn, obj_pts, slam.gaussian_points, expansion=expansion,
        agent_pose=current_agent_pose[:3, 3], criterion=criterion)
    if global_points is None:
        return None, None
    global_points, eigs = np.asarray(global_points), np.asarray(eigs)

    from ..planning import LocalizationError
    try:
        goals, path_actions, paths_arr, goal_idx = action_planning(
            global_points, current_agent_pose, planner,
            slam.gaussian_points, t, forward_step, turn_angle, queue_size)
    except LocalizationError:
        # enclosed start (e.g. agent boxed in next to the object): fall
        # back to the scene planner instead of aborting the episode
        return None, None
    if not path_actions:
        return None, None
    goals, path_actions, paths_arr, goal_idx = (
        goals[:8], path_actions[:8], paths_arr[:8], goal_idx[:8])
    final_eigs = []
    for i in goal_idx:
        # fisher scores are summed ratios (log for mixing); popgs scores
        # are already log-domain-ish utilities
        e = float(eigs[i])
        final_eigs.append(np.log(max(e, 1e-30)) if criterion == "fisher"
                          else e)

    # cached (keyframes × params)-versioned H_train; popgs uses K=2 probes
    probes = 2 if criterion in ("topt", "dopt") else obj_slam.hutch_probes
    if len(obj_slam.keyframes):
        h_train11 = obj_slam.compute_H_train_obj(n_probes=probes)
    else:
        h_train11 = jnp.zeros((obj_slam.state.capacity, 11))
    scores = path_evaluation_batched(
        obj_slam, h_train11, path_actions, current_agent_pose,
        planner.cam_height, forward_step, turn_angle, final_eigs, cfg,
        criterion=criterion if criterion in ("topt", "dopt") else "fisher",
        probes=probes)

    best = int(np.argmax(scores))
    return path_actions[best], paths_arr[best]


def init_object_policy(mask, turn_angle: float, width: int,
                       max_actions: int = 12) -> list[int]:
    """Mask-centering turn actions (reference tester:2878-2948
    init_object_policy): rotate until the object mask centroid is within
    one turn-angle of the image center."""
    from .dino_gate import object_center_error
    err = object_center_error(mask, width)
    # horizontal pixel offset -> approximate yaw (90° hfov camera)
    yaw_err_deg = err * 45.0
    n = int(abs(yaw_err_deg) // turn_angle)
    action = 3 if yaw_err_deg > 0 else 2       # object right -> turn right
    return [action] * min(n, max_actions)
