"""Object-centric path planning + P-optimality path evaluation.

Reference: tester_gaussians_navigation.py:1738-1818 plan_best_object_path
(criterion fisher | topt | dopt), :1977-2107 path_object_evaluation and
:2109-2204 path_evaluation_popgs — roll the camera through each candidate
action sequence, accumulate the object SLAM's information (Fisher H or
Hutchinson diag JᵀJ) every acc_H_train_every actions, and mix the path
score with the endpoint EIG via object_path_end_weight.
"""
from __future__ import annotations

import numpy as np

from ..ops.fisher import dopt_score_from_diags, topt_score_from_diags
from .actions import action_planning, rollout_path_poses


def path_evaluation_fisher(obj_slam, h_train, path_actions, current_pose,
                           cam_height, forward_step, turn_angle,
                           final_eigs, cfg):
    """Per-path Fisher EIG accumulation over the 11-dim object Hessian
    (reference path_object_evaluation)."""
    lam = float(cfg.H_reg_lambda)
    acc_every = int(cfg.acc_H_train_every)
    w_end = float(cfg.object_path_end_weight)
    w_point = float(cfg.path_point_weight)
    scores = []
    for actions, final_eig in zip(path_actions, final_eigs):
        poses = rollout_path_poses(current_pose, actions, cam_height,
                                   forward_step, turn_angle)
        h_path = np.asarray(h_train).copy()
        total, count = 0.0, 0
        for pose in poses:
            count += 1
            if (count + 1) % acc_every != 0:
                continue
            cur = np.asarray(obj_slam.compute_Hessian(
                np.linalg.inv(pose), return_points=True))
            eig = np.log(max(float((cur / (h_path + lam)).sum()), 1e-30))
            total += w_point * eig
            h_path = h_path + cur
        length = max(count, 1)
        if w_end > 0:
            scores.append(total / length + w_end * float(final_eig))
        else:
            scores.append((total + float(final_eig)) / length)
    return np.asarray(scores, np.float32)


def path_evaluation_popgs(obj_slam, h_train_diag, path_actions, current_pose,
                          cam_height, forward_step, turn_angle, final_eigs,
                          cfg, criterion: str = "topt", probes: int = 2):
    """P-optimality path evaluation: per future pose, Hutchinson diag JᵀJ
    updates the running prior and the T-opt/D-opt delta scores the action
    (reference path_evaluation_popgs)."""
    lam = 1e-6
    acc_every = int(cfg.acc_H_train_every)
    w_end = float(cfg.object_path_end_weight)
    w_point = float(cfg.path_point_weight)
    score_fn = (topt_score_from_diags if criterion == "topt"
                else dopt_score_from_diags)
    scores = []
    for actions, final_eig in zip(path_actions, final_eigs):
        poses = rollout_path_poses(current_pose, actions, cam_height,
                                   forward_step, turn_angle)
        h_path = np.asarray(h_train_diag).copy()
        total, count = 0.0, 0
        for pose in poses:
            count += 1
            if (count + 1) % acc_every != 0:
                continue
            diag, _vis = obj_slam.estimate_diag_JtJ_simple(
                np.linalg.inv(pose), K=probes)
            diag = np.asarray(diag)
            total += w_point * float(score_fn(h_path, diag, lam))
            h_path = h_path + diag
        length = max(count, 1)
        if w_end > 0:
            scores.append(total / length + w_end * float(final_eig))
        else:
            scores.append((total + float(final_eig)) / length)
    return np.asarray(scores, np.float32)


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

    goals, path_actions, paths_arr = action_planning(
        global_points, current_agent_pose, planner, slam.gaussian_points, t,
        forward_step, turn_angle, queue_size)
    if not path_actions:
        return None, None
    goals, path_actions, paths_arr = (goals[:8], path_actions[:8],
                                      paths_arr[:8])
    final_eigs = []
    for g in goals:
        i = np.where((global_points == g).all(axis=(1, 2)))[0][0]
        # fisher scores are summed ratios (log for mixing); popgs scores
        # are already log-domain-ish utilities
        e = float(eigs[i])
        final_eigs.append(np.log(max(e, 1e-30)) if criterion == "fisher"
                          else e)

    if criterion in ("topt", "dopt"):
        h_train = np.asarray(obj_slam.compute_H_train_popgs(K=2))
        scores = path_evaluation_popgs(
            obj_slam, h_train, path_actions, current_agent_pose,
            planner.cam_height, forward_step, turn_angle, final_eigs, cfg,
            criterion=criterion)
    else:
        h_train = None
        for w2c in obj_slam.keyframes.w2cs:
            h = np.asarray(obj_slam.compute_Hessian(w2c, return_points=True))
            h_train = h if h_train is None else h_train + h
        if h_train is None:
            h_train = np.zeros((obj_slam.state.capacity, 11), np.float32)
        scores = path_evaluation_fisher(
            obj_slam, h_train, path_actions, current_agent_pose,
            planner.cam_height, forward_step, turn_angle, final_eigs, cfg)

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
