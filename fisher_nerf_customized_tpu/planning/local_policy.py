"""Local waypoint-following policies.

Reference: planning/pathfollower.py:12-92 PathFollower (habitat
GreedyGeodesicFollower wrapper) and planning/ddppo_policy.py:11-82
DdppoPolicy (pretrained DD-PPO ResNet50 pointgoal network — its checkpoint
file is not available offline, so loading is gated and the geometric
follower is the default local policy for UPEN)."""
from __future__ import annotations

import math

import numpy as np

from ..utils.geometry import compute_next_campos


class PathFollower:
    """Greedy geometric follower: turn toward the goal until within one
    turn-angle, else step forward; STOP within `stop_dist`."""

    STOP, FORWARD, LEFT, RIGHT = 0, 1, 2, 3

    def __init__(self, forward_step: float = 0.25, turn_angle: float = 10.0,
                 stop_dist: float = 0.2):
        self.forward_step = float(forward_step)
        self.turn_angle = float(turn_angle)
        self.stop_dist = float(stop_dist)

    def next_action(self, c2w: np.ndarray, goal_world_xz) -> int:
        c2w = np.asarray(c2w, np.float64)
        goal = np.array([goal_world_xz[0], c2w[1, 3], goal_world_xz[-1], 1.0])
        rel = np.linalg.inv(c2w) @ goal
        xz = rel[[0, 2]]
        if np.linalg.norm(xz) < self.stop_dist:
            return self.STOP
        ang = math.atan2(xz[0], xz[1])
        if ang > math.radians(self.turn_angle):
            return self.RIGHT
        if ang < -math.radians(self.turn_angle):
            return self.LEFT
        return self.FORWARD

    def rollout(self, c2w: np.ndarray, goal_world_xz,
                max_actions: int = 50) -> list[int]:
        pose = np.asarray(c2w, np.float64).copy()
        actions = []
        for _ in range(max_actions):
            a = self.next_action(pose, goal_world_xz)
            if a == self.STOP:
                break
            pose = compute_next_campos(pose, a, self.forward_step,
                                       self.turn_angle)
            actions.append(a)
        return actions


class DdppoPolicy:
    """DD-PPO pointgoal local policy (checkpoint-gated).

    Reference planning/ddppo_policy.py loads a pretrained ResNet50 habitat
    baseline checkpoint; without one this delegates to PathFollower and
    records that the learned policy is inactive."""

    def __init__(self, ckpt_path: str | None = None, **follower_kwargs):
        self.learned = False
        self.net = None
        if ckpt_path:
            try:
                import torch
                self.net = torch.load(ckpt_path, map_location="cpu")
                self.learned = True
            except Exception as e:   # missing file / incompatible ckpt
                import logging
                logging.getLogger("fnc_tpu").warning(
                    "DD-PPO checkpoint unavailable (%s); using geometric "
                    "follower", e)
        self.follower = PathFollower(**follower_kwargs)

    def plan(self, depth, pointgoal_rel, c2w=None) -> int:
        """Action for a relative pointgoal (rho, phi) or world xz goal."""
        if self.learned and self.net is not None:
            raise NotImplementedError(
                "learned DD-PPO inference requires habitat_baselines; "
                "geometric fallback is used in this environment")
        if c2w is None:
            raise ValueError("geometric follower needs the agent pose c2w")
        return self.follower.next_action(c2w, pointgoal_rel)

    def reset(self):
        pass
