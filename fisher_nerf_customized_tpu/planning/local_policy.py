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

    Reference planning/ddppo_policy.py:11-82 loads a pretrained
    GroupNorm-ResNet50 + 2-layer-LSTM habitat baseline checkpoint and
    samples one action per frame.  The network itself is re-implemented
    natively in JAX (planning/ddppo_net.py) with a name-identity torch
    state-dict loader, so with a checkpoint the LEARNED policy runs for
    real (jitted, on-device); without one this delegates to PathFollower
    and records that the learned policy is inactive."""

    def __init__(self, ckpt_path: str | None = None, seed: int = 0,
                 deterministic: bool = False, **follower_kwargs):
        self.learned = False
        self.params = None
        self.hidden_size = 0
        self.deterministic = bool(deterministic)
        if ckpt_path:
            try:
                from . import ddppo_net
                self.params, self.hidden_size = \
                    ddppo_net.load_torch_checkpoint(ckpt_path)
                self.learned = True
            except Exception as e:   # missing file / incompatible ckpt
                import logging
                logging.getLogger("fnc_tpu").warning(
                    "DD-PPO checkpoint unavailable (%s); using geometric "
                    "follower", e)
        self.follower = PathFollower(**follower_kwargs)
        self._seed = int(seed)
        self.reset()

    def _goal_polar(self, pointgoal_rel, c2w):
        """(rho, phi) for the network: either already polar, or derived
        from a world-frame xz goal + agent pose (phi measured from the
        camera forward axis, left positive — habitat's convention)."""
        g = np.asarray(pointgoal_rel, np.float64).reshape(-1)
        if c2w is None:
            return np.asarray(g[:2], np.float32)
        c2w = np.asarray(c2w, np.float64)
        goal = np.array([g[0], c2w[1, 3], g[-1], 1.0])
        rel = np.linalg.inv(c2w) @ goal
        rho = float(np.hypot(rel[0], rel[2]))
        phi = float(-math.atan2(rel[0], rel[2]))
        return np.asarray([rho, phi], np.float32)

    def plan(self, depth, pointgoal_rel, c2w=None, t: int | None = None) -> int:
        """Action for a relative pointgoal (rho, phi) or world xz goal.

        `t` mirrors the reference's step counter (t == 0 clears the
        recurrent state via the not-done mask); when omitted an internal
        counter is used."""
        if self.learned and self.params is not None:
            import jax
            import jax.numpy as jnp
            from . import ddppo_net
            step = self._t if t is None else int(t)
            d = np.asarray(depth, np.float32)
            if d.ndim == 2:
                d = d[..., None]
            goal = self._goal_polar(pointgoal_rel, c2w)
            mask = jnp.asarray([0.0 if step == 0 else 1.0], jnp.float32)
            self._rng, sub = jax.random.split(self._rng)
            action, _value, self._hidden = ddppo_net.act(
                self.params, jnp.asarray(d)[None], jnp.asarray(goal)[None],
                self._hidden, self._prev_action, mask, sub,
                deterministic=self.deterministic)
            self._prev_action = action
            self._t = step + 1
            return int(action[0])
        if c2w is None:
            raise ValueError("geometric follower needs the agent pose c2w")
        return self.follower.next_action(c2w, pointgoal_rel)

    def reset(self):
        import jax
        import jax.numpy as jnp
        from . import ddppo_net
        self._t = 0
        self._rng = jax.random.PRNGKey(self._seed)
        h = self.hidden_size if self.learned else 1
        self._hidden = ddppo_net.zero_state(h)
        self._prev_action = jnp.zeros((1,), jnp.int32)
