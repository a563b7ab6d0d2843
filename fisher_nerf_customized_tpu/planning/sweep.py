"""Jitted multi-goal shortest-path field — the TPU replacement for
per-goal host A*.

The reference runs its custom A* once per candidate goal (reference
planning/astar.py:1591-1772; ~dozens of goals per planning event), each
search re-exploring the same occupancy grid in a Python heap loop.  On TPU
the natural formulation is ONE whole-grid Bellman–Ford relaxation with the
SAME edge set — 16 three-cell "jump" neighbors, each validated against a
9-cell swept corridor, with tiered obstacle-distance collision costs
(0/4/8/12 for distances >20/>10/>5/<=5 cells) added to the travel cost —
iterated as a `lax.while_loop` of vectorized rolled minima until the cost
field converges.  The converged (cost, parent-direction) field answers
EVERY goal of a planning event; per-goal work shrinks to a host-side
parent backtrace (microseconds).

Edge weight matches AstarSearch exactly: the reference relaxes on
cost+collision (astar.py:1722 `old[0]+old[3] > cost+coll`), i.e. a single
combined edge weight hypot(jump) + Σ_corridor tier(dist_obs).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .astar import _CORRIDORS, _NEIGHBORS, _collision_cost

_INF = np.float32(3e38)   # numpy scalar: no device alloc at import


@functools.partial(jax.jit, static_argnames=("max_iters",))
def sweep_field(free, tier_cost, start_yx, max_iters: int = 600):
    """Converged shortest-path cost + parent-direction fields.

    Args:
      free:      (H, W) bool — connected traversable space.
      tier_cost: (H, W) f32 — per-cell collision tier cost
                 (_collision_cost of the L1 obstacle distance transform).
      start_yx:  (2,) int32 — start cell [y, x].
      max_iters: relaxation bound (graph diameter in jumps; each round
                 extends the reached set by one jump ≈ 3 cells).

    Returns:
      cost:   (H, W) f32 — combined travel+collision cost, _INF where
              unreachable.
      parent: (H, W) int8 — index into _NEIGHBORS of the edge that set the
              cell's cost (-1 at the start / unreached cells).
    """
    h, w = free.shape
    freef = free.astype(jnp.float32)

    # per-direction edge data, indexed by SOURCE cell:
    #   ok_d[s]    = all corridor cells of jump d from s are free
    #   wcoll_d[s] = Σ corridor tier costs
    oks, wcolls = [], []
    for d in range(16):
        ok = jnp.ones((h, w), jnp.float32)
        wc = jnp.zeros((h, w), jnp.float32)
        for (cy, cx) in np.asarray(_CORRIDORS[d]):
            # value at s comes from s + (cy, cx): roll by (-cy, -cx)
            ok = ok * jnp.roll(freef, (-int(cy), -int(cx)), (0, 1))
            wc = wc + jnp.roll(tier_cost, (-int(cy), -int(cx)), (0, 1))
        oks.append(ok > 0.5)
        wcolls.append(wc)

    # edge weights (INF where the corridor is blocked), plus target-side
    # wrap masks (a roll that crosses the grid edge is not a real edge)
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    weights, tmasks = [], []
    for d, (dy, dx) in enumerate(np.asarray(_NEIGHBORS)):
        step = float(np.hypot(dy, dx))
        weights.append(jnp.where(oks[d], step + wcolls[d], _INF))
        ty_ok = ((ys - dy >= 0) & (ys - dy < h))
        tx_ok = ((xs - dx >= 0) & (xs - dx < w))
        tmasks.append(ty_ok & tx_ok)

    cost0 = jnp.full((h, w), _INF).at[start_yx[0], start_yx[1]].set(0.0)
    parent0 = jnp.full((h, w), -1, jnp.int8)

    def body(state):
        cost, parent, _changed, it = state
        new_cost, new_parent = cost, parent
        for d, (dy, dx) in enumerate(np.asarray(_NEIGHBORS)):
            # cand[t] = cost[s] + w[s],  s = t - (dy, dx)
            cand = jnp.roll(cost + weights[d], (int(dy), int(dx)), (0, 1))
            cand = jnp.where(tmasks[d], cand, _INF)
            better = cand < new_cost - 1e-4
            new_parent = jnp.where(better, jnp.int8(d), new_parent)
            new_cost = jnp.minimum(new_cost, cand)
        changed = jnp.any(new_cost < cost - 1e-4)
        return new_cost, new_parent, changed, it + 1

    def cond(state):
        _c, _p, changed, it = state
        return changed & (it < max_iters)

    cost, parent, _ch, _it = jax.lax.while_loop(
        cond, body, (cost0, parent0, jnp.bool_(True), jnp.int32(0)))
    return cost, parent


class SweepSearch:
    """Drop-in for AstarSearch: one device sweep at construction, then
    `plan(goal)` is a host backtrace over the parent-direction field."""

    def __init__(self, occ_map_np: np.ndarray, free_space_np: np.ndarray,
                 start):
        import cv2
        self.occ = occ_map_np
        h, w = occ_map_np.shape
        self.start = (int(start[0]), int(start[1]))
        dist_obs = cv2.distanceTransform(
            free_space_np.astype(np.uint8), cv2.DIST_L1, 5)
        tier = _collision_cost(dist_obs)
        # dispatch only — the field is pulled lazily at the first plan()
        # call, so the sweep overlaps whatever else the planning event has
        # in flight (candidate Fisher scoring, typically)
        self._cost_dev, self._parent_dev = sweep_field(
            jnp.asarray(free_space_np.astype(bool)),
            jnp.asarray(tier, jnp.float32),
            jnp.asarray(self.start, jnp.int32))
        # enqueue the D2H copies right behind the sweep on the in-order
        # stream: by the time plan() materializes, the data has landed
        # instead of the pull waiting behind later-dispatched device work
        for a in (self._cost_dev, self._parent_dev):
            if hasattr(a, "copy_to_host_async"):
                a.copy_to_host_async()
        self.cost = None
        self.parent = None

    def _materialize(self):
        if self.cost is None:
            import jax
            cost, parent = jax.device_get((self._cost_dev, self._parent_dev))
            self.cost = np.asarray(cost, np.float32)
            self.parent = np.asarray(parent)

    def plan(self, goal, shortcut: bool = True) -> np.ndarray:
        """Shortest path to `goal` [y, x] (goal tolerance <2 cells in
        Chebyshev distance, as the reference's early-accept; astar.py:1715).
        Returns (K, 2) [x, z] cells, empty array if unreachable."""
        self._materialize()
        gy, gx = int(goal[0]), int(goal[1])
        h, w = self.cost.shape
        if self.occ[gy, gx]:
            return np.array([])
        # min-cost reachable cell within the 3x3 tolerance window
        y0, y1 = max(gy - 1, 0), min(gy + 2, h)
        x0, x1 = max(gx - 1, 0), min(gx + 2, w)
        win = self.cost[y0:y1, x0:x1]
        if not np.isfinite(win.min()) or win.min() >= 3e38:
            return np.array([])
        dy, dx = np.unravel_index(int(np.argmin(win)), win.shape)
        cy, cx = y0 + int(dy), x0 + int(dx)

        path = [(cy, cx)]
        while (cy, cx) != self.start:
            d = int(self.parent[cy, cx])
            if d < 0:
                return np.array([])     # inconsistent field (unreached)
            oy, ox = _NEIGHBORS[d]
            cy, cx = cy - int(oy), cx - int(ox)
            path.append((cy, cx))
            if len(path) > h + w:       # cycle guard
                return np.array([])
        if len(path) == 1:
            return np.array([])
        paths = np.array(path[::-1])[:, [1, 0]]       # to [x, z]
        if shortcut:
            paths = self._shortcut(paths)
        return paths

    def _shortcut(self, paths: np.ndarray) -> np.ndarray:
        from .astar import check_collision_free
        if len(paths) < 3:
            return paths
        out = [paths[0], paths[1]]
        idx = 1
        for i in range(2, paths.shape[0] - 1):
            if check_collision_free(out[idx - 1], paths[i], self.occ):
                out[idx] = paths[i]
            else:
                out.append(paths[i])
                idx += 1
        out.append(paths[-1])
        return np.stack(out, axis=0)
