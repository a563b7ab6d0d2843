"""Hermetic simulator: procedural box-room scenes with analytic raycasting.

The reference binds every episode to habitat-sim + scene datasets
(reference datasets/dataloader.py:79 HabitatDataScene); its only hermetic
fixture is TrajReader pose replay (SURVEY.md §4).  The TPU build gets a
real fake: `BoxScene` describes a room with box obstacles, `FakeSim`
renders ground-truth RGB-D by jitted per-pixel AABB raycasting and steps
the discrete action space (1 fwd / 2 left / 3 right) with collision
checks — so full active-mapping episodes, tests, and benchmarks run with
no external scene data.  `ReplaySim` plays back recorded RGB-D + poses
(the TrajReader equivalent).

Conventions: world y is up; cameras are +z forward / +y down (CV frame);
depth images are z-depth (camera-axis), matching habitat's depth sensor as
consumed by the reference's back-projection (gaussian.py:101).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.camera import Camera
from ..utils.geometry import compute_next_campos


class _Boxes(NamedTuple):
    lo: jnp.ndarray      # (B, 3)
    hi: jnp.ndarray      # (B, 3)
    inward: jnp.ndarray  # (B,) bool: True = room shell (hit from inside)
    color_seed: jnp.ndarray  # (B,) float


@dataclass
class BoxScene:
    """Room shell + box obstacles.  Sizes in meters."""
    room_lo: tuple = (-4.0, 0.0, -4.0)
    room_hi: tuple = (4.0, 2.5, 4.0)
    obstacles: list = field(default_factory=list)   # list of (lo, hi) tuples
    agent_radius: float = 0.18

    @staticmethod
    def default(seed: int = 0, n_obstacles: int = 6,
                room: float = 4.0) -> "BoxScene":
        rng = np.random.default_rng(seed)
        obstacles = []
        for _ in range(n_obstacles):
            cx, cz = rng.uniform(-room + 1.2, room - 1.2, 2)
            sx, sz = rng.uniform(0.25, 0.7, 2)
            sy = rng.uniform(0.8, 2.2)
            if abs(cx) < 1.2 and abs(cz) < 1.2:
                continue   # keep the spawn area clear
            obstacles.append(((cx - sx, 0.0, cz - sz), (cx + sx, sy, cz + sz)))
        return BoxScene(room_lo=(-room, 0.0, -room), room_hi=(room, 2.5, room),
                        obstacles=obstacles)

    @staticmethod
    def multi_room(seed: int = 0, rooms_x: int = 3, rooms_z: int = 3,
                   room: float = 4.0, door: float = 1.0,
                   wall_t: float = 0.12, height: float = 2.5,
                   clutter_per_room: int = 2) -> "BoxScene":
        """Procedural multi-room apartment: a rooms_x x rooms_z grid of
        `room`-sized rooms separated by interior walls with one doorway
        per shared edge, plus per-room clutter boxes and half-height
        occluders.

        Purpose (VERDICT r3 next-#3): the single-box default() saturates
        (~29k Gaussians, frontier exhausted ~step 532), so the late-
        episode regime of the reference's blessed 2000-step protocol
        (BASELINE configs[3,4]; ref tester:1372-1491) was unreachable.
        Doorway-gated rooms keep fresh frontiers alive deep into the
        episode and multiply wall surface (>=60k Gaussians at 3x3).
        The agent spawns at the CENTER room's center (the grid is
        origin-centered with odd-preferred layouts); every room is
        reachable through the doorway graph
        (tests/test_fake_sim.py::test_multi_room_connectivity)."""
        rng = np.random.default_rng(seed)
        wx = rooms_x * room / 2.0
        wz = rooms_z * room / 2.0
        # shift so that one room's center is the origin (spawn point)
        ox = (room / 2.0) if rooms_x % 2 == 0 else 0.0
        oz = (room / 2.0) if rooms_z % 2 == 0 else 0.0
        obstacles = []

        def x_of(i):   # interior boundary i in [1, rooms_x-1]
            return -wx + i * room + ox

        def z_of(j):
            return -wz + j * room + oz

        # interior walls normal to x: one door per room cell they border
        for i in range(1, rooms_x):
            x = x_of(i)
            for j in range(rooms_z):
                z0, z1 = -wz + j * room + oz, -wz + (j + 1) * room + oz
                dz = rng.uniform(z0 + 0.6, z1 - 0.6 - door)
                if dz - z0 > 0.05:
                    obstacles.append(((x - wall_t / 2, 0.0, z0),
                                      (x + wall_t / 2, height, dz)))
                if z1 - (dz + door) > 0.05:
                    obstacles.append(((x - wall_t / 2, 0.0, dz + door),
                                      (x + wall_t / 2, height, z1)))
        # interior walls normal to z
        for j in range(1, rooms_z):
            z = z_of(j)
            for i in range(rooms_x):
                x0, x1 = -wx + i * room + ox, -wx + (i + 1) * room + ox
                dx = rng.uniform(x0 + 0.6, x1 - 0.6 - door)
                if dx - x0 > 0.05:
                    obstacles.append(((x0, 0.0, z - wall_t / 2),
                                      (dx, height, z + wall_t / 2)))
                if x1 - (dx + door) > 0.05:
                    obstacles.append(((dx + door, 0.0, z - wall_t / 2),
                                      (x1, height, z + wall_t / 2)))
        # per-room clutter (tall boxes + half-height occluders), kept off
        # walls/doorways by a margin and out of the spawn room's center
        for i in range(rooms_x):
            for j in range(rooms_z):
                cx0 = -wx + i * room + ox + 1.0
                cz0 = -wz + j * room + oz + 1.0
                for _ in range(clutter_per_room):
                    cx = rng.uniform(cx0, cx0 + room - 2.0)
                    cz = rng.uniform(cz0, cz0 + room - 2.0)
                    if abs(cx) < 1.0 and abs(cz) < 1.0:
                        continue                    # spawn area clear
                    sx, sz = rng.uniform(0.2, 0.55, 2)
                    sy = rng.uniform(0.5, 1.1) if rng.uniform() < 0.5 \
                        else rng.uniform(1.4, 2.2)
                    obstacles.append(((cx - sx, 0.0, cz - sz),
                                      (cx + sx, sy, cz + sz)))
        return BoxScene(room_lo=(-wx + ox, 0.0, -wz + oz),
                        room_hi=(wx + ox, height, wz + oz),
                        obstacles=obstacles)

    def boxes(self) -> _Boxes:
        los = [np.asarray(self.room_lo, np.float32)]
        his = [np.asarray(self.room_hi, np.float32)]
        inward = [True]
        for lo, hi in self.obstacles:
            los.append(np.asarray(lo, np.float32))
            his.append(np.asarray(hi, np.float32))
            inward.append(False)
        seeds = np.arange(len(los), dtype=np.float32)
        return _Boxes(lo=np.stack(los), hi=np.stack(his),
                      inward=np.asarray(inward), color_seed=seeds)

    # -- navigation ---------------------------------------------------------
    def is_navigable(self, pos: np.ndarray) -> bool:
        """xz position reachable by the agent (inside room, off obstacles)."""
        p = np.asarray(pos, np.float32).reshape(-1)
        x, z = float(p[0]), float(p[-1])
        r = self.agent_radius
        lo, hi = self.room_lo, self.room_hi
        if not (lo[0] + r <= x <= hi[0] - r and lo[2] + r <= z <= hi[2] - r):
            return False
        for blo, bhi in self.obstacles:
            if blo[0] - r <= x <= bhi[0] + r and blo[2] - r <= z <= bhi[2] + r:
                return False
        return True

    def sample_navigable(self, rng: np.random.Generator,
                         n: int) -> np.ndarray:
        out = []
        lo, hi = self.room_lo, self.room_hi
        while len(out) < n:
            x = rng.uniform(lo[0], hi[0])
            z = rng.uniform(lo[2], hi[2])
            if self.is_navigable((x, 0.0, z)):
                out.append((x, z))
        return np.asarray(out, np.float32)

    # -- ground truth for evaluation ---------------------------------------
    def sample_surface_points(self, n: int, rng=None,
                              interior_only: bool = True) -> np.ndarray:
        """Area-weighted uniform samples of all visible surfaces (analog of
        load_env_glb_pointcloud; reference scripts/evaluation.py:135)."""
        rng = rng or np.random.default_rng(0)
        faces = []   # (origin, edge_u, edge_v)
        def add_box(lo, hi, inward):
            lo, hi = np.asarray(lo, np.float64), np.asarray(hi, np.float64)
            d = hi - lo
            # 6 faces of the box
            faces.extend([
                (np.array([lo[0], lo[1], lo[2]]), np.array([0, d[1], 0]), np.array([0, 0, d[2]])),   # x-
                (np.array([hi[0], lo[1], lo[2]]), np.array([0, d[1], 0]), np.array([0, 0, d[2]])),   # x+
                (np.array([lo[0], lo[1], lo[2]]), np.array([d[0], 0, 0]), np.array([0, 0, d[2]])),   # y-
                (np.array([lo[0], hi[1], lo[2]]), np.array([d[0], 0, 0]), np.array([0, 0, d[2]])),   # y+
                (np.array([lo[0], lo[1], lo[2]]), np.array([d[0], 0, 0]), np.array([0, d[1], 0])),   # z-
                (np.array([lo[0], lo[1], hi[2]]), np.array([d[0], 0, 0]), np.array([0, d[1], 0])),   # z+
            ])
        add_box(self.room_lo, self.room_hi, True)
        for lo, hi in self.obstacles:
            add_box(lo, hi, False)
        origins = np.stack([f[0] for f in faces])
        e_u = np.stack([f[1] for f in faces])
        e_v = np.stack([f[2] for f in faces])
        areas = np.linalg.norm(np.cross(e_u, e_v), axis=1)
        probs = areas / areas.sum()
        idx = rng.choice(len(faces), size=n, p=probs)
        us, vs = rng.uniform(size=(2, n, 1))
        pts = origins[idx] + us * e_u[idx] + vs * e_v[idx]
        return pts.astype(np.float32)

    def surface_area(self) -> float:
        """Total surface area (m^2) of all box faces — scales the GT
        sample count so NN spacing stays well under the 5 cm metric
        threshold on large scenes (r4 verdict: a fixed 100k cloud on a
        ~700 m^2 apartment has ~2.5 cm+ spacing artifacts)."""
        def box_area(lo, hi):
            d = np.asarray(hi, np.float64) - np.asarray(lo, np.float64)
            return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[0] * d[2])
        area = box_area(self.room_lo, self.room_hi)
        for lo, hi in self.obstacles:
            area += box_area(lo, hi)
        return float(area)

    def surface_distance(self, pts: np.ndarray) -> np.ndarray:
        """EXACT distance from each point to the nearest box surface
        (|SDF| of each axis-aligned box, min over boxes).  Replaces the
        est->sampled-GT NN distance in accuracy/FPR metrics: sampled-GT
        sparsity biased acc_distance by the GT NN spacing (the r4
        config-4 run read 9.3 cm acc / 81 % FPR purely from a 100k-point
        GT on a multi-room scene).  Analytic distance has no sampling
        floor.  Like the reference's full-GLB sampling
        (scripts/evaluation.py:135-168), buried faces (wall interiors)
        count as surface — same optimism on both sides of the parity."""
        p = np.asarray(pts, np.float64).reshape(-1, 3)
        best = np.full(len(p), np.inf)
        boxes = [(self.room_lo, self.room_hi)] + list(self.obstacles)
        for lo, hi in boxes:
            lo = np.asarray(lo, np.float64)
            hi = np.asarray(hi, np.float64)
            q = np.abs(p - (lo + hi) / 2.0) - (hi - lo) / 2.0
            outside = np.linalg.norm(np.maximum(q, 0.0), axis=1)
            inside = np.minimum(np.max(q, axis=1), 0.0)
            np.minimum(best, np.abs(outside + inside), out=best)
        return best.astype(np.float64)

    def gt_free_map(self, cell_size: float, grid_dim, map_center) -> np.ndarray:
        """Top-down free-space grid for 2D coverage eval (analog of
        test_utils.py:31 draw_map)."""
        gx, gz = int(grid_dim[0]), int(grid_dim[1])
        xs = (np.arange(gx) + 0.5 - gx // 2) * cell_size + map_center[0]
        zs = (np.arange(gz) + 0.5 - gz // 2) * cell_size + map_center[1]
        free = np.zeros((gz, gx), bool)
        for iz, z in enumerate(zs):
            for ix, x in enumerate(xs):
                free[iz, ix] = self.is_navigable((x, 0.0, z))
        return free


class SimObject:
    """Kinematic dynamic object (an extra box) with random-walk motion.

    Reference: SimObjects.py:5-163 SimObject — semantic id, translation /
    rotation accessors, `moving_forward_and_back`, `moving_randomly`
    (random yaw + bounce when the next position is non-navigable).
    """

    def __init__(self, scene: "BoxScene", semantic_id: int = 100,
                 size=(0.3, 0.6, 0.3), start_xz=(0.8, -0.8),
                 speed: float = 0.04, seed: int = 0):
        self.scene = scene
        self.semantic_id = int(semantic_id)
        self.size = np.asarray(size, np.float32)
        self.pos = np.array([start_xz[0], 0.0, start_xz[1]], np.float32)
        self.yaw = 0.0
        self.speed = float(speed)
        self.rng = np.random.default_rng(seed)
        self._dir = 1.0

    @property
    def translation(self) -> np.ndarray:
        return self.pos.copy()

    def set_translation(self, pos):
        self.pos = np.asarray(pos, np.float32)

    def aabb(self):
        half = self.size / 2
        lo = self.pos + np.array([-half[0], 0.0, -half[2]])
        hi = self.pos + np.array([half[0], self.size[1], half[2]])
        return tuple(lo), tuple(hi)

    def object_pose(self) -> np.ndarray:
        """4x4 world-from-object transform.  The box geometry is axis-
        aligned (yaw only steers the random-walk direction), so the
        canonical object frame is a pure translation — the analog of the
        reference's `object_pose` used to accumulate observations in the
        object frame (tester:508-550 store_filtered_obj_pointcloud)."""
        T = np.eye(4, dtype=np.float64)
        T[:3, 3] = self.pos
        return T

    def sample_surface_points(self, n: int, rng=None,
                              frame: str = "world") -> np.ndarray:
        """Uniform points on the object box's faces (GT cloud for
        evaluate_3d_object_reconstruction; reference tester:1212-1289).
        frame='object' returns canonical-frame points (reference compares
        est/GT in the object's canonical frame, tester:1215-1225)."""
        rng = rng or np.random.default_rng(0)
        lo, hi = self.aabb()
        if frame == "object":
            lo, hi = np.asarray(lo) - self.pos, np.asarray(hi) - self.pos
        lo, hi = np.asarray(lo), np.asarray(hi)
        ext = hi - lo
        # face areas: two each normal to x, y, z
        areas = np.array([ext[1] * ext[2], ext[1] * ext[2],
                          ext[0] * ext[2], ext[0] * ext[2],
                          ext[0] * ext[1], ext[0] * ext[1]])
        face = rng.choice(6, size=n, p=areas / areas.sum())
        u, v = rng.uniform(size=(2, n))
        pts = np.empty((n, 3), np.float32)
        axis = face // 2            # 0=x, 1=y, 2=z
        side = face % 2             # 0=lo face, 1=hi face
        for a in range(3):
            b, c = [i for i in range(3) if i != a]
            m = axis == a
            pts[m, a] = np.where(side[m] == 1, hi[a], lo[a])
            pts[m, b] = lo[b] + u[m] * ext[b]
            pts[m, c] = lo[c] + v[m] * ext[c]
        return pts

    def _try_move(self, delta) -> bool:
        nxt = self.pos + delta
        if self.scene.is_navigable((nxt[0], 0.0, nxt[2])):
            self.pos = nxt
            return True
        return False

    def moving_forward_and_back(self):
        """Oscillate along the current heading (SimObjects.py:84-92)."""
        d = np.array([np.sin(self.yaw), 0.0, np.cos(self.yaw)]) \
            * self.speed * self._dir
        if not self._try_move(d):
            self._dir *= -1.0

    def moving_randomly(self):
        """Random yaw jitter + bounce on non-navigable (SimObjects.py:94)."""
        self.yaw += self.rng.uniform(-0.4, 0.4)
        d = np.array([np.sin(self.yaw), 0.0, np.cos(self.yaw)]) * self.speed
        if not self._try_move(d):
            self.yaw = self.rng.uniform(0, 2 * np.pi)


@functools.partial(jax.jit, static_argnames=("camera",))
def _raycast_device(lo, hi, inward, seeds, c2w, camera: Camera):
    """Per-pixel nearest-hit AABB raycast, jitted (one tiny kernel).

    The simulator stands in for habitat-sim's C++/GL renderer (~ms per
    frame); a host-numpy raycast at 256² costs ~70 ms/step and would cap
    the episode benchmark at the *stand-in's* speed, not the framework's.
    With `device_obs` (default) rgb/depth stay on device — every hot
    consumer is jitted, so this matches a habitat deployment's single
    host->device upload better than a pull-then-reupload round trip;
    `device_obs=False` restores the reference's host boundary
    (SURVEY.md §3.1) for object/semantic episodes and A/B timing."""
    h, w = camera.height, camera.width
    ys = (jnp.arange(h, dtype=jnp.float32) - camera.cy) / camera.fy
    xs = (jnp.arange(w, dtype=jnp.float32) - camera.cx) / camera.fx
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    dirs_cam = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)   # (H, W, 3)
    dirs_w = jnp.einsum("ij,hwj->hwi", c2w[:3, :3], dirs_cam)
    origin = c2w[:3, 3]

    safe = jnp.where(jnp.abs(dirs_w) < 1e-9, 1e-9, dirs_w)
    inv_d = 1.0 / safe
    t0 = (lo[:, None, None, :] - origin) * inv_d[None]
    t1 = (hi[:, None, None, :] - origin) * inv_d[None]
    tmin = jnp.minimum(t0, t1).max(axis=-1)
    tmax = jnp.maximum(t0, t1).min(axis=-1)
    t_hit = jnp.where(inward[:, None, None], tmax, tmin)
    hit_ok = (tmax >= jnp.maximum(tmin, 0.0)) & (t_hit > 1e-4)
    t_hit = jnp.where(hit_ok, t_hit, jnp.inf)
    best = jnp.argmin(t_hit, axis=0)                             # (H, W)
    t_best = t_hit.min(axis=0)
    t_best = jnp.where(jnp.isfinite(t_best), t_best, 0.0)

    hit_pt = origin + dirs_w * t_best[..., None]
    # rays are scaled so dirs_cam.z == 1, hence t IS the camera z-depth
    z_depth = t_best
    seed = seeds[best]
    checker = (jnp.floor(hit_pt[..., 0] / 0.5)
               + jnp.floor(hit_pt[..., 1] / 0.5)
               + jnp.floor(hit_pt[..., 2] / 0.5)) % 2.0
    base_r = 0.25 + 0.5 * jnp.abs(jnp.sin(seed * 2.1 + 1.0))
    base_g = 0.25 + 0.5 * jnp.abs(jnp.sin(seed * 3.7 + 2.0))
    base_b = 0.25 + 0.5 * jnp.abs(jnp.sin(seed * 5.3 + 3.0))
    shade = 0.75 + 0.25 * checker
    stripes = 0.85 + 0.15 * jnp.sin(hit_pt[..., 0] * 7.0) * jnp.sin(
        hit_pt[..., 2] * 7.0)
    rgb = jnp.stack([base_r * shade * stripes, base_g * shade,
                     base_b * (1.25 - 0.25 * checker)], axis=-1)
    return jnp.clip(rgb, 0.0, 1.0), z_depth, best


@functools.partial(jax.jit, static_argnames=("camera",))
def _raycast_device_batch(lo, hi, inward, seeds, c2ws, camera: Camera):
    """P-pose raycast in ONE launch (vmapped _raycast_device).  The
    2000-pose eval protocol previously paid one GT-render launch + one
    image pull per pose — with the batched SLAM renders this was the
    remaining per-pose dispatch sink of eval_navigation."""
    return jax.vmap(
        lambda c: _raycast_device(lo, hi, inward, seeds, c, camera))(c2ws)


def _raycast(boxes: _Boxes, c2w, camera: Camera):
    """Per-pixel nearest-hit AABB raycast.  Returns (rgb, z_depth, hit_id)
    as numpy (host-side observations, like habitat's)."""
    out = _raycast_device(
        jnp.asarray(boxes.lo), jnp.asarray(boxes.hi),
        jnp.asarray(boxes.inward), jnp.asarray(boxes.color_seed),
        jnp.asarray(np.asarray(c2w, np.float32)), camera)
    # ONE batched pull: on a tunneled TPU each separate device->host read
    # pays the full round-trip latency (~tens of ms)
    rgb, z, best = jax.device_get(out)
    return rgb.astype(np.float32), z.astype(np.float32), best


class FakeSim:
    """Habitat-free embodied sim over a BoxScene.

    API shape follows what the episode driver needs from the reference's
    HabitatDataScene/habitat.Env (reset / step / get_observations /
    is_navigable / intrinsics), with actions 1=fwd, 2=left, 3=right.
    """

    def __init__(self, scene: BoxScene, camera: Camera,
                 forward_step: float = 0.065, turn_angle: float = 10.0,
                 cam_height: float = 1.25, seed: int = 0,
                 dynamic_object: SimObject | None = None,
                 device_obs: bool = True,
                 object_dynamic: bool = False):
        self.scene = scene
        self.camera = camera
        self.forward_step = float(forward_step)
        self.turn_angle = float(turn_angle)
        self.cam_height = float(cam_height)
        self._boxes = scene.boxes()
        self.dynamic_object = dynamic_object
        # object_dynamic: the driver moves the object between steps
        # (--dynamic_scene), so a prefetched raycast would show a stale
        # object position.  A static object (--object_scene alone) keeps
        # the prefetch path: its raycast is dispatched BEFORE the step's
        # mapping work, so the in-order device stream finishes it first
        # and the step's pull doesn't wait behind the mapping events.
        self.object_dynamic = bool(object_dynamic)
        # device_obs: rgb/depth stay JAX device arrays (all hot consumers —
        # SLAM, occupancy, point-cloud subsample — are jitted; a habitat
        # deployment pays ONE host->device upload, while pulling here just
        # to re-upload pays a tunnel round trip both ways).  Object/semantic
        # episodes keep device rgb/depth too: only the small int32 semantic
        # mask is pulled per step (its .sum() gates host control flow).
        self.device_obs = bool(device_obs)
        self.rng = np.random.default_rng(seed)
        self.c2w = np.eye(4, dtype=np.float32)
        self.collided_last = False
        self.reset()

    def _boxes_now(self):
        """Static scene boxes + (optionally) the dynamic object's box."""
        if self.dynamic_object is None:
            return self._boxes, -1
        lo, hi = self.dynamic_object.aabb()
        b = self._boxes
        obj_idx = b.lo.shape[0]
        boxes = _Boxes(
            lo=np.concatenate([b.lo, np.asarray([lo], np.float32)]),
            hi=np.concatenate([b.hi, np.asarray([hi], np.float32)]),
            inward=np.concatenate([b.inward, np.asarray([False])]),
            color_seed=np.concatenate([b.color_seed,
                                       np.asarray([17.0], np.float32)]))
        return boxes, obj_idx

    def _boxes_dev(self, boxes):
        """Device copies of the box arrays, cached by identity: the static
        scene returns the same _Boxes object every step, and re-uploading
        its 4 arrays cost 4 host->device RPCs per step for bytes that
        never change.  Dynamic-object frames build fresh arrays and skip
        the cache."""
        c = getattr(self, "_boxes_dev_cache", None)
        if c is not None and c[0] is boxes:
            return c[1]
        dev = (jnp.asarray(boxes.lo), jnp.asarray(boxes.hi),
               jnp.asarray(boxes.inward), jnp.asarray(boxes.color_seed))
        if boxes is self._boxes:
            self._boxes_dev_cache = (boxes, dev)
        return dev

    def reset(self, start_xz=(0.0, 0.0), yaw: float = 0.0):
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        # CV camera: x right, y down, z forward: flip x and y of the y-up frame
        R = R @ np.diag([-1.0, -1.0, 1.0]).astype(np.float32)
        self.c2w = np.eye(4, dtype=np.float32)
        self.c2w[:3, :3] = R
        self.c2w[:3, 3] = [start_xz[0], self.cam_height, start_xz[1]]
        self.collided_last = False
        return self.get_observations()

    def get_observations(self):
        boxes, obj_idx = self._boxes_now()
        if self.device_obs:
            lo_d, hi_d, in_d, cs_d = self._boxes_dev(boxes)
            rgb, depth, hit = _raycast_device(
                lo_d, hi_d, in_d, cs_d,
                jnp.asarray(np.asarray(self.c2w, np.float32)), self.camera)
            obs = dict(rgb=rgb, depth=depth, c2w=self.c2w.copy())
            if self.dynamic_object is not None:
                sem = jnp.where(hit == obj_idx,
                                self.dynamic_object.semantic_id,
                                0).astype(jnp.int32)
                obs["semantic"] = np.asarray(sem)
            return obs
        rgb, depth, hit = _raycast(boxes, self.c2w, self.camera)
        obs = dict(rgb=rgb, depth=depth, c2w=self.c2w.copy())
        if self.dynamic_object is not None:
            sem = np.where(hit == obj_idx, self.dynamic_object.semantic_id, 0)
            obs["semantic"] = sem.astype(np.int32)
        return obs

    def _next_pose(self, action_id: int):
        next_c2w = compute_next_campos(self.c2w, int(action_id),
                                       self.forward_step, self.turn_angle)
        collided = False
        if action_id == 1:
            nxt = next_c2w[:3, 3]
            if not self.scene.is_navigable((nxt[0], 0.0, nxt[2])):
                collided = True
                next_c2w = self.c2w      # blocked: stay (habitat-style stop)
        return np.asarray(next_c2w, np.float32), collided

    def prefetch(self, action_id: int):
        """Dispatch the NEXT frame's raycast asynchronously (the action is
        already known whenever the planner's queue is non-empty).  The
        episode driver calls this before its heavy device dispatches, so
        the observation is computed concurrently and `step` only pays the
        pull.  No sim state is mutated until `step` resolves it."""
        if self.dynamic_object is not None and self.object_dynamic:
            return            # object state may still change this frame
        next_c2w, collided = self._next_pose(int(action_id))
        boxes, obj_idx = self._boxes_now()
        lo_d, hi_d, in_d, cs_d = self._boxes_dev(boxes)
        out = _raycast_device(
            lo_d, hi_d, in_d, cs_d,
            jnp.asarray(next_c2w), self.camera)
        sem_dev = None
        if not self.device_obs:
            # host-observation mode pulls in step(): enqueue the D2H right
            # behind the raycast, ahead of the step's mapping dispatches,
            # so the pull reads landed data instead of draining the stream
            for a in out:
                if hasattr(a, "copy_to_host_async"):
                    a.copy_to_host_async()
        elif self.dynamic_object is not None:
            # device mode: precompute the semantic mask and enqueue ITS
            # D2H now — step() then pulls landed data
            _rgb, _z, best = out
            sem_dev = jnp.where(best == obj_idx,
                                self.dynamic_object.semantic_id,
                                0).astype(jnp.int32)
            if hasattr(sem_dev, "copy_to_host_async"):
                sem_dev.copy_to_host_async()
        self._prefetched = (int(action_id), next_c2w, collided, out, obj_idx,
                            sem_dev)

    def step(self, action_id: int):
        pf = getattr(self, "_prefetched", None)
        self._prefetched = None
        if (pf is not None and pf[0] == int(action_id)
                and not (self.dynamic_object is not None
                         and self.object_dynamic)):
            _a, next_c2w, collided, out, obj_idx, sem_dev = pf
            self.c2w = next_c2w
            self.collided_last = collided
            if self.device_obs:
                rgb, z, _best = out
                obs = dict(rgb=rgb, depth=z, c2w=self.c2w.copy())
                if sem_dev is not None:
                    obs["semantic"] = np.asarray(sem_dev)
                return obs
            rgb, z, best = jax.device_get(out)
            obs = dict(rgb=rgb.astype(np.float32),
                       depth=z.astype(np.float32), c2w=self.c2w.copy())
            if self.dynamic_object is not None:
                sem = np.where(best == obj_idx,
                               self.dynamic_object.semantic_id, 0)
                obs["semantic"] = sem.astype(np.int32)
            return obs
        next_c2w, collided = self._next_pose(int(action_id))
        self.c2w = next_c2w
        self.collided_last = collided
        return self.get_observations()

    def set_pose(self, c2w):
        self.c2w = np.asarray(c2w, np.float32)

    def render_at(self, c2w):
        boxes, _ = self._boxes_now()
        rgb, depth, _hit = _raycast(boxes, np.asarray(c2w, np.float32),
                                    self.camera)
        return rgb, depth

    def render_at_batch(self, c2ws):
        """GT renders for (P, 4, 4) poses in one launch; returns DEVICE
        arrays (P, H, W, 3) rgb and (P, H, W) depth so eval metric
        launches can consume them without a host round trip."""
        boxes, _ = self._boxes_now()
        rgb, depth, _best = _raycast_device_batch(
            jnp.asarray(boxes.lo), jnp.asarray(boxes.hi),
            jnp.asarray(boxes.inward), jnp.asarray(boxes.color_seed),
            jnp.asarray(np.asarray(c2ws, np.float32)), self.camera)
        return rgb, depth

    def is_navigable(self, pos) -> bool:
        return self.scene.is_navigable(pos)

    @property
    def intrinsics(self) -> np.ndarray:
        return np.asarray(self.camera.intrinsics)


class ReplaySim:
    """Plays back a recorded trajectory (TrajReader analog;
    reference tester_gaussians_navigation.py:299 TrajReader policy)."""

    def __init__(self, colors, depths, c2ws):
        self.colors = [np.asarray(c, np.float32) for c in colors]
        self.depths = [np.asarray(d, np.float32) for d in depths]
        self.c2ws = [np.asarray(p, np.float32) for p in c2ws]
        self.t = 0

    def __len__(self):
        return len(self.colors)

    def reset(self):
        self.t = 0
        return self.get_observations()

    def get_observations(self):
        i = min(self.t, len(self.colors) - 1)
        return dict(rgb=self.colors[i], depth=self.depths[i],
                    c2w=self.c2ws[i].copy())

    def step(self, action_id: int = 0):
        self.t += 1
        return self.get_observations()
