"""GaussianObjectSLAM — mask-aware object-centric reconstruction.

Reference: models/SLAM/gaussian_object.py:536-2220 GaussianObjectSLAM — a
second Gaussian-SLAM instance dedicated to a dynamic/novel object:
  * init / densify seed ONLY object-mask pixels (:595-663);
  * the mapping loss is mask-restricted (calc_loss_mask);
  * Gaussians that project OUTSIDE the current object mask with active
    opacity are pruned (slam_external.py:345-408 obj-aware prune);
  * keyframes carry the object mask and the overlap selection is
    mask-aware (keyframe_selection.py:99-118);
  * compute_Hessian covers means+opacity+scales+rotations (:1940-2045)
    and P-optimality criteria (T-opt / D-opt) score candidate poses from
    Hutchinson diag / per-splat block JᵀJ estimates (:2049-2176,
    :1591-1732).

TPU design: reuses the fused mapping machinery with a mask channel; the
Hutchinson probes are a vmap over cotangents of one VJP (ops/fisher.py).

Round-2 optimization pass (scene-path standard, VERDICT r1 item 3):
  * candidate scoring is batched over pose chunks — ONE XLA launch and
    ONE device pull per chunk (`_obj_h11_batch` + the jitted scorers),
    replacing the per-pose python loops with a blocking float() each;
  * H_train (fisher-11 and P-opt diag) is cached per
    (keyframes, param-version) and incrementally topped up when only
    keyframes were appended — per-keyframe Hutchinson keys are derived
    with fold_in(base, kf_id) so a top-up equals a full recompute;
  * object keyframes and masks keep device-resident copies; the mapping
    window is stacked on device instead of re-uploading per event.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.camera import Camera
from ..ops.fisher import (block_jtj, dopt_score_blocks, hutchinson_diag,
                          topt_score_blocks)
from ..ops.image import calc_ssim
from .gaussian_state import adam_init, adam_step
from .slam import (GaussianSLAM, MappingConfig, _gaussian_rendervars,
                   _render_rgbd)


def _masked_mapping_loss(params, n_active, w2c, gt_color, gt_depth, obj_mask,
                         camera, settings, mc: MappingConfig, bins=None):
    """Mask-restricted photometric + depth loss (reference
    slam_helpers.py:46 calc_loss_mask, mapping branch)."""
    out = _render_rgbd(camera, settings, params, n_active, w2c, bins=bins)
    depth = out["depth"]
    m = obj_mask & (gt_depth > 0) & jnp.isfinite(depth)
    m = jax.lax.stop_gradient(m)
    denom = jnp.maximum(jnp.sum(m), 1)
    depth_l1 = jnp.sum(jnp.abs(gt_depth - depth) * m) / denom
    mf = m[..., None].astype(jnp.float32)
    im_l1 = jnp.sum(jnp.abs(out["im"] - gt_color) * mf) / (3 * denom)
    ssim = calc_ssim(out["im"] * mf, gt_color * mf)
    im_loss = 0.8 * im_l1 + 0.2 * (1.0 - ssim)
    loss = mc.depth_weight * depth_l1 + mc.im_weight * im_loss
    return loss, dict(depth_l1=depth_l1, im_loss=im_loss)


@functools.partial(jax.jit, static_argnames=("camera", "settings", "mc"))
def _object_mapping_phase(state, kf_colors, kf_depths, kf_w2cs, kf_masks,
                          frame_choices, camera: Camera, settings, mc):
    """Masked analog of models/slam._mapping_phase (no in-loop prune; the
    object path prunes by mask after the phase).  Binning tables are
    frozen per window frame for the phase, like the scene mapping."""
    lrs = dict(means3D=mc.lr_means3D, rgb_colors=mc.lr_rgb,
               unnorm_rotations=mc.lr_rots, logit_opacities=mc.lr_logit_op,
               log_scales=mc.lr_log_scales)
    params = state.params()
    opt = adam_init(params)
    active = state.active

    from ..ops.binning import TileBins, tile_bin
    from ..ops.projection import preprocess as _preproc
    ntx = -(-camera.width // settings.tile_size)
    nty = -(-camera.height // settings.tile_size)

    def bin_frame(w2c):
        mcam, scl, qt, _op = _gaussian_rendervars(params, w2c)
        prep = _preproc(mcam, scl, qt, camera, active=active)
        b = tile_bin(prep.mean2d, prep.radius, prep.depth, prep.valid,
                     camera.width, camera.height, settings.tile_size,
                     settings.max_per_tile)
        return b.table, b.slot_valid, b.counts, b.overflow
    tables, svalids, counts_all, overflows = jax.lax.map(bin_frame, kf_w2cs)
    bin_overflow = jnp.sum(overflows)

    def bins_at(i):
        return TileBins(table=tables[i], slot_valid=svalids[i],
                        counts=counts_all[i], overflow=overflows[i],
                        n_tiles_x=ntx, n_tiles_y=nty)

    def loss_fn(p, w2cs_i, colors_i, depths_i, masks_i, idx_i):
        # frames_per_iter minibatch, same as the scene _mapping_phase:
        # mean loss of F frames per Adam step in num_iters/F launches
        def one(w2c, color, depth, mask, i):
            loss, _aux = _masked_mapping_loss(
                p, state.n_active, w2c, color, depth, mask, camera,
                settings, mc, bins=bins_at(i))
            return loss
        return jnp.mean(jax.vmap(one)(w2cs_i, colors_i, depths_i,
                                      masks_i, idx_i))

    grad_fn = jax.value_and_grad(loss_fn)

    def body(carry, it):
        params, opt = carry
        i = frame_choices[it]                     # (F,) frame indices
        loss, grads = grad_fn(params, kf_w2cs[i], kf_colors[i],
                              kf_depths[i], kf_masks[i], i)
        params, opt = adam_step(opt, params, grads, lrs, eps=1e-15)
        return (params, opt), loss

    n_steps = max(mc.num_iters // mc.frames_per_iter, 1)
    (params, _opt), losses = jax.lax.scan(body, (params, opt),
                                          jnp.arange(n_steps))
    return state.replace_params(params), losses, bin_overflow


@functools.partial(jax.jit, static_argnames=("camera",))
def _project_outside_mask(means3D, n_active, w2c, obj_mask, opacities,
                          camera: Camera, alpha_thresh: float):
    """Active Gaussians projecting outside the current object mask
    (reference slam_external.py:317 get_gaussians_outside_mask)."""
    mc = means3D @ w2c[:3, :3].T + w2c[:3, 3]
    z = jnp.maximum(mc[:, 2], 1e-6)
    u = camera.fx * mc[:, 0] / z + camera.cx
    v = camera.fy * mc[:, 1] / z + camera.cy
    h, w = obj_mask.shape
    in_img = (mc[:, 2] > 0) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    iu = jnp.clip(jnp.round(u), 0, w - 1).astype(jnp.int32)
    iv = jnp.clip(jnp.round(v), 0, h - 1).astype(jnp.int32)
    inside = in_img & obj_mask[iv, iu]
    active = jnp.arange(means3D.shape[0]) < n_active
    outside_active = (~inside) & active & (opacities >= alpha_thresh)
    return outside_active, inside & active


def _h11_layout(out):
    """compute_Hessian's (N, 11) layout: [means(3), opacity(1), scales(3),
    rotations(4)] (reference gaussian_object.py:1940-2045)."""
    return jnp.concatenate([out["means"], out["opacity"], out["scales"],
                            out["rotations"]], axis=-1)


@functools.partial(jax.jit, static_argnames=("camera", "settings",
                                             "n_probes"))
def _obj_h11_batch(params, n_active, w2cs, keys, camera: Camera, settings,
                   n_probes: int):
    """Hutchinson (B, N, 11) Hessian diagonals for a batch of poses in ONE
    XLA launch (replaces the reference's per-pose python loop,
    gaussian_object.py:1600)."""
    active = jnp.arange(params["means3D"].shape[0]) < n_active
    scales = jnp.exp(params["log_scales"])
    quats = params["unnorm_rotations"]
    opac = jax.nn.sigmoid(params["logit_opacities"][:, 0])
    colors = params["rgb_colors"]

    def one(w2c, key):
        mc = params["means3D"] @ w2c[:3, :3].T + w2c[:3, 3]
        out = hutchinson_diag(camera, mc, scales, quats, opac, colors, key,
                              n_probes=n_probes, active=active,
                              settings=settings)
        return _h11_layout(out)
    return jax.vmap(one)(w2cs, keys)


@functools.partial(jax.jit, static_argnames=("camera", "settings",
                                             "n_probes"))
def _obj_fisher_scores(params, n_active, w2cs, keys, h_inv, camera: Camera,
                       settings, n_probes: int):
    """Fisher EIG per pose: sum(H_pose * 1/(H_train+0.1)) over the 11-dim
    Hessian (reference gaussian_object.py:1591-1625), batched."""
    h = _obj_h11_batch(params, n_active, w2cs, keys, camera, settings,
                       n_probes)
    return jnp.einsum("bnd,nd->b", h, h_inv)


@functools.partial(jax.jit, static_argnames=("camera", "settings",
                                             "n_probes", "criterion"))
def _obj_popgs_scores(params, n_active, w2cs, keys, h_train11, lam,
                      camera: Camera, settings, n_probes: int,
                      criterion: str):
    """T-opt / D-opt scores per pose from diag JᵀJ updates (reference
    gaussian_object.py:1632-1672), batched over poses.

    Sums run over ACTIVE rows only: inactive (zero) rows would add a
    constant -count/λ T-opt offset that is ranking-neutral in exact
    arithmetic but absorbs the between-pose deltas in f32."""
    h = _obj_h11_batch(params, n_active, w2cs, keys, camera, settings,
                       n_probes)                      # (B, N, 11)
    active = (jnp.arange(params["means3D"].shape[0]) < n_active)[None, :, None]
    if criterion == "topt":
        inv = 1.0 / jnp.maximum(h_train11[None] + h + lam, 1e-12)
        return -jnp.sum(jnp.where(active, inv, 0.0), axis=(1, 2))
    hm = jnp.maximum(h_train11[None] + lam, 1e-12)
    hpi = jnp.maximum(hm + h, 1e-12)
    gain = jnp.log(hpi) - jnp.log(hm)                 # 0 where h == 0
    return jnp.sum(jnp.where(active, gain, 0.0), axis=(1, 2))


@functools.partial(jax.jit, static_argnames=("camera", "settings",
                                             "n_probes", "criterion"))
def object_path_scores(params, n_active, h_train11, acc_w2cs, acc_valid,
                       lengths, final_eigs, keys, lam, w_point, w_end,
                       camera: Camera, settings, n_probes: int,
                       criterion: str):
    """Batched object path evaluation — ALL paths in one launch.

    Reference semantics (tester:1977-2107 path_object_evaluation fisher /
    :2109-2204 path_evaluation_popgs): per path, per acc step, score the
    pose against the running per-path prior and fold its information in.
    acc_w2cs: (P, A', 4, 4) poses at the acc steps, acc_valid: (P, A'),
    keys: (A', P, 2) per-step Hutchinson keys, lengths: (P,) full action
    counts.  criterion: 'fisher' | 'topt' | 'dopt'.
    """
    n_paths = acc_w2cs.shape[0]
    active = (jnp.arange(params["means3D"].shape[0])
              < n_active)[None, :, None]

    def step(carry, inp):
        h_paths, totals = carry                    # (P, N, 11), (P,)
        w2cs_s, ok_s, keys_s = inp
        cur = _obj_h11_batch(params, n_active, w2cs_s, keys_s, camera,
                             settings, n_probes)   # (P, N, 11)
        if criterion == "fisher":
            raw = jnp.sum(cur / (h_paths + lam), axis=(1, 2))
            point = jnp.log(jnp.maximum(raw, 1e-30))
        elif criterion == "topt":
            inv = 1.0 / jnp.maximum(h_paths + cur + lam, 1e-12)
            point = -jnp.sum(jnp.where(active, inv, 0.0), axis=(1, 2))
        else:                                      # dopt
            hm = jnp.maximum(h_paths + lam, 1e-12)
            gain = jnp.log(jnp.maximum(hm + cur, 1e-12)) - jnp.log(hm)
            point = jnp.sum(jnp.where(active, gain, 0.0), axis=(1, 2))
        totals = totals + jnp.where(ok_s, w_point * point, 0.0)
        h_paths = h_paths + jnp.where(ok_s, 1.0, 0.0)[:, None, None] * cur
        return (h_paths, totals), None

    h0 = jnp.broadcast_to(h_train11[None], (n_paths,) + h_train11.shape)
    (_h, totals), _ = jax.lax.scan(
        step, (h0, jnp.zeros((n_paths,))),
        (jnp.swapaxes(acc_w2cs, 0, 1), jnp.swapaxes(acc_valid, 0, 1), keys))
    length = jnp.maximum(lengths.astype(jnp.float32), 1.0)
    return jnp.where(w_end > 0,
                     totals / length + w_end * final_eigs,
                     (totals + final_eigs) / length)


class GaussianObjectSLAM(GaussianSLAM):
    """Object-centric SLAM with the reference GaussianObjectSLAM API."""

    def __init__(self, cfg, eval_dir: str | None = None,
                 start_frame_idx: int = 0):
        super().__init__(cfg, eval_dir=eval_dir)
        # the object state holds ONE object's splats, not the scene's:
        # re-seat it at a small capacity (grown on demand) so the 120
        # Adam iters every map_obj_every steps don't preprocess/optimize
        # the scene-sized (131k for eccv) slot array.  8k slots cover a
        # full-frame mask at downsample 4 with room to grow.
        from .gaussian_state import empty_state
        self.state = empty_state(int(cfg.tpu.get("object_capacity", 8192)))
        # object renders cover a small screen region with shallow per-tile
        # depth; the blend costs T*K*P whether slots are valid or not, so
        # the scene's K (256) makes a ~500-splat object event cost as much
        # as a 19k-Gaussian scene event.  K=64 cuts it ~4x; the overflow
        # guard below doubles it (one bucketed recompile) if a close-up
        # view ever truncates.
        k_obj = int(cfg.tpu.get("object_max_per_tile", 64))
        self.settings = self.settings._replace(
            max_per_tile=k_obj, chunk=min(64, k_obj))
        self.start_frame_idx = int(start_frame_idx)
        self.map_obj_every = int(cfg.map_obj_every)
        self.keyframe_obj_every = int(cfg.keyframe_obj_every)
        self.hutch_probes = int(cfg.tpu.hutchinson_probes)
        self.outside_alpha_thresh = 0.01
        self.keyframe_masks: list[np.ndarray] = []
        self._masks_dev: list = []           # device-resident mask copies
        self._key = jax.random.PRNGKey(self.start_frame_idx)
        # base key for per-keyframe Hutchinson probes: fold_in(base, kf_id)
        # makes the incremental H_train top-up equal a full recompute
        self._kf_base_key = jax.random.PRNGKey(self.start_frame_idx + 7919)
        self.obj_pose_chunk = int(cfg.tpu.get("object_pose_chunk", 8))
        # H_train keyframe budget per planning event (0 = exact full sum).
        # The reference recomputes the FULL keyframe sum every planning
        # event (gaussian_object.py:1553-1585), O(K) with K growing ~400
        # by step 1000; since mapping bumps _param_version every
        # map_obj_every=2 steps, the cache never survives an event and
        # object planning cost grows linearly with episode length.  A
        # strided subsample of W keyframes spanning the WHOLE history
        # (scaled by K/W) keeps the prior's coverage and magnitude while
        # bounding each event at O(W) — candidate rankings match the
        # exact prior (Spearman gate in tests/test_object_slam.py).
        self.h_train_window = int(cfg.tpu.get("object_h_train_window", 64))

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _kf_keys(self, kf_ids):
        return jnp.stack([jax.random.fold_in(self._kf_base_key, int(i))
                          for i in kf_ids])

    def _pose_keys(self, n):
        base = self._next_key()
        return jnp.stack([jax.random.fold_in(base, i) for i in range(n)])

    # -- lifecycle ----------------------------------------------------------
    def init(self, color, depth, w2c=None, mask=None):
        """Seed only masked pixels (reference gaussian_object.py:595-663)."""
        color, depth = self._prep_inputs(color, depth)
        if mask is None:
            mask = np.ones_like(depth, bool)
        mask = np.asarray(mask, bool).reshape(depth.shape)
        w2c = np.eye(4, dtype=np.float32) if w2c is None \
            else np.asarray(w2c, np.float32)
        self.frame_idx = 0
        self.poses_w2c = [w2c]
        from .slam import _init_first_frame
        self._ensure_capacity(int(mask.sum()) + 16)
        color_dev, depth_dev = jnp.asarray(color), jnp.asarray(depth)
        mask_dev = jnp.asarray(mask)
        state, _dropped, n_added = _init_first_frame(
            self.state, color_dev, jnp.where(mask_dev, depth_dev, 0.0),
            jnp.asarray(w2c), 0.01, self.camera)
        self.state = state
        self.keyframes.append(color, depth, w2c, 0,
                              color_dev=color_dev, depth_dev=depth_dev)
        self.keyframe_masks.append(mask)
        self._masks_dev.append(mask_dev)
        self.keyframe_time_indices.append(0)
        self.initialized = True
        return int(n_added)

    def track_rgbd(self, color, depth, gt_w2c=None, action=None,
                   obj_mask_2d=None, step: int | None = None,
                   allow_map: bool = True):
        """allow_map=False vetoes the mapping/keyframe events for this
        frame (tracking still runs) — the driver's DINO distinctiveness
        gate uses it to skip frames too similar to the accepted bank
        (reference tester:628-768 gating contract)."""
        if not self.initialized:
            self.init(color, depth, gt_w2c, obj_mask_2d)
            return
        color, depth = self._prep_inputs(color, depth)
        mask = (np.ones(depth.shape, bool) if obj_mask_2d is None
                else np.asarray(obj_mask_2d, bool).reshape(depth.shape))
        time_idx = self.frame_idx + 1
        w2c = (np.asarray(gt_w2c, np.float32) if gt_w2c is not None
               else self.poses_w2c[-1])
        self.poses_w2c.append(w2c)

        is_map = (allow_map and mask.sum() > 0
                  and (time_idx + 1) % self.map_obj_every == 0)
        is_kf = (allow_map and mask.sum() > 0
                 and (time_idx + 1) % self.keyframe_obj_every == 0)
        # upload the frame ONCE for both the mapping event and the keyframe
        devs = None
        if is_map or is_kf:
            devs = (jnp.asarray(color), jnp.asarray(depth), jnp.asarray(mask))
        if is_map:
            self._object_mapping_event(color, depth, w2c, mask, time_idx,
                                       devs=devs)
        if is_kf:
            self.keyframes.append(color, depth, w2c, time_idx,
                                  color_dev=devs[0], depth_dev=devs[1])
            self.keyframe_masks.append(mask)
            self._masks_dev.append(devs[2])
            self.keyframe_time_indices.append(time_idx)
        self.frame_idx = time_idx

    def _object_mapping_event(self, color, depth, w2c, mask, time_idx,
                              devs=None):
        # densify only masked pixels: feed a mask-zeroed depth so the
        # candidate grid ignores everything else
        from .slam import _densify
        if devs is None:
            devs = (jnp.asarray(color), jnp.asarray(depth),
                    jnp.asarray(mask))
        color_dev, depth_dev, mask_dev = devs
        ds = self.mc.downsample_pcd
        self._ensure_capacity(
            (self.camera.height // ds) * (self.camera.width // ds))
        self.state, _dropped, _added, _overflow = _densify(
            self.state, color_dev, jnp.where(mask_dev, depth_dev, 0.0),
            jnp.asarray(w2c), float(time_idx), self.camera, self.settings,
            self.mc)

        num_kf = int(self.cfg.mapping_window_size) - 2
        from .keyframes import select_keyframes_overlap
        # keyframe overlap selection is host-side; with device-resident
        # observations this is the ONE host pull per mapping event (the
        # per-step rgb/depth pulls are gone — driver passes device obs)
        depth_h = np.asarray(depth)
        selected = select_keyframes_overlap(
            np.where(mask, depth_h, 0.0)[None], w2c, self.intrinsics,
            self.keyframes, num_kf, rng=self.rng)
        if len(self.keyframes) > 0:
            selected.append(len(self.keyframes) - 1)
        # window stacked from DEVICE-resident keyframe copies (uploaded
        # once at append) — no per-event ~25 MB host->device re-upload
        win_c = [self.keyframes.color_dev(i) for i in selected] + [color_dev]
        win_d = [self.keyframes.depth_dev(i) for i in selected] + [depth_dev]
        win_w = [self.keyframes.w2cs[i] for i in selected] + [w2c]
        win_m = [self._mask_dev(i) for i in selected] + [mask_dev]
        b = len(win_c)
        # fixed-size window batch (one compile per episode; see slam.py)
        b_max = int(self.cfg.mapping_window_size)
        while len(win_c) < b_max:
            win_c.append(win_c[-1]); win_d.append(win_d[-1])
            win_w.append(win_w[-1]); win_m.append(win_m[-1])
        win_c, win_d = win_c[:b_max], win_d[:b_max]
        win_w, win_m = win_w[:b_max], win_m[:b_max]
        n_steps = max(self.mc.num_iters // self.mc.frames_per_iter, 1)
        choices = self.rng.integers(
            0, min(b, b_max),
            size=(n_steps, self.mc.frames_per_iter))
        # deferred overflow guard from the PREVIOUS event (pulling the
        # counter immediately would drain the stream behind scene mapping)
        self._flush_pending_bump()
        self.state, losses, bin_overflow = _object_mapping_phase(
            self.state, jnp.stack(win_c), jnp.stack(win_d),
            jnp.asarray(np.stack(win_w)), jnp.stack(win_m),
            jnp.asarray(choices, jnp.int32),
            self.camera, self.settings, self.mc)
        self.last_losses = losses     # device handle; pulled lazily
        self._pending_bump = (bin_overflow, b_max)

        # object-aware pruning: drop out-of-mask active Gaussians
        # (reference slam_external.py:345-408; done once per mapping event
        # here instead of inside the iteration loop)
        opac = jax.nn.sigmoid(self.state.logit_opacities[:, 0])
        outside, _inside = _project_outside_mask(
            self.state.means3D, self.state.n_active, jnp.asarray(w2c),
            jnp.asarray(mask), opac, self.camera, self.outside_alpha_thresh)
        # also low-opacity prune (pruning_dict semantics)
        low = opac < self.mc.prune_thresh
        keep = ~(outside | low)
        from .gaussian_state import prune_compact
        self.state, _order = prune_compact(self.state, keep)
        # parameters changed -> invalidate the cached object H_train
        self._param_version += 1

    def _mask_dev(self, i: int):
        if self._masks_dev[i] is None:
            self._masks_dev[i] = jnp.asarray(self.keyframe_masks[i])
        return self._masks_dev[i]

    def count_gaussians_vs_mask(self, w2c, obj_mask_2d,
                                alpha_thresh: float = 0.01):
        """(in_count, out_count) of active (alpha >= thresh) Gaussians vs
        the mask (reference gaussian_object.py:359-428)."""
        opac = jax.nn.sigmoid(self.state.logit_opacities[:, 0])
        outside, inside = _project_outside_mask(
            self.state.means3D, self.state.n_active,
            jnp.asarray(np.asarray(w2c, np.float32)),
            jnp.asarray(np.asarray(obj_mask_2d, bool)), opac, self.camera,
            alpha_thresh)
        return int(jnp.sum(inside)), int(jnp.sum(outside))

    # -- Fisher / P-optimality ------------------------------------------------
    def _hutch(self, w2c, n_probes=None):
        params = self.state.params()
        w2c = jnp.asarray(np.asarray(w2c, np.float32))
        mc = params["means3D"] @ w2c[:3, :3].T + w2c[:3, 3]
        return hutchinson_diag(
            self.camera, mc, jnp.exp(params["log_scales"]),
            params["unnorm_rotations"],
            jax.nn.sigmoid(params["logit_opacities"][:, 0]),
            params["rgb_colors"], self._next_key(),
            n_probes=n_probes or self.hutch_probes,
            active=jnp.arange(self.state.capacity) < self.state.n_active,
            settings=self.settings)

    def compute_Hessian(self, rel_w2c, return_points: bool = False,
                        random_gaussian_params=None, return_pose: bool = False):
        """Object variant returns H over means+opacity+scales+rotations
        (N, 11) (reference gaussian_object.py:1940-2045)."""
        out = self._hutch(rel_w2c)
        h = jnp.concatenate([out["means"], out["opacity"], out["scales"],
                             out["rotations"]], axis=-1)
        if not return_points:
            h = h.reshape(-1)
        if return_pose:
            return h, jnp.eye(6)
        return h

    def estimate_diag_JtJ_simple(self, w2c, K: int = 4):
        out = self._hutch(w2c, n_probes=K)
        diag = jnp.concatenate([
            out["means"].reshape(-1), out["opacity"].reshape(-1),
            out["rotations"].reshape(-1), out["scales"].reshape(-1)])
        return diag, int(jnp.sum(out["visible"]))

    def estimate_block_JtJ(self, w2c, K: int = 2, use_rot=True,
                           use_scale=True, use_opacity=True):
        params = self.state.params()
        w2c = jnp.asarray(np.asarray(w2c, np.float32))
        mc = params["means3D"] @ w2c[:3, :3].T + w2c[:3, 3]
        out = block_jtj(
            self.camera, mc, jnp.exp(params["log_scales"]),
            params["unnorm_rotations"],
            jax.nn.sigmoid(params["logit_opacities"][:, 0]),
            params["rgb_colors"], self._next_key(), n_probes=K,
            active=jnp.arange(self.state.capacity) < self.state.n_active,
            settings=self.settings)
        vis_idx = np.where(np.asarray(out["visible"]))[0]
        return out["blocks"][jnp.asarray(vis_idx)], vis_idx

    # -- cached object H_train (scene-path standard: models/slam.py:791) ----
    def _h11_key(self, n_probes: int):
        return (len(self.keyframes), self._param_version, self.n_active,
                self.state.capacity, int(n_probes))

    def _h11_over(self, w2cs, kf_ids, n_probes: int):
        """Σ Hutchinson (N, 11) Hessians over keyframe poses, chunked —
        keys derive from the keyframe index, so partial sums compose."""
        cap = self.state.capacity
        h = jnp.zeros((cap, 11))
        if len(w2cs) == 0:
            return h
        params = self.state.params()
        ck = min(self.obj_pose_chunk, len(w2cs))
        for i in range(0, len(w2cs), ck):
            chunk = np.asarray(w2cs[i:i + ck], np.float32)
            ids = list(kf_ids[i:i + ck])
            n_real = len(chunk)
            if n_real < ck:
                chunk = np.concatenate(
                    [chunk, np.tile(np.eye(4, dtype=np.float32),
                                    (ck - n_real, 1, 1))])
                # pad ids live at the top of the uint32 fold_in domain
                # (results are discarded; negative ids would overflow)
                ids += [2**32 - 1 - j for j in range(ck - n_real)]
            hh = _obj_h11_batch(params, self.state.n_active,
                                jnp.asarray(chunk), self._kf_keys(ids),
                                self.camera, self.settings, int(n_probes))
            h = h + jnp.sum(hh[:n_real], axis=0)
        return h

    def _h_train_kf_ids(self) -> list[int]:
        """Keyframe ids contributing to the H_train prior this event: all
        of them in exact mode, else `h_train_window` ids evenly strided
        across the WHOLE history (always including first + latest).  A
        stride — not a recency window — keeps every orbit segment's
        coverage in the prior, which is what makes candidate rankings
        track the exact sum (Spearman gate in tests/test_object_slam.py)."""
        n_kf = len(self.keyframes)
        w = self.h_train_window
        if not w or n_kf <= w:
            return list(range(n_kf))
        return sorted(set(np.round(
            np.linspace(0, n_kf - 1, w)).astype(int).tolist()))

    def compute_H_train_obj(self, n_probes: int | None = None):
        """Σ over keyframes of the (N, 11) Hutchinson Hessian.  Cached per
        (keyframe-set, param-version); when only keyframes were APPENDED
        the cache is topped up with the new frames' terms — identical to a
        full recompute because per-keyframe probe keys are fold_in(kf_id).

        With `h_train_window` set (default) and more keyframes than the
        window, the sum runs over a strided keyframe subsample scaled by
        K/|ids| — an unbiased-coverage estimate of the exact prior that
        bounds planning-event cost at O(W) where the reference pays O(K)
        (gaussian_object.py:1553-1585 recomputes the full sum per event
        because mapping invalidates any cache)."""
        n_probes = int(n_probes or self.hutch_probes)
        ids = self._h_train_kf_ids()
        n_kf = len(self.keyframes)
        if len(ids) < n_kf:
            key = self._h11_key(n_probes) + ("win", tuple(ids))
            cached = getattr(self, "_h11_cache", None)
            if cached is not None and cached[0] == key:
                return cached[1]
            h = self._h11_over([self.keyframes.w2cs[i] for i in ids],
                               ids, n_probes) * (n_kf / len(ids))
            self._h11_cache = (key, h)
            return h
        key = self._h11_key(n_probes)
        cached = getattr(self, "_h11_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        if cached is not None and len(cached[0]) == len(key) \
                and cached[0][1:] == key[1:] and cached[0][0] < key[0]:
            new_ids = list(range(cached[0][0], len(self.keyframes)))
            h = cached[1] + self._h11_over(
                [self.keyframes.w2cs[i] for i in new_ids], new_ids, n_probes)
        else:
            h = self._h11_over(self.keyframes.w2cs,
                               list(range(len(self.keyframes))), n_probes)
        self._h11_cache = (key, h)
        return h

    def compute_H_train_popgs(self, K: int = 4):
        """Flat group-major diag prior [means|opacity|rotations|scales]
        (the estimate_diag_JtJ_simple layout; reference
        gaussian_object.py:1553-1585)."""
        if len(self.keyframes) == 0:
            raise RuntimeError("No keyframes available for POP-GS prior.")
        h = self.compute_H_train_obj(n_probes=K)
        return jnp.concatenate([h[:, :3].reshape(-1), h[:, 3].reshape(-1),
                                h[:, 7:11].reshape(-1),
                                h[:, 4:7].reshape(-1)])

    def _chunked_scores(self, w2cs, score_chunk_fn):
        """Dispatch all pose chunks, ONE device pull (models/slam.py:853
        pose_eval_async pattern)."""
        params = self.state.params()
        keys = self._pose_keys(len(w2cs))
        chunks = []
        ck = min(self.obj_pose_chunk, max(len(w2cs), 1))
        for i in range(0, len(w2cs), ck):
            chunk = w2cs[i:i + ck]
            kchunk = keys[i:i + ck]
            n_real = len(chunk)
            if n_real < ck:
                chunk = np.concatenate(
                    [chunk, np.tile(np.eye(4, dtype=np.float32),
                                    (ck - n_real, 1, 1))])
                kchunk = jnp.concatenate([kchunk, keys[:ck - n_real]])
            s = score_chunk_fn(params, jnp.asarray(chunk), kchunk)
            chunks.append((s, n_real))
        pulled = jax.device_get([s for s, _ in chunks])
        return np.concatenate(
            [np.asarray(s)[:n] for s, (_, n) in zip(pulled, chunks)])

    def pose_eval(self, poses, random_gaussian_params=None, criterion=None):
        """Fisher EIG over the 11-dim per-splat Hessian (reference
        gaussian_object.py:1591-1625), batched over pose chunks with a
        cached H_train."""
        poses = np.asarray(poses, np.float32)
        h_train = (self.compute_H_train_obj() if len(self.keyframes)
                   else jnp.zeros((self.state.capacity, 11)))
        h_inv = 1.0 / (h_train + 0.1)
        w2cs = np.linalg.inv(poses)
        scores = self._chunked_scores(
            w2cs, lambda p, c, k: _obj_fisher_scores(
                p, self.state.n_active, c, k, h_inv, self.camera,
                self.settings, self.hutch_probes))
        return jnp.asarray(scores), jnp.asarray(poses)

    def pose_eval_popgs(self, poses, random_gaussian_params=None,
                        criterion: str = "topt", K: int = 4,
                        lam: float = 1e-6):
        """(reference gaussian_object.py:1632-1672), batched."""
        if criterion.lower() not in ("topt", "dopt"):
            raise ValueError("criterion must be 'topt' or 'dopt'")
        poses = np.asarray(poses, np.float32)
        h_train = self.compute_H_train_obj(n_probes=K)
        w2cs = np.linalg.inv(poses)
        scores = self._chunked_scores(
            w2cs, lambda p, c, k: _obj_popgs_scores(
                p, self.state.n_active, c, k, h_train, lam, self.camera,
                self.settings, int(K), criterion.lower()))
        return jnp.asarray(scores), jnp.asarray(poses)

    def pose_eval_popgs_blocks(self, poses, random_gaussian_params=None,
                               criterion: str = "topt", K: int = 6,
                               lam: float = 1e-6, use_rot=True,
                               use_scale=True, use_opacity=True):
        """(reference gaussian_object.py:1674-1703)"""
        poses = np.asarray(poses, np.float32)
        # train blocks over keyframes (aligned by splat index — the
        # fixed-capacity layout makes the reference's visible-set
        # intersection a plain index mask); cached per
        # (keyframe-set, param-version) like the diag H_train
        ids = self._h_train_kf_ids()   # strided subsample past the window
        key = self._h11_key(K) + ("blocks", tuple(ids))
        cached = getattr(self, "_blocks_cache", None)
        if cached is not None and cached[0] == key:
            h_blocks, train_vis = cached[1]
        else:
            h_blocks, train_vis = None, None
            for i in ids:
                b, vis = self._blocks_full(self.keyframes.w2cs[i], K)
                h_blocks = b if h_blocks is None else h_blocks + b
                train_vis = vis if train_vis is None else (train_vis | vis)
            if h_blocks is None:
                raise RuntimeError(
                    "No keyframes available for POP-GS blocks.")
            if len(ids) < len(self.keyframes):
                h_blocks = h_blocks * (len(self.keyframes) / len(ids))
            self._blocks_cache = (key, (h_blocks, train_vis))
        if criterion.lower() not in ("topt", "dopt"):
            raise ValueError("criterion must be 'topt' or 'dopt'")
        score_fn = (topt_score_blocks if criterion.lower() == "topt"
                    else dopt_score_blocks)
        handles = []
        for c2w in poses:          # dispatch all, pull ONCE
            jb, cur_vis = self._blocks_full(np.linalg.inv(c2w), K)
            handles.append(score_fn(h_blocks, jb, train_vis & cur_vis, lam))
        scores = np.asarray(jax.device_get(handles), np.float32)
        return jnp.asarray(scores), jnp.asarray(poses)

    def _blocks_full(self, w2c, K):
        params = self.state.params()
        w2c = jnp.asarray(np.asarray(w2c, np.float32))
        mc = params["means3D"] @ w2c[:3, :3].T + w2c[:3, 3]
        out = block_jtj(
            self.camera, mc, jnp.exp(params["log_scales"]),
            params["unnorm_rotations"],
            jax.nn.sigmoid(params["logit_opacities"][:, 0]),
            params["rgb_colors"], self._next_key(), n_probes=K,
            active=jnp.arange(self.state.capacity) < self.state.n_active,
            settings=self.settings)
        return out["blocks"], out["visible"]
