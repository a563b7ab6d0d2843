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
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.camera import Camera
from ..ops.fisher import (block_jtj, dopt_score_blocks,
                          dopt_score_from_diags, hutchinson_diag,
                          topt_score_blocks, topt_score_from_diags)
from ..ops.image import calc_ssim
from ..ops.rasterize import render
from ..utils.geometry import invert_se3
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

    def bins_at(i):
        return TileBins(table=tables[i], slot_valid=svalids[i],
                        counts=counts_all[i], overflow=overflows[i],
                        n_tiles_x=ntx, n_tiles_y=nty)

    def loss_fn(p, w2c, color, depth, mask, i):
        return _masked_mapping_loss(p, state.n_active, w2c, color, depth,
                                    mask, camera, settings, mc,
                                    bins=bins_at(i))

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def body(carry, it):
        params, opt = carry
        i = frame_choices[it]
        (loss, _aux), grads = grad_fn(params, kf_w2cs[i], kf_colors[i],
                                      kf_depths[i], kf_masks[i], i)
        params, opt = adam_step(opt, params, grads, lrs, eps=1e-15)
        return (params, opt), loss

    (params, _opt), losses = jax.lax.scan(body, (params, opt),
                                          jnp.arange(mc.num_iters))
    return state.replace_params(params), losses


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


class GaussianObjectSLAM(GaussianSLAM):
    """Object-centric SLAM with the reference GaussianObjectSLAM API."""

    def __init__(self, cfg, eval_dir: str | None = None,
                 start_frame_idx: int = 0):
        super().__init__(cfg, eval_dir=eval_dir)
        self.start_frame_idx = int(start_frame_idx)
        self.map_obj_every = int(cfg.map_obj_every)
        self.keyframe_obj_every = int(cfg.keyframe_obj_every)
        self.hutch_probes = int(cfg.tpu.hutchinson_probes)
        self.outside_alpha_thresh = 0.01
        self.keyframe_masks: list[np.ndarray] = []
        self._key = jax.random.PRNGKey(self.start_frame_idx)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    # -- lifecycle ----------------------------------------------------------
    def init(self, color, depth, w2c=None, mask=None):
        """Seed only masked pixels (reference gaussian_object.py:595-663)."""
        color, depth = self._prep_inputs(color, depth)
        if mask is None:
            mask = np.ones_like(depth, bool)
        mask = np.asarray(mask, bool).reshape(depth.shape)
        masked_depth = np.where(mask, depth, 0.0)
        w2c = np.eye(4, dtype=np.float32) if w2c is None \
            else np.asarray(w2c, np.float32)
        self.frame_idx = 0
        self.poses_w2c = [w2c]
        from .slam import _init_first_frame
        self._ensure_capacity(int(mask.sum()) + 16)
        state, _dropped, n_added = _init_first_frame(
            self.state, jnp.asarray(color), jnp.asarray(masked_depth),
            jnp.asarray(w2c), 0.01, self.camera)
        self.state = state
        self.keyframes.append(color, depth, w2c, 0)
        self.keyframe_masks.append(mask)
        self.keyframe_time_indices.append(0)
        self.initialized = True
        return int(n_added)

    def track_rgbd(self, color, depth, gt_w2c=None, action=None,
                   obj_mask_2d=None, step: int | None = None):
        if not self.initialized:
            self.init(color, depth, gt_w2c, obj_mask_2d)
            return
        color, depth = self._prep_inputs(color, depth)
        mask = (np.ones_like(depth, bool) if obj_mask_2d is None
                else np.asarray(obj_mask_2d, bool).reshape(depth.shape))
        time_idx = self.frame_idx + 1
        w2c = (np.asarray(gt_w2c, np.float32) if gt_w2c is not None
               else self.poses_w2c[-1])
        self.poses_w2c.append(w2c)

        if mask.sum() > 0 and (time_idx + 1) % self.map_obj_every == 0:
            self._object_mapping_event(color, depth, w2c, mask, time_idx)

        if mask.sum() > 0 and (time_idx + 1) % self.keyframe_obj_every == 0:
            self.keyframes.append(color, depth, w2c, time_idx)
            self.keyframe_masks.append(mask)
            self.keyframe_time_indices.append(time_idx)
        self.frame_idx = time_idx

    def _object_mapping_event(self, color, depth, w2c, mask, time_idx):
        # densify only masked pixels: feed a mask-zeroed depth so the
        # candidate grid ignores everything else
        from .slam import _densify
        masked_depth = np.where(mask, depth, 0.0)
        ds = self.mc.downsample_pcd
        self._ensure_capacity(
            (self.camera.height // ds) * (self.camera.width // ds))
        self.state, _dropped, _added, _overflow = _densify(
            self.state, jnp.asarray(color), jnp.asarray(masked_depth),
            jnp.asarray(w2c), float(time_idx), self.camera, self.settings,
            self.mc)

        num_kf = int(self.cfg.mapping_window_size) - 2
        from .keyframes import select_keyframes_overlap
        selected = select_keyframes_overlap(
            np.where(mask, depth, 0.0)[None], w2c, self.intrinsics,
            self.keyframes, num_kf, rng=self.rng)
        if len(self.keyframes) > 0:
            selected.append(len(self.keyframes) - 1)
        win_c = [self.keyframes.colors[i] for i in selected] + [color]
        win_d = [self.keyframes.depths[i] for i in selected] + [depth]
        win_w = [self.keyframes.w2cs[i] for i in selected] + [w2c]
        win_m = [self.keyframe_masks[i] for i in selected] + [mask]
        b = len(win_c)
        # fixed-size window batch (one compile per episode; see slam.py)
        b_max = int(self.cfg.mapping_window_size)
        while len(win_c) < b_max:
            win_c.append(win_c[-1]); win_d.append(win_d[-1])
            win_w.append(win_w[-1]); win_m.append(win_m[-1])
        win_c, win_d = win_c[:b_max], win_d[:b_max]
        win_w, win_m = win_w[:b_max], win_m[:b_max]
        choices = self.rng.integers(0, min(b, b_max), size=self.mc.num_iters)
        self.state, losses = _object_mapping_phase(
            self.state, jnp.asarray(np.stack(win_c)),
            jnp.asarray(np.stack(win_d)), jnp.asarray(np.stack(win_w)),
            jnp.asarray(np.stack(win_m)), jnp.asarray(choices, jnp.int32),
            self.camera, self.settings, self.mc)
        self.last_losses = np.asarray(losses)

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

    def compute_H_train_popgs(self, K: int = 4):
        h = None
        for w2c in self.keyframes.w2cs:
            diag, _vis = self.estimate_diag_JtJ_simple(w2c, K=K)
            h = diag if h is None else h + diag
        if h is None:
            raise RuntimeError("No keyframes available for POP-GS prior.")
        return h

    def pose_eval(self, poses, random_gaussian_params=None, criterion=None):
        """Fisher EIG over the 11-dim per-splat Hessian (reference
        gaussian_object.py:1591-1625)."""
        poses = np.asarray(poses, np.float32)
        h_train = None
        for w2c in self.keyframes.w2cs:
            h = self.compute_Hessian(w2c, return_points=True)
            h_train = h if h_train is None else h_train + h
        if h_train is None:
            h_train = jnp.zeros((self.state.capacity, 11))
        h_inv = 1.0 / (h_train + 0.1)
        scores = []
        for c2w in poses:
            cur = self.compute_Hessian(np.linalg.inv(c2w), return_points=True)
            scores.append(float(jnp.sum(cur * h_inv)))
        return jnp.asarray(np.asarray(scores, np.float32)), jnp.asarray(poses)

    def pose_eval_popgs(self, poses, random_gaussian_params=None,
                        criterion: str = "topt", K: int = 4,
                        lam: float = 1e-6):
        """(reference gaussian_object.py:1632-1672)"""
        poses = np.asarray(poses, np.float32)
        h_train = self.compute_H_train_popgs(K=K)
        scores = []
        for c2w in poses:
            diag, _vis = self.estimate_diag_JtJ_simple(np.linalg.inv(c2w), K=K)
            if criterion.lower() == "topt":
                s = topt_score_from_diags(h_train, diag, lam)
            elif criterion.lower() == "dopt":
                s = dopt_score_from_diags(h_train, diag, lam)
            else:
                raise ValueError("criterion must be 'topt' or 'dopt'")
            scores.append(float(s))
        return jnp.asarray(np.asarray(scores, np.float32)), jnp.asarray(poses)

    def pose_eval_popgs_blocks(self, poses, random_gaussian_params=None,
                               criterion: str = "topt", K: int = 6,
                               lam: float = 1e-6, use_rot=True,
                               use_scale=True, use_opacity=True):
        """(reference gaussian_object.py:1674-1703)"""
        poses = np.asarray(poses, np.float32)
        # train blocks over keyframes (aligned by splat index — the
        # fixed-capacity layout makes the reference's visible-set
        # intersection a plain index mask)
        h_blocks, train_vis = None, None
        for w2c in self.keyframes.w2cs:
            b, vis = self._blocks_full(w2c, K)
            h_blocks = b if h_blocks is None else h_blocks + b
            train_vis = vis if train_vis is None else (train_vis | vis)
        if h_blocks is None:
            raise RuntimeError("No keyframes available for POP-GS blocks.")
        scores = []
        for c2w in poses:
            jb, cur_vis = self._blocks_full(np.linalg.inv(c2w), K)
            valid = train_vis & cur_vis
            if criterion.lower() == "topt":
                s = topt_score_blocks(h_blocks, jb, valid, lam)
            elif criterion.lower() == "dopt":
                s = dopt_score_blocks(h_blocks, jb, valid, lam)
            else:
                raise ValueError("criterion must be 'topt' or 'dopt'")
            scores.append(float(s))
        return jnp.asarray(np.asarray(scores, np.float32)), jnp.asarray(poses)

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
