"""Multi-chip sharded execution of the hot paths.

Three TPU-native parallelism strategies (SURVEY.md §2.9 "TPU-native
equivalents to build"; the reference has none of these — it loops
candidates in python on one GPU):

  1. `pose_eval_sharded` — candidate-pose data parallelism: each device
     Fisher-renders its shard of candidate w2cs against the replicated
     Gaussian state; scores all_gather over ICI.
  2. `mapping_step_sharded` — keyframe-batch data parallelism for the
     mapping optimization: per-device loss/grad on its shard of window
     frames, gradients psum'd, replicated Adam update.  (A TPU-native
     upgrade over the reference's one-random-frame-per-iteration loop —
     each step descends the mean loss of B frames.)
  3. `multi_scene_occ_update` — scene/episode data parallelism: the
     shell-level multi-scene sweep (reference scripts/mp3d.sh) becomes a
     sharded batch of per-scene occupancy updates.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models.gaussian_state import GaussianState, adam_init, adam_step
from ..models.slam import MappingConfig, _mapping_loss
from ..ops.camera import Camera
from ..ops.fisher import fisher_diag
from ..ops.rasterize import RenderSettings
from ..planning.occupancy import occ_update


def pose_eval_sharded(mesh: Mesh, state: GaussianState, w2cs, h_train_inv,
                      camera: Camera, settings: RenderSettings):
    """EIG scores for (B, 4, 4) candidate w2cs, B sharded over 'data'."""
    params = state.params()
    means_w = params["means3D"]
    scales = jnp.exp(params["log_scales"])
    quats = params["unnorm_rotations"]
    opac = jax.nn.sigmoid(params["logit_opacities"][:, 0])
    colors = params["rgb_colors"]
    active = jnp.arange(means_w.shape[0]) < state.n_active

    def shard_fn(w2c_shard, h_inv):
        def one(w2c):
            mc = means_w @ w2c[:3, :3].T + w2c[:3, 3]
            out = fisher_diag(camera, mc, scales, quats, opac, colors,
                              active=active, settings=settings)
            return jnp.sum(out["H"] * h_inv)
        return jax.lax.map(one, w2c_shard)

    fn = shard_map(shard_fn, mesh=mesh, in_specs=(P("data"), P()),
                   out_specs=P("data"), check_vma=False)
    return jax.jit(fn)(w2cs, h_train_inv)


def mapping_step_sharded(mesh: Mesh, camera: Camera,
                         settings: RenderSettings, mc: MappingConfig):
    """Builds a jitted sharded training step:
    (params, opt, n_active, colors (B,H,W,3), depths (B,H,W), w2cs (B,4,4))
    -> (params, opt, loss); the frame batch is sharded over 'data' and
    gradients are psum-averaged over ICI."""
    lrs = dict(means3D=mc.lr_means3D, rgb_colors=mc.lr_rgb,
               unnorm_rotations=mc.lr_rots, logit_opacities=mc.lr_logit_op,
               log_scales=mc.lr_log_scales)

    def local_loss(params, n_active, colors, depths, w2cs):
        def one(c, d, w2c):
            loss, _aux = _mapping_loss(params, n_active, w2c, c, d, camera,
                                       settings, mc)
            return loss
        losses = jax.vmap(one)(colors, depths, w2cs)
        return jnp.mean(losses)

    def shard_fn(params, opt, n_active, colors, depths, w2cs):
        loss, grads = jax.value_and_grad(local_loss)(params, n_active,
                                                     colors, depths, w2cs)
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(loss, "data")
        new_params, new_opt = adam_step(opt, params, grads, lrs, eps=1e-15)
        return new_params, new_opt, loss

    rep = P()
    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(rep, rep, rep, P("data"), P("data"), P("data")),
        out_specs=(rep, rep, rep),
        check_vma=False)
    return jax.jit(fn)


def multi_scene_occ_update(mesh: Mesh, camera: Camera):
    """Sharded batch of per-scene occupancy updates: occ_maps (S, 3, Gz,
    Gx), depths (S, H, W), c2ws (S, 4, 4) with S over 'data'."""
    def one(occ, depth, c2w, cell_size, center, h_lo, h_hi, far):
        new_occ, cam = occ_update(occ, depth, c2w, camera, cell_size, center,
                                  h_lo, h_hi, far)
        return new_occ, cam

    def shard_fn(occs, depths, c2ws, cell_size, centers, h_lo, h_hi, far):
        return jax.vmap(one, in_axes=(0, 0, 0, None, 0, None, None, None))(
            occs, depths, c2ws, cell_size, centers, h_lo, h_hi, far)

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P(), P("data"), P(), P(),
                  P()),
        out_specs=(P("data"), P("data")),
        check_vma=False)
    return jax.jit(fn)


def full_train_step(mesh: Mesh, camera: Camera, settings: RenderSettings,
                    mc: MappingConfig):
    """One complete sharded active-mapping training step for the multichip
    dry-run: sharded mapping gradient step + sharded candidate-pose EIG.
    Returns a function of (state, frames..., cand_w2cs, h_train_inv)."""
    step_fn = mapping_step_sharded(mesh, camera, settings, mc)

    def run(state: GaussianState, colors, depths, w2cs, cand_w2cs,
            h_train_inv):
        params = state.params()
        opt = adam_init(params)
        params, opt, loss = step_fn(params, opt, state.n_active, colors,
                                    depths, w2cs)
        scores = pose_eval_sharded(mesh, state.replace_params(params),
                                   cand_w2cs, h_train_inv, camera, settings)
        return state.replace_params(params), loss, scores

    return run
