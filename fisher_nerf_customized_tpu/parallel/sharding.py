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
from ..models.slam import (MappingConfig, _fisher_batch, _mapping_loss,
                           _mapping_phase_impl)
from ..ops.binning import tile_bin
from ..ops.camera import Camera
from ..ops.fisher import _pack_params, fisher_core, fisher_diag
from ..ops.projection import build_cov3d, conic_mean_jac, preprocess
from ..ops.rasterize import (RenderSettings, _tiles_to_image, blend_packed,
                             pack_blend_features, tile_pixel_coords)
from ..planning.occupancy import occ_update


def pose_eval_sharded(mesh: Mesh, state: GaussianState, w2cs, h_train_inv,
                      camera: Camera, settings: RenderSettings,
                      full_chain: bool = True):
    """EIG scores for (B, 4, 4) candidate w2cs, B sharded over 'data'.

    full_chain selects the cov2D-through-mean Fisher chain (exact
    backward.cu parity) vs the reduced projection chain the engine uses
    for EIG ranking (see GaussianSLAM.fisher_full_chain)."""
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
                              active=active, settings=settings,
                              full_chain=full_chain)
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


def multi_scene_train_step(mesh: Mesh, camera: Camera,
                           settings: RenderSettings, mc: MappingConfig):
    """Scene/episode data parallelism over the FULL mapping step: S
    independent scenes' Gaussian states (stacked pytrees, S over 'data')
    each take one Adam step on their own frame — the multi-host
    replacement for the reference's shell-level scene loop
    (scripts/mp3d.sh).  On a multi-host mesh from
    parallel.distributed.make_multihost_mesh the scene axis crosses DCN;
    no cross-scene collectives exist, so DCN carries nothing hot."""
    lrs = dict(means3D=mc.lr_means3D, rgb_colors=mc.lr_rgb,
               unnorm_rotations=mc.lr_rots, logit_opacities=mc.lr_logit_op,
               log_scales=mc.lr_log_scales)

    def one_scene(params, opt, n_active, color, depth, w2c):
        def loss_fn(p):
            loss, _aux = _mapping_loss(p, n_active, w2c, color, depth,
                                       camera, settings, mc)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt = adam_step(opt, params, grads, lrs, eps=1e-15)
        return params, opt, loss

    def shard_fn(params_stack, opt_stack, n_actives, colors, depths, w2cs):
        return jax.vmap(one_scene)(params_stack, opt_stack, n_actives,
                                   colors, depths, w2cs)

    d = P("data")
    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(d, d, d, d, d, d),
                   out_specs=(d, d, d), check_vma=False)
    return jax.jit(fn)


def _merge_shard_tiles(score, *arrays, axis_name: str, k: int):
    """all_gather per-device per-tile top-k candidate lists and re-select
    the global top-k per tile.

    The union of per-device nearest-k sets contains the global nearest-k
    (any globally nearest candidate is nearest on its own device), so the
    merge is EXACT — the distributed equivalent of the CUB radix sort's
    global [tile|depth] order (reference rasterizer_impl.cu:277-323).

    score: (T, K) per-slot merge score (-depth, -inf for invalid slots).
    arrays: per-slot payloads (T, K, ...) to carry through the merge.
    Returns (merged_valid (T, K), merged arrays, n_cand (T,)).
    """
    score_all = jax.lax.all_gather(score, axis_name)        # (D, T, K)
    d = score_all.shape[0]
    t = score.shape[0]
    score_m = jnp.moveaxis(score_all, 0, 1).reshape(t, d * k)
    vals, pos = jax.lax.top_k(score_m, k)                   # (T, K)
    valid = vals > -jnp.inf
    n_cand = jnp.sum((score_m > -jnp.inf).astype(jnp.int32), axis=1)

    merged = []
    for arr in arrays:
        arr_all = jax.lax.all_gather(arr, axis_name)        # (D, T, K, ...)
        arr_m = jnp.moveaxis(arr_all, 0, 1).reshape(
            (t, d * k) + arr.shape[2:])
        idx = pos.reshape(pos.shape + (1,) * (arr_m.ndim - 2))
        merged.append(jnp.take_along_axis(arr_m, idx, axis=1))
    return valid, merged, n_cand


def render_gaussian_sharded(mesh: Mesh, camera: Camera,
                            settings: RenderSettings = RenderSettings()):
    """Gaussian-axis ("model") sharded rendering for maps too large for one
    chip (SURVEY.md §2.9 TPU-native equivalent (3)).

    Each device preprocesses + tile-bins its shard of the N-Gaussian axis,
    all_gathers the per-tile front-to-back candidate lists (features travel
    with the sort, so no post-merge gather), re-selects the global
    nearest-K per tile, and alpha-blends a disjoint 1/D shard of the tiles.
    Collectives ride ICI: one all_gather of (T, K, F) candidate features
    per device + the output tile concat.

    Returns a jitted fn(means_w, scales, quats, opacities, colors, active,
    w2c) -> dict(color (H,W,C), depth, final_t, radii (N,), overflow) whose
    N-axis inputs are sharded over 'model' (divisible by the mesh size).
    """
    st = settings
    ts = st.tile_size
    ntx = -(-camera.width // ts)
    nty = -(-camera.height // ts)
    n_tiles = ntx * nty
    d_model = mesh.shape["model"]
    assert n_tiles % d_model == 0, (n_tiles, d_model)
    tpd = n_tiles // d_model
    pix_x, pix_y = tile_pixel_coords(ntx, nty, ts)

    def shard_fn(means_w, scales, quats, opacities, colors, active, w2c):
        mc = means_w @ w2c[:3, :3].T + w2c[:3, 3]
        prep = preprocess(mc, scales, quats, camera, active=active)
        bins = tile_bin(prep.mean2d, prep.radius, prep.depth, prep.valid,
                        camera.width, camera.height, ts, st.max_per_tile)
        feat = pack_blend_features(prep, opacities, colors)
        packed = feat[bins.table]                           # (T, K, F)
        score = jnp.where(bins.slot_valid, -packed[..., 6], -jnp.inf)

        valid, (merged,), n_cand = _merge_shard_tiles(
            score, packed, axis_name="model", k=st.max_per_tile)
        merge_overflow = jnp.sum(jnp.maximum(n_cand - st.max_per_tile, 0))
        overflow = jax.lax.psum(bins.overflow, "model") + merge_overflow

        dev = jax.lax.axis_index("model")
        t0 = dev * tpd
        merged_l = jax.lax.dynamic_slice_in_dim(merged, t0, tpd, 0)
        valid_l = jax.lax.dynamic_slice_in_dim(valid, t0, tpd, 0)
        px_l = jax.lax.dynamic_slice_in_dim(pix_x, t0, tpd, 0)
        py_l = jax.lax.dynamic_slice_in_dim(pix_y, t0, tpd, 0)
        t_final, c_acc, med = blend_packed(st, merged_l, valid_l, px_l, py_l)
        return c_acc, t_final, med, prep.radius, overflow

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("model"), P("model"), P("model"), P("model"), P("model"),
                  P("model"), P()),
        out_specs=(P("model"), P("model"), P("model"), P("model"), P()),
        check_vma=False)

    @jax.jit
    def run(means_w, scales, quats, opacities, colors, active, w2c, bg=None):
        c_acc, t_final, med, radii, overflow = fn(
            means_w, scales, quats, opacities, colors, active, w2c)
        cch = colors.shape[-1]
        if bg is None:
            bg = jnp.zeros((cch,), jnp.float32)
        out = c_acc + t_final[:, :, None] * bg[None, None, :]
        img = _tiles_to_image(out, nty, ntx, ts, camera.height, camera.width)
        depth = _tiles_to_image(med, nty, ntx, ts, camera.height,
                                camera.width)
        ft = _tiles_to_image(t_final, nty, ntx, ts, camera.height,
                             camera.width)
        return dict(color=img, depth=depth, final_t=ft, radii=radii,
                    overflow=overflow)

    return run


def fisher_diag_gaussian_sharded(mesh: Mesh, camera: Camera,
                                 settings: RenderSettings = RenderSettings(),
                                 grad_value: float = 1e-3,
                                 full_chain: bool = True):
    """Gaussian-axis sharded Fisher diagonal: the compute_Hessian analog
    for maps sharded over 'model' (SURVEY.md §2.9 (3): "psum the ...
    Hessian accumulations over ICI").

    Same merge as render_gaussian_sharded but carrying GLOBAL Gaussian
    indices through the sort; each device runs the squared-backward core
    on its tile shard, scattering into a full-capacity accumulator, then a
    psum_scatter returns each device its own Gaussians' Hessian rows.

    Returns a jitted fn(means_w, scales, quats, opacities, colors, active,
    w2c) -> dict(H (N, 4), radii (N,), visible (N,)), N-axis sharded over
    'model'.
    """
    st = settings
    ts = st.tile_size
    ntx = -(-camera.width // ts)
    nty = -(-camera.height // ts)
    n_tiles = ntx * nty
    d_model = mesh.shape["model"]
    assert n_tiles % d_model == 0, (n_tiles, d_model)
    tpd = n_tiles // d_model
    pix_x, pix_y = tile_pixel_coords(ntx, nty, ts)

    def shard_fn(means_w, scales, quats, opacities, colors, active, w2c):
        n_local = means_w.shape[0]
        mc = means_w @ w2c[:3, :3].T + w2c[:3, 3]
        prep = preprocess(mc, scales, quats, camera, active=active)
        bins = tile_bin(prep.mean2d, prep.radius, prep.depth, prep.valid,
                        camera.width, camera.height, ts, st.max_per_tile)
        cjac = (conic_mean_jac(mc, build_cov3d(scales, quats), camera,
                               valid=prep.valid) if full_chain else None)
        packed = _pack_params(prep, bins, opacities, colors, mc,
                              conic_jac=cjac)
        dev = jax.lax.axis_index("model")
        gidx = bins.table + dev * n_local                   # global indices
        score = jnp.where(bins.slot_valid, -packed[..., 6], -jnp.inf)

        valid, (merged, gidx_m), _n_cand = _merge_shard_tiles(
            score, packed, gidx, axis_name="model", k=st.max_per_tile)

        t0 = dev * tpd
        merged_l = jax.lax.dynamic_slice_in_dim(merged, t0, tpd, 0)
        gidx_l = jax.lax.dynamic_slice_in_dim(gidx_m, t0, tpd, 0)
        valid_l = jax.lax.dynamic_slice_in_dim(valid, t0, tpd, 0)
        px_l = jax.lax.dynamic_slice_in_dim(pix_x, t0, tpd, 0)
        py_l = jax.lax.dynamic_slice_in_dim(pix_y, t0, tpd, 0)

        h_full = fisher_core(st, camera, merged_l, gidx_l, valid_l,
                             px_l, py_l, n_local * d_model, grad_value,
                             n_channels=colors.shape[-1],
                             full_chain=full_chain)
        h_local = jax.lax.psum_scatter(h_full, "model", scatter_dimension=0,
                                       tiled=True)          # (n_local, 4)
        return h_local, prep.radius, prep.radius > 0

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("model"), P("model"), P("model"), P("model"), P("model"),
                  P("model"), P()),
        out_specs=(P("model"), P("model"), P("model")),
        check_vma=False)

    @jax.jit
    def run(means_w, scales, quats, opacities, colors, active, w2c):
        h, radii, visible = fn(means_w, scales, quats, opacities, colors,
                               active, w2c)
        return dict(H=h, radii=radii, visible=visible)

    return run


# -- episode-path sharded factories ----------------------------------------
# These are the PRODUCT multi-chip paths: GaussianSLAM routes its hot
# dispatches through them whenever cfg.tpu.mesh_axes.data > 1 (see
# GaussianSLAM.__init__/_mapping_event/pose_eval_async/_h_train_over and
# ActiveMapper.plan_best_path).  Each factory is lru_cached on its static
# configuration so the underlying shard_map program compiles once per
# episode (re-tracing only on Gaussian-capacity growth, like the
# single-device jits).

@functools.lru_cache(maxsize=64)
def sharded_mapping_phase(mesh: Mesh, camera: Camera,
                          settings: RenderSettings, mc: MappingConfig):
    """Keyframe-minibatch data parallelism over the FULL mapping event
    (the scan of num_iters Adam steps, frozen binning, soft prune +
    compaction — models/slam._mapping_phase_impl): `frame_choices`
    (n_steps, F) is sharded over 'data' on the F axis; per-device
    gradients are pmean'd inside the scan body, so the replicated update
    equals the single-device F-frame minibatch step exactly (up to float
    reduction order — exactness-tested in tests/test_sharded_episode.py).
    """
    def shard_fn(state, kf_colors, kf_depths, kf_w2cs, frame_choices):
        return _mapping_phase_impl(state, kf_colors, kf_depths, kf_w2cs,
                                   frame_choices, camera, settings, mc,
                                   axis_name="data")

    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P(), P(), P(), P(), P(None, "data")),
                   out_specs=(P(), P(), P(), P(), P()),
                   check_vma=False)
    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def sharded_pose_scores(mesh: Mesh, camera: Camera, settings: RenderSettings,
                        engine: str, full_chain: bool, grad_value: float):
    """Candidate-pose data parallelism for EIG scoring: the (ck, 4, 4)
    w2c chunk is sharded over 'data'; each device Fisher-renders its
    poses against the replicated Gaussian state (same engine dispatch as
    the single-device path — pallas on real TPU) and returns its shard of
    sum(H ⊙ h_train_inv) scores."""
    def shard_fn(state, w2cs, h_inv):
        out = _fisher_batch(state, w2cs, camera, settings, engine,
                            full_chain, grad_value)
        return jnp.sum(out["H"] * h_inv[None], axis=(1, 2))

    fn = shard_map(shard_fn, mesh=mesh, in_specs=(P(), P("data"), P()),
                   out_specs=P("data"), check_vma=False)
    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def sharded_fisher_hsum(mesh: Mesh, camera: Camera, settings: RenderSettings,
                        engine: str, full_chain: bool, grad_value: float):
    """Sharded H_train accumulation: Σ over a (ck, 4, 4) keyframe-pose
    chunk of the Fisher diagonal (gaussian.py:1338-1348 compute_H_train),
    poses sharded over 'data', partial sums psum'd over ICI.  `weights`
    (ck,) masks chunk padding (0 rows contribute nothing)."""
    def shard_fn(state, w2cs, weights):
        out = _fisher_batch(state, w2cs, camera, settings, engine,
                            full_chain, grad_value)
        h = jnp.sum(out["H"] * weights[:, None, None], axis=0)
        return jax.lax.psum(h, "data")

    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P(), P("data"), P("data")), out_specs=P(),
                   check_vma=False)
    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def sharded_path_eig(mesh: Mesh, camera: Camera, settings: RenderSettings,
                     vol_weighted: bool, engine: str, grad_value: float):
    """Path-axis data parallelism for the path-EIG evaluation
    (engine/path_eval.path_eig_scores): each device scans the action
    steps for its shard of candidate paths, carrying its (P/D, N, 4)
    running H_train_path locally — the per-path accumulators never cross
    devices, so no hot collectives at all."""
    from ..engine.path_eval import path_eig_scores

    def shard_fn(state, h_train, acc_w2cs, acc_valid, lengths, final_eigs,
                 h_reg_lambda, ppw, ptw, pew, gs_cnt):
        return path_eig_scores(state, h_train, acc_w2cs, acc_valid,
                               lengths, final_eigs, camera, settings,
                               h_reg_lambda, ppw, ptw, pew, vol_weighted,
                               gs_cnt, engine, grad_value)

    d = P("data")
    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P(), P(), d, d, d, d, P(), P(), P(), P(), P()),
                   out_specs=d, check_vma=False)
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
