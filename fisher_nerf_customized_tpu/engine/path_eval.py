"""Batched path-EIG evaluation.

Reference semantics (tester_gaussians_navigation.py:1664-1723): for each
candidate path, roll the camera through its action sequence, computing a
Fisher Hessian at every future pose and accumulating

    point_EIG_s = log( Σ cur_H_s / (H_train_path + λ) )
    every `acc_H_train_every` actions:  score += w_point · point_EIG_s,
                                        H_train_path += cur_H_s
    final:  score/len + path_end_weight · final_EIG   (or (score+final)/len)

(the pose term is logdet of the reference's identity placeholder Hessian —
identically zero — and is kept only for config parity).

TPU re-design: the reference runs one CUDA render+backward per action per
path sequentially from python.  Here ALL paths evaluate in a single XLA
launch: `lax.map` over paths, `lax.scan` over each path's (padded) pose
sequence, with the running H_train_path carried on-device.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.gaussian_state import GaussianState
from ..ops.camera import Camera
from ..ops.fisher import fisher_diag
from ..ops.rasterize import RenderSettings


@functools.partial(jax.jit, static_argnames=("camera", "settings",
                                             "acc_every", "vol_weighted"))
def path_eig_scores(state: GaussianState, h_train, path_w2cs, path_valid,
                    final_eigs, camera: Camera, settings: RenderSettings,
                    h_reg_lambda, path_pose_weight, path_point_weight,
                    path_end_weight, acc_every: int, vol_weighted: bool,
                    gs_pts_cnt):
    """Scores (P,) for P padded paths.

    path_w2cs: (P, A, 4, 4) world->cam per future pose, path_valid: (P, A).
    """
    params = state.params()
    means_w = params["means3D"]
    scales = jnp.exp(params["log_scales"])
    quats = params["unnorm_rotations"]
    opac = jax.nn.sigmoid(params["logit_opacities"][:, 0])
    colors = params["rgb_colors"]
    active = jnp.arange(means_w.shape[0]) < state.n_active

    def eval_one_path(args):
        w2cs, valid, final_eig = args

        def step(carry, inp):
            h_path, total, count = carry
            w2c, ok, s = inp
            mc = means_w @ w2c[:3, :3].T + w2c[:3, 3]
            out = fisher_diag(camera, mc, scales, quats, opac, colors,
                              active=active, settings=settings)
            cur_h = out["H"]
            h_inv = 1.0 / (h_path + h_reg_lambda)
            raw = jnp.sum(cur_h * h_inv)
            if vol_weighted:
                raw = raw / gs_pts_cnt
            point_eig = jnp.log(jnp.maximum(raw, 1e-30))
            # pose term: logdet(eye(6)) == 0 (kept for parity)
            acc_now = ok & (((count + 2) % acc_every) == 0)
            total = total + jnp.where(acc_now, path_point_weight * point_eig,
                                      0.0)
            h_path = h_path + jnp.where(acc_now, 1.0, 0.0) * cur_h
            count = count + jnp.where(ok, 1, 0)
            return (h_path, total, count), None

        n_steps = w2cs.shape[0]
        (h_path, total, count), _ = jax.lax.scan(
            step, (h_train, 0.0, jnp.asarray(0, jnp.int32)),
            (w2cs, valid, jnp.arange(n_steps)))
        length = jnp.maximum(count.astype(jnp.float32), 1.0)
        score = jnp.where(path_end_weight > 0,
                          total / length + path_end_weight * final_eig,
                          (total + final_eig) / length)
        return score

    return jax.lax.map(eval_one_path, (path_w2cs, path_valid, final_eigs))
