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
launch: a `lax.scan` over the (padded) action steps whose body vmaps the
Fisher render over ALL paths at once — the only sequential dependency is
the per-path running H_train_path, carried on-device as a (P, N, 4) array.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.gaussian_state import GaussianState
from ..ops.camera import Camera
from ..ops.fisher import fisher_diag_dispatch
from ..ops.rasterize import RenderSettings


def acc_step_indices(n_actions: int, acc_every: int) -> list[int]:
    """The action indices whose Hessians affect the score: the reference
    computes a Hessian per action but only ACCUMULATES (and scores) when
    (len(actions)+1) % acc_every == 0 (tester:1706-1710) — i.e. 0-based
    steps s with (s+2) % acc_every == 0.  Everything else is wasted work
    there; here it is skipped exactly."""
    return [s for s in range(n_actions) if (s + 2) % acc_every == 0]


@functools.partial(jax.jit, static_argnames=("camera", "settings",
                                             "vol_weighted", "engine",
                                             "grad_value"))
def path_eig_scores(state: GaussianState, h_train, acc_w2cs, acc_valid,
                    lengths, final_eigs, camera: Camera,
                    settings: RenderSettings, h_reg_lambda,
                    path_pose_weight, path_point_weight, path_end_weight,
                    vol_weighted: bool, gs_pts_cnt, engine: str = "xla",
                    grad_value: float = 1e-3):
    """Scores (P,) for P padded paths.

    acc_w2cs: (P, A', 4, 4) world->cam at the ACC steps only (see
    acc_step_indices), acc_valid: (P, A'), lengths: (P,) full action
    counts (the score normalizer uses the whole path length).
    """
    params = state.params()
    means_w = params["means3D"]
    scales = jnp.exp(params["log_scales"])
    quats = params["unnorm_rotations"]
    opac = jax.nn.sigmoid(params["logit_opacities"][:, 0])
    colors = params["rgb_colors"]
    active = jnp.arange(means_w.shape[0]) < state.n_active
    n_paths = acc_w2cs.shape[0]

    def fisher_at(w2c):
        mc = means_w @ w2c[:3, :3].T + w2c[:3, 3]
        return fisher_diag_dispatch(engine, camera, mc, scales, quats, opac,
                                    colors, active=active,
                                    settings=settings,
                                    grad_value=grad_value)["H"]

    def step(carry, inp):
        h_paths, totals = carry                # (P,N,4), (P,)
        w2cs_s, ok_s = inp                     # (P,4,4), (P,)
        cur_h = jax.vmap(fisher_at)(w2cs_s)    # (P, N, 4)
        h_inv = 1.0 / (h_paths + h_reg_lambda)
        raw = jnp.sum(cur_h * h_inv, axis=(1, 2))
        if vol_weighted:
            raw = raw / gs_pts_cnt
        point_eig = jnp.log(jnp.maximum(raw, 1e-30))
        # pose term: logdet(eye(6)) == 0 (kept for parity)
        totals = totals + jnp.where(ok_s, path_point_weight * point_eig, 0.0)
        h_paths = h_paths + jnp.where(ok_s, 1.0, 0.0)[:, None, None] * cur_h
        return (h_paths, totals), None

    h0 = jnp.broadcast_to(h_train[None], (n_paths,) + h_train.shape)
    (h_paths, totals), _ = jax.lax.scan(
        step, (h0, jnp.zeros((n_paths,))),
        (jnp.swapaxes(acc_w2cs, 0, 1), jnp.swapaxes(acc_valid, 0, 1)))
    length = jnp.maximum(lengths.astype(jnp.float32), 1.0)
    return jnp.where(path_end_weight > 0,
                     totals / length + path_end_weight * final_eigs,
                     (totals + final_eigs) / length)
