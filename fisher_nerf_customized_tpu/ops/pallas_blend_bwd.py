"""Pallas TPU backward kernel for the tile blend — the power=1 sibling of
ops/pallas_fisher.py, giving the mapping/tracking losses a custom VJP
with in-kernel early termination.

The XLA path differentiates the chunked blend scan with `jax.checkpoint`
(re-runs the forward per chunk, then reverse-mode math over every slot
of every tile).  This kernel computes the ANALYTIC per-slot gradients
(the standard 3DGS backward, reference backward.cu:587 renderCUDA with
grad_power=1) per tile inside VMEM, walking only the chunks the forward
actually blended:

  dL/dcol_ch[i] = Σ_p w_i g_ch[p]             (w = α · T_before)
  dL/dα_i      = Σ_p [Σ_ch g_ch (T_i c_i,ch − S_behind,ch/(1−α_i))
                      − g_T T_final/(1−α_i)]
  dL/do_i      = G · dL/dα ;  dL/dμ2d, dL/dconic via ∇G

The channel sums collapse into ONE MXU matmul per chunk:
cg[i, p] = Σ_ch c_i,ch g_ch[p]  (col (CH,C) @ gᵀ (C,P)), after which the
suffix algebra is identical to the uniform-cotangent Fisher kernel.

Per-slot outputs (T, K, 6+C) = [dμx, dμy, da, db, dc, dopa, dcol...]
scatter-add to per-Gaussian grads outside; the chain through the EWA
preprocess (mean2d/conic → means_cam/scales/quats) runs as one cheap
XLA VJP of elementwise code (ops/projection.py).

`render_prebinned_pallas` wires it as a jax.custom_vjp drop-in for
ops.rasterize.render_prebinned inside the frozen-binning mapping phase.
Gradients flow through color channels and final_t (background blending);
the median-depth output is a measurement (zero gradient), matching the
XLA path where the T=0.5 crossing selects via comparisons.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# packed layout (matches ops/rasterize.pack_blend_features):
# [mu_x, mu_y, con_a, con_b, con_c, opacity, depth, color_0..C-1]
_BASE = 7


def _chunk_alpha(blk, pix_x, pix_y):
    mu_x = blk[:, 0:1]
    mu_y = blk[:, 1:2]
    a, b, c = blk[:, 2:3], blk[:, 3:4], blk[:, 4:5]
    opa = blk[:, 5:6]
    dx = mu_x - pix_x[None, :]
    dy = mu_y - pix_y[None, :]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    inside = power <= 0.0
    g = jnp.exp(jnp.where(inside, power, 0.0))
    alpha = jnp.minimum(0.99, opa * g)
    live = inside & (alpha >= 1.0 / 255.0)
    alpha = jnp.where(live, alpha, 0.0)
    g = jnp.where(live, g, 0.0)
    return alpha, g, dx, dy


def _blend_bwd_kernel(packed_ref, pix_ref, gcol_ref, gt_ref, nval_ref,
                      out_ref, tstart_ref, *, k_total: int, chunk: int,
                      n_ch: int):
    p = pix_ref.shape[-1]
    pix_x = pix_ref[0, 0, :]
    pix_y = pix_ref[0, 1, :]
    # valid slots are front-contiguous (binning top_k); the per-tile
    # count bounds BOTH walks — empty tiles do zero chunks in fwd AND bwd
    n_chunks = (nval_ref[0, 0, 0] + chunk - 1) // chunk
    gcol = gcol_ref[0, :, :]                              # (P, C) cotangent
    g_t = gt_ref[0, 0, :]                                 # (P,) d final_t

    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    tri_low = (cols < rows).astype(jnp.float32)
    tri_up = (cols > rows).astype(jnp.float32)

    out_ref[0, :, :] = jnp.zeros((k_total, 6 + n_ch), jnp.float32)

    def fwd_body(state):
        ci, t_carry = state
        blk = packed_ref[0, pl.ds(ci * chunk, chunk), :]
        alpha, _g, _dx, _dy = _chunk_alpha(blk, pix_x, pix_y)
        tstart_ref[0, pl.ds(ci, 1), :] = t_carry[None, :]
        t_carry = t_carry * jnp.exp(jnp.sum(jnp.log1p(-alpha), axis=0))
        return ci + 1, t_carry

    def fwd_cond(state):
        ci, t_carry = state
        return (ci < n_chunks) & (jnp.max(t_carry) >= 1e-4)

    t0 = jnp.ones((p,), jnp.float32)
    k_eff, t_final = jax.lax.while_loop(fwd_cond, fwd_body, (0, t0))
    # d final_t term shared by every slot: g_T · T_final (per pixel)
    gtf = g_t * t_final                                   # (P,)

    def bwd_body(state):
        ci, s_behind = state
        blk = packed_ref[0, pl.ds(ci * chunk, chunk), :]
        alpha, g, dx, dy = _chunk_alpha(blk, pix_x, pix_y)
        opa = blk[:, 5:6]
        a, b, c = blk[:, 2:3], blk[:, 3:4], blk[:, 4:5]
        col = blk[:, _BASE:]                              # (CH, C)

        t_start = tstart_ref[0, pl.ds(ci, 1), :][0]
        logs = jnp.log1p(-alpha)
        cum_excl = jnp.exp(jax.lax.dot_general(
            tri_low, logs, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        t_before = t_start[None, :] * cum_excl            # (CH, P)
        w = alpha * t_before

        # channel collapse: cg[i, p] = Σ_ch c_i,ch · g_ch[p]  (MXU)
        cg = jax.lax.dot_general(
            col, gcol, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (CH, P)
        contrib = w * cg
        s_within = jax.lax.dot_general(
            tri_up, contrib, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        s_b = s_within + s_behind[None, :]

        inv_om = 1.0 / jnp.maximum(1.0 - alpha, 1e-2)
        dl_da = t_before * cg - (s_b + gtf[None, :]) * inv_om
        dl_da = jnp.where(alpha > 0.0, dl_da, 0.0)        # (CH, P)

        dl_do_pix = g * dl_da
        dl_dg = opa * dl_da
        dg_dmx = -g * (a * dx + b * dy)
        dg_dmy = -g * (c * dy + b * dx)

        # per-slot reductions over pixels
        d_mu_x = jnp.sum(dl_dg * dg_dmx, axis=-1, keepdims=True)
        d_mu_y = jnp.sum(dl_dg * dg_dmy, axis=-1, keepdims=True)
        # dG/d(a,b,c) = G · [-0.5 dx², -dx dy, -0.5 dy²]; dl_dg already
        # carries the G factor (dl_dg · dG/da = opa·dl_da·G·(-0.5 dx²))
        d_a = jnp.sum(dl_dg * g * (-0.5) * dx * dx, axis=-1, keepdims=True)
        d_b = jnp.sum(dl_dg * g * (-1.0) * dx * dy, axis=-1, keepdims=True)
        d_c = jnp.sum(dl_dg * g * (-0.5) * dy * dy, axis=-1, keepdims=True)
        d_opa = jnp.sum(dl_do_pix, axis=-1, keepdims=True)
        # dL/dcol_ch = Σ_p w · g_ch  → (CH, C) matmul (MXU)
        d_col = jax.lax.dot_general(
            w, gcol, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (CH, C)

        out = jnp.concatenate([d_mu_x, d_mu_y, d_a, d_b, d_c, d_opa,
                               d_col], axis=-1)           # (CH, 6+C)
        out_ref[0, pl.ds(ci * chunk, chunk), :] = out

        s_behind = s_behind + jnp.sum(contrib, axis=0)
        return ci - 1, s_behind

    def bwd_cond(state):
        ci, _s = state
        return ci >= 0

    s0 = jnp.zeros((p,), jnp.float32)
    jax.lax.while_loop(bwd_cond, bwd_body, (k_eff - 1, s0))


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def pallas_blend_bwd_slots(packed, pix_xy, gcol_tiles, gt_tiles, nvalid,
                           chunk: int, interpret: bool = False):
    """packed: (T, K, 7+C); pix_xy: (T, 2, P); gcol_tiles: (T, P, C)
    cotangent w.r.t. the blended color; gt_tiles: (T, 1, P) cotangent
    w.r.t. final transmittance; nvalid: (T,) valid front-slot counts.
    Returns per-slot grads (T, K, 6+C)."""
    n_tiles, k, f = packed.shape
    p = pix_xy.shape[-1]
    n_ch = f - _BASE
    n_chunks = k // chunk
    # (T, 1, 1) in VMEM: Mosaic requires block trailing dims divisible by
    # (8, 128) OR equal to the full array dims — a (1, 1) SMEM block is
    # rejected on hardware (interpret mode accepts it), so the count rides
    # VMEM with a full-trailing-dims block instead.
    nval = jnp.asarray(nvalid, jnp.int32).reshape(n_tiles, 1, 1)
    kernel = functools.partial(_blend_bwd_kernel, k_total=k, chunk=chunk,
                               n_ch=n_ch)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, k, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, n_ch), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, 6 + n_ch), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, k, 6 + n_ch), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, n_chunks, p), jnp.float32)],
        interpret=interpret,
    )(packed, pix_xy, gcol_tiles, gt_tiles, nval)
    return out
