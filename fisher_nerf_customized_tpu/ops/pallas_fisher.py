"""Pallas TPU kernel for the Fisher squared-backward (grad_power=2).

The XLA fisher core (ops/fisher.py) walks every depth chunk of every
tile twice with (T, CH, P) HBM-resident intermediates; on a saturated
indoor tile most slots sit behind an opaque surface and contribute ~0.
This kernel runs both passes per tile inside VMEM with the CUDA
renderCUDA `done` latch re-created (reference forward.cu:313-356 /
backward.cu:587): the forward walk stops at the first chunk where every
pixel's transmittance is saturated, and the backward walk only re-visits
the chunks the forward actually blended.

Per tile (grid = tiles):
  pass 1 (front-to-back, chunked while_loop): per-chunk alpha, carried
    transmittance; records each chunk's starting transmittance into a
    VMEM scratch; stops early at max_pixel(T) < 1e-4.
  pass 2 (back-to-front from the stop chunk): reconstructs per-pair
    transmittance (log-space triangular matmul, MXU) and the channel-
    summed suffix color S_behind (strictly-upper triangular matmul —
    the cotangent is uniform so channels collapse, see ops/fisher.py),
    forms the per-pair gradients dL/dα → (dμ2d, dopacity), chains to the
    camera-frame mean, squares per pixel, sums over pixels, and writes
    per-slot Hessian rows (K, 4).

The per-Gaussian (N, 4) diagonal is one scatter-add outside the kernel
(h.at[table].add) — the XLA side owns indexing, the kernel owns the
arithmetic, exactly the division of labor of ops/pallas_blend.py.

Semantics match reference backward.cu:1093-1137 with grad_power=2 and a
uniform 1e-3 cotangent (models/SLAM/gaussian.py:1503 compute_Hessian);
outputs match ops/fisher.fisher_diag up to the early-termination cutoff
(contributions below T=1e-4, which the CUDA reference also drops).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# packed feature layout per slot (matches ops/fisher._pack_params):
# [mu_x, mu_y, con_a, con_b, con_c, opacity, depth, mc_x, mc_y, mc_z,
#  csum, jac(9)?] — colors enter only as their channel sum (uniform
# cotangent), packed XLA-side so the kernel is independent of the channel
# count; jac is the d(conic)/d(mean_cam) cov2D-chain Jacobian, appended
# ONLY in full_chain mode so the reduced chain keeps the 11-float slot
# bandwidth (the kernel is VMEM-traffic-bound).
_NF = 11
_NF_FULL = 20


def pack_fisher_features(prep, bins, opacities, colors, means_cam,
                         conic_jac=None):
    """(T, K, 11|20) slot features for the kernel (one XLA row gather)."""
    feat = jnp.concatenate([
        prep.mean2d,                                  # 0:2
        prep.conic,                                   # 2:5
        opacities[:, None],                           # 5
        prep.depth[:, None],                          # 6 (kept for parity)
        means_cam,                                    # 7:10
        jnp.sum(colors, axis=-1, keepdims=True),      # 10 (channel sum)
    ], axis=-1)
    if conic_jac is not None:
        feat = jnp.concatenate([feat, conic_jac.reshape(-1, 9)], axis=-1)
    packed = feat[bins.table]
    val = bins.slot_valid[..., None].astype(packed.dtype)
    # invalid slots: zero opacity so alpha = 0 everywhere
    packed = packed.at[..., 5:6].multiply(val)
    return packed


def _chunk_alpha(blk, pix_x, pix_y):
    mu_x = blk[:, 0:1]
    mu_y = blk[:, 1:2]
    a, b, c = blk[:, 2:3], blk[:, 3:4], blk[:, 4:5]
    opa = blk[:, 5:6]
    dx = mu_x - pix_x[None, :]                        # (CH, P)
    dy = mu_y - pix_y[None, :]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    inside = power <= 0.0
    g = jnp.exp(jnp.where(inside, power, 0.0))
    alpha = jnp.minimum(0.99, opa * g)
    live = inside & (alpha >= 1.0 / 255.0)
    alpha = jnp.where(live, alpha, 0.0)
    g = jnp.where(live, g, 0.0)
    return alpha, g, dx, dy


def _fisher_kernel(packed_ref, pix_ref, nval_ref, h_ref, tstart_ref, *,
                   k_total: int, chunk: int, grad_value: float,
                   fx: float, fy: float, full_chain: bool):
    p = pix_ref.shape[-1]
    pix_x = pix_ref[0, 0, :]
    pix_y = pix_ref[0, 1, :]
    # valid slots are front-contiguous (binning top_k); the per-tile
    # count bounds both walks — empty tiles do zero chunks
    n_chunks = (nval_ref[0, 0, 0] + chunk - 1) // chunk

    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    tri_strict_low = (cols < rows).astype(jnp.float32)    # prefix (excl)
    tri_strict_up = (cols > rows).astype(jnp.float32)     # suffix (excl)

    h_ref[0, :, :] = jnp.zeros((k_total, 4), jnp.float32)

    # ---- pass 1: forward walk, record chunk-start transmittance ---------
    def fwd_body(state):
        ci, t_carry = state
        blk = packed_ref[0, pl.ds(ci * chunk, chunk), :]
        alpha, _g, _dx, _dy = _chunk_alpha(blk, pix_x, pix_y)
        tstart_ref[0, pl.ds(ci, 1), :] = t_carry[None, :]
        logs = jnp.log1p(-alpha)
        t_carry = t_carry * jnp.exp(jnp.sum(logs, axis=0))
        return ci + 1, t_carry

    def fwd_cond(state):
        ci, t_carry = state
        return (ci < n_chunks) & (jnp.max(t_carry) >= 1e-4)

    t0 = jnp.ones((p,), jnp.float32)
    k_eff, _tf = jax.lax.while_loop(fwd_cond, fwd_body, (0, t0))

    # ---- pass 2: reverse walk over the k_eff blended chunks -------------
    def bwd_body(state):
        ci, s_behind = state
        blk = packed_ref[0, pl.ds(ci * chunk, chunk), :]
        alpha, g, dx, dy = _chunk_alpha(blk, pix_x, pix_y)
        opa = blk[:, 5:6]
        a, b, c = blk[:, 2:3], blk[:, 3:4], blk[:, 4:5]
        mc_x, mc_y, mc_z = blk[:, 7:8], blk[:, 8:9], blk[:, 9:10]
        csum = blk[:, 10:11]                              # (CH, 1)

        t_start = tstart_ref[0, pl.ds(ci, 1), :][0]       # (P,)
        logs = jnp.log1p(-alpha)                          # (CH, P)
        cum_excl = jnp.exp(jax.lax.dot_general(
            tri_strict_low, logs,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        t_before = t_start[None, :] * cum_excl            # (CH, P)
        w = alpha * t_before
        contrib = w * csum                                # (CH, P)

        # suffix within the chunk (strictly-upper tri matmul) + carry
        s_within = jax.lax.dot_general(
            tri_strict_up, contrib,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        s_b = s_within + s_behind[None, :]

        inv_om = 1.0 / jnp.maximum(1.0 - alpha, 1e-2)     # alpha <= 0.99
        dl_da = grad_value * (t_before * csum - s_b * inv_om)
        dl_da = jnp.where(alpha > 0.0, dl_da, 0.0)

        dl_do = g * dl_da
        dl_dg = opa * dl_da
        dg_dmx = -g * (a * dx + b * dy)
        dg_dmy = -g * (c * dy + b * dx)
        dl_dmx = dl_dg * dg_dmx
        dl_dmy = dl_dg * dg_dmy

        z = jnp.maximum(mc_z, 1e-6)
        gx = dl_dmx * (fx / z)
        gy = dl_dmy * (fy / z)
        gz = -(dl_dmx * fx * mc_x + dl_dmy * fy * mc_y) / (z * z)

        if full_chain:
            # cov2D-through-mean chain (backward.cu:144-270): per-pixel
            # TRUE conic cotangent contracted with the packed
            # d(conic)/d(mean) Jacobian, added before squaring
            t1 = dl_dg * g
            ca = -0.5 * t1 * dx * dx
            cb = -t1 * dx * dy
            cc = -0.5 * t1 * dy * dy
            gx = gx + (ca * blk[:, 11:12] + cb * blk[:, 14:15]
                       + cc * blk[:, 17:18])
            gy = gy + (ca * blk[:, 12:13] + cb * blk[:, 15:16]
                       + cc * blk[:, 18:19])
            gz = gz + (ca * blk[:, 13:14] + cb * blk[:, 16:17]
                       + cc * blk[:, 19:20])

        h_chunk = jnp.concatenate([
            jnp.sum(gx * gx, axis=-1, keepdims=True),
            jnp.sum(gy * gy, axis=-1, keepdims=True),
            jnp.sum(gz * gz, axis=-1, keepdims=True),
            jnp.sum(dl_do * dl_do, axis=-1, keepdims=True),
        ], axis=-1)                                       # (CH, 4)
        h_ref[0, pl.ds(ci * chunk, chunk), :] = h_chunk

        s_behind = s_behind + jnp.sum(contrib, axis=0)
        return ci - 1, s_behind

    def bwd_cond(state):
        ci, _s = state
        return ci >= 0

    s0 = jnp.zeros((p,), jnp.float32)
    jax.lax.while_loop(bwd_cond, bwd_body, (k_eff - 1, s0))


@functools.partial(jax.jit, static_argnames=("chunk", "grad_value", "fx",
                                             "fy", "interpret"))
def pallas_fisher_slots(packed, pix_xy, nvalid, chunk: int,
                        grad_value: float, fx: float, fy: float,
                        interpret: bool = False):
    """packed: (T, K, 11|20); pix_xy: (T, 2, P); nvalid: (T,) valid
    front-slot counts.  Returns per-slot Hessian rows (T, K, 4) aligned
    with the binning table.  A 20-wide packing (trailing conic Jacobian)
    selects the full-chain kernel variant."""
    n_tiles, k, nf = packed.shape
    p = pix_xy.shape[-1]
    n_chunks = k // chunk
    # VMEM (T, 1, 1): a (1, 1) SMEM block fails Mosaic's block-shape rule
    # on hardware (trailing dims must be divisible by (8, 128) or equal to
    # the full array dims); interpret mode does not check this.
    nval = jnp.asarray(nvalid, jnp.int32).reshape(n_tiles, 1, 1)
    kernel = functools.partial(_fisher_kernel, k_total=k, chunk=chunk,
                               grad_value=grad_value, fx=fx, fy=fy,
                               full_chain=nf >= _NF_FULL)
    h = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, k, nf), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, 4), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, k, 4), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, n_chunks, p), jnp.float32)],
        interpret=interpret,
    )(packed, pix_xy, nval)
    return h


def fisher_diag_pallas(camera, means_cam, scales, quats, opacities, colors,
                       grad_value: float = 1e-3, active=None,
                       settings=None, interpret: bool = False,
                       full_chain: bool = True):
    """Drop-in fisher_diag using the Pallas early-terminating kernel."""
    from .binning import tile_bin
    from .projection import build_cov3d, conic_mean_jac, preprocess
    from .rasterize import RenderSettings, tile_pixel_coords

    st = settings or RenderSettings()
    n = means_cam.shape[0]
    prep = preprocess(means_cam, scales, quats, camera, active=active)
    bins = tile_bin(prep.mean2d, prep.radius, prep.depth, prep.valid,
                    camera.width, camera.height, st.tile_size,
                    st.max_per_tile)
    cjac = None
    if full_chain:
        cjac = conic_mean_jac(means_cam, build_cov3d(scales, quats), camera,
                              valid=prep.valid)
    packed = pack_fisher_features(prep, bins, opacities, colors, means_cam,
                                  conic_jac=cjac)
    pix_x, pix_y = tile_pixel_coords(bins.n_tiles_x, bins.n_tiles_y,
                                     st.tile_size)
    pix_xy = jnp.stack([pix_x, pix_y], axis=1)
    nvalid = jnp.minimum(bins.counts, st.max_per_tile)
    h_slots = pallas_fisher_slots(packed, pix_xy, nvalid, st.chunk,
                                  float(grad_value), float(camera.fx),
                                  float(camera.fy), interpret=interpret)
    h_slots = jnp.where(bins.slot_valid[..., None], h_slots, 0.0)
    h = jnp.zeros((n, 4), jnp.float32).at[bins.table.reshape(-1)].add(
        h_slots.reshape(-1, 4), mode="drop")
    return dict(H=h, radii=prep.radius, visible=prep.radius > 0)
