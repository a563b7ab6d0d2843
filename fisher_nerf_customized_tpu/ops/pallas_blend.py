"""Pallas TPU kernel for the per-tile alpha-blend stage.

The north-star design point (BASELINE.json): the reference's CUDA
rasterizer becomes a Pallas tile-binned splatting kernel.  Division of
labor: XLA keeps what it is already optimal at — projection, binning
(sort/cumsum/searchsorted) and the (T, K) parameter gather — and Pallas
owns the sequential front-to-back composite, where it can do what an XLA
scan cannot: **early-terminate** a tile once every pixel's transmittance
has saturated (the CUDA renderCUDA `done` latch, forward.cu:313-356).
Saturated indoor tiles typically stop after a fraction of their K slots.

Grid: one program per tile.  Block: the tile's packed (K, F) parameter
list in VMEM; a `lax.while_loop` walks K in CH-sized chunks, carrying
(transmittance, color accum, median depth) and breaking when
max_pixel(T) < 1e-4.

Outputs bit-match the XLA blend path (ops/rasterize._blend_tiles) up to
f32 associativity; `tpu.blend_forward: pallas` selects it as the forward
of the custom-VJP blend (ops/rasterize._vjp_forward).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# packed feature layout per slot:
# [mu_x, mu_y, con_a, con_b, con_c, opacity, depth, valid, color_0..C-1]
_BASE_F = 8


def pack_tile_params(prep, bins, opacities, colors):
    """XLA-side gather into the (T, K, F) packed layout."""
    idx = bins.table                                  # (T, K)
    mu = prep.mean2d[idx]
    con = prep.conic[idx]
    opa = opacities[idx][..., None]
    dep = prep.depth[idx][..., None]
    val = bins.slot_valid[..., None].astype(jnp.float32)
    col = colors[idx]
    return jnp.concatenate([mu, con, opa, dep, val, col], axis=-1)


def _blend_kernel(packed_ref, pix_ref, nval_ref, out_color_ref, out_t_ref,
                  out_med_ref, *, k_total: int, chunk: int, n_ch: int,
                  max_depth: float):
    p = pix_ref.shape[-1]                # pixels per tile
    pix_x = pix_ref[0, 0, :]
    pix_y = pix_ref[0, 1, :]
    # valid slots are contiguous at the front of each tile row (binning
    # top_k puts -inf-scored slots last), so the per-tile valid count
    # bounds the walk EXACTLY — an empty tile does zero chunks instead
    # of walking all K (it never saturates, so the T<1e-4 latch alone
    # never fires there)
    k_lim = ((nval_ref[0, 0, 0] + chunk - 1) // chunk) * chunk

    # triangular matrices turn the within-chunk transmittance cumprod into
    # one MXU matmul in log space: cum_excl = exp(strict_lower @ log(1-a))
    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    tri_strict = (cols < rows).astype(jnp.float32)       # strictly lower

    def chunk_body(state):
        k0, t_carry, c_acc, med, has_med = state
        blk = packed_ref[0, pl.ds(k0, chunk), :]         # (CH, F)
        mu_x = blk[:, 0:1]
        mu_y = blk[:, 1:2]
        a, b, c = blk[:, 2:3], blk[:, 3:4], blk[:, 4:5]
        opa = blk[:, 5:6]
        dep = blk[:, 6:7]
        val = blk[:, 7:8]
        col = blk[:, _BASE_F:]                           # (CH, C)

        dx = mu_x - pix_x[None, :]                       # (CH, P)
        dy = mu_y - pix_y[None, :]
        power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
        inside = power <= 0.0
        g = jnp.exp(jnp.where(inside, power, 0.0))
        alpha = jnp.minimum(0.99, opa * g)
        alpha = jnp.where(inside & (val > 0.5) & (alpha >= 1.0 / 255.0),
                          alpha, 0.0)

        logs = jnp.log1p(-alpha)                         # (CH, P), <= 0
        cum_excl_log = jax.lax.dot_general(
            tri_strict, logs, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        cum_excl = jnp.exp(cum_excl_log)
        t_before = t_carry[None, :] * cum_excl
        w = alpha * t_before                             # (CH, P)

        c_acc = c_acc + jax.lax.dot_general(
            w, col, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (P, C)

        one_minus = 1.0 - alpha
        t_after = t_before * one_minus
        # carries must be float vectors: Mosaic rejects (P,) bool loop
        # carries and -inf constants in this position
        crossing = (t_before > 0.5) & (t_after < 0.5) & (alpha > 0.0)
        dep_b = jnp.broadcast_to(dep, crossing.shape)
        dep_cross = jnp.max(jnp.where(crossing, dep_b, -1e30), axis=0)
        any_cross = jnp.any(crossing, axis=0).astype(jnp.float32)
        med = jnp.where((has_med < 0.5) & (any_cross > 0.5), dep_cross, med)
        has_med = jnp.maximum(has_med, any_cross)

        chunk_prod = jnp.exp(jnp.sum(logs, axis=0))
        t_carry = t_carry * chunk_prod
        return k0 + chunk, t_carry, c_acc, med, has_med

    def cond(state):
        k0, t_carry, *_ = state
        # EARLY TERMINATION: stop at the last valid slot or when every
        # pixel is saturated, whichever comes first
        return (k0 < k_lim) & (jnp.max(t_carry) >= 1e-4)

    t0 = jnp.ones((p,), jnp.float32)
    c0 = jnp.zeros((p, n_ch), jnp.float32)
    med0 = jnp.zeros((p,), jnp.float32)
    hm0 = jnp.zeros((p,), jnp.float32)
    _k, t_final, c_acc, med, has_med = jax.lax.while_loop(
        cond, chunk_body, (0, t0, c0, med0, hm0))

    out_color_ref[0, :, :] = c_acc
    out_t_ref[0, 0, :] = t_final
    out_med_ref[0, 0, :] = jnp.where(has_med > 0.5, med, max_depth)


@functools.partial(jax.jit,
                   static_argnames=("tile_size", "max_per_tile", "chunk",
                                    "max_depth", "interpret"))
def pallas_blend(packed, pix_xy, nvalid, tile_size: int, max_per_tile: int,
                 chunk: int = 64, max_depth: float = 15.0,
                 interpret: bool = False):
    """packed: (T, K, F); pix_xy: (T, 2, P) pixel centers per tile;
    nvalid: (T,) int32 count of valid front slots per tile (bounds the
    chunk walk — empty/sparse tiles skip dead slots entirely).
    Returns (color (T, P, C), final_t (T, P), med_depth (T, P))."""
    n_tiles, k, f = packed.shape
    p = pix_xy.shape[-1]
    cch = f - _BASE_F
    # VMEM (T, 1, 1): a (1, 1) SMEM block fails Mosaic's block-shape rule
    # on hardware (trailing dims must be divisible by (8, 128) or equal to
    # the full array dims); interpret mode does not check this.
    nval = jnp.asarray(nvalid, jnp.int32).reshape(n_tiles, 1, 1)
    kernel = functools.partial(_blend_kernel, k_total=k, chunk=chunk,
                               n_ch=cch, max_depth=max_depth)
    color, t_final, med = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, k, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, p, cch), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, p, cch), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, p), jnp.float32),
        ],
        interpret=interpret,
    )(packed, pix_xy, nval)
    return color, t_final[:, 0, :], med[:, 0, :]


def render_pallas(camera, means_cam, scales, quats, opacities, colors,
                  bg=None, active=None, settings=None,
                  interpret: bool = False):
    """Full render using the Pallas blend (same outputs as ops.rasterize
    .render)."""
    from .binning import tile_bin
    from .projection import preprocess
    from .rasterize import RenderSettings, _tiles_to_image

    st = settings or RenderSettings()
    prep = preprocess(means_cam, scales, quats, camera, active=active)
    bins = tile_bin(prep.mean2d, prep.radius, prep.depth, prep.valid,
                    camera.width, camera.height, st.tile_size,
                    st.max_per_tile)
    packed = pack_tile_params(prep, bins, opacities, colors)

    ts = st.tile_size
    ntx, nty = bins.n_tiles_x, bins.n_tiles_y
    n_tiles = ntx * nty
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    lx = jnp.tile(jnp.arange(ts, dtype=jnp.float32), (ts,))
    ly = jnp.repeat(jnp.arange(ts, dtype=jnp.float32), ts)
    pix_x = ((tile_ids % ntx) * ts)[:, None].astype(jnp.float32) + lx[None]
    pix_y = ((tile_ids // ntx) * ts)[:, None].astype(jnp.float32) + ly[None]
    pix_xy = jnp.stack([pix_x, pix_y], axis=1)          # (T, 2, P)

    nvalid = jnp.minimum(bins.counts, st.max_per_tile)
    color, t_final, med = pallas_blend(packed, pix_xy, nvalid, st.tile_size,
                                       st.max_per_tile, chunk=st.chunk,
                                       max_depth=st.max_depth,
                                       interpret=interpret)
    cch = colors.shape[-1]
    if bg is None:
        bg = jnp.zeros((cch,), jnp.float32)
    out = color + t_final[:, :, None] * bg[None, None, :]
    img = _tiles_to_image(out, nty, ntx, ts, camera.height, camera.width)
    depth = _tiles_to_image(med, nty, ntx, ts, camera.height, camera.width)
    ft = _tiles_to_image(t_final, nty, ntx, ts, camera.height, camera.width)
    return dict(color=img, depth=depth, final_t=ft, radii=prep.radius,
                overflow=bins.overflow)
