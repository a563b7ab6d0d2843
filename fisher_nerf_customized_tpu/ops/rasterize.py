"""Tile-based 3DGS forward rasterizer (pure XLA, jit/vmap-able, differentiable).

TPU re-design of the reference CUDA renderer (reference
cuda_rasterizer/forward.cu:300-393 renderCUDA + rasterizer_impl.cu
orchestration).  Key moves:

  * binning is gather-based with static shapes (ops/binning.py);
  * per-tile front-to-back alpha blending runs as a `lax.scan` over
    fixed-size depth chunks; the (chunk x pixels) color accumulation is an
    einsum that lands on the MXU;
  * transmittance is a carried product; the "median depth" output (depth at
    the T=0.5 crossing, 15.0 fallback — forward.cu:363-371) and final
    transmittance (silhouette) come from the same scan;
  * JAX AD through the scan replaces the hand-written CUDA backward for the
    mapping/tracking losses (`jax.checkpoint` keeps residual memory flat);
    the Fisher-specific squared backward lives in ops/fisher.py.

Numerical parity notes vs CUDA: alpha is clamped to 0.99 and zeroed below
1/255 exactly as in renderCUDA; the early "done when T < 1e-4" latch is not
replicated (contributions below that transmittance are < 1e-4 in color and
the latch would serialize the chunk).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .binning import tile_bin
from .camera import Camera
from .projection import preprocess


class RenderSettings(NamedTuple):
    tile_size: int = 16
    max_per_tile: int = 512
    chunk: int = 64
    max_depth: float = 15.0   # median-depth fallback (forward.cu:308)
    # "xla": differentiate the blend scan with JAX AD (jax.checkpoint);
    # "pallas": analytic per-slot backward kernel with early termination
    # (ops/pallas_blend_bwd.py) — the reference's hand-written backward.cu
    # equivalent.  Forward math is identical either way.
    diff_backend: str = "xla"
    # forward blend engine INSIDE the custom-VJP path (only honored when
    # diff_backend == "pallas", where the VJP shields it from JAX AD):
    # "pallas" runs ops/pallas_blend with in-kernel early termination —
    # the forward counterpart of the CUDA renderCUDA `done` latch.
    fwd_backend: str = "xla"


def pack_blend_features(prep, opacities, colors):
    """Per-Gaussian packed feature rows for the blend:
    [mean2d (2), conic (3), opacity (1), depth (1), colors (C)]."""
    return jnp.concatenate([
        prep.mean2d,                                 # 0:2
        prep.conic,                                  # 2:5
        opacities[:, None],                          # 5
        prep.depth[:, None],                         # 6
        colors,                                      # 7:
    ], axis=-1)


def tile_pixel_coords(ntx: int, nty: int, ts: int):
    """Pixel-center coordinates per tile: two (T, P) float arrays."""
    n_tiles = ntx * nty
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    tile_x0 = (tile_ids % ntx) * ts
    tile_y0 = (tile_ids // ntx) * ts
    lx = jnp.tile(jnp.arange(ts, dtype=jnp.float32), (ts,))
    ly = jnp.repeat(jnp.arange(ts, dtype=jnp.float32), ts)
    pix_x = tile_x0[:, None].astype(jnp.float32) + lx[None, :]
    pix_y = tile_y0[:, None].astype(jnp.float32) + ly[None, :]
    return pix_x, pix_y


def _blend_tiles(camera: Camera, st: RenderSettings, prep, bins,
                 opacities, colors):
    """Front-to-back blend of all tiles.  Returns per-tile-pixel buffers.

    The per-slot Gaussian parameters are gathered ONCE into a packed
    (T, K, F) array before the depth-chunk scan — random-index gathers
    inside the scan body are catastrophically slow on TPU (they lower to
    per-chunk dynamic-slice loops); a single large gather vectorizes over
    the contiguous feature axis."""
    ts = st.tile_size
    ntx, nty = bins.n_tiles_x, bins.n_tiles_y
    cch = colors.shape[-1]
    feat = pack_blend_features(prep, opacities, colors)
    packed = feat[bins.table]                        # (T, K, 7+C)
    pix_x, pix_y = tile_pixel_coords(ntx, nty, ts)
    if st.diff_backend == "pallas":
        return blend_packed_pallas_bwd(st, packed, bins.slot_valid,
                                       pix_x, pix_y)
    return blend_packed(st, packed, bins.slot_valid, pix_x, pix_y)


def blend_packed(st: RenderSettings, packed, slot_valid, pix_x, pix_y):
    """Chunked front-to-back blend of pre-packed per-tile slot features.

    packed: (T, K, 7+C) rows in front-to-back depth order (layout of
    `pack_blend_features`); slot_valid: (T, K); pix_x/pix_y: (T, P).
    Returns (final_t (T, P), color_acc (T, P, C), median_depth (T, P)).
    Factored out of _blend_tiles so the Gaussian-axis sharded renderer
    (parallel/sharding.py) can blend merged cross-device candidate lists.
    """
    n_tiles, p = pix_x.shape
    n_chunks = st.max_per_tile // st.chunk
    assert n_chunks * st.chunk == st.max_per_tile, "chunk must divide max_per_tile"
    cch = packed.shape[-1] - 7

    @jax.checkpoint
    def chunk_step(carry, k0):
        t_carry, c_acc, med, has_med = carry
        blk = jax.lax.dynamic_slice(
            packed, (0, k0, 0), (n_tiles, st.chunk, packed.shape[-1]))
        sval = jax.lax.dynamic_slice(slot_valid, (0, k0), (n_tiles, st.chunk))

        mu = blk[..., 0:2]             # (T, CH, 2)
        con = blk[..., 2:5]            # (T, CH, 3)
        opa = blk[..., 5]              # (T, CH)
        dep = blk[..., 6]              # (T, CH)
        col = blk[..., 7:]             # (T, CH, C)

        dx = mu[:, :, 0:1] - pix_x[:, None, :]     # (T, CH, P)
        dy = mu[:, :, 1:2] - pix_y[:, None, :]
        a, b, c = con[:, :, 0:1], con[:, :, 1:2], con[:, :, 2:3]
        power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
        inside = power <= 0.0
        g = jnp.exp(jnp.where(inside, power, 0.0))
        alpha = jnp.minimum(0.99, opa[:, :, None] * g)
        alpha = jnp.where(inside & sval[:, :, None] & (alpha >= 1.0 / 255.0),
                          alpha, 0.0)

        one_minus = 1.0 - alpha
        cum = jnp.cumprod(one_minus, axis=1)                     # (T, CH, P)
        cum_excl = jnp.concatenate(
            [jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1)
        t_before = t_carry[:, None, :] * cum_excl
        w = alpha * t_before                                     # (T, CH, P)

        c_acc = c_acc + jnp.einsum("tkp,tkc->tpc", w, col,
                                   preferred_element_type=jnp.float32)

        t_after = t_before * one_minus
        crossing = (t_before > 0.5) & (t_after < 0.5) & (alpha > 0.0)
        dep_b = jnp.broadcast_to(dep[:, :, None], crossing.shape)
        dep_cross = jnp.max(jnp.where(crossing, dep_b, -jnp.inf), axis=1)
        any_cross = jnp.any(crossing, axis=1)
        med = jnp.where(~has_med & any_cross, dep_cross, med)
        has_med = has_med | any_cross

        t_carry = t_carry * cum[:, -1, :]
        return (t_carry, c_acc, med, has_med), None

    t0 = jnp.ones((n_tiles, p), jnp.float32)
    c0 = jnp.zeros((n_tiles, p, cch), jnp.float32)
    med0 = jnp.zeros((n_tiles, p), jnp.float32)
    hm0 = jnp.zeros((n_tiles, p), bool)
    k0s = jnp.arange(n_chunks, dtype=jnp.int32) * st.chunk
    (t_final, c_acc, med, has_med), _ = jax.lax.scan(
        chunk_step, (t0, c0, med0, hm0), k0s)
    med = jnp.where(has_med, med, st.max_depth)
    return t_final, c_acc, med


def _tiles_to_image(buf, nty, ntx, ts, height, width):
    """(T, P, ...) tile-pixel buffer -> (H, W, ...) image (crops padding)."""
    trailing = buf.shape[2:]
    img = buf.reshape((nty, ntx, ts, ts) + trailing)
    img = jnp.moveaxis(img, 2, 1).reshape((nty * ts, ntx * ts) + trailing)
    return img[:height, :width]


def render_prebinned(camera: Camera, means_cam, scales, quats, opacities,
                     colors, bins, bg=None,
                     settings: RenderSettings = RenderSettings()):
    """Render with a FROZEN tile-binning table.

    The CUDA reference re-sorts every optimizer iteration because its CUB
    radix sort is nearly free (rasterizer_impl.cu:277-323); on TPU the
    binning pass (plus its jax.checkpoint recompute in the backward) is a
    large fraction of a mapping iteration, while splats move << 1 px per
    Adam step — so the mapping phase bins once per window frame and blends
    against live (differentiable) preprocess outputs."""
    st = settings
    prep = preprocess(means_cam, scales, quats, camera)
    t_final, c_acc, med = _blend_tiles(camera, st, prep, bins, opacities,
                                       colors)
    cch = colors.shape[-1]
    if bg is None:
        bg = jnp.zeros((cch,), jnp.float32)
    out = c_acc + t_final[:, :, None] * bg[None, None, :]
    ts = st.tile_size
    img = _tiles_to_image(out, bins.n_tiles_y, bins.n_tiles_x, ts,
                          camera.height, camera.width)
    depth = _tiles_to_image(med, bins.n_tiles_y, bins.n_tiles_x, ts,
                            camera.height, camera.width)
    final_t = _tiles_to_image(t_final, bins.n_tiles_y, bins.n_tiles_x, ts,
                              camera.height, camera.width)
    return dict(color=img, depth=depth, final_t=final_t, radii=prep.radius,
                overflow=bins.overflow)


@functools.partial(jax.jit, static_argnames=("camera", "settings"))
def render(camera: Camera, means_cam, scales, quats, opacities, colors,
           bg=None, active=None, settings: RenderSettings = RenderSettings()):
    """Render camera-frame Gaussians to an (H, W, C) image.

    Args:
      means_cam: (N, 3) centers in the camera frame (+z forward).
      scales:    (N, 3) stddevs (exp of log_scales).
      quats:     (N, 4) wxyz rotations (world frame, reference quirk).
      opacities: (N,) post-sigmoid opacities.
      colors:    (N, C) per-Gaussian channel values ("colors_precomp" —
                 RGB for the photometric pass, [z, 1, z²] for the
                 depth/silhouette pass; reference slam_helpers.py:235).
      bg:        (C,) background color (default zeros).
      active:    (N,) bool slot mask.

    Returns dict with:
      color:   (H, W, C) blended channels + T*bg
      depth:   (H, W) median depth (T=0.5 crossing, 15.0 fallback)
      final_t: (H, W) final transmittance (1 - alpha coverage)
      radii:   (N,) screen-space radii (0 = culled; drives "seen" masks)
      overflow: () count of Gaussians truncated by the per-tile capacity
    """
    st = settings
    prep = preprocess(means_cam, scales, quats, camera, active=active)
    bins = tile_bin(prep.mean2d, prep.radius, prep.depth, prep.valid,
                    camera.width, camera.height, st.tile_size, st.max_per_tile)
    t_final, c_acc, med = _blend_tiles(camera, st, prep, bins, opacities, colors)

    cch = colors.shape[-1]
    if bg is None:
        bg = jnp.zeros((cch,), jnp.float32)
    out = c_acc + t_final[:, :, None] * bg[None, None, :]

    ts = st.tile_size
    img = _tiles_to_image(out, bins.n_tiles_y, bins.n_tiles_x, ts,
                          camera.height, camera.width)
    depth = _tiles_to_image(med, bins.n_tiles_y, bins.n_tiles_x, ts,
                            camera.height, camera.width)
    final_t = _tiles_to_image(t_final, bins.n_tiles_y, bins.n_tiles_x, ts,
                              camera.height, camera.width)
    return dict(color=img, depth=depth, final_t=final_t, radii=prep.radius,
                overflow=bins.overflow)


# ---- custom-VJP blend: XLA forward, Pallas analytic backward --------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def blend_packed_pallas_bwd(st: RenderSettings, packed, slot_valid,
                            pix_x, pix_y):
    """blend_packed with the backward pass replaced by the analytic
    per-slot Pallas kernel (ops/pallas_blend_bwd.py) — the grad_power=1
    equivalent of the reference's hand-written backward.cu, with in-kernel
    early termination.  Forward outputs are bit-identical to blend_packed.

    Gradient notes (documented differences from strict JAX-AD of the
    scan, both matching the CUDA reference's conventions):
      * the alpha=0.99 clamp does not gate gradients (backward.cu
        recomputes alpha without a saturation mask);
      * the median-depth output is treated as a measurement (zero
        gradient; in the XLA path its comparisons also yield zero);
      * contributions past the T<1e-4 early-termination point are
        dropped (renderCUDA's `done` latch drops them too)."""
    return _vjp_forward(st, packed, slot_valid, pix_x, pix_y)


def _vjp_forward(st, packed, slot_valid, pix_x, pix_y):
    if st.fwd_backend == "pallas":
        from .pallas_blend import pallas_blend
        val = slot_valid[..., None].astype(packed.dtype)
        packed8 = jnp.concatenate(
            [packed[..., :7], val, packed[..., 7:]], axis=-1)
        pix_xy = jnp.stack([pix_x, pix_y], axis=1)        # (T, 2, P)
        nvalid = jnp.sum(slot_valid.astype(jnp.int32), axis=1)
        color, t_final, med = pallas_blend(
            packed8, pix_xy, nvalid, st.tile_size, st.max_per_tile,
            chunk=st.chunk, max_depth=st.max_depth,
            interpret=jax.default_backend() != "tpu")
        return t_final, color, med
    return blend_packed(st, packed, slot_valid, pix_x, pix_y)


def _bppb_fwd(st, packed, slot_valid, pix_x, pix_y):
    out = _vjp_forward(st, packed, slot_valid, pix_x, pix_y)
    return out, (packed, slot_valid, pix_x, pix_y)


def _bppb_bwd(st, res, cotangents):
    from .pallas_blend_bwd import pallas_blend_bwd_slots
    packed, slot_valid, pix_x, pix_y = res
    g_t, g_col, _g_med = cotangents          # (T,P), (T,P,C), (T,P)
    # fold validity into the kernel's convention (zero opacity => alpha 0)
    val = slot_valid[..., None].astype(packed.dtype)
    packed_k = packed.at[..., 5:6].multiply(val)
    pix_xy = jnp.stack([pix_x, pix_y], axis=1)                # (T, 2, P)
    nvalid = jnp.sum(slot_valid.astype(jnp.int32), axis=1)
    slots = pallas_blend_bwd_slots(packed_k, pix_xy, g_col,
                                   g_t[:, None, :], nvalid, st.chunk,
                                   interpret=jax.default_backend() != "tpu")
    cch = packed.shape[-1] - 7
    zeros_dep = jnp.zeros(slots.shape[:-1] + (1,), slots.dtype)
    d_packed = jnp.concatenate([
        slots[..., 0:2],                      # d mean2d
        slots[..., 2:5],                      # d conic
        slots[..., 5:6],                      # d opacity
        zeros_dep,                            # d depth (measurement)
        slots[..., 6:6 + cch],                # d colors
    ], axis=-1)
    d_packed = jnp.where(slot_valid[..., None], d_packed, 0.0)
    return (d_packed, None, None, None)


blend_packed_pallas_bwd.defvjp(_bppb_fwd, _bppb_bwd)


@functools.partial(jax.jit, static_argnames=("camera", "settings", "deg"))
def render_sh(camera: Camera, means_world, w2c, scales, quats, opacities,
              sh, deg: int = 3, bg=None, active=None,
              settings: RenderSettings = RenderSettings()):
    """Render with view-dependent SH colors (deg 0..3).

    The CUDA kernel evaluates SH inside its per-Gaussian preprocess when
    colors_precomp is absent (forward.cu:241-247); here the SH preamble
    (ops/sh.py) and the world->cam transform live in the SAME jit so XLA
    fuses them into the render program — the fusion the CUDA code does by
    hand.  sh: (N, M, 3) with M >= (deg+1)^2."""
    from .sh import sh_to_rgb
    c2w_rot = w2c[:3, :3].T                       # R^-1 = R^T
    campos = -(c2w_rot @ w2c[:3, 3])              # world camera center
    colors = sh_to_rgb(sh, means_world, campos, deg=deg)
    means_cam = means_world @ w2c[:3, :3].T + w2c[:3, 3]
    return render(camera, means_cam, scales, quats, opacities, colors,
                  bg=bg, active=active, settings=settings)
