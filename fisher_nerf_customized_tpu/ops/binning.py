"""Static-shape tile binning — the XLA replacement for CUB sort-based binning.

The CUDA rasterizer builds per-tile depth-sorted Gaussian lists by
duplicating [tile|depth] keys and radix-sorting them (reference
cuda_rasterizer/rasterizer_impl.cu:277-323).  Dynamic list lengths are
impossible under XLA's static shapes, so the TPU design is:

  1. one global depth argsort of all N slots (invalid slots sort to +inf);
  2. a (N, T) tile-touch matrix from the per-Gaussian screen bboxes;
  3. an inclusive per-tile cumsum (`ranks`) over depth order;
  4. a *gather* fill of the fixed (T, K) table: slot k of tile t is the
     depth-sorted index whose rank first reaches k+1 — a searchsorted over
     the monotone rank column.  No scatter, no sort of N*T pairs.

K (`max_per_tile`) bounds per-tile blending work; overflow beyond K is
counted and reported so capacity can be tuned (front-to-back blending
saturates transmittance long before a well-tuned K).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TileBins(NamedTuple):
    table: jnp.ndarray        # (T, K) int32 indices into the ORIGINAL arrays
    slot_valid: jnp.ndarray   # (T, K) bool
    counts: jnp.ndarray       # (T,) number of touching Gaussians (uncapped)
    overflow: jnp.ndarray     # () total truncated entries across tiles
    n_tiles_x: int
    n_tiles_y: int


def _first_k_touchers(touch_t_n, k: int):
    """touch (T, N) over depth-ordered positions -> first-k positions per
    row via ONE fused lax.top_k (the k smallest touching positions == the
    top-k of -position).  Returns (positions (T, K) clamped, valid)."""
    n_rows, n = touch_t_n.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (n_rows, n), 1)
    score = jnp.where(touch_t_n, -pos, -(n + 1))
    if n < k:                                             # top_k needs k <= N
        score = jnp.pad(score, ((0, 0), (0, k - n)),
                        constant_values=-(n + 1))
    neg_pos, _ = jax.lax.top_k(score, k)
    return jnp.minimum(-neg_pos, n - 1), -neg_pos <= n - 1


def tile_bin(mean2d, radius, depth, valid, width: int, height: int,
             tile_size: int, max_per_tile: int,
             coarse_factor: int = 4, coarse_mult: int = 8) -> TileBins:
    n = mean2d.shape[0]
    ntx = -(-width // tile_size)
    nty = -(-height // tile_size)
    n_tiles = ntx * nty

    # 1. global depth order (invalid slots last)
    sort_key = jnp.where(valid, depth, jnp.inf)
    order = jnp.argsort(sort_key)                       # (N,)
    s_mean2d = mean2d[order]
    s_radius = radius[order]
    s_valid = valid[order]

    # 2. tile-bbox per sorted Gaussian (getRect, rasterizer_impl.cu /
    #    auxiliary.h semantics: min floor-div, max via +tile-1 ceil-div)
    u, v = s_mean2d[:, 0], s_mean2d[:, 1]
    r = s_radius
    x0 = jnp.clip(jnp.floor((u - r) / tile_size), 0, ntx).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((v - r) / tile_size), 0, nty).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((u + r) / tile_size) + 1, 0, ntx).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((v + r) / tile_size) + 1, 0, nty).astype(jnp.int32)

    tx = jnp.arange(ntx, dtype=jnp.int32)
    ty = jnp.arange(nty, dtype=jnp.int32)
    # touch_x: (N, ntx); touch_y: (N, nty)
    touch_x = (tx[None, :] >= x0[:, None]) & (tx[None, :] < x1[:, None])
    touch_y = (ty[None, :] >= y0[:, None]) & (ty[None, :] < y1[:, None])
    touch_x = touch_x & s_valid[:, None]
    # exact per-tile counts WITHOUT materializing (N, T): one MXU matmul
    counts = jnp.einsum("ny,nx->yx", touch_y.astype(jnp.float32),
                        touch_x.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    counts = counts.reshape(-1).astype(jnp.int32)         # (T,)

    use_hier = (ntx % coarse_factor == 0 and nty % coarse_factor == 0
                and ntx >= 2 * coarse_factor and nty >= 2 * coarse_factor)
    if use_hier:
        # -- hierarchical fill: the single-level top_k sorts a (T, N)
        # score matrix (the dominant cost of the whole render at 256²);
        # selecting into coarse supertiles first cuts the sorted volume
        # by ~coarse_factor² ---------------------------------------------
        cf = coarse_factor
        ncx, ncy = ntx // cf, nty // cf
        n_coarse = ncx * ncy
        kc = min(coarse_mult * max_per_tile, max(n, max_per_tile))

        cx0, cx1 = x0 // cf, (x1 + cf - 1) // cf
        cy0, cy1 = y0 // cf, (y1 + cf - 1) // cf
        ctx = jnp.arange(ncx, dtype=jnp.int32)
        cty = jnp.arange(ncy, dtype=jnp.int32)
        touch_cx = ((ctx[None] >= cx0[:, None]) & (ctx[None] < cx1[:, None])
                    & s_valid[:, None])
        touch_cy = (cty[None] >= cy0[:, None]) & (cty[None] < cy1[:, None])
        touch_c = (touch_cy[:, :, None] & touch_cx[:, None, :]).reshape(
            n, n_coarse)
        cpos, cvalid = _first_k_touchers(touch_c.T, kc)   # (C, Kc)

        # coarse overflow (candidates silently dropped beyond Kc)
        counts_c = jnp.einsum("ny,nx->yx", touch_cy.astype(jnp.float32),
                              touch_cx.astype(jnp.float32),
                              preferred_element_type=jnp.float32)
        overflow_c = jnp.sum(jnp.maximum(
            counts_c.reshape(-1).astype(jnp.int32) - kc, 0))

        # candidate bboxes per coarse cell: (C, Kc)
        bx0, bx1 = x0[cpos], x1[cpos]
        by0, by1 = y0[cpos], y1[cpos]

        # fine tiles of each coarse cell: global (tx, ty) per (cell, sub)
        sub = jnp.arange(cf * cf, dtype=jnp.int32)
        cell = jnp.arange(n_coarse, dtype=jnp.int32)
        g_tx = (cell % ncx)[:, None] * cf + (sub % cf)[None, :]   # (C, S)
        g_ty = (cell // ncx)[:, None] * cf + (sub // cf)[None, :]
        touch_f = ((g_tx[:, :, None] >= bx0[:, None, :])
                   & (g_tx[:, :, None] < bx1[:, None, :])
                   & (g_ty[:, :, None] >= by0[:, None, :])
                   & (g_ty[:, :, None] < by1[:, None, :])
                   & cvalid[:, None, :])                  # (C, S, Kc)
        fpos, fvalid = _first_k_touchers(
            touch_f.reshape(n_coarse * cf * cf, kc), max_per_tile)
        # fpos indexes the coarse candidate list -> global sorted position
        cell_of_row = jnp.repeat(jnp.arange(n_coarse), cf * cf)
        table_sorted = cpos[cell_of_row[:, None],
                            fpos]                          # (C*S, K)
        # rows are (coarse cell, sub-tile) ordered; remap to tile-major
        row_tile = (g_ty.reshape(-1) * ntx + g_tx.reshape(-1))
        inv = jnp.zeros((n_tiles,), jnp.int32).at[row_tile].set(
            jnp.arange(n_tiles, dtype=jnp.int32))
        table_sorted = table_sorted[inv]
        slot_valid = fvalid[inv]
        overflow = jnp.sum(jnp.maximum(counts - max_per_tile, 0)) + overflow_c
    else:
        touch = (touch_y[:, :, None] & touch_x[:, None, :]).reshape(n, n_tiles)
        table_sorted, slot_valid = _first_k_touchers(touch.T, max_per_tile)
        overflow = jnp.sum(jnp.maximum(counts - max_per_tile, 0))

    table = order[table_sorted]
    return TileBins(table=table, slot_valid=slot_valid, counts=counts,
                    overflow=overflow, n_tiles_x=ntx, n_tiles_y=nty)
