"""Static-shape tile binning — the XLA replacement for CUB sort-based binning.

The CUDA rasterizer builds per-tile depth-sorted Gaussian lists by
duplicating [tile|depth] keys and radix-sorting them (reference
cuda_rasterizer/rasterizer_impl.cu:277-323).  Dynamic list lengths are
impossible under XLA's static shapes, so the TPU design is:

  1. a per-Gaussian screen bbox -> tile-touch predicate (never
     materialized at (N, T); split into (N, ntx) x (N, nty) factors);
  2. per-tile nearest-K selection via ONE fused `lax.top_k` with score
     `-depth` (invalid / non-touching slots score -inf).  top_k's
     descending value order IS front-to-back depth order, and its returned
     indices point straight into the original parameter arrays — so the
     whole binning pass does NO argsort and NO O(N)-row gathers (random
     row gathers run at ~30M rows/s on TPU and would dominate the render);
  3. hierarchically: coarse supertile candidate lists first (top_k over
     (C, N)), then fine per-tile selection from the candidate lists
     (top_k over (T, Kc)) — cutting the scored volume by ~coarse_factor².

K (`max_per_tile`) bounds per-tile blending work; overflow beyond K is
counted and reported so capacity can be tuned (front-to-back blending
saturates transmittance long before a well-tuned K).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp


class TileBins(NamedTuple):
    table: jnp.ndarray        # (T, K) int32 indices into the ORIGINAL arrays
    slot_valid: jnp.ndarray   # (T, K) bool
    counts: jnp.ndarray       # (T,) number of touching Gaussians (uncapped)
    overflow: jnp.ndarray     # () total truncated entries across tiles
    n_tiles_x: int
    n_tiles_y: int


# numpy scalar, NOT jnp: a module-level device constant would initialize
# the XLA backend at import time, which breaks jax.distributed.initialize
# ordering on multi-host (it must run before any backend touch)
_NEG_INF = np.float32(-np.inf)


def _nearest_k(scores, k: int):
    """Per-row top-k of `scores` (higher = nearer camera).  Returns
    (indices (R, K), valid (R, K)); rows are depth-descending in score,
    i.e. front-to-back."""
    n = scores.shape[-1]
    if n < k:
        scores = jnp.pad(scores, ((0, 0), (0, k - n)),
                         constant_values=_NEG_INF)
    vals, idx = jax.lax.top_k(scores, k)
    return jnp.minimum(idx, n - 1), vals > _NEG_INF


def tile_bin(mean2d, radius, depth, valid, width: int, height: int,
             tile_size: int, max_per_tile: int,
             coarse_factor: int = 4, coarse_mult: int = 8) -> TileBins:
    n = mean2d.shape[0]
    ntx = -(-width // tile_size)
    nty = -(-height // tile_size)
    n_tiles = ntx * nty

    # tile-bbox per Gaussian, in ORIGINAL slot order (getRect,
    # rasterizer_impl.cu / auxiliary.h semantics)
    u, v = mean2d[:, 0], mean2d[:, 1]
    r = radius
    x0 = jnp.clip(jnp.floor((u - r) / tile_size), 0, ntx).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((v - r) / tile_size), 0, nty).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((u + r) / tile_size) + 1, 0, ntx).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((v + r) / tile_size) + 1, 0, nty).astype(jnp.int32)

    tx = jnp.arange(ntx, dtype=jnp.int32)
    ty = jnp.arange(nty, dtype=jnp.int32)
    # touch_x: (N, ntx); touch_y: (N, nty)
    touch_x = (tx[None, :] >= x0[:, None]) & (tx[None, :] < x1[:, None])
    touch_y = (ty[None, :] >= y0[:, None]) & (ty[None, :] < y1[:, None])
    touch_x = touch_x & valid[:, None]
    # exact per-tile counts WITHOUT materializing (N, T): one MXU matmul
    counts = jnp.einsum("ny,nx->yx", touch_y.astype(jnp.float32),
                        touch_x.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    counts = counts.reshape(-1).astype(jnp.int32)         # (T,)

    neg_depth = jnp.where(valid, -depth, _NEG_INF)        # (N,) score base

    use_hier = (ntx % coarse_factor == 0 and nty % coarse_factor == 0
                and ntx >= 2 * coarse_factor and nty >= 2 * coarse_factor)
    if use_hier:
        # -- hierarchical fill: a single-level top_k scores a (T, N)
        # matrix (the dominant cost at 256²); selecting into coarse
        # supertiles first cuts the scored volume by ~coarse_factor² ----
        cf = coarse_factor
        ncx, ncy = ntx // cf, nty // cf
        n_coarse = ncx * ncy
        kc = min(coarse_mult * max_per_tile, max(n, max_per_tile))

        cx0, cx1 = x0 // cf, (x1 + cf - 1) // cf
        cy0, cy1 = y0 // cf, (y1 + cf - 1) // cf
        ctx = jnp.arange(ncx, dtype=jnp.int32)
        cty = jnp.arange(ncy, dtype=jnp.int32)
        touch_cx = ((ctx[None] >= cx0[:, None]) & (ctx[None] < cx1[:, None])
                    & valid[:, None])
        touch_cy = (cty[None] >= cy0[:, None]) & (cty[None] < cy1[:, None])
        touch_c = (touch_cy[:, :, None] & touch_cx[:, None, :]).reshape(
            n, n_coarse)
        scores_c = jnp.where(touch_c.T, neg_depth[None, :], _NEG_INF)
        cidx, cvalid = _nearest_k(scores_c, kc)           # (C, Kc) orig idx

        # coarse overflow (candidates silently dropped beyond Kc)
        counts_c = jnp.einsum("ny,nx->yx", touch_cy.astype(jnp.float32),
                              touch_cx.astype(jnp.float32),
                              preferred_element_type=jnp.float32)
        overflow_c = jnp.sum(jnp.maximum(
            counts_c.reshape(-1).astype(jnp.int32) - kc, 0))

        # candidate bboxes + depth: ONE (C, Kc)-row gather of a packed
        # (N, 5) matrix instead of five scalar-column gathers
        bbox = jnp.stack([x0.astype(jnp.float32), x1.astype(jnp.float32),
                          y0.astype(jnp.float32), y1.astype(jnp.float32),
                          neg_depth], axis=-1)            # (N, 5)
        cand = bbox[cidx]                                 # (C, Kc, 5)
        bx0, bx1 = cand[..., 0], cand[..., 1]
        by0, by1 = cand[..., 2], cand[..., 3]
        cand_nd = jnp.where(cvalid, cand[..., 4], _NEG_INF)

        # fine tiles of each coarse cell: global (tx, ty) per (cell, sub)
        sub = jnp.arange(cf * cf, dtype=jnp.int32)
        cell = jnp.arange(n_coarse, dtype=jnp.int32)
        g_tx = ((cell % ncx)[:, None] * cf + (sub % cf)[None, :]).astype(
            jnp.float32)                                  # (C, S)
        g_ty = ((cell // ncx)[:, None] * cf + (sub // cf)[None, :]).astype(
            jnp.float32)
        touch_f = ((g_tx[:, :, None] >= bx0[:, None, :])
                   & (g_tx[:, :, None] < bx1[:, None, :])
                   & (g_ty[:, :, None] >= by0[:, None, :])
                   & (g_ty[:, :, None] < by1[:, None, :]))  # (C, S, Kc)
        scores_f = jnp.where(touch_f, cand_nd[:, None, :], _NEG_INF)
        fpos, fvalid = _nearest_k(
            scores_f.reshape(n_coarse * cf * cf, kc), max_per_tile)
        # fpos indexes the coarse candidate list -> original index
        cell_of_row = jnp.repeat(jnp.arange(n_coarse), cf * cf)
        table = cidx[cell_of_row[:, None], fpos]          # (C*S, K)
        # rows are (coarse cell, sub-tile) ordered; remap to tile-major
        row_tile = (g_ty.reshape(-1) * ntx + g_tx.reshape(-1)).astype(
            jnp.int32)
        inv = jnp.zeros((n_tiles,), jnp.int32).at[row_tile].set(
            jnp.arange(n_tiles, dtype=jnp.int32))
        table = table[inv]
        slot_valid = fvalid[inv]
        overflow = jnp.sum(jnp.maximum(counts - max_per_tile, 0)) + overflow_c
    else:
        touch = (touch_y[:, :, None] & touch_x[:, None, :]).reshape(n, n_tiles)
        scores = jnp.where(touch.T, neg_depth[None, :], _NEG_INF)
        table, slot_valid = _nearest_k(scores, max_per_tile)
        overflow = jnp.sum(jnp.maximum(counts - max_per_tile, 0))

    return TileBins(table=table, slot_valid=slot_valid, counts=counts,
                    overflow=overflow, n_tiles_x=ntx, n_tiles_y=nty)
