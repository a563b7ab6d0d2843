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


def tile_bin(mean2d, radius, depth, valid, width: int, height: int,
             tile_size: int, max_per_tile: int) -> TileBins:
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
    touch = (touch_y[:, :, None] & touch_x[:, None, :]) & s_valid[:, None, None]
    touch = touch.reshape(n, n_tiles)

    # 3. per-tile ranks over depth order
    ranks = jnp.cumsum(touch.astype(jnp.int32), axis=0)   # (N, T)
    counts = ranks[-1]                                    # (T,)

    # 4. gather-fill the (T, K) table via searchsorted per tile column
    ks = jnp.arange(1, max_per_tile + 1, dtype=jnp.int32)

    def fill_tile(rank_col):
        idx = jnp.searchsorted(rank_col, ks, side="left")
        return jnp.clip(idx, 0, n - 1).astype(jnp.int32)

    table_sorted = jax.vmap(fill_tile, in_axes=1)(ranks)  # (T, K) into sorted order
    slot_valid = ks[None, :] <= counts[:, None]
    table = order[table_sorted]
    overflow = jnp.sum(jnp.maximum(counts - max_per_tile, 0))

    return TileBins(table=table, slot_valid=slot_valid, counts=counts,
                    overflow=overflow, n_tiles_x=ntx, n_tiles_y=nty)
