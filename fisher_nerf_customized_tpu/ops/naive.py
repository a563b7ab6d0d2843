"""Naive O(N·pixels) reference rasterizer — ground truth for unit tests.

Implements the identical math to ops/rasterize.py with no tile binning and
no per-tile capacity: every Gaussian is blended at every pixel in global
depth order.  Exact (up to fp reordering) against the CUDA semantics for
scenes small enough to afford it.  Used only by tests and debugging.
"""
from __future__ import annotations

import jax.numpy as jnp

from .camera import Camera
from .projection import preprocess


def render_naive(camera: Camera, means_cam, scales, quats, opacities, colors,
                 bg=None, active=None, max_depth: float = 15.0,
                 tile_size: int = 16):
    prep = preprocess(means_cam, scales, quats, camera, active=active)
    order = jnp.argsort(jnp.where(prep.valid, prep.depth, jnp.inf))

    mu = prep.mean2d[order]
    con = prep.conic[order]
    dep = prep.depth[order]
    val = prep.valid[order]
    rad = prep.radius[order]
    opa = opacities[order]
    col = colors[order]

    h, w = camera.height, camera.width
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    pix = jnp.stack([xs.ravel(), ys.ravel()], axis=-1)          # (P, 2)

    dx = mu[:, 0:1] - pix[None, :, 0]                           # (N, P)
    dy = mu[:, 1:2] - pix[None, :, 1]
    a, b, c = con[:, 0:1], con[:, 1:2], con[:, 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    inside = power <= 0.0
    g = jnp.exp(jnp.where(inside, power, 0.0))
    alpha = jnp.minimum(0.99, opa[:, None] * g)
    # CUDA only evaluates a Gaussian at pixels of tiles inside its screen
    # bbox (getRect); replicate so this oracle matches tile semantics
    ts = float(tile_size)
    px_t = jnp.floor(pix[None, :, 0] / ts)
    py_t = jnp.floor(pix[None, :, 1] / ts)
    x0 = jnp.floor((mu[:, 0:1] - rad[:, None]) / ts)
    x1 = jnp.floor((mu[:, 0:1] + rad[:, None]) / ts)
    y0 = jnp.floor((mu[:, 1:2] - rad[:, None]) / ts)
    y1 = jnp.floor((mu[:, 1:2] + rad[:, None]) / ts)
    in_rect = (px_t >= x0) & (px_t <= x1) & (py_t >= y0) & (py_t <= y1)
    alpha = jnp.where(inside & in_rect & val[:, None]
                      & (alpha >= 1.0 / 255.0), alpha, 0.0)

    cum = jnp.cumprod(1.0 - alpha, axis=0)
    t_before = jnp.concatenate([jnp.ones_like(cum[:1]), cum[:-1]], axis=0)
    wgt = alpha * t_before                                      # (N, P)

    img = jnp.einsum("np,nc->pc", wgt, col)
    t_final = cum[-1]

    t_after = t_before * (1.0 - alpha)
    crossing = (t_before > 0.5) & (t_after < 0.5) & (alpha > 0.0)
    dep_b = jnp.broadcast_to(dep[:, None], crossing.shape)
    dep_cross = jnp.max(jnp.where(crossing, dep_b, -jnp.inf), axis=0)
    depth = jnp.where(jnp.any(crossing, axis=0), dep_cross, max_depth)

    cch = colors.shape[-1]
    if bg is None:
        bg = jnp.zeros((cch,), jnp.float32)
    img = img + t_final[:, None] * bg[None, :]

    return dict(color=img.reshape(h, w, cch),
                depth=depth.reshape(h, w),
                final_t=t_final.reshape(h, w),
                radii=prep.radius)
