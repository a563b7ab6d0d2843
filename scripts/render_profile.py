#!/usr/bin/env python
"""Per-stage render profile at 23k and 131k Gaussians (VERDICT r4 item 2:
locate the true bottleneck before optimizing — the corrected roofline says
the kernels are far from any wall, so the 33.6 ms @131k must be one stage).

Stages timed separately (each jitted + blocked):
  preprocess (EWA project/cull)  | tile_bin (hierarchical top-k)
  pack_tile_params (gather)      | pallas_blend (chunk walk)
  full render_pallas             | full render (XLA twin)

Usage: python scripts/render_profile.py [--n 23000 131072] [--img 256]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fisher_nerf_customized_tpu.utils.platform import pin_platform_from_env

pin_platform_from_env()

import jax
import jax.numpy as jnp
import numpy as np


def scene_params(n, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(2.0, 9.0, n)          # in front of camera
    scales = np.full((n, 3), 0.03, np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    opac = rng.uniform(0.3, 0.9, (n,)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return (jnp.asarray(pts), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(cols))


def timed(fn, *args, reps=20, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1000.0, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, nargs="+", default=[23000, 131072])
    ap.add_argument("--img", type=int, default=256)
    ap.add_argument("--tile", type=int, default=16)
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    from fisher_nerf_customized_tpu.ops.binning import tile_bin
    from fisher_nerf_customized_tpu.ops.camera import Camera
    from fisher_nerf_customized_tpu.ops.pallas_blend import (
        pack_tile_params, pallas_blend, render_pallas)
    from fisher_nerf_customized_tpu.ops.projection import preprocess
    from fisher_nerf_customized_tpu.ops.rasterize import (RenderSettings,
                                                          render)

    img = args.img
    cam = Camera(fx=img / 2.0, fy=img / 2.0, cx=img / 2.0, cy=img / 2.0,
                 width=img, height=img)
    st = RenderSettings(tile_size=args.tile, max_per_tile=args.k,
                        chunk=args.chunk)

    prep_j = jax.jit(lambda m, s, q: preprocess(m, s, q, cam))
    bin_j = jax.jit(lambda m2, r, d, v: tile_bin(
        m2, r, d, v, cam.width, cam.height, args.tile, args.k))
    pack_j = jax.jit(pack_tile_params)

    report = {}
    for n in args.n:
        means, scales, quats, opac, cols = scene_params(n)
        t_prep, prep = timed(prep_j, means, scales, quats, reps=args.reps)
        t_bin, bins = timed(bin_j, prep.mean2d, prep.radius, prep.depth,
                            prep.valid, reps=args.reps)
        t_pack, packed = timed(pack_j, prep, bins, opac, cols,
                               reps=args.reps)

        ts = args.tile
        ntx, nty = bins.n_tiles_x, bins.n_tiles_y
        tile_ids = jnp.arange(ntx * nty, dtype=jnp.int32)
        lx = jnp.tile(jnp.arange(ts, dtype=jnp.float32), (ts,))
        ly = jnp.repeat(jnp.arange(ts, dtype=jnp.float32), ts)
        px = ((tile_ids % ntx) * ts)[:, None].astype(jnp.float32) + lx[None]
        py = ((tile_ids // ntx) * ts)[:, None].astype(jnp.float32) + ly[None]
        pix_xy = jnp.stack([px, py], axis=1)
        nval = jnp.minimum(bins.counts, args.k)
        interp = jax.devices()[0].platform == "cpu"   # CPU smoke path only
        t_blend, _ = timed(pallas_blend, packed, pix_xy, nval, args.tile,
                           args.k, chunk=args.chunk, interpret=interp,
                           reps=args.reps)

        t_full, out = timed(
            lambda: render_pallas(cam, means, scales, quats, opac, cols,
                                  settings=st, interpret=interp),
            reps=args.reps)
        t_xla, _ = timed(
            lambda: render(cam, means, scales, quats, opac, cols,
                           settings=st), reps=args.reps)
        report[n] = dict(
            preprocess_ms=round(t_prep, 3), tile_bin_ms=round(t_bin, 3),
            pack_ms=round(t_pack, 3), pallas_blend_ms=round(t_blend, 3),
            full_render_pallas_ms=round(t_full, 3),
            full_render_xla_ms=round(t_xla, 3),
            sum_stages_ms=round(t_prep + t_bin + t_pack + t_blend, 3),
            overflow=int(np.asarray(bins.overflow)),
            mean_count=float(np.asarray(bins.counts).mean()))
    print(json.dumps(dict(img=img, tile=args.tile, k=args.k,
                          chunk=args.chunk, platform=jax.devices()[0]
                          .platform, stages=report)))


if __name__ == "__main__":
    main()
