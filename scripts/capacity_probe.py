#!/usr/bin/env python
"""100k+ Gaussian capacity probe (run on the real chip).

The blessed FakeSim scenes saturate around ~30k Gaussians, so the
late-episode 100k+ regime of the reference's MP3D scenes (its
mp3d_gaussian_FR_eccv episodes end with 10^5-scale maps) is probed
synthetically here: a dense state at N Gaussians drives the three hot
programs (mapping loss-grad, Fisher pose-eval chunk, plain render) at
each per-tile capacity tier, reporting throughput + per-tile overflow so
tier behavior at scale is a recorded artifact (VERDICT r2 'do this' #4,
last clause).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fisher_nerf_customized_tpu.utils.platform import pin_platform_from_env

pin_platform_from_env()


def synth_state(n: int, capacity: int, seed: int = 0):
    import jax.numpy as jnp

    from fisher_nerf_customized_tpu.models.gaussian_state import (
        add_gaussians, empty_state)
    rng = np.random.default_rng(seed)
    # room-like cloud: points on an 8x8x3m box shell + interior clutter
    pts = rng.uniform((-4, 0, -4), (4, 3, 4), (n, 3)).astype(np.float32)
    shell = rng.integers(0, 6, n)
    for ax, lo, hi in ((0, -4, 4), (1, 0, 3), (2, -4, 4)):
        pts[shell == 2 * ax, ax] = lo
        pts[shell == 2 * ax + 1, ax] = hi
    new = dict(
        means3D=jnp.asarray(pts),
        rgb_colors=jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32),
        unnorm_rotations=jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32),
                                  (n, 1)),
        logit_opacities=jnp.full((n, 1), 2.0, jnp.float32),
        log_scales=jnp.full((n, 3), np.log(0.02), jnp.float32))
    state, dropped = add_gaussians(empty_state(capacity), new,
                                   jnp.ones((n,), bool), 0)
    assert int(dropped) == 0
    return state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=131072)
    ap.add_argument("--tiers", default="256,512")
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fisher_nerf_customized_tpu.models.slam import (_mapping_loss,
                                                        _pose_scores,
                                                        MappingConfig)
    from fisher_nerf_customized_tpu.ops.camera import Camera
    from fisher_nerf_customized_tpu.ops.rasterize import (RenderSettings,
                                                          render)
    from fisher_nerf_customized_tpu.utils.jax_cache import (
        enable_persistent_cache)
    enable_persistent_cache()

    cam = Camera(fx=128.0, fy=128.0, cx=128.0, cy=128.0,
                 width=256, height=256)
    cap = 1
    while cap < args.n:
        cap *= 2
    state = synth_state(args.n, cap)
    mc = MappingConfig(
        num_iters=120, sil_thres=0.5, depth_weight=1.0, im_weight=0.5,
        prune_enabled=False, prune_every=40, prune_start=0, prune_stop=20,
        prune_thresh=0.005, prune_big_after=0, lr_means3D=1e-4,
        lr_rgb=2.5e-3, lr_rots=1e-3, lr_logit_op=0.05,
        lr_log_scales=1e-3, depth_error_ratio=10.0, downsample_pcd=4)
    rng = np.random.default_rng(1)
    gt_c = jnp.asarray(rng.uniform(0, 1, (256, 256, 3)), jnp.float32)
    gt_d = jnp.asarray(rng.uniform(1, 6, (256, 256)), jnp.float32)
    w2c = jnp.eye(4, dtype=jnp.float32)
    h_inv = jnp.ones((cap, 4), jnp.float32)
    loss_grad = jax.jit(jax.grad(
        lambda p, na, st_: _mapping_loss(p, na, w2c, gt_c, gt_d, cam, st_,
                                         mc)[0]),
        static_argnames=("st_",))

    out = dict(n_gaussians=args.n, capacity=cap,
               platform=jax.devices()[0].platform, tiers=[])
    for k in (int(t) for t in args.tiers.split(",")):
        st = RenderSettings(tile_size=16, max_per_tile=k, chunk=64)
        fst = RenderSettings(tile_size=32, max_per_tile=k, chunk=64)
        row = dict(max_per_tile=k)

        r = render(cam, state.params()["means3D"],
                   jnp.exp(state.params()["log_scales"]),
                   state.params()["unnorm_rotations"],
                   jax.nn.sigmoid(state.params()["logit_opacities"][:, 0]),
                   state.params()["rgb_colors"],
                   active=jnp.arange(cap) < state.n_active, settings=st)
        jax.block_until_ready(r["color"])
        n_tiles = (256 // 16) ** 2
        row["overflow_frac"] = round(
            float(r["overflow"]) / (n_tiles * k), 5)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            r = render(cam, state.params()["means3D"],
                       jnp.exp(state.params()["log_scales"]),
                       state.params()["unnorm_rotations"],
                       jax.nn.sigmoid(
                           state.params()["logit_opacities"][:, 0]),
                       state.params()["rgb_colors"],
                       active=jnp.arange(cap) < state.n_active, settings=st)
            jax.block_until_ready(r["color"])
        row["render_ms"] = round(
            (time.perf_counter() - t0) / args.reps * 1e3, 2)

        g = loss_grad(state.params(), state.n_active, st)
        jax.block_until_ready(g["means3D"])
        t0 = time.perf_counter()
        for _ in range(args.reps):
            g = loss_grad(state.params(), state.n_active, st)
            jax.block_until_ready(g["means3D"])
        row["loss_grad_ms"] = round(
            (time.perf_counter() - t0) / args.reps * 1e3, 2)

        ck = 8
        w2cs = jnp.tile(jnp.eye(4, dtype=jnp.float32), (ck, 1, 1))
        s = _pose_scores(state, w2cs, h_inv, cam, fst, "xla", False, 1e-3)
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            s = _pose_scores(state, w2cs, h_inv, cam, fst, "xla",
                             False, 1e-3)
            jax.block_until_ready(s)
        row["pose_eval_ms_per_pose"] = round(
            (time.perf_counter() - t0) / args.reps / ck * 1e3, 3)
        out["tiers"].append(row)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
