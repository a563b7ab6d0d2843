#!/usr/bin/env python
"""Render-quality CLI (reference scripts/eval_render.py): PSNR/SSIM over
saved render/GT image pairs (PNG directories with matching filenames)."""
import argparse
import glob
import json
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fisher_nerf_customized_tpu.utils.platform import pin_platform_from_env

pin_platform_from_env()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("render_dir")
    p.add_argument("gt_dir")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from fisher_nerf_customized_tpu.ops.image import calc_psnr, calc_ssim

    psnrs, ssims = [], []
    for rf in sorted(glob.glob(os.path.join(args.render_dir, "*.png"))):
        gf = os.path.join(args.gt_dir, os.path.basename(rf))
        if not os.path.exists(gf):
            continue
        r = cv2.imread(rf)[..., ::-1].astype(np.float32) / 255.0
        g = cv2.imread(gf)[..., ::-1].astype(np.float32) / 255.0
        psnrs.append(float(calc_psnr(jnp.asarray(r), jnp.asarray(g))))
        ssims.append(float(calc_ssim(jnp.asarray(r), jnp.asarray(g))))
    print(json.dumps(dict(n=len(psnrs),
                          psnr=float(np.mean(psnrs)) if psnrs else None,
                          ssim=float(np.mean(ssims)) if ssims else None)))


if __name__ == "__main__":
    main()
