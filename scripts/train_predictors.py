#!/usr/bin/env python
"""UPEN predictor-ensemble offline training CLI.

Reference: pytorch_utils/base_trainer.py + datasets/dataloader.py
HabitatDataOffline — train the map-completion ensemble on stored episodes.
Here episodes come from FakeSim (envs/offline_dataset.py); with habitat
installed, recorded episode archives can be passed via --dataset_npz.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fisher_nerf_customized_tpu.utils.platform import pin_platform_from_env

pin_platform_from_env()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", default="experiments/predictors")
    p.add_argument("--dataset_npz", default=None,
                   help="pre-stored (inputs, labels) archive")
    p.add_argument("--n_scenes", type=int, default=4)
    p.add_argument("--steps_per_scene", type=int, default=40)
    p.add_argument("--grid_dim", type=int, default=64)
    p.add_argument("--ensemble_size", type=int, default=4)
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--dataset_percentage", type=float, default=0.9)
    p.add_argument("--traj_policy", default="frontier",
                   choices=("frontier", "random"),
                   help="recording policy for the offline episodes; "
                        "frontier (default) matches the reference's "
                        "goal-directed coverage trajectories")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from fisher_nerf_customized_tpu.envs.offline_dataset import (
        generate_offline_dataset, load_dataset, save_dataset)
    from fisher_nerf_customized_tpu.models.predictors import PredictorEnsemble
    from fisher_nerf_customized_tpu.ops.camera import Camera
    from fisher_nerf_customized_tpu.engine.seg_metrics import mean_iou

    if args.dataset_npz and os.path.exists(args.dataset_npz):
        inputs, labels = load_dataset(args.dataset_npz)
    else:
        cam = Camera(fx=64.0, fy=64.0, cx=64.0, cy=64.0, width=128,
                     height=128)
        inputs, labels = generate_offline_dataset(
            cam, n_scenes=args.n_scenes,
            steps_per_scene=args.steps_per_scene, grid_dim=args.grid_dim,
            seed=args.seed, traj_policy=args.traj_policy)
        save_dataset(os.path.join(args.out_dir, "offline_dataset.npz"),
                     inputs, labels)

    n_val = max(len(inputs) // 5, 1)
    tr_x, tr_y = inputs[:-n_val], labels[:-n_val]
    va_x, va_y = inputs[-n_val:], labels[-n_val:]

    ens = PredictorEnsemble(n_members=args.ensemble_size, seed=args.seed)
    losses = ens.train(tr_x, tr_y, epochs=args.epochs,
                       batch_size=args.batch_size,
                       dataset_percentage=args.dataset_percentage,
                       seed=args.seed)
    ens.save(args.out_dir)

    mean, var, _ = ens.predict(va_x)
    pred = np.asarray(mean).argmax(-1)
    miou = mean_iou(pred, va_y, 3)
    print(json.dumps(dict(final_losses=[float(l) for l in losses],
                          val_miou=miou, n_train=len(tr_x),
                          n_val=len(va_x), out_dir=args.out_dir)))


if __name__ == "__main__":
    main()
