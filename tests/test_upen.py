"""UPEN baseline stack: networks, ensemble, semantic grid, policy,
segmentation metrics, visualization."""
import numpy as np

from fisher_nerf_customized_tpu.engine.seg_metrics import (mean_f1, mean_iou,
                                                           pixel_accuracy)
from fisher_nerf_customized_tpu.engine.visualization import (MapVisualizer,
                                                             save_occ_map_png)
from fisher_nerf_customized_tpu.envs.fake_sim import BoxScene, FakeSim
from fisher_nerf_customized_tpu.models.predictors import (OccupancyPredictor,
                                                          PredictorEnsemble)
from fisher_nerf_customized_tpu.models.semantic_grid import SemanticGrid
from fisher_nerf_customized_tpu.models.upen import UPEN, ego_grid_from_depth
from fisher_nerf_customized_tpu.ops.camera import Camera

import jax


def test_predictor_learns_identity_ish():
    """A predictor can learn to reproduce simple occupancy patterns."""
    rng = np.random.default_rng(0)
    n = 8
    labels = rng.integers(0, 3, size=(n, 32, 32))
    inputs = np.eye(3, dtype=np.float32)[labels]        # one-hot NHWC
    pred = OccupancyPredictor(jax.random.PRNGKey(0), base=8)
    losses = [pred.train_step(inputs, labels) for _ in range(100)]
    assert losses[-1] < losses[0] * 0.6, (losses[0], losses[-1])


def test_ensemble_bootstrap_and_disagreement():
    rng = np.random.default_rng(1)
    labels = rng.integers(0, 3, size=(8, 64, 64))
    inputs = np.eye(3, dtype=np.float32)[labels]
    ens = PredictorEnsemble(n_members=2, seed=0, base=8)
    ens.train(inputs, labels, epochs=1, batch_size=4,
              dataset_percentage=0.8)
    mean, var, all_preds = ens.predict(inputs[:2])
    assert mean.shape == (2, 64, 64, 3)
    assert np.all(np.asarray(var) >= 0)
    assert all_preds.shape[0] == 2


def test_semantic_grid_registration():
    g = SemanticGrid(grid_dim=(96, 96), cell_size=0.1)
    g.set_origin((0.0, 0.0, 0.0))
    ego = np.zeros((3, 32, 32), np.float32)
    ego[2, :, :] = 0.9               # all free
    g.register_ego(ego, (0.0, 0.0, 0.0))
    # center region should now be confidently free
    c = g.proj_grid[:, 48, 48]
    assert c[2] > c[0] and c[2] > c[1]
    crop = g.crop_at((0.0, 0.0, 0.0), crop=32)
    assert crop.shape == (3, 32, 32)


def test_ego_grid_from_depth_marks_obstacle_and_free():
    cam = Camera(fx=32.0, fy=32.0, cx=32.0, cy=32.0, width=64, height=64)
    scene = BoxScene(room_lo=(-2, 0, -2), room_hi=(2, 2.5, 2), obstacles=[])
    sim = FakeSim(scene, cam)
    obs = sim.reset()
    ego = ego_grid_from_depth(obs["depth"], sim.intrinsics, grid_dim=64,
                              cell_size=0.1)
    assert ego.shape == (3, 64, 64)
    labels = ego.argmax(axis=0)
    # wall 2 m ahead -> occupied band near row 20
    assert (labels[18:23, 24:40] == 1).any()
    # free space before the wall
    assert (labels[5:15, 28:36] == 2).mean() > 0.5


def test_upen_policy_returns_goal():
    cam = Camera(fx=32.0, fy=32.0, cx=32.0, cy=32.0, width=64, height=64)
    scene = BoxScene.default(seed=2)
    sim = FakeSim(scene, cam)
    obs = sim.reset()
    upen = UPEN(options=None, n_members=2, seed=0, use_rrt=True)
    pose = (float(obs["c2w"][0, 3]), float(obs["c2w"][2, 3]), 0.0)
    upen.init(pose)
    upen.observe(obs["depth"], sim.intrinsics, pose)
    goal, info = upen.predict_action(pose)
    assert goal is not None and len(goal) == 2
    assert info["mode"] in ("rrt", "fbe")


def test_seg_metrics():
    pred = np.array([[0, 1], [2, 2]])
    target = np.array([[0, 1], [2, 0]])
    assert pixel_accuracy(pred, target) == 0.75
    assert 0 < mean_iou(pred, target, 3) <= 1
    assert 0 < mean_f1(pred, target, 3) <= 1
    assert mean_iou(target, target, 3) == 1.0


def test_map_visualizer_fow_coverage(tmp_path):
    scene = BoxScene(room_lo=(-2, 0, -2), room_hi=(2, 2.5, 2), obstacles=[])
    grid_dim = np.array([64, 64])
    free = scene.gt_free_map(0.1, grid_dim, np.zeros(2))
    vis = MapVisualizer(free, 0.1, np.zeros(2), vis_range=3.0)
    c2w = np.eye(4)
    c2w[1, 3] = 1.25
    vis.update_fow_sim(c2w)
    cov1 = vis.coverage_2d()
    assert cov1 > 0
    # turning around reveals more
    c2w2 = c2w.copy()
    c2w2[:3, :3] = c2w[:3, :3] @ np.diag([-1, 1, -1])
    vis.update_fow_sim(c2w2)
    assert vis.coverage_2d() > cov1
    img = vis.render()
    assert img.shape == free.shape + (3,)
    vis.save_vis_seen(str(tmp_path), 0)
    # state roundtrip
    d = vis.state_dict()
    vis2 = MapVisualizer(free, 0.1, np.zeros(2))
    vis2.load_state_dict(d)
    assert vis2.coverage_2d() == vis.coverage_2d()


def test_save_occ_map_png(tmp_path):
    occ = np.zeros((3, 32, 32), np.float32)
    occ[0] = 1.0
    occ[1, 10:12, 10:20] = 5.0
    occ[2, 15:25, 10:20] = 5.0
    p = str(tmp_path / "m.png")
    save_occ_map_png(occ, p, candidates=[(12, 18), (14, 20)],
                     scores=[0.2, 0.9], agent_cell=(16, 16))
    import os
    assert os.path.exists(p)
