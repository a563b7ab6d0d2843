"""KNN kernel, novelty mask, optimized tracking, ATE."""
import jax.numpy as jnp
import numpy as np
from scipy.spatial import cKDTree

from fisher_nerf_customized_tpu.config import get_cfg_defaults
from fisher_nerf_customized_tpu.engine.eval import evaluate_ate
from fisher_nerf_customized_tpu.envs.fake_sim import BoxScene, FakeSim
from fisher_nerf_customized_tpu.models.slam import GaussianSLAM
from fisher_nerf_customized_tpu.ops.camera import Camera
from fisher_nerf_customized_tpu.ops.knn import (knn, knn_self,
                                                novelty_mask_from_pcd_nn)

IMG = 48


def test_knn_matches_kdtree():
    rng = np.random.default_rng(0)
    refs = rng.normal(size=(3000, 3)).astype(np.float32)
    qs = rng.normal(size=(500, 3)).astype(np.float32)
    d, i = knn(jnp.asarray(qs), jnp.asarray(refs), k=3, chunk=1024)
    tree = cKDTree(refs)
    d_ref, i_ref = tree.query(qs, k=3)
    # f32 |q|²+|r|²-2qr vs the tree's f64 exact distances
    np.testing.assert_allclose(np.asarray(d), d_ref, atol=1e-3)
    assert (np.asarray(i) == i_ref).mean() > 0.995   # near-tie flips allowed


def test_knn_ref_mask():
    refs = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0]], np.float32)
    qs = np.array([[0.9, 0, 0]], np.float32)
    mask = jnp.array([True, False, True])
    d, i = knn(jnp.asarray(qs), jnp.asarray(refs), k=1, ref_mask=mask,
               chunk=2)
    assert int(i[0, 0]) in (0, 2)   # masked-out nearest (idx 1) skipped


def test_knn_self_excludes_self():
    pts = np.array([[0, 0, 0], [1, 0, 0], [3, 0, 0]], np.float32)
    d, i = knn_self(jnp.asarray(pts), k=1, chunk=4)
    np.testing.assert_allclose(np.asarray(d[:, 0]), [1.0, 1.0, 2.0],
                               atol=1e-5)


def test_novelty_mask_detects_new_object():
    cam = Camera(fx=float(IMG), fy=float(IMG), cx=IMG / 2, cy=IMG / 2,
                 width=IMG, height=IMG)
    scene_empty = BoxScene(room_lo=(-2, 0, -2), room_hi=(2, 2.5, 2),
                           obstacles=[])
    scene_obj = BoxScene(room_lo=(-2, 0, -2), room_hi=(2, 2.5, 2),
                         obstacles=[((-0.3, 0.0, 0.8), (0.3, 1.2, 1.4))])
    gt_cloud = scene_empty.sample_surface_points(60000)
    sim = FakeSim(scene_obj, cam)
    obs = sim.reset(yaw=0.0)
    inv_k = np.linalg.inv(sim.intrinsics)
    mask, n = novelty_mask_from_pcd_nn(
        jnp.asarray(gt_cloud), jnp.asarray(obs["depth"]),
        jnp.asarray(inv_k.astype(np.float32)), jnp.asarray(obs["c2w"]),
        dist_thresh=0.05, min_pixels=20)
    mask = np.asarray(mask)
    assert int(n) > 50
    # the novel pixels cluster around the image center (the box is ahead)
    ys, xs = np.where(mask)
    assert abs(xs.mean() - IMG / 2) < IMG / 4


def test_tracking_recovers_pose_perturbation(tmp_path):
    cfg = get_cfg_defaults()
    cfg.SLAM.Dataset.Calibration.merge_from_other(dict(
        fx=float(IMG), fy=float(IMG), cx=IMG / 2, cy=IMG / 2,
        width=IMG, height=IMG))
    cfg.workdir = str(tmp_path)
    cfg.downsample_pcd = 1
    cfg.tracking.use_gt_poses = False
    cfg.tracking.num_iters = 60
    cfg.tracking.lrs.cam_trans = 0.004
    cfg.tracking.lrs.cam_unnorm_rots = 0.001
    cfg.tracking.use_depth_loss_thres = False
    cfg.tpu.capacity = 8192
    cfg.tpu.tile_size = 8
    cfg.tpu.max_per_tile = 512
    cfg.map_every = 2
    cfg.keyframe_every = 2
    cfg.mapping.num_iters = 15

    cam = Camera(fx=float(IMG), fy=float(IMG), cx=IMG / 2, cy=IMG / 2,
                 width=IMG, height=IMG)
    scene = BoxScene(room_lo=(-2, 0, -2), room_hi=(2, 2.5, 2),
                     obstacles=[((0.5, 0, 0.8), (1.0, 1.5, 1.3))])
    sim = FakeSim(scene, cam, forward_step=0.03, turn_angle=10.0)

    # phase 1: build a multi-view map with GT poses (tracking a one-view
    # map is ill-posed — staying at the init view is a true loss minimum)
    slam = GaussianSLAM(cfg)
    slam.use_gt_poses = True
    obs = sim.reset(yaw=0.3)
    slam.init(obs["rgb"], obs["depth"], np.linalg.inv(obs["c2w"]))
    for a in (2, 1, 3, 1, 3, 1, 2, 1):
        obs = sim.step(a)
        slam.track_rgbd(obs["rgb"], obs["depth"],
                        gt_w2c=np.linalg.inv(obs["c2w"]))

    # phase 2: optimized tracking against the converged map
    slam.use_gt_poses = False
    errs = []
    for _ in range(3):
        obs = sim.step(1)
        slam.track_rgbd(obs["rgb"], obs["depth"])   # no gt pose provided
        gt_c2w = obs["c2w"]
        est_c2w = np.linalg.inv(slam.poses_w2c[-1])
        errs.append(np.linalg.norm(gt_c2w[:3, 3] - est_c2w[:3, 3]))
    # pose error should stay under the 3 cm step size (no runaway drift)
    assert np.mean(errs) < 0.03, f"tracking errors: {errs}"


def test_evaluate_ate_zero_for_identical():
    rng = np.random.default_rng(0)
    poses = np.tile(np.eye(4), (10, 1, 1))
    poses[:, :3, 3] = rng.normal(size=(10, 3))
    assert evaluate_ate(poses, poses) < 1e-9
    shifted = poses.copy()
    shifted[:, :3, 3] += np.array([1.0, 0, 0])   # global shift aligns away
    assert evaluate_ate(poses, shifted) < 1e-6
    noisy = poses.copy()
    noisy[:, :3, 3] += rng.normal(scale=0.1, size=(10, 3))
    assert evaluate_ate(poses, noisy) > 0.01
