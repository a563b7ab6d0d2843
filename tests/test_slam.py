"""End-to-end SLAM core tests on FakeSim RGB-D (the SURVEY.md §7 step-2
milestone: mapping a recorded trajectory and checking render quality)."""
import numpy as np
import pytest

from fisher_nerf_customized_tpu.config import get_cfg_defaults
from fisher_nerf_customized_tpu.envs.fake_sim import BoxScene, FakeSim
from fisher_nerf_customized_tpu.models.slam import GaussianSLAM
from fisher_nerf_customized_tpu.ops.camera import Camera
from fisher_nerf_customized_tpu.ops.image import calc_psnr

IMG = 48


def small_cfg(tmp_path):
    cfg = get_cfg_defaults()
    cfg.SLAM.Dataset.Calibration.merge_from_other(dict(
        fx=float(IMG), fy=float(IMG), cx=IMG / 2, cy=IMG / 2,
        width=IMG, height=IMG))
    cfg.workdir = str(tmp_path)
    cfg.run_name = "t"
    cfg.map_every = 5
    cfg.keyframe_every = 4
    cfg.downsample_pcd = 2
    cfg.mapping.num_iters = 12
    cfg.mapping.prune_gaussians = True
    cfg.mapping.pruning_dict.prune_every = 6
    cfg.tpu.capacity = 8192
    cfg.tpu.tile_size = 8
    cfg.tpu.max_per_tile = 512
    cfg.tpu.pose_chunk = 2
    return cfg


def make_sim():
    cam = Camera(fx=float(IMG), fy=float(IMG), cx=IMG / 2, cy=IMG / 2,
                 width=IMG, height=IMG)
    scene = BoxScene(room_lo=(-2, 0, -2), room_hi=(2, 2.5, 2), obstacles=[])
    return FakeSim(scene, cam, forward_step=0.1, turn_angle=30.0)


def run_short_episode(slam, sim, n_steps=10):
    obs = sim.reset(start_xz=(0.0, 0.0), yaw=0.2)
    slam.init(obs["rgb"], obs["depth"], np.linalg.inv(obs["c2w"]))
    actions = [2, 1, 1, 2, 1, 3, 1, 1, 2, 1][:n_steps]
    for a in actions:
        obs = sim.step(a)
        slam.track_rgbd(obs["rgb"], obs["depth"],
                        gt_w2c=np.linalg.inv(obs["c2w"]))
    return obs


def test_slam_init_creates_gaussians(tmp_path):
    slam = GaussianSLAM(small_cfg(tmp_path))
    sim = make_sim()
    obs = sim.reset()
    n = slam.init(obs["rgb"], obs["depth"], np.linalg.inv(obs["c2w"]))
    # init back-projects the downsample_pcd(=2)-strided grid
    assert n > 0.9 * (IMG // 2) * (IMG // 2)
    assert slam.n_active == n


def test_slam_mapping_improves_psnr(tmp_path):
    slam = GaussianSLAM(small_cfg(tmp_path))
    sim = make_sim()
    obs = run_short_episode(slam, sim)
    out = slam.render_at_pose(obs["c2w"])
    psnr = float(calc_psnr(out["render"], obs["rgb"]))
    assert psnr > 20.0, f"render PSNR too low: {psnr}"
    # depth should roughly match too
    med = np.asarray(out["depth"])
    err = np.abs(med - obs["depth"])
    assert np.median(err) < 0.1


def test_slam_densification_adds_on_novel_view(tmp_path):
    slam = GaussianSLAM(small_cfg(tmp_path))
    sim = make_sim()
    obs = sim.reset(yaw=0.0)
    slam.init(obs["rgb"], obs["depth"], np.linalg.inv(obs["c2w"]))
    n0 = slam.n_active
    # rotate far enough to see unmapped wall, then map
    for _ in range(4):
        obs = sim.step(2)
        slam.track_rgbd(obs["rgb"], obs["depth"],
                        gt_w2c=np.linalg.inv(obs["c2w"]))
    assert slam.n_active > n0


def test_slam_keyframes_accumulate(tmp_path):
    slam = GaussianSLAM(small_cfg(tmp_path))
    sim = make_sim()
    run_short_episode(slam, sim)
    assert len(slam.keyframes) >= 2
    assert slam.keyframe_time_indices[0] == 0


def test_h_train_incremental_topup_exact(tmp_path):
    """compute_H_train's keyframe top-up path (cache hit + append) must be
    numerically identical to a from-scratch recompute — the sum over
    keyframes is over independent terms."""
    slam = GaussianSLAM(small_cfg(tmp_path))
    sim = make_sim()
    run_short_episode(slam, sim)
    assert len(slam.keyframes) >= 2
    # prime the cache on a PREFIX of the keyframes, then restore and let
    # compute_H_train top up the remainder
    full_w2cs = slam.keyframes.stacked_w2cs()
    prefix_key = (len(full_w2cs) - 1,) + slam._h_train_key()[1:]
    slam._h_train_cache = (prefix_key, slam._h_train_over(full_w2cs[:-1]))
    h_inc = np.asarray(slam.compute_H_train())
    slam._h_train_cache = None
    h_full = np.asarray(slam.compute_H_train())
    np.testing.assert_allclose(h_inc, h_full, rtol=1e-5, atol=1e-7)


def test_pose_eval_eig_contract(tmp_path):
    """EIG = sum(H_pose / (H_train + 0.1)): a view of mapped Gaussians
    scores > 0, a view of completely unmapped space scores exactly 0
    (FisherRF can only score existing Gaussians — the reason the reference
    injects frontier 'random Gaussians'), and raising H_train lowers the
    score of the same view (diminishing information)."""
    import jax.numpy as jnp
    from fisher_nerf_customized_tpu.models.slam import _pose_scores

    slam = GaussianSLAM(small_cfg(tmp_path))
    sim = make_sim()
    obs = sim.reset(yaw=0.0)
    slam.init(obs["rgb"], obs["depth"], np.linalg.inv(obs["c2w"]))
    for _ in range(3):
        obs = sim.step(1)
        slam.track_rgbd(obs["rgb"], obs["depth"],
                        gt_w2c=np.linalg.inv(obs["c2w"]))

    seen_pose = obs["c2w"].copy()
    empty_pose = obs["c2w"].copy()
    empty_pose[:3, :3] = seen_pose[:3, :3] @ np.diag([-1, 1, -1])  # 180°
    scores, _ = slam.pose_eval(np.stack([seen_pose, empty_pose]))
    scores = np.asarray(scores)
    assert np.all(np.isfinite(scores))
    assert scores[0] > 0
    assert scores[1] == 0.0

    # monotonicity: same view, more accumulated training info -> lower EIG
    h_train = slam.compute_H_train()
    w2cs = jnp.asarray(np.stack([np.linalg.inv(seen_pose)] * slam.pose_chunk))
    s_lo = _pose_scores(slam.state, w2cs, 1.0 / (h_train + 0.1),
                        slam.camera, slam.settings)
    s_hi = _pose_scores(slam.state, w2cs, 1.0 / (10.0 * h_train + 0.1),
                        slam.camera, slam.settings)
    assert float(s_hi[0]) < float(s_lo[0])


def test_compute_hessian_api(tmp_path):
    slam = GaussianSLAM(small_cfg(tmp_path))
    sim = make_sim()
    obs = sim.reset()
    slam.init(obs["rgb"], obs["depth"], np.linalg.inv(obs["c2w"]))
    w2c = np.linalg.inv(obs["c2w"])
    h = slam.compute_Hessian(w2c, return_points=True)
    assert h.shape == (slam.state.capacity, 4)
    h_flat = slam.compute_Hessian(w2c)
    assert h_flat.ndim == 1
    h2, pose_h = slam.compute_Hessian(w2c, return_pose=True,
                                      return_points=True)
    assert pose_h.shape == (6, 6)
    assert np.asarray(h)[: slam.n_active].sum() > 0


def test_save_load_roundtrip(tmp_path):
    slam = GaussianSLAM(small_cfg(tmp_path))
    sim = make_sim()
    obs = run_short_episode(slam, sim, n_steps=5)
    path = slam.save(slam.frame_idx)
    render0 = np.asarray(slam.render_at_pose(obs["c2w"])["render"])

    slam2 = GaussianSLAM(small_cfg(tmp_path))
    slam2.load(path)
    assert slam2.n_active == slam.n_active
    render1 = np.asarray(slam2.render_at_pose(obs["c2w"])["render"])
    np.testing.assert_allclose(render0, render1, atol=1e-5)


def test_gs_densify_clone_split_prune():
    """Gradient densification (reference slam_external.py:411-463 densify):
    a small high-gradient splat is CLONED, a large high-gradient splat is
    SPLIT into n children (source removed), low-gradient splats untouched,
    low-opacity slots pruned."""
    import jax
    import jax.numpy as jnp
    from fisher_nerf_customized_tpu.models.gaussian_state import (
        empty_state, add_gaussians, gs_densify)

    state = empty_state(64)
    m = 4
    params = {
        "means3D": jnp.array([[0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0]],
                             jnp.float32),
        "rgb_colors": jnp.full((m, 3), 0.5),
        "unnorm_rotations": jnp.tile(jnp.array([1.0, 0, 0, 0]), (m, 1)),
        # slot 3 = low opacity (pruned); others opaque
        "logit_opacities": jnp.array([[3.0], [3.0], [3.0], [-9.0]]),
        # slot 1 = big (scale 0.2 > 0.05), others small
        "log_scales": jnp.log(jnp.array(
            [[0.01] * 3, [0.2] * 3, [0.01] * 3, [0.01] * 3])),
    }
    state, _ = add_gaussians(state, params, jnp.ones((m,), bool), 0.0)
    assert int(state.n_active) == 4

    # slots 0 (small) and 1 (big) have high grads; 2 and 3 low
    ga = jnp.zeros((64,)).at[0].set(1.0).at[1].set(1.0)
    dn = jnp.zeros((64,)).at[:4].set(1.0)
    out = gs_densify(state, ga, dn, jax.random.PRNGKey(0),
                     grad_thresh=0.5, split_scale=0.05,
                     num_to_split_into=2,
                     removal_opacity_threshold=0.005)
    # 4 start + 1 clone + 2 children - 1 split source - 1 low-opacity = 5
    assert int(out.n_active) == 5
    means = np.asarray(out.means3D[: int(out.n_active)])
    # clone of slot 0 -> two splats exactly at origin
    assert (np.linalg.norm(means, axis=1) < 1e-6).sum() == 2
    # split source at x=1 removed, children near it with shrunk scales
    assert not any(np.allclose(p, [1, 0, 0]) for p in means)
    near = np.abs(means[:, 0] - 1.0) < 1.0
    assert near.sum() >= 2
    scales = np.exp(np.asarray(out.log_scales[: int(out.n_active)]))
    assert scales.max() < 0.2  # children shrunk by 0.8*n
    # low-opacity slot 3 gone
    assert not any(np.allclose(p, [3, 0, 0]) for p in means)


def test_slam_gs_densification_episode(tmp_path):
    """Episode path with use_gaussian_splatting_densification on: runs
    without error and keeps a live map."""
    cfg = small_cfg(tmp_path)
    cfg.mapping.use_gaussian_splatting_densification = True
    cfg.mapping.densify_dict.grad_thresh = 1e-8  # force some activity
    slam = GaussianSLAM(cfg)
    sim = make_sim()
    obs = run_short_episode(slam, sim, n_steps=6)
    assert slam.n_active > 0
    out = slam.render_at_pose(obs["c2w"])
    psnr = float(calc_psnr(out["render"], obs["rgb"]))
    assert psnr > 15.0


def test_adaptive_max_per_tile_bump(tmp_path):
    """A scene far denser than max_per_tile must trigger the bucketed
    max_per_tile doubling (overflow fraction > overflow_bump_ratio)."""
    cfg = small_cfg(tmp_path)
    cfg.map_every = 1
    cfg.downsample_pcd = 1            # one splat per pixel: dense
    cfg.mapping.num_iters = 2
    cfg.tpu.max_per_tile = 16         # absurdly small
    cfg.tpu.max_per_tile_limit = 64
    slam = GaussianSLAM(cfg)
    rng = np.random.default_rng(0)
    col = rng.random((IMG, IMG, 3)).astype(np.float32)
    dep = np.full((IMG, IMG), 2.0, np.float32)
    slam.init(col, dep, np.eye(4, dtype=np.float32))
    for t in range(3):
        w = np.eye(4, dtype=np.float32)
        w[2, 3] = 0.01 * t
        slam.track_rgbd(col, dep, gt_w2c=w)
    assert slam.settings.max_per_tile > 16
    assert slam.settings.max_per_tile <= 64   # respects the limit


def test_legacy_global_planning_dbscan(tmp_path):
    """Legacy in-SLAM global_planning (gaussian.py:1176-1336): DBSCAN
    uncertainty branch returns navigable EIG-scored candidates, the
    frontier branch honors the selection<2 gate, and prune_invisible
    culling only ever removes cluster members."""
    cfg = small_cfg(tmp_path)
    cfg.explore.sample_view_num = 8
    cfg.explore.prune_invisible = True
    slam = GaussianSLAM(cfg, eval_dir=str(tmp_path))
    sim = make_sim()
    run_short_episode(slam, sim, n_steps=6)
    n_before = slam.n_active

    # frontier branch (selection == 0 < 2)
    frontier = np.array([[1.0, 1.0], [-1.0, 0.5]], np.float32)
    scores, c2ws = slam.global_planning(lambda p: True, frontier=frontier)
    assert scores is not None and len(scores) == len(c2ws) == 8
    assert np.all(np.isfinite(np.asarray(scores)))
    assert slam.selection == 1

    # uncertainty branch (no frontier): DBSCAN targeting + culling path
    scores2, c2ws2 = slam.global_planning(lambda p: True)
    assert scores2 is not None and len(scores2) >= 1
    assert np.asarray(c2ws2).shape[1:] == (4, 4)
    # culling may remove low-H cluster members but never grows the state
    assert slam.n_active <= n_before
    assert slam.selection == 2

    # nothing navigable -> (None, None)
    s3, c3 = slam.global_planning(lambda p: False)
    assert s3 is None and c3 is None


def test_uncertainty_scores_and_dbscan_unit(tmp_path):
    from fisher_nerf_customized_tpu.utils.clustering import dbscan
    # two well-separated blobs + isolated noise point
    rng = np.random.default_rng(0)
    a = rng.normal([0, 0, 0], 0.02, (20, 3))
    b = rng.normal([1, 0, 0], 0.02, (20, 3))
    noise = np.array([[5.0, 5.0, 5.0]])
    labels = dbscan(np.concatenate([a, b, noise]), eps=0.1, min_samples=5)
    assert labels[-1] == -1
    assert len(set(labels[:20])) == 1 and len(set(labels[20:40])) == 1
    assert labels[0] != labels[20]

    cfg = small_cfg(tmp_path)
    slam = GaussianSLAM(cfg)
    sim = make_sim()
    run_short_episode(slam, sim, n_steps=4)
    u = slam.uncertainty_scores()
    assert u.shape[0] == slam.state.capacity
    assert np.all(u[: slam.n_active] > 0)


def test_eval_nvs_protocol(tmp_path):
    """eval_nvs (reference eval_helpers.py:639): frame-0 skip, eval_every
    stride, silhouette hole-validity, valid-frame-only averages."""
    from fisher_nerf_customized_tpu.engine.eval import eval_nvs
    from fisher_nerf_customized_tpu.envs.fake_sim import ReplaySim

    slam = GaussianSLAM(small_cfg(tmp_path))
    sim = make_sim()
    obs = sim.reset(start_xz=(0.0, 0.0), yaw=0.2)
    colors, depths, c2ws = [obs["rgb"]], [obs["depth"]], [obs["c2w"]]
    slam.init(obs["rgb"], obs["depth"], np.linalg.inv(obs["c2w"]))
    for a in [2, 1, 1, 2, 1, 3, 1, 1]:
        obs = sim.step(a)
        colors.append(obs["rgb"])
        depths.append(obs["depth"])
        c2ws.append(obs["c2w"])
        slam.track_rgbd(obs["rgb"], obs["depth"],
                        gt_w2c=np.linalg.inv(obs["c2w"]))

    replay = ReplaySim(colors, depths, c2ws)
    res = eval_nvs(slam, replay, eval_every=1, out_dir=str(tmp_path / "nvs"))
    assert res["n_eval_frames"] == len(colors) - 1      # frame 0 skipped
    assert res["n_valid_frames"] >= 1                   # mapped views valid
    assert np.isfinite(res["psnr"]) and res["psnr"] > 10.0
    assert 0.0 <= res["ssim"] <= 1.0
    assert res["depth_l1"] < 0.5
    assert (tmp_path / "nvs" / "psnr.txt").exists()
    assert (tmp_path / "nvs" / "valid_nvs_frames.npy").exists()

    # eval_every=3 keeps test_idx 0 and every 3rd thereafter (ref :681)
    res3 = eval_nvs(slam, replay, eval_every=3)
    kept = [f["frame"] for f in res3["per_frame"]]
    assert kept == [i for i in range(len(colors) - 1)
                    if i == 0 or (i + 1) % 3 == 0]

    # a pose far outside the mapped region renders ~zero silhouette ->
    # marked invalid and EXCLUDED from the averages
    far_c2w = np.eye(4, dtype=np.float32)
    far_c2w[:3, 3] = (50.0, 1.2, 50.0)
    res_far = eval_nvs(slam, [(colors[0], depths[0], c2ws[0]),
                              (colors[1], depths[1], far_c2w)])
    assert res_far["n_eval_frames"] == 1
    assert res_far["n_valid_frames"] == 0
    assert np.isnan(res_far["psnr"])


def test_h_train_window_ranking_gate(tmp_path):
    """Windowed H_train prior (cfg.tpu.h_train_window, strided K/W
    subsample scaled by K/W) must preserve candidate-pose EIG rankings vs
    the exact full-keyframe sum (Spearman >= 0.95) — the estimator-
    equivalence gate for beating the reference's O(K)-per-event recompute
    (gaussian.py:1338-1348)."""
    from scipy.stats import spearmanr
    cfg = small_cfg(tmp_path)
    cfg.keyframe_every = 2
    slam = GaussianSLAM(cfg)
    sim = make_sim()
    obs = sim.reset(start_xz=(0.0, 0.0), yaw=0.2)
    slam.init(obs["rgb"], obs["depth"], np.linalg.inv(obs["c2w"]))
    for a in [2, 1, 1, 2, 1, 3, 1, 1, 2, 1, 2, 1, 1, 3, 1, 2]:
        obs = sim.step(a)
        slam.track_rgbd(obs["rgb"], obs["depth"],
                        gt_w2c=np.linalg.inv(obs["c2w"]))
    n_kf = len(slam.keyframes)
    assert n_kf >= 6
    # candidate poses: perturbed copies of visited keyframe poses
    cands = []
    for i, w2c in enumerate(slam.keyframes.w2cs):
        c2w = np.linalg.inv(np.asarray(w2c))
        c2w[0, 3] += 0.15 * ((i % 3) - 1)
        cands.append(c2w)
    cands = np.stack(cands)

    slam.h_train_window = 0
    slam._h_train_cache = None
    exact, _ = slam.pose_eval(cands)
    slam.h_train_window = max(3, n_kf // 2)
    slam._h_train_cache = None
    approx, _ = slam.pose_eval(cands)
    rho = spearmanr(np.asarray(exact), np.asarray(approx)).statistic
    assert rho >= 0.95, f"windowed H_train broke rankings: rho={rho}"
    assert int(np.argmax(exact)) == int(np.argmax(approx))
