"""End-to-end episode tests on FakeSim (hermetic NavTester equivalent)."""
import numpy as np
import pytest

from fisher_nerf_customized_tpu.config import get_cfg_defaults
from fisher_nerf_customized_tpu.engine import ActiveMapper, FrontierNavigator
from fisher_nerf_customized_tpu.engine.actions import compile_actions
from fisher_nerf_customized_tpu.engine.eval import (
    accuracy_comp_ratio_from_pcl, coverage_percentage, trapezoid_auc)
from fisher_nerf_customized_tpu.envs.fake_sim import BoxScene, FakeSim
from fisher_nerf_customized_tpu.ops.camera import Camera
from fisher_nerf_customized_tpu.utils.pointcloud import (GlobalPointCloud,
                                                         read_ply, write_ply)

IMG = 48


def episode_cfg(tmp_path, policy="gaussians_based", steps=24):
    cfg = get_cfg_defaults()
    cfg.SLAM.Dataset.Calibration.merge_from_other(dict(
        fx=float(IMG), fy=float(IMG), cx=IMG / 2, cy=IMG / 2,
        width=IMG, height=IMG))
    cfg.workdir = str(tmp_path)
    cfg.run_name = "ep"
    cfg.policy.name = policy
    cfg.policy.planning_queue_size = 8
    cfg.num_frames = steps
    cfg.map_every = 6
    cfg.keyframe_every = 4
    cfg.downsample_pcd = 2
    cfg.mapping.num_iters = 8
    cfg.forward_step_size = 0.15
    cfg.turn_angle = 30.0
    cfg.explore.cell_size = 0.1
    cfg.explore.sample_view_num = 16
    cfg.explore.frontier_select_method = "combined"
    cfg.tpu.capacity = 8192
    cfg.tpu.tile_size = 8
    cfg.tpu.max_per_tile = 512
    cfg.tpu.pose_chunk = 4
    return cfg


def make_sim(seed=3):
    cam = Camera(fx=float(IMG), fy=float(IMG), cx=IMG / 2, cy=IMG / 2,
                 width=IMG, height=IMG)
    scene = BoxScene(room_lo=(-3, 0, -3), room_hi=(3, 2.5, 3),
                     obstacles=[((1.0, 0.0, 1.0), (1.8, 1.8, 1.8))])
    sim = FakeSim(scene, cam, forward_step=0.15, turn_angle=30.0, seed=seed)
    return sim, scene


def test_active_mapping_episode_runs(tmp_path):
    sim, scene = make_sim()
    cfg = episode_cfg(tmp_path)
    mapper = ActiveMapper(cfg, sim, scene=scene, seed=0)
    gt = scene.sample_surface_points(4000)
    result = mapper.test_navigation(n_eval_poses=10, recon_gt_points=gt)
    assert result["steps"] >= 10
    assert result["n_gaussians"] > 1000
    # 24 steps only partially cover the room; mapped-view quality bars live
    # in test_slam — this is a pipeline sanity bound
    assert result["eval"]["psnr"] > 8.0
    assert result["recon"]["completeness_ratio"] > 5.0
    assert np.isfinite(result["auc"])


def test_frontier_episode_runs(tmp_path):
    sim, scene = make_sim(seed=5)
    cfg = episode_cfg(tmp_path, policy="frontier", steps=20)
    mapper = FrontierNavigator(cfg, sim, scene=scene, seed=0)
    gt = scene.sample_surface_points(3000)
    result = mapper.frontier_test_navigation(recon_gt_points=gt)
    assert result["steps"] >= 5
    assert result["recon"]["completeness_ratio"] > 2.0


def test_traj_reader_replay_is_deterministic(tmp_path):
    actions = [2, 2, 1, 1, 2, 1, 1, 3, 1, 1]

    def run():
        sim, scene = make_sim(seed=1)
        cfg = episode_cfg(tmp_path, steps=len(actions))
        m = ActiveMapper(cfg, sim, scene=scene, seed=0,
                         traj_actions=actions)
        r = m.test_navigation(n_eval_poses=0)
        return r, m.slam.n_active

    r1, n1 = run()
    r2, n2 = run()
    assert r1["steps"] == r2["steps"]
    assert n1 == n2


def test_random_walk_policy(tmp_path):
    sim, scene = make_sim(seed=2)
    cfg = episode_cfg(tmp_path, policy="random_walk", steps=12)
    mapper = ActiveMapper(cfg, sim, scene=scene, seed=0)
    result = mapper.test_navigation(n_eval_poses=0)
    assert result["steps"] >= 10


def test_compile_actions_reaches_goal():
    # straight-line path along +z, goal facing +z
    paths = np.array([[10, 10], [10, 16]])   # [x, z] cells

    def conv(c):
        return (np.asarray(c, np.float64) - 16) * 0.1   # 32-cell grid, 10 cm

    goal_pose = np.eye(4)
    cur = np.eye(4)
    cur[:3, 3] = [conv(paths[0] + 0.5)[0], 1.25, conv(paths[0] + 0.5)[1]]
    actions = compile_actions(paths, goal_pose, cur, 1.25, conv,
                              forward_step=0.1, turn_angle=30.0,
                              queue_size=20)
    assert len(actions) > 0
    assert actions.count(1) >= 5          # must move ~0.6 m forward


def test_recon_metrics_known_values():
    gt = np.random.default_rng(0).uniform(-1, 1, (500, 3))
    est_exact = gt.copy()
    m = accuracy_comp_ratio_from_pcl(est_exact, gt, 0.05)
    assert m["acc_distance"] < 1e-9
    assert m["completeness_ratio"] == 100.0
    assert m["fpr"] == 0.0
    est_off = gt + 0.2
    m2 = accuracy_comp_ratio_from_pcl(est_off, gt, 0.05)
    assert m2["completeness_ratio"] < 100.0
    cov = coverage_percentage(gt, est_exact, 0.05)
    assert cov == 100.0


def test_trapezoid_auc_padding():
    assert trapezoid_auc([1.0, 1.0, 1.0]) == pytest.approx(1.0)
    assert trapezoid_auc([0.0, 1.0]) == pytest.approx(0.5)
    assert trapezoid_auc([2.0], max_steps=5) == pytest.approx(2.0)


def test_ply_roundtrip(tmp_path):
    pts = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    p = str(tmp_path / "t.ply")
    write_ply(p, pts)
    back = read_ply(p)
    np.testing.assert_allclose(back, pts, atol=1e-6)
    # with colors
    cols = np.random.default_rng(1).uniform(0, 1, (100, 3)).astype(np.float32)
    write_ply(p, pts, cols)
    back2 = read_ply(p)
    np.testing.assert_allclose(back2, pts, atol=1e-6)


def test_global_pointcloud_subsampling():
    g = GlobalPointCloud(keep_ratio=0.5, seed=0)
    depth = np.full((32, 32), 2.0, np.float32)
    K = np.array([[32.0, 0, 16], [0, 32.0, 16], [0, 0, 1]])
    g.add_frame(depth, K, np.eye(4))
    n = len(g.get())
    assert 300 < n < 700      # ~50% of 1024


def test_upen_policy_episode(tmp_path):
    sim, scene = make_sim(seed=7)
    cfg = episode_cfg(tmp_path, policy="UPEN_rrt", steps=12)
    mapper = ActiveMapper(cfg, sim, scene=scene, seed=0)
    result = mapper.test_navigation(n_eval_poses=0)
    assert result["steps"] >= 8


def test_checkpoint_resume_roundtrip(tmp_path):
    """Preemption-style resume: checkpoint mid-episode, restore into a
    fresh driver (reference tester:2745-2800 load_3d_gaussian)."""
    sim, scene = make_sim(seed=9)
    cfg = episode_cfg(tmp_path, steps=10)
    m1 = ActiveMapper(cfg, sim, scene=scene, seed=0,
                      traj_actions=[2, 1, 1, 2, 1, 1, 3, 1, 1, 1])
    m1.test_navigation(n_eval_poses=0)
    m1.save_checkpoint(m1.slam.frame_idx)
    ckpt = f"{m1.eval_dir}/params{m1.slam.frame_idx}.npz"

    sim2, scene2 = make_sim(seed=9)
    m2 = ActiveMapper(cfg, sim2, scene=scene2, seed=0)
    m2.resume(ckpt)
    assert m2.slam.n_active == m1.slam.n_active
    assert m2.slam.frame_idx == m1.slam.frame_idx
    assert m2.planner.occ_map is not None
    # restored map renders identically
    obs = sim2.reset()
    r1 = np.asarray(m1.slam.render_at_pose(obs["c2w"])["render"])
    r2 = np.asarray(m2.slam.render_at_pose(obs["c2w"])["render"])
    np.testing.assert_allclose(r1, r2, atol=1e-5)


def test_kill_and_resume_equals_uninterrupted(tmp_path):
    """A policy-driven episode checkpointed mid-run and resumed in a fresh
    driver ends with THE SAME trajectory and coverage as an uninterrupted
    run (reference resume semantics tester:2745-2874: params + astar +
    habvis + global pcl + poses; RNG states make the continuation draw
    the same plans)."""
    steps = 20

    # uninterrupted reference run
    sim_a, scene_a = make_sim(seed=11)
    cfg_a = episode_cfg(tmp_path / "a", steps=steps)
    m_a = ActiveMapper(cfg_a, sim_a, scene=scene_a, seed=0)
    r_a = m_a.test_navigation(n_eval_poses=0)

    # part 1: same seeds, killed after the in-loop checkpoint at t=9
    # (checkpoints land at t % interval == map_every//2, i.e. mid mapping
    # window; map_every=6, interval=6 -> first checkpoint at t=9)
    sim_b, scene_b = make_sim(seed=11)
    cfg_b = episode_cfg(tmp_path / "b", steps=10)
    cfg_b.checkpoint_interval = 6
    m_b = ActiveMapper(cfg_b, sim_b, scene=scene_b, seed=0)
    m_b.test_navigation(n_eval_poses=0)

    # part 2: fresh driver + fresh sim, resumed from the checkpoint
    sim_c, scene_c = make_sim(seed=11)
    cfg_c = episode_cfg(tmp_path / "b", steps=steps)   # same eval_dir as b
    cfg_c.checkpoint_interval = 10_000
    m_c = ActiveMapper(cfg_c, sim_c, scene=scene_c, seed=0)
    m_c.resume(f"{m_b.eval_dir}/params9.npz")
    r_c = m_c.test_navigation(n_eval_poses=0)

    assert r_c["steps"] == r_a["steps"]
    np.testing.assert_allclose(sim_c.c2w, sim_a.c2w, atol=1e-5)
    assert r_c["coverage_2d_pct"] == pytest.approx(
        r_a["coverage_2d_pct"], abs=1e-6)
    assert m_c.slam.n_active == m_a.slam.n_active


def test_pipeline_planning_optin(tmp_path):
    """pipeline_planning=True: stage-1 dispatch at the queue watermark and
    the finish-closure consumption must produce a working episode."""
    cfg = episode_cfg(tmp_path, policy="gaussians_based", steps=16)
    cfg.tpu.pipeline_planning = True
    sim, scene = make_sim()
    mapper = ActiveMapper(cfg, sim, scene=scene, seed=0)
    result = mapper.test_navigation(n_eval_poses=0)
    assert result["steps"] >= 10
    assert mapper.slam.n_active > 0


def test_incremental_recon_matches_oneshot():
    """IncrementalReconMetric over appended batches == one-shot
    accuracy_comp_ratio_from_pcl on the concatenated cloud."""
    from fisher_nerf_customized_tpu.engine.eval import (
        IncrementalReconMetric, accuracy_comp_ratio_from_pcl)

    rng = np.random.default_rng(5)
    gt = rng.uniform(-2, 2, (5000, 3)).astype(np.float32)
    batches = [rng.uniform(-2, 2, (n, 3)).astype(np.float32)
               for n in (800, 1200, 0, 600)]
    inc = IncrementalReconMetric(gt, 0.05)
    for b in batches:
        m_inc = inc.update(b)
    m_ref = accuracy_comp_ratio_from_pcl(np.concatenate(batches), gt, 0.05)
    for k in m_ref:
        np.testing.assert_allclose(m_inc[k], m_ref[k], rtol=1e-6,
                                   err_msg=k)


# -- round 5: batched eval renders, seen flags, atomic checkpoints ----------

def test_render_at_poses_matches_single(tmp_path):
    """One vmapped launch == per-pose launches (eval fast path parity)."""
    cfg = episode_cfg(tmp_path, steps=8)
    sim, scene = make_sim()
    m = ActiveMapper(cfg, sim, scene=scene, seed=0)
    m.test_navigation(n_eval_poses=0)
    from fisher_nerf_customized_tpu.engine.eval import uniform_eval_poses
    poses = uniform_eval_poses(scene, 5, cam_height=1.25)
    batch = m.slam.render_at_poses(poses)
    for i, c2w in enumerate(poses):
        one = m.slam.render_at_pose(c2w)
        np.testing.assert_allclose(np.asarray(batch["render"][i]),
                                   np.asarray(one["render"]),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(batch["depth"][i]),
                                   np.asarray(one["depth"]), atol=2e-5)


def test_eval_navigation_seen_flags(tmp_path):
    """seen_fn threads per-pose flags + seen-only aggregates."""
    cfg = episode_cfg(tmp_path, steps=8)
    sim, scene = make_sim()
    m = ActiveMapper(cfg, sim, scene=scene, seed=0)
    m.test_navigation(n_eval_poses=0)
    from fisher_nerf_customized_tpu.engine.eval import eval_navigation
    out = eval_navigation(m.slam, sim, scene, n_poses=12, cam_height=1.25,
                          seen_fn=lambda x, z: x > 0)
    assert all("seen" in row for row in out["per_pose"])
    assert "psnr_seen" in out and "n_seen" in out
    seen_psnr = [r["psnr"] for r in out["per_pose"] if r["seen"]]
    if seen_psnr:
        np.testing.assert_allclose(out["psnr_seen"], np.mean(seen_psnr),
                                   rtol=1e-6)


def test_batched_eval_matches_render_metrics(tmp_path):
    """_batch_render_metrics == render_metrics per pose."""
    from fisher_nerf_customized_tpu.engine.eval import (
        _batch_render_metrics, render_metrics)
    rng = np.random.default_rng(0)
    r = rng.uniform(0, 1, (3, 32, 32, 3)).astype(np.float32)
    g = rng.uniform(0, 1, (3, 32, 32, 3)).astype(np.float32)
    d = rng.uniform(0.1, 5, (3, 32, 32)).astype(np.float32)
    gd = rng.uniform(0, 5, (3, 32, 32)).astype(np.float32)
    gd[0, :8] = 0.0                         # invalid-depth masking
    ps, ss, lp, mae = _batch_render_metrics(r, g, d, gd)
    for i in range(3):
        ref = render_metrics(r[i], g[i], d[i], gd[i])
        np.testing.assert_allclose(float(ps[i]), ref["psnr"], rtol=1e-5)
        np.testing.assert_allclose(float(ss[i]), ref["ssim"], rtol=1e-5)
        np.testing.assert_allclose(float(lp[i]), ref["lpips_proxy"],
                                   rtol=1e-4)
        np.testing.assert_allclose(float(mae[i]), ref["depth_mae"],
                                   rtol=1e-5)


def test_resume_prefers_committed_checkpoint(tmp_path):
    """A params file NEWER than the episode_state commit record is
    ignored: resume pairs the state with params{ep['t']}."""
    cfg = episode_cfg(tmp_path, steps=12)
    cfg.checkpoint_interval = 6
    sim, scene = make_sim()
    m = ActiveMapper(cfg, sim, scene=scene, seed=0)
    m.test_navigation(n_eval_poses=0)
    ed = m.eval_dir
    import glob, os
    cks = sorted(glob.glob(os.path.join(ed, "params*.npz")),
                 key=lambda p: int(p.split("params")[-1].split(".")[0]))
    assert len(cks) >= 1
    ep = np.load(os.path.join(ed, "episode_state.npz"))
    committed = int(ep["t"])
    # forge a NEWER params file that is garbage: a torn post-commit save
    bogus = os.path.join(ed, f"params{committed + 999}.npz")
    with open(bogus, "wb") as f:
        f.write(b"truncated")
    sim2, _ = make_sim()
    m2 = ActiveMapper(cfg, sim2, scene=scene, seed=0, eval_dir=ed)
    m2.resume(bogus)                        # must redirect, not crash
    assert m2.slam.frame_idx >= 0


def test_incremental_recon_with_surface_fn_matches_oneshot():
    from fisher_nerf_customized_tpu.engine.eval import (
        IncrementalReconMetric, accuracy_comp_ratio_from_pcl)
    scene = BoxScene()
    fn = scene.surface_distance
    rng = np.random.default_rng(7)
    gt = scene.sample_surface_points(4000)
    batches = [scene.sample_surface_points(n, rng=np.random.default_rng(i))
               + rng.normal(0, 0.01, (n, 3)).astype(np.float32)
               for i, n in enumerate((500, 900, 700))]
    inc = IncrementalReconMetric(gt, 0.05, surface_dist_fn=fn)
    for b in batches:
        m_inc = inc.update(b)
    m_ref = accuracy_comp_ratio_from_pcl(np.concatenate(batches), gt, 0.05,
                                         surface_dist_fn=fn)
    for k in m_ref:
        np.testing.assert_allclose(m_inc[k], m_ref[k], rtol=1e-5,
                                   err_msg=k)
    # analytic accuracy of near-surface points must be ~ the noise scale,
    # far below any GT-sampling floor
    assert m_ref["acc_distance"] < 0.02
