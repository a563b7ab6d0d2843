"""Object-aware active-mapping episode end-to-end (reference §3.5 object
branch + §3.6 known-env novelty mode)."""
import numpy as np

from fisher_nerf_customized_tpu.engine import ActiveMapper
from fisher_nerf_customized_tpu.envs.fake_sim import (BoxScene, FakeSim,
                                                      SimObject)
from fisher_nerf_customized_tpu.ops.camera import Camera
from tests.test_engine import episode_cfg

IMG = 48


def make_obj_sim(seed=0, dynamic=False):
    cam = Camera(fx=float(IMG), fy=float(IMG), cx=IMG / 2, cy=IMG / 2,
                 width=IMG, height=IMG)
    scene = BoxScene(room_lo=(-3, 0, -3), room_hi=(3, 2.5, 3), obstacles=[])
    obj = SimObject(scene, semantic_id=100, size=(0.5, 1.2, 0.5),
                    start_xz=(0.0, 1.8), speed=0.03, seed=seed)
    sim = FakeSim(scene, cam, forward_step=0.15, turn_angle=30.0,
                  dynamic_object=obj, seed=seed)
    return sim, scene, obj


def gt_object_points(obj, n=2000):
    # canonical object frame: record_object_metrics compares against the
    # accumulated inv(object_pose)-registered observation cloud
    pts = obj.sample_surface_points(n, frame="object")
    lo = np.asarray(obj.aabb()[0]) - obj.pos
    hi = np.asarray(obj.aabb()[1]) - obj.pos
    assert (pts >= lo - 1e-4).all() and (pts <= hi + 1e-4).all()
    return pts


def test_object_episode_fisher(tmp_path):
    sim, scene, obj = make_obj_sim()
    cfg = episode_cfg(tmp_path, steps=16)
    cfg.map_obj_every = 2
    cfg.keyframe_obj_every = 2
    cfg.criterion = "fisher"
    cfg.explore_object.sample_view_num = 8
    mapper = ActiveMapper(cfg, sim, scene=scene, seed=0, object_scene=True,
                          dynamic_scene=False)
    result = mapper.test_navigation(n_eval_poses=0)
    assert result["steps"] >= 10
    assert mapper.obj_slam is not None
    assert mapper.obj_slam.n_active > 0
    # object gaussians near the object
    pts = mapper.obj_slam.gaussian_points
    d = np.linalg.norm(pts[:, [0, 2]] - obj.translation[[0, 2]], axis=1)
    assert np.median(d) < 1.2
    # object metrics recordable
    m = mapper.record_object_metrics(result["steps"], gt_object_points(obj))
    assert m is not None and np.isfinite(m["completeness_ratio"])
    assert mapper.object_metrics.auc() >= 0
    mapper.object_metrics.dump(str(tmp_path / "object_recon_metrics.yaml"))


def test_object_episode_topt(tmp_path):
    sim, scene, obj = make_obj_sim(seed=1)
    cfg = episode_cfg(tmp_path, steps=12)
    cfg.map_obj_every = 2
    cfg.keyframe_obj_every = 2
    cfg.criterion = "topt"
    cfg.explore_object.sample_view_num = 6
    cfg.tpu.hutchinson_probes = 2
    mapper = ActiveMapper(cfg, sim, scene=scene, seed=0, object_scene=True,
                          dynamic_scene=True)
    result = mapper.test_navigation(n_eval_poses=0)
    assert result["steps"] >= 8
    assert mapper.obj_slam is not None


def test_known_env_novelty_episode(tmp_path):
    """Known-env mode: object discovered via GT-cloud novelty mask, no
    semantics (reference §3.6)."""
    sim, scene, obj = make_obj_sim(seed=2)
    # GT cloud of the EMPTY scene (the object is the novelty)
    empty = BoxScene(room_lo=scene.room_lo, room_hi=scene.room_hi,
                     obstacles=[])
    gt_cloud = empty.sample_surface_points(40000)
    cfg = episode_cfg(tmp_path, steps=10)
    cfg.map_obj_every = 2
    cfg.explore_object.sample_view_num = 6
    mapper = ActiveMapper(cfg, sim, scene=scene, seed=0, object_scene=True,
                          known_env_points=gt_cloud)
    obs = sim.reset(yaw=0.0)        # facing the object
    mask = mapper._object_mask(obs)
    assert mask is not None and mask.sum() > 20
    result = mapper.test_navigation(n_eval_poses=0)
    assert result["steps"] >= 6
    assert mapper.obj_slam is not None


def test_object_canonical_frame_registration():
    """A moving object's canonical-frame samples are pose-invariant:
    world samples re-registered through inv(object_pose) land on the same
    canonical surface (the property record_object_metrics relies on for
    dynamic objects; reference tester:508-550)."""
    _sim, _scene, obj = make_obj_sim(seed=3)
    canon0 = gt_object_points(obj, 500)
    world0 = obj.sample_surface_points(500, frame="world")
    T = obj.object_pose()
    np.testing.assert_allclose(
        (world0 - T[:3, 3]) @ T[:3, :3], canon0, atol=1e-5)
    # move the object; canonical samples must be unchanged as a SET
    obj.set_translation(obj.pos + np.array([0.7, 0.0, -0.4], np.float32))
    canon1 = gt_object_points(obj, 500)
    np.testing.assert_allclose(np.sort(canon0, axis=0),
                               np.sort(canon1, axis=0), atol=1e-5)


def test_obj_pcl_cap_preserves_metric_coverage(tmp_path):
    """The accumulated object cloud's memory cap must not dent the 1 cm
    completeness metric: voxel dedup at 0.5 cm keeps every GT point's
    nearest-neighbor distance <= pre-cap distance + voxel diagonal
    (random halving, the old policy, dropped completeness ~3% per cap
    event on long episodes)."""
    import numpy as np

    from fisher_nerf_customized_tpu.engine.eval import (
        accuracy_comp_ratio_from_pcl)

    rng = np.random.default_rng(0)
    # dense surface cloud: a 0.4 m box face sampled at ~1.5 mm spacing
    gt = np.stack([rng.uniform(0, 0.4, 5000), rng.uniform(0, 0.4, 5000),
                   np.zeros(5000)], -1).astype(np.float32)
    dense = np.stack([rng.uniform(0, 0.4, 450_000),
                      rng.uniform(0, 0.4, 450_000),
                      np.zeros(450_000)], -1).astype(np.float32)
    before = accuracy_comp_ratio_from_pcl(dense, gt, 0.01)

    q = np.round(dense / 0.005).astype(np.int64)
    _, first = np.unique(q, axis=0, return_index=True)
    deduped = dense[first]
    assert len(deduped) < len(dense)        # the cap actually shrinks
    after = accuracy_comp_ratio_from_pcl(deduped, gt, 0.01)
    # completeness preserved at the metric scale
    assert after["completeness_ratio"] >= before["completeness_ratio"] - 0.2
    # the cap is bounded by surface area: one point per 0.5 cm voxel on a
    # 0.16 m^2 face is <= ~6.4k + quantization fringe
    assert len(deduped) < 30_000
    # idempotent: a second cap event does not erode the cloud further
    q2 = np.round(deduped / 0.005).astype(np.int64)
    _, first2 = np.unique(q2, axis=0, return_index=True)
    assert len(first2) == len(deduped)
