"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from fisher_nerf_customized_tpu.config import get_cfg_defaults
from fisher_nerf_customized_tpu.envs.fake_sim import BoxScene, FakeSim
from fisher_nerf_customized_tpu.models.slam import GaussianSLAM, MappingConfig
from fisher_nerf_customized_tpu.ops.camera import Camera
from fisher_nerf_customized_tpu.parallel import (make_mesh,
                                                 mapping_step_sharded,
                                                 pose_eval_sharded)
from fisher_nerf_customized_tpu.models.gaussian_state import adam_init

IMG = 32


def small_cfg(tmp_path):
    cfg = get_cfg_defaults()
    cfg.SLAM.Dataset.Calibration.merge_from_other(dict(
        fx=float(IMG), fy=float(IMG), cx=IMG / 2, cy=IMG / 2,
        width=IMG, height=IMG))
    cfg.workdir = str(tmp_path)
    cfg.mapping.num_iters = 4
    cfg.tpu.capacity = 4096
    cfg.tpu.tile_size = 8
    cfg.tpu.max_per_tile = 256
    cfg.tpu.pose_chunk = 2
    return cfg


def build_slam(tmp_path):
    cam = Camera(fx=float(IMG), fy=float(IMG), cx=IMG / 2, cy=IMG / 2,
                 width=IMG, height=IMG)
    scene = BoxScene(room_lo=(-2, 0, -2), room_hi=(2, 2.5, 2), obstacles=[])
    sim = FakeSim(scene, cam)
    slam = GaussianSLAM(small_cfg(tmp_path))
    obs = sim.reset()
    slam.init(obs["rgb"], obs["depth"], np.linalg.inv(obs["c2w"]))
    return slam, sim


def test_devices_available():
    assert len(jax.devices()) == 8


def test_pose_eval_sharded_matches_single(tmp_path):
    slam, sim = build_slam(tmp_path)
    mesh = make_mesh(data=8)
    rng = np.random.default_rng(0)
    w2cs = np.tile(np.eye(4, dtype=np.float32), (8, 1, 1))
    w2cs[:, 0, 3] = rng.uniform(-0.2, 0.2, 8)
    h_inv = jnp.ones((slam.state.capacity, 4))

    from fisher_nerf_customized_tpu.models.slam import _fisher_batch
    for full_chain in (False, True):
        sharded = np.asarray(pose_eval_sharded(
            mesh, slam.state, jnp.asarray(w2cs), h_inv, slam.camera,
            slam.settings, full_chain=full_chain))
        ref = _fisher_batch(slam.state, jnp.asarray(w2cs), slam.camera,
                            slam.settings, full_chain=full_chain)
        ref_scores = np.asarray(jnp.sum(ref["H"] * h_inv[None], axis=(1, 2)))
        np.testing.assert_allclose(sharded, ref_scores, rtol=1e-5)


def test_mapping_step_sharded_reduces_loss(tmp_path):
    slam, sim = build_slam(tmp_path)
    mesh = make_mesh(data=8)
    step = mapping_step_sharded(mesh, slam.camera, slam.settings, slam.mc)

    obs = sim.get_observations()
    colors = jnp.asarray(np.tile(obs["rgb"][None], (8, 1, 1, 1)))
    depths = jnp.asarray(np.tile(obs["depth"][None], (8, 1, 1)))
    w2cs = jnp.asarray(np.tile(np.linalg.inv(obs["c2w"])[None], (8, 1, 1)))

    params = slam.state.params()
    # degrade opacities so the gradient step has clear signal
    params["logit_opacities"] = params["logit_opacities"] - 2.0
    opt = adam_init(params)
    losses = []
    for _ in range(6):
        params, opt, loss = step(params, opt, slam.state.n_active, colors,
                                 depths, w2cs)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    # params actually changed and stayed finite
    assert np.all(np.isfinite(np.asarray(params["means3D"])))


def test_mesh_shapes():
    mesh = make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}


def _random_gaussians(n, seed=0):
    rng = np.random.default_rng(seed)
    means = np.stack([rng.uniform(-2, 2, n), rng.uniform(0, 2.0, n),
                      rng.uniform(0.5, 6.0, n)], -1).astype(np.float32)
    scales = rng.uniform(0.02, 0.1, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.2, 0.9, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    active = np.ones((n,), bool)
    active[-n // 8:] = False            # some inactive slots on one shard
    return (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(active))


def test_render_gaussian_sharded_matches_single():
    """Gaussian-axis ('model') sharded render == single-device render: the
    per-device nearest-K union contains the global nearest-K, so the merge
    is exact (SURVEY.md §2.9 equivalent (3))."""
    from fisher_nerf_customized_tpu.ops.rasterize import (RenderSettings,
                                                          render)
    from fisher_nerf_customized_tpu.parallel import render_gaussian_sharded

    cam = Camera(fx=32.0, fy=32.0, cx=32.0, cy=32.0, width=64, height=64)
    st = RenderSettings(tile_size=8, max_per_tile=64, chunk=16)
    mesh = make_mesh(data=1, model=8)
    means, scales, quats, opac, colors, active = _random_gaussians(2048)
    w2c = jnp.eye(4)

    sharded_fn = render_gaussian_sharded(mesh, cam, st)
    out_s = sharded_fn(means, scales, quats, opac, colors, active, w2c)

    mc = means @ w2c[:3, :3].T + w2c[:3, 3]
    out_r = render(cam, mc, scales, quats, opac, colors,
                   active=active, settings=st)

    np.testing.assert_allclose(np.asarray(out_s["color"]),
                               np.asarray(out_r["color"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_s["depth"]),
                               np.asarray(out_r["depth"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_s["final_t"]),
                               np.asarray(out_r["final_t"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_s["radii"]),
                                  np.asarray(out_r["radii"]))


def test_fisher_gaussian_sharded_matches_single():
    """Sharded Fisher diag (psum_scatter'd accumulator) == fisher_diag."""
    from fisher_nerf_customized_tpu.ops.fisher import fisher_diag
    from fisher_nerf_customized_tpu.ops.rasterize import RenderSettings
    from fisher_nerf_customized_tpu.parallel import (
        fisher_diag_gaussian_sharded)

    cam = Camera(fx=32.0, fy=32.0, cx=32.0, cy=32.0, width=64, height=64)
    st = RenderSettings(tile_size=8, max_per_tile=64, chunk=16)
    mesh = make_mesh(data=1, model=8)
    means, scales, quats, opac, colors, active = _random_gaussians(2048,
                                                                   seed=3)
    w2c = jnp.eye(4)

    sharded_fn = fisher_diag_gaussian_sharded(mesh, cam, st)
    out_s = sharded_fn(means, scales, quats, opac, colors, active, w2c)

    mc = means @ w2c[:3, :3].T + w2c[:3, 3]
    out_r = fisher_diag(cam, mc, scales, quats, opac, colors,
                        active=active, settings=st)

    np.testing.assert_allclose(np.asarray(out_s["H"]),
                               np.asarray(out_r["H"]),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(out_s["visible"]),
                                  np.asarray(out_r["visible"]))


def test_multi_scene_train_step_matches_per_scene():
    """Scene-DP mapping step == per-scene unsharded steps (the DCN axis
    carries independent work; parallel/sharding.multi_scene_train_step)."""
    import jax
    from fisher_nerf_customized_tpu.models.gaussian_state import adam_init
    from fisher_nerf_customized_tpu.models.slam import MappingConfig
    from fisher_nerf_customized_tpu.ops.rasterize import RenderSettings
    from fisher_nerf_customized_tpu.parallel.sharding import (
        multi_scene_train_step)

    img = 16
    cam = Camera(fx=float(img), fy=float(img), cx=img / 2, cy=img / 2,
                 width=img, height=img)
    st = RenderSettings(tile_size=8, max_per_tile=32, chunk=16)
    mc = MappingConfig(
        num_iters=1, sil_thres=0.5, depth_weight=1.0, im_weight=0.5,
        prune_enabled=False, prune_every=40, prune_start=0, prune_stop=1000,
        prune_thresh=1e-4, prune_big_after=100,
        lr_means3D=1e-3, lr_rgb=2.5e-3, lr_rots=1e-3, lr_logit_op=0.05,
        lr_log_scales=0.01, depth_error_ratio=10.0, downsample_pcd=2)
    mesh = make_mesh(data=8, model=1)
    s = 8
    rng = np.random.default_rng(0)
    n = 128
    base = dict(
        means3D=np.stack([rng.uniform(-1, 1, (s, n)),
                          rng.uniform(0, 2, (s, n)),
                          rng.uniform(0.5, 3, (s, n))], -1).astype(np.float32),
        rgb_colors=rng.uniform(0, 1, (s, n, 3)).astype(np.float32),
        unnorm_rotations=np.tile(np.array([1.0, 0, 0, 0], np.float32),
                                 (s, n, 1)),
        logit_opacities=np.zeros((s, n, 1), np.float32),
        log_scales=np.full((s, n, 3), -2.5, np.float32))
    params_stack = {k: jnp.asarray(v) for k, v in base.items()}
    opt_stack = jax.vmap(adam_init)(params_stack)
    n_actives = jnp.full((s,), n, jnp.int32)
    colors = jnp.asarray(rng.uniform(0, 1, (s, img, img, 3)), jnp.float32)
    depths = jnp.asarray(rng.uniform(1, 2.5, (s, img, img)), jnp.float32)
    w2cs = jnp.tile(jnp.eye(4), (s, 1, 1))

    fn = multi_scene_train_step(mesh, cam, st, mc)
    new_params, _opt, losses = fn(params_stack, opt_stack, n_actives,
                                  colors, depths, w2cs)
    assert losses.shape == (s,)
    assert np.all(np.isfinite(np.asarray(losses)))
    # scenes see different frames -> different losses (independence)
    assert len(np.unique(np.round(np.asarray(losses), 6))) > 1
    # parameters actually moved
    assert not np.allclose(np.asarray(new_params["means3D"]),
                           base["means3D"])


def test_init_distributed_noop_single_host(monkeypatch):
    from fisher_nerf_customized_tpu.parallel import distributed
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("SLURM_STEP_NODELIST", raising=False)
    assert distributed.init_distributed() is False
    info = distributed.process_info()
    assert info["process_count"] == 1
    mesh = distributed.make_multihost_mesh(model=2)
    assert mesh.devices.shape == (4, 2)
