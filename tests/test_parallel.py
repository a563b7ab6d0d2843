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

    sharded = np.asarray(pose_eval_sharded(
        mesh, slam.state, jnp.asarray(w2cs), h_inv, slam.camera,
        slam.settings))

    from fisher_nerf_customized_tpu.models.slam import _fisher_batch
    ref = _fisher_batch(slam.state, jnp.asarray(w2cs), slam.camera,
                        slam.settings)
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
