import numpy as np

from fisher_nerf_customized_tpu.envs.fake_sim import BoxScene, FakeSim
from fisher_nerf_customized_tpu.ops.camera import Camera
from fisher_nerf_customized_tpu.planning.occ_map import (OccupancyMap,
                                                         crop_grid,
                                                         est_occ_from_pcd)

CAM = Camera(fx=32.0, fy=32.0, cx=32.0, cy=32.0, width=64, height=64)


def test_occupancy_map_standalone(tmp_path):
    scene = BoxScene(room_lo=(-2, 0, -2), room_hi=(2, 2.5, 2), obstacles=[])
    sim = FakeSim(scene, CAM, turn_angle=45.0)
    om = OccupancyMap(CAM, grid_dim=(128, 128), cell_size=0.1)
    obs = sim.reset()
    om.update(obs["depth"], obs["c2w"])
    r0 = om.explored_ratio()
    assert r0 > 0
    for _ in range(7):
        obs = sim.step(2)
        om.update(obs["depth"], obs["c2w"])
    assert om.explored_ratio() > r0
    crop = om.ego_crop(obs["c2w"], crop=32)
    assert crop.shape == (3, 32, 32)
    p = str(tmp_path / "occ.npz")
    om.save(p)
    om2 = OccupancyMap(CAM, grid_dim=(128, 128))
    om2.load(p)
    assert abs(om2.explored_ratio() - om.explored_ratio()) < 1e-9


def test_est_occ_from_pcd():
    pts = np.array([[0.0, 0.5, 1.0], [0.0, 5.0, 1.0]])  # second above band
    occ = est_occ_from_pcd(pts, (32, 32), 0.1, (0.0, 0.0))
    assert occ[1].sum() == 1.0


def test_crop_grid_padding():
    g = np.ones((3, 16, 16), np.float32)
    c = crop_grid(g, (0, 0), 8)
    assert c.shape == (3, 8, 8)
    assert c[0, 0, 0] == 0.0       # padded corner
    assert c[0, -1, -1] == 1.0     # real data
