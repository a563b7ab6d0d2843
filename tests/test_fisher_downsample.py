"""Fisher EIG downsampling gate: candidate RANKING must survive
`tpu.fisher_downsample` (EIG renders at reduced resolution; the
reference computes the Hessian at full camera resolution,
gaussian.py:1503-1570 — the downsample is a TPU-side planning speedup
whose validity rests on these checks plus the hardware episode A/B in
QUALITY.md).

Two scale-compensations make the downsampled scores comparable:
  * grad_value *= s  (H ~ grad_value² · n_pixels)
  * camera.dilation /= s²  (the EWA +0.3 low-pass is a pixel-space
    floor; unscaled it dominates small splats at reduced resolution)
Residual ranking noise comes from per-tile top-K truncation differences
(a low-res tile covers s² more area), so the gate checks rank
correlation and top-5 agreement, not exact argmax."""
import numpy as np
import pytest

from fisher_nerf_customized_tpu.config import get_cfg_defaults
from fisher_nerf_customized_tpu.models.slam import GaussianSLAM

HW = 128


def _spearman(a, b):
    ra = np.argsort(np.argsort(a))
    rb = np.argsort(np.argsort(b))
    ra = ra - ra.mean()
    rb = rb - rb.mean()
    return float((ra * rb).sum()
                 / np.sqrt((ra * ra).sum() * (rb * rb).sum()))


def _make_slam(tmp_path, downsample):
    cfg = get_cfg_defaults()
    cfg.workdir = str(tmp_path)
    cfg.run_name = f"ds{downsample}"
    c = cfg.SLAM.Dataset.Calibration
    c.width = c.height = HW
    c.fx = c.fy = HW / 2.0
    c.cx = c.cy = HW / 2.0
    cfg.tpu.capacity = 8192
    cfg.tpu.fisher_downsample = downsample
    cfg.tpu.pose_chunk = 8
    slam = GaussianSLAM(cfg, eval_dir=str(tmp_path / f"ds{downsample}"))
    rng = np.random.default_rng(0)
    depth = 2.0 + 0.5 * rng.random((HW, HW)).astype(np.float32)
    rgb = rng.random((HW, HW, 3)).astype(np.float32)
    slam.init(rgb, depth, np.eye(4, dtype=np.float32))
    return slam


def _candidate_poses(n=16, seed=1):
    rng = np.random.default_rng(seed)
    poses = []
    for _ in range(n):
        c2w = np.eye(4, dtype=np.float32)
        th = rng.uniform(-0.6, 0.6)
        c2w[:3, :3] = np.array([[np.cos(th), 0, np.sin(th)],
                                [0, 1, 0],
                                [-np.sin(th), 0, np.cos(th)]], np.float32)
        c2w[:3, 3] = rng.uniform(-0.4, 0.4, 3).astype(np.float32)
        poses.append(c2w)
    return np.stack(poses)


def test_downsample_ranking_parity(tmp_path):
    s1 = _make_slam(tmp_path, 1)
    s2 = _make_slam(tmp_path, 2)
    poses = _candidate_poses()
    sc1 = np.asarray(s1.pose_eval(poses)[0])
    sc2 = np.asarray(s2.pose_eval(poses)[0])
    rho = _spearman(sc1, sc2)
    assert rho >= 0.85, f"Spearman {rho:.3f} < 0.85"
    # planning consumes the top-20 of 256; require the downsampled argmax
    # to be a top-5 candidate at full res (and vice versa)
    top5_full = set(np.argsort(-sc1)[:5].tolist())
    top5_ds = set(np.argsort(-sc2)[:5].tolist())
    assert int(np.argmax(sc2)) in top5_full
    assert int(np.argmax(sc1)) in top5_ds
    # compensations keep the score MAGNITUDE in the same decade so the
    # +0.1 H_train regularizer means the same thing at both resolutions
    ratio = np.median(sc2) / max(np.median(sc1), 1e-30)
    assert 0.3 < ratio < 3.0, f"score magnitude drifted {ratio:.2f}x"


def test_downsample_camera_shapes(tmp_path):
    s2 = _make_slam(tmp_path, 2)
    assert s2.fisher_camera.width == HW // 2
    assert s2.fisher_camera.fx == pytest.approx(HW / 4.0)
    assert s2.fisher_camera.dilation == pytest.approx(0.3 / 4.0)
    assert s2.fisher_grad_value == pytest.approx(2e-3)
    # render camera untouched
    assert s2.camera.width == HW and s2.camera.dilation == pytest.approx(0.3)
    # H_train shares the fisher camera: shapes stay (capacity, 4)
    h = s2.compute_H_train()
    assert h.shape == (s2.state.capacity, 4)
