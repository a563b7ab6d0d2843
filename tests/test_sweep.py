"""Multi-scene sweep artifact tests (BASELINE.json configs[4]; ref:
scripts/auc_evaluation.py:26-169 + data/metric_data YAML shape)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts")
sys.path.insert(0, SCRIPTS)

REF_STEP_KEYS = {"step", "acc_distance_m", "comp_distance_m",
                 "completeness_ratio", "fpr", "est_pcl_path"}


def _small_env(tmp_path):
    env = dict(os.environ)
    env["QUALITY_SET"] = ("mapping.num_iters=6,tpu.capacity=8192,"
                          "tpu.tile_size=8,tpu.max_per_tile=512,"
                          "map_every=4,keyframe_every=4,downsample_pcd=4,"
                          "policy.planning_queue_size=10,"
                          "explore.sample_view_num=32")
    env["FNC_PLATFORM"] = "cpu"
    return env


def test_sweep_emits_reference_shape_and_summary(tmp_path):
    out = tmp_path / "sweep"
    env = _small_env(tmp_path)
    r = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "multi_scene_sweep.py"),
         "--policies", "frontier", "--n_scenes", "2", "--steps", "10",
         "--img", "64", "--out", str(out)],
        env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    md = out / "metric_data"
    ys = sorted((md / "FBE").glob("*.yaml"))
    assert len(ys) == 2
    doc = yaml.safe_load(ys[0].read_text())
    assert doc["experiment"]["policy_name"] == "FBE"
    assert doc["experiment"]["scene_id"].startswith("fake_room_")
    assert doc["settings"]["distance_threshold_m"] == pytest.approx(0.05)
    assert doc["steps"] and set(doc["steps"][0]) == REF_STEP_KEYS
    summary = json.loads((md / "auc_summary.json").read_text())
    pol = summary["policies"]["FBE"]
    per = list(pol["auc_per_scene"].values())
    assert pol["auc_mean"] == pytest.approx(np.mean(per), abs=1e-3)
    assert pol["auc_std"] == pytest.approx(np.std(per), abs=1e-3)


def test_sweep_cell_equals_individual_run(tmp_path):
    """A sweep cell must reproduce an individually-launched episode of the
    same (policy, scene seed): identical per-step curve and AUC — the
    sweep is per-scene sequential runs, nothing shared leaks across."""
    os.environ["QUALITY_SET"] = _small_env(tmp_path)["QUALITY_SET"]
    try:
        from multi_scene_sweep import run_cell
        a = run_cell("frontier", 100, 10, str(tmp_path / "a"), img=64)
        b = run_cell("frontier", 100, 10, str(tmp_path / "b"), img=64)
    finally:
        os.environ.pop("QUALITY_SET", None)
    assert a["auc"] == pytest.approx(b["auc"], rel=1e-6)
    assert a["steps"] == b["steps"]
    ca = [s["completeness_ratio"] for s in a["recorder"].steps]
    cb = [s["completeness_ratio"] for s in b["recorder"].steps]
    np.testing.assert_allclose(ca, cb, rtol=1e-6)


def test_sweep_cached_resume_auc_matches_recorder(tmp_path):
    """The resume path recomputes a cell's AUC from its dumped YAML; it
    must equal the live recorder's AUC exactly (trapezoid over recorded
    entries, scripts/multi_scene_sweep.py cached branch) so a
    babysitter-restarted sweep aggregates identical mean/std."""
    os.environ["QUALITY_SET"] = _small_env(tmp_path)["QUALITY_SET"]
    try:
        from multi_scene_sweep import dump_reference_yaml, run_cell
        cell = run_cell("frontier", 100, 10, str(tmp_path / "runs"),
                        img=64)
    finally:
        os.environ.pop("QUALITY_SET", None)
    ypath = tmp_path / "md" / "FBE" / f"{cell['scene_id']}.yaml"
    dump_reference_yaml(cell["recorder"], str(ypath), cell["scene_id"],
                        0.05)
    from fisher_nerf_customized_tpu.engine.eval import trapezoid_auc
    doc = yaml.safe_load(ypath.read_text())
    ys = [s["completeness_ratio"] for s in doc["steps"]]
    assert trapezoid_auc(ys) == pytest.approx(cell["auc"], rel=1e-6)
