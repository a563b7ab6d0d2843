"""Golden-curve harness tests (SURVEY.md §4 golden-file strategy).

The reference ships MP3D metric curves (reference data/metric_data/*.yaml,
produced by tester:1212-1289); absolute completeness is scene-suite
specific, so the transferable invariants are policy ORDERING by AUC and
curve SHAPE.  These tests exercise scripts/compare_curves.py end-to-end
on synthetic repo curves, and — when the reference checkout is present —
assert the ordering invariant on the real golden files.

No jax import: the harness is pure numpy/yaml and must stay cheap.
"""
import importlib.util
import os

import numpy as np
import pytest
import yaml

_SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                       "compare_curves.py")
_spec = importlib.util.spec_from_file_location("compare_curves", _SCRIPT)
cc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(cc)

_REF_DIR = "/root/reference/data/metric_data"


def _dump_ours(path, policy, curve):
    """MetricsRecorder.dump schema (engine/eval.py MetricsRecorder)."""
    steps = [dict(step=i, completeness_ratio=float(v))
             for i, v in enumerate(curve)]
    with open(path, "w") as f:
        yaml.safe_dump(dict(policy=policy, scene="fake_scene", steps=steps,
                            auc=cc.curve_auc(np.asarray(curve))),
                       f, sort_keys=False)
    return str(path)


def test_curve_auc_normalized():
    # constant curve -> AUC equals the constant, independent of length
    assert cc.curve_auc(np.full(10, 0.5)) == pytest.approx(0.5)
    assert cc.curve_auc(np.full(100, 0.5)) == pytest.approx(0.5)
    # linear ramp 0..1 -> 0.5
    assert cc.curve_auc(np.linspace(0, 1, 50)) == pytest.approx(0.5)


def test_shape_stats_monotone_and_saturation():
    t = np.linspace(0, 1, 100)
    sat = 1.0 - np.exp(-4 * t)           # saturating growth
    st = cc.shape_stats(dict(completeness=sat))
    assert st["monotone_frac"] == pytest.approx(1.0)
    assert st["half_point"] < 0.35        # reaches half coverage early
    assert st["late_growth"] < 0.1        # saturated by the last quarter
    noisy = np.concatenate([t[:50], t[50:] - 0.2])   # a regression dip
    st2 = cc.shape_stats(dict(completeness=noisy))
    assert st2["monotone_frac"] < 1.0


def test_loads_repo_and_reference_schemas(tmp_path):
    p = _dump_ours(tmp_path / "m.yaml", "gaussians_based",
                   np.linspace(0, 0.8, 20))
    c = cc.load_curve(p)
    assert c["name"] == "gaussians_based" and len(c["steps"]) == 20
    # reference schema (experiment: {policy_name}) parses through the
    # same loader
    ref_like = tmp_path / "ref.yaml"
    with open(ref_like, "w") as f:
        yaml.safe_dump(dict(
            experiment=dict(policy_name="FBE", scene_id="x"),
            steps=[dict(step=i, completeness_ratio=i / 10.0)
                   for i in range(10)]), f)
    c2 = cc.load_curve(str(ref_like))
    assert c2["name"] == "FBE" and c2["final"] == pytest.approx(0.9)


def test_main_end_to_end_ordering(tmp_path):
    strong = _dump_ours(tmp_path / "a.yaml", "gaussians_based",
                        1 - np.exp(-5 * np.linspace(0, 1, 60)))
    weak = _dump_ours(tmp_path / "b.yaml", "frontier",
                      1 - np.exp(-3 * np.linspace(0, 1, 60)))
    ref = _REF_DIR if os.path.isdir(_REF_DIR) else str(tmp_path / "noref")
    out = str(tmp_path / "cmp.csv")
    rc = cc.main(["--ours", strong, weak, "--reference", ref, "--out", out])
    assert rc == 0
    assert os.path.exists(out)
    # inverted ordering must FAIL the harness
    rc_bad = cc.main(
        ["--ours",
         _dump_ours(tmp_path / "a2.yaml", "gaussians_based",
                    np.linspace(0, 0.3, 60)),
         _dump_ours(tmp_path / "b2.yaml", "frontier",
                    np.linspace(0, 0.9, 60)),
         "--reference", ref, "--out", out])
    assert rc_bad == 1


@pytest.mark.skipif(not os.path.isdir(_REF_DIR),
                    reason="reference checkout not present")
def test_reference_golden_invariant_holds():
    """The invariant the harness checks is true of the reference's own
    published curves: FisherRF beats FBE on AUC (BASELINE.md)."""
    fisher = cc.load_curve(os.path.join(_REF_DIR, "FisherRF.yaml"))
    fbe = cc.load_curve(os.path.join(_REF_DIR, "FBE.yaml"))
    assert fisher["auc"] >= fbe["auc"]
    # both golden curves are mostly monotone coverage curves
    for c in (fisher, fbe):
        assert cc.shape_stats(c)["monotone_frac"] >= 0.9
