"""Validate the FULL Fisher gradient chain (VERDICT r1 missing #2).

ops/fisher.py (full_chain=True, the default) squares the backward through
the alpha+projection chain PLUS the cov2D-through-mean term
(computeCov2DCUDA's dL_dmean, reference cuda_rasterizer/backward.cu:144-270,
summed before squaring exactly as backward.cu:1104-1107).  These tests
compute the FULL-chain squared autodiff — jacrev through the real
differentiable render pipeline, where the conic's dependence on the
camera-frame mean is included automatically — and assert (a) the analytic
full-chain kernel matches it numerically, and (b) candidate-VIEW RANKING
(the only consumer of these scores: pose_eval / path EIG) agrees between
the reduced (round-1) chain and the full chain at Spearman >= 0.99.

Scene scale note: jacrev of the full render is O(pixels x N x 3) memory,
so the gate runs at small scenes (24x24, N=16) rather than eccv shapes
(256x256, 100k+); the omitted term scales with perspective distortion
(focal/z), which the small frustum here exercises at realistic z ranges.
"""
import jax
import jax.numpy as jnp
import numpy as np

from fisher_nerf_customized_tpu.ops.camera import Camera
from fisher_nerf_customized_tpu.ops.fisher import fisher_diag
from fisher_nerf_customized_tpu.ops.rasterize import RenderSettings, render

CAM = Camera(fx=24.0, fy=24.0, cx=12.0, cy=12.0, width=24, height=24)
ST = RenderSettings(tile_size=8, max_per_tile=32, chunk=8)
GRAD = 1e-3


def make_scene(n=16, seed=0):
    rng = np.random.default_rng(seed)
    means = np.stack([rng.uniform(-0.8, 0.8, n),
                      rng.uniform(-0.8, 0.8, n),
                      rng.uniform(1.5, 5.0, n)], -1).astype(np.float32)
    scales = rng.uniform(0.05, 0.2, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.3, 0.9, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(colors))


def full_chain_H(means_cam, scales, quats, opac, colors):
    """(N, 4) = [mean_cam (3), opacity (1)] squared per-pixel grads of the
    channel-summed render — the FULL differentiation chain (incl. the
    cov2D-through-mean term the analytic kernel omits)."""
    def pix_sums(mc, op):
        out = render(CAM, mc, scales, quats, op, colors, settings=ST)
        return GRAD * jnp.sum(out["color"], axis=-1).reshape(-1)   # (P,)

    j_mc = jax.jacrev(lambda mc: pix_sums(mc, opac))(means_cam)    # (P,N,3)
    j_op = jax.jacrev(lambda op: pix_sums(means_cam, op))(opac)    # (P,N)
    return jnp.concatenate([jnp.sum(j_mc ** 2, axis=0),
                            jnp.sum(j_op ** 2, axis=0)[:, None]], axis=-1)


def spearman(a, b):
    ra = np.argsort(np.argsort(a))
    rb = np.argsort(np.argsort(b))
    return np.corrcoef(ra, rb)[0, 1]


def candidate_poses(k=24, seed=7):
    rng = np.random.default_rng(seed)
    poses = []
    for _ in range(k):
        yaw = rng.uniform(-0.5, 0.5)
        c, s = np.cos(yaw), np.sin(yaw)
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]],
                               np.float32)
        w2c[:3, 3] = [rng.uniform(-0.4, 0.4), rng.uniform(-0.2, 0.2),
                      rng.uniform(-0.6, 0.6)]
        poses.append(w2c)
    return np.stack(poses)


def test_full_chain_kernel_matches_full_autodiff():
    """The analytic full-chain kernel (default) vs jacrev through the real
    render: mean rows now include the cov2D-through-mean term, so ALL four
    diagonal rows must agree."""
    means, scales, quats, opac, colors = make_scene()
    got = np.asarray(fisher_diag(CAM, means, scales, quats, opac, colors,
                                 grad_value=GRAD, settings=ST,
                                 full_chain=True)["H"])
    full = np.asarray(full_chain_H(means, scales, quats, opac, colors))
    np.testing.assert_allclose(got, full, rtol=5e-2, atol=1e-12)


def test_full_chain_opacity_row_matches_reduced():
    """The opacity row has NO cov2D chain — full-chain autodiff and the
    analytic kernel must agree there (validates the harness itself)."""
    means, scales, quats, opac, colors = make_scene()
    reduced = np.asarray(fisher_diag(CAM, means, scales, quats, opac,
                                     colors, grad_value=GRAD,
                                     settings=ST)["H"])
    full = np.asarray(full_chain_H(means, scales, quats, opac, colors))
    np.testing.assert_allclose(reduced[:, 3], full[:, 3], rtol=5e-2,
                               atol=1e-14)


def test_candidate_ranking_agreement_full_vs_reduced_chain():
    """EIG candidate ranking: reduced chain vs full chain, Spearman >=
    0.99 over 24 candidate poses (each chain uses its own H_train from
    the same 2 'visited' views, mirroring pose_eval's self-consistent
    use)."""
    means_w, scales, quats, opac, colors = make_scene(seed=1)
    train_w2cs = candidate_poses(k=2, seed=3)
    cands = candidate_poses(k=24, seed=7)

    def h_at(w2c, fn):
        mc = means_w @ jnp.asarray(w2c)[:3, :3].T + jnp.asarray(w2c)[:3, 3]
        return fn(mc)

    red_fn = lambda mc: np.asarray(fisher_diag(    # noqa: E731
        CAM, mc, scales, quats, opac, colors, grad_value=GRAD,
        settings=ST)["H"])
    full_fn = lambda mc: np.asarray(full_chain_H(  # noqa: E731
        mc, scales, quats, opac, colors))

    scores = {}
    for name, fn in (("reduced", red_fn), ("full", full_fn)):
        h_train = sum(h_at(w, fn) for w in train_w2cs)
        h_inv = 1.0 / (h_train + 0.1)
        scores[name] = np.array([(h_at(c, fn) * h_inv).sum()
                                 for c in cands])

    rho = spearman(scores["reduced"], scores["full"])
    assert rho >= 0.99, f"ranking drift: spearman={rho:.4f}"
    # the argmax candidate (the pose the planner would pick) agrees
    assert int(np.argmax(scores["reduced"])) == \
        int(np.argmax(scores["full"]))
