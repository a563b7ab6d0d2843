import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fisher_nerf_customized_tpu.ops.camera import Camera
from fisher_nerf_customized_tpu.ops.naive import render_naive
from fisher_nerf_customized_tpu.ops.rasterize import RenderSettings, render


def make_scene(n=200, seed=0, spread=1.5, z_range=(1.0, 6.0)):
    rng = np.random.default_rng(seed)
    means = np.stack([
        rng.uniform(-spread, spread, n),
        rng.uniform(-spread, spread, n),
        rng.uniform(*z_range, n),
    ], axis=-1).astype(np.float32)
    scales = rng.uniform(0.02, 0.15, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(colors))


CAM = Camera(fx=64.0, fy=64.0, cx=32.0, cy=32.0, width=64, height=64)
ST = RenderSettings(tile_size=16, max_per_tile=256, chunk=32)


def test_tiled_matches_naive():
    means, scales, quats, opac, colors = make_scene()
    out = render(CAM, means, scales, quats, opac, colors, settings=ST)
    ref = render_naive(CAM, means, scales, quats, opac, colors)
    np.testing.assert_allclose(np.asarray(out["color"]),
                               np.asarray(ref["color"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["final_t"]),
                               np.asarray(ref["final_t"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["depth"]),
                               np.asarray(ref["depth"]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["radii"]),
                               np.asarray(ref["radii"]))
    assert int(out["overflow"]) == 0


def test_active_mask_culls_gaussians():
    means, scales, quats, opac, colors = make_scene(n=50)
    active = jnp.arange(50) < 25
    out = render(CAM, means, scales, quats, opac, colors, active=active,
                 settings=ST)
    ref = render_naive(CAM, means[:25], scales[:25], quats[:25], opac[:25],
                       colors[:25])
    np.testing.assert_allclose(np.asarray(out["color"]),
                               np.asarray(ref["color"]), atol=2e-4)
    assert np.all(np.asarray(out["radii"])[25:] == 0)


def test_background_color():
    means, scales, quats, opac, colors = make_scene(n=5, spread=0.2)
    bg = jnp.array([1.0, 1.0, 1.0])
    out = render(CAM, means, scales, quats, opac, colors, bg=bg, settings=ST)
    # far corners should be (near) background
    corner = np.asarray(out["color"])[0, 0]
    t_corner = np.asarray(out["final_t"])[0, 0]
    np.testing.assert_allclose(corner, t_corner * np.ones(3), atol=2e-4)


def test_median_depth_single_opaque_gaussian():
    # one big opaque Gaussian in front of the camera -> median depth = its z
    means = jnp.array([[0.0, 0.0, 2.0]])
    scales = jnp.array([[0.5, 0.5, 0.5]])
    quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    opac = jnp.array([0.95])
    colors = jnp.array([[1.0, 0.0, 0.0]])
    out = render(CAM, means, scales, quats, opac, colors, settings=ST)
    d = np.asarray(out["depth"])
    assert abs(d[32, 32] - 2.0) < 1e-5
    # pixels the splat doesn't cover keep the max-depth fallback
    assert d[0, 0] == pytest.approx(15.0)


def test_depth_ordering_front_occludes_back():
    means = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, 4.0]])
    scales = jnp.full((2, 3), 0.5)
    quats = jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (2, 1))
    opac = jnp.array([0.99, 0.99])
    colors = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    out = render(CAM, means, scales, quats, opac, colors, settings=ST)
    center = np.asarray(out["color"])[32, 32]
    assert center[0] > 0.9 and center[1] < 0.05


def test_render_is_differentiable():
    means, scales, quats, opac, colors = make_scene(n=60)

    def loss(op, col, m):
        out = render(CAM, m, scales, quats, op, col, settings=ST)
        return jnp.sum(out["color"] ** 2)

    g_op, g_col, g_m = jax.grad(loss, argnums=(0, 1, 2))(opac, colors, means)
    for g in (g_op, g_col, g_m):
        arr = np.asarray(g)
        assert np.all(np.isfinite(arr))
        assert np.abs(arr).max() > 0


def test_vmap_over_poses():
    means, scales, quats, opac, colors = make_scene(n=40)

    def render_shifted(dxs):
        m = means + jnp.array([dxs, 0.0, 0.0])
        return render(CAM, m, scales, quats, opac, colors, settings=ST)["color"]

    batch = jax.vmap(render_shifted)(jnp.array([0.0, 0.1, -0.1]))
    assert batch.shape == (3, 64, 64, 3)
    single = render_shifted(0.1)
    np.testing.assert_allclose(np.asarray(batch[1]), np.asarray(single),
                               atol=1e-5)


def test_non_multiple_image_size_padding():
    cam = Camera(fx=48.0, fy=48.0, cx=24.0, cy=20.0, width=48, height=40)
    means, scales, quats, opac, colors = make_scene(n=80)
    out = render(cam, means, scales, quats, opac, colors, settings=ST)
    ref = render_naive(cam, means, scales, quats, opac, colors)
    assert out["color"].shape == (40, 48, 3)
    np.testing.assert_allclose(np.asarray(out["color"]),
                               np.asarray(ref["color"]), atol=2e-4)


def test_hierarchical_binning_matches_naive():
    """128² with 16px tiles -> 8x8 tile grid activates the two-level
    (coarse supertile) binning path; must match the naive oracle."""
    cam = Camera(fx=128.0, fy=128.0, cx=64.0, cy=64.0, width=128, height=128)
    means, scales, quats, opac, colors = make_scene(n=400, seed=7)
    st = RenderSettings(tile_size=16, max_per_tile=256, chunk=32)
    out = render(cam, means, scales, quats, opac, colors, settings=st)
    ref = render_naive(cam, means, scales, quats, opac, colors)
    assert int(out["overflow"]) == 0
    np.testing.assert_allclose(np.asarray(out["color"]),
                               np.asarray(ref["color"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["depth"]),
                               np.asarray(ref["depth"]), atol=1e-3)


def test_hierarchical_binning_dense_scene():
    """Dense cluster: coarse capacity must not silently drop visible
    splats (overflow must be reported if it does)."""
    cam = Camera(fx=128.0, fy=128.0, cx=64.0, cy=64.0, width=128, height=128)
    means, scales, quats, opac, colors = make_scene(n=2000, seed=8,
                                                    spread=0.6)
    st = RenderSettings(tile_size=16, max_per_tile=512, chunk=64)
    out = render(cam, means, scales, quats, opac, colors, settings=st)
    ref = render_naive(cam, means, scales, quats, opac, colors)
    if int(out["overflow"]) == 0:
        np.testing.assert_allclose(np.asarray(out["color"]),
                                   np.asarray(ref["color"]), atol=3e-4)


def test_overflow_reported_when_capacity_too_small():
    means, scales, quats, opac, colors = make_scene(n=500, spread=0.3)
    small = RenderSettings(tile_size=16, max_per_tile=64, chunk=32)
    out = render(CAM, means, scales, quats, opac, colors, settings=small)
    assert int(out["overflow"]) > 0


def test_render_prebinned_matches_render():
    """render_prebinned with the bins from the SAME params must match
    render() exactly (the frozen-binning mapping phase relies on this
    as its iteration-0 equivalence)."""
    from fisher_nerf_customized_tpu.ops.binning import tile_bin
    from fisher_nerf_customized_tpu.ops.projection import preprocess
    from fisher_nerf_customized_tpu.ops.rasterize import render_prebinned

    means, scales, quats, opac, colors = make_scene(n=200, seed=5)
    active = jnp.arange(200) < 150       # some inactive tail slots
    ref = render(CAM, means, scales, quats, opac, colors, active=active,
                 settings=ST)
    prep = preprocess(means, scales, quats, CAM, active=active)
    bins = tile_bin(prep.mean2d, prep.radius, prep.depth, prep.valid,
                    CAM.width, CAM.height, ST.tile_size, ST.max_per_tile)
    got = render_prebinned(CAM, means, scales, quats, opac, colors, bins,
                           settings=ST)
    # atol 1e-5: the two programs compile separately, so f32 fusion /
    # reassociation differs in the last bits
    np.testing.assert_allclose(np.asarray(got["color"]),
                               np.asarray(ref["color"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["depth"]),
                               np.asarray(ref["depth"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["final_t"]),
                               np.asarray(ref["final_t"]), atol=1e-5)


def test_render_prebinned_differentiable_wrt_params():
    """Gradients flow through live preprocess outputs under frozen bins."""
    from fisher_nerf_customized_tpu.ops.binning import tile_bin
    from fisher_nerf_customized_tpu.ops.projection import preprocess
    from fisher_nerf_customized_tpu.ops.rasterize import render_prebinned

    means, scales, quats, opac, colors = make_scene(n=80, seed=6)
    prep = preprocess(means, scales, quats, CAM)
    bins = tile_bin(prep.mean2d, prep.radius, prep.depth, prep.valid,
                    CAM.width, CAM.height, ST.tile_size, ST.max_per_tile)

    def loss(m, o, c):
        out = render_prebinned(CAM, m, scales, quats, o, c, bins,
                               settings=ST)
        return jnp.sum(out["color"] ** 2)

    g_m, g_o, g_c = jax.grad(loss, argnums=(0, 1, 2))(means, opac, colors)
    assert np.isfinite(np.asarray(g_m)).all()
    assert float(jnp.abs(g_m).sum()) > 0
    assert float(jnp.abs(g_o).sum()) > 0
    assert float(jnp.abs(g_c).sum()) > 0


def test_pallas_blend_backward_matches_ad(monkeypatch):
    """diff_backend='pallas' (analytic per-slot backward kernel, interpret
    mode on CPU) must match JAX AD through the blend scan for every
    parameter group, including the background/final_t path."""
    import fisher_nerf_customized_tpu.ops.pallas_blend_bwd as pbb

    orig = pbb.pallas_blend_bwd_slots
    monkeypatch.setattr(
        pbb, "pallas_blend_bwd_slots",
        lambda packed, pix_xy, gcol, gt, nvalid, chunk, interpret=False:
        orig(packed, pix_xy, gcol, gt, nvalid, chunk, interpret=True))

    rng = np.random.default_rng(3)
    n = 800
    cam = Camera(fx=32.0, fy=32.0, cx=32.0, cy=32.0, width=64, height=64)
    means = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1, 2, n),
                      rng.uniform(0.5, 6, n)], -1).astype(np.float32)
    scales = rng.uniform(0.02, 0.1, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.2, 0.85, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    args = [jnp.asarray(a) for a in (means, scales, quats, opac, colors)]
    target = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)), jnp.float32)
    bg = jnp.asarray([0.3, 0.2, 0.1], jnp.float32)

    def loss_with(st):
        def f(mc, sc, qt, op, co):
            out = render(cam, mc, sc, qt, op, co, bg=bg, settings=st)
            return jnp.mean(jnp.abs(out["color"] - target))
        return f

    st_x = RenderSettings(tile_size=8, max_per_tile=64, chunk=16)
    st_p = st_x._replace(diff_backend="pallas")
    gx = jax.grad(loss_with(st_x), argnums=(0, 1, 2, 3, 4))(*args)
    gp = jax.grad(loss_with(st_p), argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(gx, gp):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-12)
        np.testing.assert_allclose(b, a, rtol=2e-2,
                                   atol=1e-6 * scale + 1e-10)


def test_mark_visible_frustum_semantics():
    """markVisible parity: pure z_view > 0.001 test (reference
    auxiliary.h:139-161 in_frustum — the NDC bound check is commented
    out upstream), no render needed."""
    import jax.numpy as jnp

    from fisher_nerf_customized_tpu.ops.projection import mark_visible
    w2c = np.eye(4, dtype=np.float32)
    pts = np.array([[0, 0, 1.0], [0, 0, -1.0], [0, 0, 0.0005],
                    [100, 100, 5.0]], np.float32)   # off-screen but z>0
    vis = np.asarray(mark_visible(jnp.asarray(pts), jnp.asarray(w2c)))
    assert vis.tolist() == [True, False, False, True]
    # respects the view transform: camera looking -z sees the -z point
    w2c_flip = np.diag([1.0, 1.0, -1.0, 1.0]).astype(np.float32)
    vis2 = np.asarray(mark_visible(jnp.asarray(pts), jnp.asarray(w2c_flip)))
    assert vis2.tolist() == [False, True, False, False]
