"""Pallas blend kernel vs the XLA blend path (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np

from fisher_nerf_customized_tpu.ops.camera import Camera
from fisher_nerf_customized_tpu.ops.pallas_blend import render_pallas
from fisher_nerf_customized_tpu.ops.rasterize import RenderSettings, render

CAM = Camera(fx=64.0, fy=64.0, cx=32.0, cy=32.0, width=64, height=64)
ST = RenderSettings(tile_size=16, max_per_tile=128, chunk=32)


def make_scene(n=150, seed=0):
    rng = np.random.default_rng(seed)
    means = np.stack([rng.uniform(-1.2, 1.2, n), rng.uniform(-1.2, 1.2, n),
                      rng.uniform(1.0, 6.0, n)], -1).astype(np.float32)
    scales = rng.uniform(0.03, 0.15, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return tuple(jnp.asarray(x) for x in (means, scales, quats, opac, colors))


def test_pallas_blend_matches_xla():
    means, scales, quats, opac, colors = make_scene()
    ref = render(CAM, means, scales, quats, opac, colors, settings=ST)
    got = render_pallas(CAM, means, scales, quats, opac, colors,
                        settings=ST, interpret=True)
    np.testing.assert_allclose(np.asarray(got["color"]),
                               np.asarray(ref["color"]), atol=3e-4)
    np.testing.assert_allclose(np.asarray(got["final_t"]),
                               np.asarray(ref["final_t"]), atol=3e-4)
    np.testing.assert_allclose(np.asarray(got["depth"]),
                               np.asarray(ref["depth"]), atol=1e-2)


def test_pallas_blend_with_background_and_channels():
    means, scales, quats, opac, colors = make_scene(n=60, seed=1)
    # 6-channel colors like the SLAM's fused RGB+depth-sil pass
    z = means[:, 2:3]
    colors6 = jnp.concatenate([colors, z, jnp.ones_like(z), z * z], axis=-1)
    bg = jnp.array([1.0, 1, 1, 0, 0, 0])
    ref = render(CAM, means, scales, quats, opac, colors6, bg=bg, settings=ST)
    got = render_pallas(CAM, means, scales, quats, opac, colors6, bg=bg,
                        settings=ST, interpret=True)
    np.testing.assert_allclose(np.asarray(got["color"]),
                               np.asarray(ref["color"]), atol=3e-4)


def test_pallas_blend_early_termination_correct():
    """Dense opaque wall: early exit must not change the image."""
    rng = np.random.default_rng(2)
    n = 400
    means = np.stack([rng.uniform(-0.5, 0.5, n), rng.uniform(-0.5, 0.5, n),
                      rng.uniform(1.0, 1.2, n)], -1).astype(np.float32)
    scales = np.full((n, 3), 0.15, np.float32)
    quats = np.tile(np.array([1.0, 0, 0, 0], np.float32), (n, 1))
    opac = np.full((n,), 0.98, np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    args = tuple(jnp.asarray(x) for x in (means, scales, quats, opac, colors))
    ref = render(CAM, *args, settings=ST)
    got = render_pallas(CAM, *args, settings=ST, interpret=True)
    np.testing.assert_allclose(np.asarray(got["color"]),
                               np.asarray(ref["color"]), atol=5e-4)


def test_vjp_path_pallas_forward_matches_xla():
    """fwd_backend=pallas inside the custom-VJP blend: forward outputs
    match the XLA forward, and the (Pallas) backward still runs."""
    import jax
    from fisher_nerf_customized_tpu.ops.rasterize import render_prebinned
    from fisher_nerf_customized_tpu.ops.binning import tile_bin
    from fisher_nerf_customized_tpu.ops.projection import preprocess

    means, scales, quats, opac, colors = make_scene(n=120, seed=3)
    st_x = ST._replace(diff_backend="pallas", fwd_backend="xla")
    st_p = ST._replace(diff_backend="pallas", fwd_backend="pallas")
    prep = preprocess(means, scales, quats, CAM)
    bins = tile_bin(prep.mean2d, prep.radius, prep.depth, prep.valid,
                    CAM.width, CAM.height, ST.tile_size, ST.max_per_tile)
    ref = render_prebinned(CAM, means, scales, quats, opac, colors, bins,
                           settings=st_x)
    got = render_prebinned(CAM, means, scales, quats, opac, colors, bins,
                           settings=st_p)
    np.testing.assert_allclose(np.asarray(got["color"]),
                               np.asarray(ref["color"]), atol=3e-4)
    np.testing.assert_allclose(np.asarray(got["depth"]),
                               np.asarray(ref["depth"]), atol=1e-2)

    def loss(op):
        out = render_prebinned(CAM, means, scales, quats, op, colors, bins,
                               settings=st_p)
        return jnp.sum(out["color"] ** 2)

    g = jax.grad(loss)(opac)
    assert np.isfinite(np.asarray(g)).all()

    def loss_x(op):
        out = render_prebinned(CAM, means, scales, quats, op, colors, bins,
                               settings=st_x)
        return jnp.sum(out["color"] ** 2)

    gx = jax.grad(loss_x)(opac)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gx),
                               atol=5e-3, rtol=1e-3)


def test_pallas_blend_nvalid_bound_empty_tiles():
    """Scene concentrated in one corner: most tiles have ZERO valid
    slots, so the per-tile nvalid bound must skip them without changing
    any output (empty tiles never saturate, so only the bound stops
    their walk)."""
    rng = np.random.default_rng(5)
    n = 80
    means = np.stack([rng.uniform(0.8, 1.2, n), rng.uniform(0.8, 1.2, n),
                      rng.uniform(1.5, 3.0, n)], -1).astype(np.float32)
    scales = rng.uniform(0.02, 0.06, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.3, 0.9, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    args = tuple(jnp.asarray(x) for x in (means, scales, quats, opac, colors))
    ref = render(CAM, *args, settings=ST)
    got = render_pallas(CAM, *args, settings=ST, interpret=True)
    np.testing.assert_allclose(np.asarray(got["color"]),
                               np.asarray(ref["color"]), atol=3e-4)
    np.testing.assert_allclose(np.asarray(got["depth"]),
                               np.asarray(ref["depth"]), atol=1e-2)
    np.testing.assert_allclose(np.asarray(got["final_t"]),
                               np.asarray(ref["final_t"]), atol=3e-4)
