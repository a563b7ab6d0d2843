"""Fisher-information diagonal via an analytic squared backward pass.

The reference computes diag(JᵀJ) by running its CUDA backward with
`grad_power=2`: every *per-pixel* gradient contribution — chained all the
way to mean3D/opacity — is squared before atomic accumulation (reference
cuda_rasterizer/backward.cu:1093-1137 and diff_gaussian_rasterization/
__init__.py backward_power; consumed by models/SLAM/gaussian.py:1503
compute_Hessian with an incoming cotangent of 1e-3 per pixel).

TPU design: instead of replaying autodiff with modified accumulation, the
per-(Gaussian, pixel) color gradient is computed analytically inside the
same chunked tile scan as the forward pass, squared, and summed over
pixels.  Two passes over the depth chunks:

  pass 1 — forward blend for the per-pixel total color (needed for the
           suffix term in d(color)/d(alpha));
  pass 2 — re-walk front-to-back, reconstructing per-pair transmittance and
           inclusive color prefixes, producing per-pair gradients:
             dL/dα    = Σ_ch g_ch (T·c_ch − S_behind_ch / (1−α))
             dL/do    = G · dL/dα
             dL/dμ2d  = o · dL/dα · ∇G
             dL/dμcam = Jᵀ_proj · dL/dμ2d        (projection chain)
           each squared per pixel, then segment-summed into the (N, 4)
           Hessian diagonal [mean_cam x, y, z, opacity].

vmap over candidate poses turns the reference's per-pose Python loop
(gaussian.py:1362) into one batched XLA launch.

Parity notes: with full_chain=True (this function's signature default —
the exact-parity mode its tests exercise; note the ENGINE's runtime
default is the reduced chain, `tpu.fisher_full_chain=False` in
config/defaults.py, gated by a Spearman ≥0.99 + identical-argmax ranking
test against this exact mode) the cov2D-through-mean chain
(computeCov2DCUDA's dL_dmean term, backward.cu:144-270) is included: the
per-Gaussian d(conic)/d(mean_cam) Jacobian is precomputed at preprocess
time (projection.conic_mean_jac, reference clamp quirk preserved) and
contracted per pixel with the TRUE conic cotangent, added to the
projection term BEFORE squaring — exactly powf(cur_dL_dmeans, 2) at
backward.cu:1104-1107.  The scale/rotation rows the CUDA kernel also
squares are not emitted because compute_Hessian never consumes them
(gaussian.py:1554-1560 concatenates means+opacity only).  The incoming
cotangent (1e-3) and black background match compute_Hessian exactly (bg
term vanishes for bg=0).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .binning import tile_bin
from .camera import Camera
from .projection import preprocess
from .rasterize import RenderSettings


class _CoreBins(NamedTuple):
    """Minimal bins view consumed by fisher_core's scan bodies."""
    table: jnp.ndarray
    slot_valid: jnp.ndarray


def _pack_params(prep, bins, opacities, colors, means_cam, conic_jac=None):
    """One big gather into (T, K, 10+C[+9]): random-index gathers inside
    scan bodies are pathologically slow on TPU (see
    rasterize._blend_tiles).  conic_jac (N, 3, 3), when given, appends the
    9 cov2D-chain Jacobian entries (full_chain mode)."""
    idx = bins.table
    parts = [
        prep.mean2d[idx],                 # 0:2
        prep.conic[idx],                  # 2:5
        opacities[idx][..., None],        # 5
        prep.depth[idx][..., None],       # 6  (unused in bwd, kept packed)
        means_cam[idx],                   # 7:10
        colors[idx],                      # 10:10+C
    ]
    if conic_jac is not None:
        parts.append(conic_jac.reshape(-1, 9)[idx])   # 10+C : 19+C
    return jnp.concatenate(parts, axis=-1)


def _unpack(blk, n_channels: int = 3):
    return (blk[..., 0:2], blk[..., 2:5], blk[..., 5],
            blk[..., 10:10 + n_channels], blk[..., 6], blk[..., 7:10])


def _pair_alpha(mu, con, opa, sval, pix_x, pix_y):
    dx = mu[:, :, 0:1] - pix_x[:, None, :]
    dy = mu[:, :, 1:2] - pix_y[:, None, :]
    a, b, c = con[:, :, 0:1], con[:, :, 1:2], con[:, :, 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    inside = power <= 0.0
    g = jnp.exp(jnp.where(inside, power, 0.0))
    alpha = jnp.minimum(0.99, opa[:, :, None] * g)
    live = inside & sval[:, :, None] & (alpha >= 1.0 / 255.0)
    alpha = jnp.where(live, alpha, 0.0)
    g = jnp.where(live, g, 0.0)
    return alpha, g, dx, dy


@functools.partial(jax.jit, static_argnames=("camera", "settings",
                                             "full_chain"))
def fisher_diag(camera: Camera, means_cam, scales, quats, opacities, colors,
                grad_value: float = 1e-3, active=None,
                settings: RenderSettings = RenderSettings(),
                full_chain: bool = True):
    """diag Fisher H for each Gaussian: (N, 4) = [∂μcam (3), ∂opacity (1)].

    Matches reference compute_Hessian's output layout
    (models/SLAM/gaussian.py:1554-1560: concat of transformed-means grad and
    opacity grad under backward_power=2, cotangent 1e-3).
    Also returns radii (N,) for the `visible = radius > 0` mask.

    full_chain=True adds the cov2D-through-mean term
    (backward.cu:144-270 computeCov2DCUDA dL_dmean, summed with the
    projection-chain term BEFORE the per-pixel square — exactly
    backward.cu:1104-1107 powf(cur_dL_dmeans, 2)).  False keeps the
    round-1 reduced chain (projection term only).
    """
    st = settings
    n = means_cam.shape[0]
    prep = preprocess(means_cam, scales, quats, camera, active=active)
    bins = tile_bin(prep.mean2d, prep.radius, prep.depth, prep.valid,
                    camera.width, camera.height, st.tile_size, st.max_per_tile)

    from .projection import build_cov3d, conic_mean_jac
    from .rasterize import tile_pixel_coords
    pix_x, pix_y = tile_pixel_coords(bins.n_tiles_x, bins.n_tiles_y,
                                     st.tile_size)
    cjac = None
    if full_chain:
        cjac = conic_mean_jac(means_cam, build_cov3d(scales, quats), camera,
                              valid=prep.valid)
    packed = _pack_params(prep, bins, opacities, colors, means_cam,
                          conic_jac=cjac)
    h = fisher_core(st, camera, packed, bins.table, bins.slot_valid,
                    pix_x, pix_y, n, grad_value,
                    n_channels=colors.shape[-1], full_chain=full_chain)
    return dict(H=h, radii=prep.radius, visible=prep.radius > 0)


def fisher_core(st: RenderSettings, camera: Camera, packed, table,
                slot_valid, pix_x, pix_y, n_out: int,
                grad_value: float = 1e-3, n_channels: int = 3,
                full_chain: bool = False):
    """Two-pass squared-backward over pre-packed per-tile slot data.

    packed: (T, K, 10+C[+9]) rows front-to-back (layout of _pack_params);
    table: (T, K) indices into the (n_out,)-sized output accumulator;
    pix_x/pix_y: (T, P).  Returns the (n_out, 4) Fisher diagonal.
    Factored from fisher_diag so the Gaussian-axis sharded path
    (parallel/sharding.py) can run it on merged cross-device lists with
    global indices.  full_chain: the trailing 9 packed features are the
    d(conic)/d(mean_cam) Jacobian rows; the per-pixel conic cotangent is
    chained through them and ADDED to the projection term before
    squaring."""
    n = n_out
    n_tiles, p = pix_x.shape
    n_chunks = st.max_per_tile // st.chunk
    k0s = jnp.arange(n_chunks, dtype=jnp.int32) * st.chunk
    nf = packed.shape[-1]
    bins = _CoreBins(table=table, slot_valid=slot_valid)

    # ---- pass 1: record per-chunk starting transmittance ------------------
    @jax.checkpoint
    def fwd_step(t_carry, k0):
        blk = jax.lax.dynamic_slice(packed, (0, k0, 0),
                                    (n_tiles, st.chunk, nf))
        sval = jax.lax.dynamic_slice(bins.slot_valid, (0, k0), (n_tiles, st.chunk))
        mu, con, opa, _col, _dep, _mc = _unpack(blk, n_channels)
        alpha, _g, _dx, _dy = _pair_alpha(mu, con, opa, sval, pix_x, pix_y)
        cum_last = jnp.prod(1.0 - alpha, axis=1)
        return t_carry * cum_last, t_carry

    t0 = jnp.ones((n_tiles, p), jnp.float32)
    _tf, t_starts = jax.lax.scan(fwd_step, t0, k0s)   # (n_chunks, T, P)

    # ---- pass 2: reverse walk, per-pair squared gradients -----------------
    # Processing chunks back-to-front makes the suffix color S_behind a pure
    # additive accumulation (no catastrophic total-minus-prefix cancellation;
    # same walk direction as backward.cu:980 renderCUDA backward).
    fx, fy = camera.fx, camera.fy

    @jax.checkpoint
    def bwd_step(carry, inp):
        s_behind_carry, h_acc = carry
        k0, t_start = inp
        blk = jax.lax.dynamic_slice(packed, (0, k0, 0),
                                    (n_tiles, st.chunk, nf))
        idx = jax.lax.dynamic_slice(bins.table, (0, k0), (n_tiles, st.chunk))
        sval = jax.lax.dynamic_slice(bins.slot_valid, (0, k0), (n_tiles, st.chunk))
        mu, con, opa, col, _dep, mc = _unpack(blk, n_channels)
        alpha, g, dx, dy = _pair_alpha(mu, con, opa, sval, pix_x, pix_y)

        one_minus = 1.0 - alpha
        cum = jnp.cumprod(one_minus, axis=1)
        cum_excl = jnp.concatenate([jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1)
        t_before = t_start[:, None, :] * cum_excl              # (T, CH, P)
        w = alpha * t_before

        # the cotangent is uniform across channels (compute_Hessian feeds
        # 1e-3 * ones), so the suffix color sum can be CHANNEL-SUMMED
        # before accumulation: (T, CH, P) instead of (T, CH, P, C)
        csum = jnp.sum(col, axis=-1)                           # (T, CH)
        contrib = w * csum[:, :, None]                         # (T, CH, P)
        suffix_inc = jnp.flip(jnp.cumsum(jnp.flip(contrib, axis=1), axis=1),
                              axis=1)
        s_behind = (suffix_inc - contrib) + s_behind_carry[:, None, :]

        inv_om = 1.0 / jnp.maximum(one_minus, 1e-2)            # alpha <= 0.99
        # dL/dalpha = grad * Σ_ch (T·c_ch − S_behind_ch/(1−α))
        dl_da = grad_value * (t_before * csum[:, :, None] - s_behind * inv_om)
        dl_da = jnp.where(alpha > 0.0, dl_da, 0.0)             # (T, CH, P)

        dl_do = g * dl_da
        dl_dg = opa[:, :, None] * dl_da
        a, b, c = con[:, :, 0:1], con[:, :, 1:2], con[:, :, 2:3]
        dg_dmx = -g * (a * dx + b * dy)       # ∂G/∂μ2d_x (= -∂G/∂pix_x)
        dg_dmy = -g * (c * dy + b * dx)
        dl_dmx = dl_dg * dg_dmx
        dl_dmy = dl_dg * dg_dmy

        # projection chain to camera-frame mean
        z = jnp.maximum(mc[:, :, 2], 1e-6)[:, :, None]
        gx = dl_dmx * (fx / z)
        gy = dl_dmy * (fy / z)
        gz = -(dl_dmx * fx * mc[:, :, 0:1] + dl_dmy * fy * mc[:, :, 1:2]) / (z * z)

        if full_chain:
            # cov2D chain: TRUE per-pixel conic cotangent (the reference
            # stores half the off-diagonal then doubles it in
            # computeCov2DCUDA — net factor 1) contracted with the
            # packed d(conic)/d(mean) Jacobian, ADDED before squaring
            jc = blk[..., 10 + n_channels:19 + n_channels]   # (T, CH, 9)
            t1 = dl_dg * g                                 # dL/dpower
            ca = -0.5 * t1 * dx * dx
            cb = -t1 * dx * dy
            cc = -0.5 * t1 * dy * dy
            gx = gx + (ca * jc[:, :, 0:1] + cb * jc[:, :, 3:4]
                       + cc * jc[:, :, 6:7])
            gy = gy + (ca * jc[:, :, 1:2] + cb * jc[:, :, 4:5]
                       + cc * jc[:, :, 7:8])
            gz = gz + (ca * jc[:, :, 2:3] + cb * jc[:, :, 5:6]
                       + cc * jc[:, :, 8:9])

        # square per pixel, sum over pixels -> (T, CH, 4)
        h_pair = jnp.stack([
            jnp.sum(gx * gx, axis=-1),
            jnp.sum(gy * gy, axis=-1),
            jnp.sum(gz * gz, axis=-1),
            jnp.sum(dl_do * dl_do, axis=-1),
        ], axis=-1)
        h_pair = jnp.where(sval[:, :, None], h_pair, 0.0)
        h_acc = h_acc.at[idx.reshape(-1)].add(
            h_pair.reshape(-1, 4), mode="drop")

        s_behind_carry = s_behind_carry + jnp.sum(contrib, axis=1)
        return (s_behind_carry, h_acc), None

    h0 = jnp.zeros((n, 4), jnp.float32)
    s0 = jnp.zeros((n_tiles, p), jnp.float32)
    (_sb, h), _ = jax.lax.scan(bwd_step, (s0, h0),
                               (jnp.flip(k0s), jnp.flip(t_starts, axis=0)))
    return h


@functools.partial(jax.jit, static_argnames=("camera", "settings", "n_probes"))
def hutchinson_diag(camera: Camera, means_cam, scales, quats, opacities,
                    colors, key, n_probes: int = 4, active=None,
                    settings: RenderSettings = RenderSettings()):
    """Unbiased diag(JᵀJ) over ALL Gaussian parameter groups via Hutchinson:
    diag ≈ (1/K) Σ_k (Jᵀz_k)⊙(Jᵀz_k), z ~ N(0, I) over pixels·channels.

    Reference: models/SLAM/gaussian_object.py:2049 estimate_diag_JtJ_simple
    (K backward passes with retain_graph).  Here the K probes are a vmap
    over cotangents of ONE jax.vjp (the VJP is linear in the cotangent).
    Note the reference feeds its probes through the grad_power=2 backward
    and squares again; this implementation uses the mathematically intended
    plain-VJP Hutchinson — same diag(JᵀJ) target, unbiased.

    Returns dict(means (N,3), opacity (N,1), rotations (N,4), scales (N,3),
    radii, visible).
    """
    from .rasterize import render

    def f(mc, sc, qt, op):
        out = render(camera, mc, sc, qt, op, colors, active=active,
                     settings=settings)
        return out["color"]

    img, vjp_fn = jax.vjp(f, means_cam, scales, quats, opacities)
    zs = jax.random.normal(key, (n_probes,) + img.shape, img.dtype)
    g_means, g_scales, g_quats, g_opac = jax.vmap(vjp_fn)(zs)
    h = dict(
        means=jnp.mean(g_means ** 2, axis=0),
        scales=jnp.mean(g_scales ** 2, axis=0),
        rotations=jnp.mean(g_quats ** 2, axis=0),
        opacity=jnp.mean(g_opac ** 2, axis=0)[:, None],
    )
    prep = preprocess(means_cam, scales, quats, camera, active=active)
    return dict(**h, radii=prep.radius, visible=prep.radius > 0)


@functools.partial(jax.jit, static_argnames=("camera", "settings", "n_probes"))
def block_jtj(camera: Camera, means_cam, scales, quats, opacities, colors,
              key, n_probes: int = 2, active=None,
              settings: RenderSettings = RenderSettings()):
    """Per-splat d×d JᵀJ blocks (d = 3+1+4+3 = 11: means, opacity,
    rotations, scales) via Hutchinson outer products
    (reference gaussian_object.py:2112 estimate_block_JtJ).

    Returns (H_blocks (N, d, d), visible (N,)); rows for invisible splats
    are zero (the reference gathers only visible rows — mask downstream)."""
    from .rasterize import render

    def f(mc, sc, qt, op):
        out = render(camera, mc, sc, qt, op, colors, active=active,
                     settings=settings)
        return out["color"]

    img, vjp_fn = jax.vjp(f, means_cam, scales, quats, opacities)
    zs = jax.random.normal(key, (n_probes,) + img.shape, img.dtype)
    g_means, g_scales, g_quats, g_opac = jax.vmap(vjp_fn)(zs)
    g = jnp.concatenate([g_means, g_opac[..., None], g_quats, g_scales],
                        axis=-1)                      # (K, N, 11)
    blocks = jnp.mean(g[..., :, None] * g[..., None, :], axis=0)
    prep = preprocess(means_cam, scales, quats, camera, active=active)
    return dict(blocks=blocks, radii=prep.radius, visible=prep.radius > 0)


def topt_score_from_diags(h_train_diag, jtj_diag, lam: float = 1e-6):
    """T-optimality (maximize): -Σ 1/(H_train + JᵀJ + λ)
    (reference gaussian_object.py:1705)."""
    hpi = h_train_diag + jtj_diag + lam
    return -jnp.sum(1.0 / jnp.maximum(hpi, 1e-12))


def dopt_score_from_diags(h_train_diag, jtj_diag, lam: float = 1e-6):
    """D-optimality (maximize): Σ log(H+J+λ) − Σ log(H+λ)
    (reference gaussian_object.py:1712)."""
    hm = jnp.maximum(h_train_diag + lam, 1e-12)
    hpi = jnp.maximum(hm + jtj_diag, 1e-12)
    return jnp.sum(jnp.log(hpi)) - jnp.sum(jnp.log(hm))


def topt_score_blocks(h_blocks, j_blocks, valid, lam: float = 1e-6):
    """Block T-opt: −Σ trace((H+J+λI)⁻¹) over valid splats
    (reference gaussian_object.py:1720 t_opt_blocks).

    Computed through eigvalsh: the blocks are PSD (sums of Hutchinson
    outer products), so trace(inv(A+λI)) = Σ 1/(eig(A)+λ) — identical in
    exact arithmetic but, unlike linalg.inv, finite for the
    rank-deficient blocks a K-probe estimate produces in f32."""
    ev = jnp.linalg.eigvalsh(h_blocks + j_blocks)
    tr = jnp.sum(1.0 / (jnp.maximum(ev, 0.0) + lam), axis=-1)
    return -jnp.sum(jnp.where(valid, tr, 0.0))


def dopt_score_blocks(h_blocks, j_blocks, valid, lam: float = 1e-6):
    """Block D-opt: Σ (logdet(H+J+λI) − logdet(H+λI))
    (reference gaussian_object.py:1726 d_opt_blocks); eigvalsh-based for
    the same f32 robustness as topt_score_blocks."""
    ev1 = jnp.linalg.eigvalsh(h_blocks + j_blocks)
    ev0 = jnp.linalg.eigvalsh(h_blocks)
    l1 = jnp.sum(jnp.log(jnp.maximum(ev1, 0.0) + lam), axis=-1)
    l0 = jnp.sum(jnp.log(jnp.maximum(ev0, 0.0) + lam), axis=-1)
    return jnp.sum(jnp.where(valid, l1 - l0, 0.0))


def resolve_fisher_engine(engine: str = "auto") -> str:
    """'auto' -> 'pallas' on real TPU hardware, 'xla' elsewhere (tests
    run on the CPU backend where Mosaic kernels only interpret)."""
    if engine != "auto":
        return engine
    plat = jax.devices()[0].platform.lower()
    return "pallas" if plat in ("tpu", "axon") else "xla"


def fisher_diag_dispatch(engine: str, camera: Camera, means_cam, scales,
                         quats, opacities, colors, grad_value: float = 1e-3,
                         active=None,
                         settings: RenderSettings = RenderSettings(),
                         full_chain: bool = True):
    """fisher_diag via the selected engine ('xla' two-pass scan core, or
    'pallas' early-terminating per-tile kernel — 1.7-2.4x faster at
    pose_eval shapes on v5e, bit-identical up to the T<1e-4 tail)."""
    if engine == "pallas":
        from .pallas_fisher import fisher_diag_pallas
        return fisher_diag_pallas(camera, means_cam, scales, quats,
                                  opacities, colors, grad_value=grad_value,
                                  active=active, settings=settings,
                                  full_chain=full_chain)
    return fisher_diag(camera, means_cam, scales, quats, opacities, colors,
                       grad_value=grad_value, active=active,
                       settings=settings, full_chain=full_chain)


def fisher_diag_batch(camera: Camera, w2cs, means_world, scales, quats,
                      opacities, colors, grad_value: float = 1e-3,
                      active=None, settings: RenderSettings = RenderSettings(),
                      engine: str = "xla", full_chain: bool = True):
    """vmap fisher_diag over a batch of world->camera poses.

    Replaces the reference's sequential per-candidate loop
    (gaussian.py:1362 `for cam_id, c2w in enumerate(poses)`).
    w2cs: (B, 4, 4).  Returns H: (B, N, 4), visible: (B, N).
    """
    def one(w2c):
        mc = means_world @ w2c[:3, :3].T + w2c[:3, 3]
        return fisher_diag_dispatch(engine, camera, mc, scales, quats,
                                    opacities, colors,
                                    grad_value=grad_value, active=active,
                                    settings=settings,
                                    full_chain=full_chain)
    return jax.vmap(one)(w2cs)
