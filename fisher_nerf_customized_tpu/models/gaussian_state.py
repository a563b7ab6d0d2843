"""Fixed-capacity Gaussian map state + slot-surgery-friendly Adam.

XLA needs static shapes, so the reference's dynamic torch.cat/boolean-index
parameter surgery (reference models/SLAM/utils/slam_external.py:218-263
cat_params_to_optimizer / remove_points) becomes:

  * a capacity-C pytree where slots [0, n_active) are live (compacted
    invariant) and the rest are free;
  * `add_gaussians`: a masked scatter of up to M candidates into the free
    tail (rank = n_active + cumsum(mask)), dropping on overflow (the host
    grows capacity — a bucketed recompile — when `dropped` is reported);
  * `prune_compact`: stable argsort on the keep mask, permuting parameters
    AND optimizer moments together (the reference keeps exp_avg/exp_avg_sq
    aligned the same way);
  * a hand-rolled Adam whose state is a plain pytree so the same scatter /
    permutation applies to the moments (torch.optim.Adam semantics:
    bias-corrected, eps inside the sqrt denominators' sum, per-param-group
    learning rates from the config lrs dict — gaussian.py:1458-1469).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

PARAM_KEYS = ("means3D", "rgb_colors", "unnorm_rotations", "logit_opacities",
              "log_scales")


class GaussianState(NamedTuple):
    means3D: jnp.ndarray            # (C, 3) world frame
    rgb_colors: jnp.ndarray         # (C, 3)
    unnorm_rotations: jnp.ndarray   # (C, 4) wxyz
    logit_opacities: jnp.ndarray    # (C, 1)
    log_scales: jnp.ndarray         # (C, 3) (isotropic configs tile to 3)
    timestep: jnp.ndarray           # (C,)  frame index each slot was born
    n_active: jnp.ndarray           # ()    int32

    @property
    def capacity(self) -> int:
        return self.means3D.shape[0]

    @property
    def active(self) -> jnp.ndarray:
        return jnp.arange(self.capacity) < self.n_active

    def params(self) -> dict:
        return {k: getattr(self, k) for k in PARAM_KEYS}

    def replace_params(self, params: dict) -> "GaussianState":
        return self._replace(**params)


def empty_state(capacity: int) -> GaussianState:
    return GaussianState(
        means3D=jnp.zeros((capacity, 3), jnp.float32),
        rgb_colors=jnp.zeros((capacity, 3), jnp.float32),
        unnorm_rotations=jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32),
                                  (capacity, 1)),
        logit_opacities=jnp.zeros((capacity, 1), jnp.float32),
        log_scales=jnp.full((capacity, 3), -10.0, jnp.float32),
        timestep=jnp.zeros((capacity,), jnp.float32),
        n_active=jnp.asarray(0, jnp.int32),
    )


def grow_state(state: GaussianState, new_capacity: int) -> GaussianState:
    """Host-side capacity growth (triggers one recompile per bucket)."""
    pad = new_capacity - state.capacity
    assert pad >= 0
    fresh = empty_state(pad)

    def cat(a, b):
        return jnp.concatenate([a, b], axis=0)

    return GaussianState(
        means3D=cat(state.means3D, fresh.means3D),
        rgb_colors=cat(state.rgb_colors, fresh.rgb_colors),
        unnorm_rotations=cat(state.unnorm_rotations, fresh.unnorm_rotations),
        logit_opacities=cat(state.logit_opacities, fresh.logit_opacities),
        log_scales=cat(state.log_scales, fresh.log_scales),
        timestep=cat(state.timestep, fresh.timestep),
        n_active=state.n_active,
    )


def add_gaussians(state: GaussianState, new_params: dict, mask,
                  time_idx) -> tuple[GaussianState, jnp.ndarray]:
    """Scatter masked candidate Gaussians into the free tail.

    new_params: dict of (M, d) candidate arrays (keys = PARAM_KEYS);
    mask: (M,) bool — which candidates to actually add.
    Returns (new_state, dropped_count).  Mirrors reference
    gaussian.py:299-318 initialize_new_params + torch.cat.
    """
    cap = state.capacity
    m = mask.shape[0]
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1          # (M,)
    dest = state.n_active + rank
    in_range = mask & (dest < cap)
    dest_safe = jnp.where(in_range, dest, cap)             # OOB -> dropped

    updates = {}
    for k in PARAM_KEYS:
        arr = getattr(state, k)
        updates[k] = arr.at[dest_safe].set(new_params[k], mode="drop")
    ts = state.timestep.at[dest_safe].set(
        jnp.full((m,), time_idx, jnp.float32), mode="drop")

    n_added = jnp.sum(in_range.astype(jnp.int32))
    dropped = jnp.sum(mask.astype(jnp.int32)) - n_added
    new_state = state._replace(timestep=ts, n_active=state.n_active + n_added,
                               **updates)
    return new_state, dropped


def prune_compact(state: GaussianState, keep) -> tuple[GaussianState, jnp.ndarray]:
    """Remove slots where ~keep (among active) and re-compact.

    keep: (C,) bool (entries past n_active are ignored).  Returns the
    compacted state and the permutation used (so optimizer moments can be
    permuted identically).  Reference: slam_external.py:236 remove_points.
    """
    cap = state.capacity
    active = state.active
    keep = keep & active
    # stable sort: kept actives first, then everything else in order
    order = jnp.argsort(jnp.where(keep, 0, 1), stable=True)
    n_new = jnp.sum(keep.astype(jnp.int32))

    updates = {k: getattr(state, k)[order] for k in PARAM_KEYS}
    new_state = state._replace(timestep=state.timestep[order], n_active=n_new,
                               **updates)
    return new_state, order


def gs_densify(state: GaussianState, grad_accum, denom, rng_key,
               grad_thresh: float = 0.0002, split_scale: float = 0.05,
               num_to_split_into: int = 2,
               removal_opacity_threshold: float = 0.005,
               time_idx: float = 0.0):
    """Gaussian-Splatting gradient densification: CLONE small high-gradient
    splats, SPLIT large ones into `n` children with positions resampled from
    the parent's covariance and scales / (0.8 n), then prune low-opacity
    slots (reference slam_external.py:411-463 densify; OFF in every shipped
    config — use_gaussian_splatting_densification=false — but part of the
    API surface).

    grad_accum/denom: accumulated ||∂L/∂means3D|| and update counts from
    the mapping phase.  Executed once per mapping event (the reference runs
    it every densify_every iterations inside the loop).
    """
    import jax
    from ..utils.geometry import quat_to_rotmat

    active = state.active
    grads = jnp.where(denom > 0, grad_accum / jnp.maximum(denom, 1), 0.0)
    max_scale = jnp.max(jnp.exp(state.log_scales), axis=1)

    high_grad = active & (grads >= grad_thresh)
    to_clone = high_grad & (max_scale <= split_scale)
    to_split = high_grad & (max_scale > split_scale)

    params = state.params()
    n = num_to_split_into
    state, _dropped = add_gaussians(state, params, to_clone, time_idx)

    # children: n copies with resampled positions, shrunk scales
    key = rng_key
    R = quat_to_rotmat(params["unnorm_rotations"])
    stds = jnp.exp(params["log_scales"])
    for i in range(n):
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, params["means3D"].shape) * stds
        offset = jnp.einsum("nij,nj->ni", R, noise)
        child = dict(params)
        child["means3D"] = params["means3D"] + offset
        child["log_scales"] = params["log_scales"] - jnp.log(0.8 * n)
        state, _dropped = add_gaussians(state, child, to_split, time_idx)

    # remove split sources + low-opacity slots
    keep = jnp.ones((state.capacity,), bool)
    keep = keep.at[: to_split.shape[0]].set(~to_split)
    opac = jax.nn.sigmoid(state.logit_opacities[:, 0])
    keep = keep & (opac >= removal_opacity_threshold)
    state, order = prune_compact(state, keep)
    return state


# ---------------------------------------------------------------------------
# Adam with per-parameter-group learning rates (torch semantics)
# ---------------------------------------------------------------------------

class AdamState(NamedTuple):
    mu: dict       # first moments, same structure as params
    nu: dict       # second moments
    count: jnp.ndarray  # () int32 step counter


def adam_init(params: dict) -> AdamState:
    zeros = {k: jnp.zeros_like(v) for k, v in params.items()}
    return AdamState(mu=zeros,
                     nu={k: jnp.zeros_like(v) for k, v in params.items()},
                     count=jnp.asarray(0, jnp.int32))


def adam_step(opt: AdamState, params: dict, grads: dict, lrs: dict,
              b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-15) -> tuple[dict, AdamState]:
    """One Adam update.  lrs maps param key -> learning rate (a key with
    lr 0.0 is frozen, like the reference's zero-lr param groups)."""
    count = opt.count + 1
    t = count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t
    new_params, new_mu, new_nu = {}, {}, {}
    for k, p in params.items():
        g = grads[k]
        mu = b1 * opt.mu[k] + (1 - b1) * g
        nu = b2 * opt.nu[k] + (1 - b2) * (g * g)
        update = (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
        new_params[k] = p - lrs[k] * update
        new_mu[k], new_nu[k] = mu, nu
    return new_params, AdamState(mu=new_mu, nu=new_nu, count=count)


def adam_permute(opt: AdamState, order) -> AdamState:
    """Permute moment slots after prune_compact."""
    return AdamState(mu={k: v[order] for k, v in opt.mu.items()},
                     nu={k: v[order] for k, v in opt.nu.items()},
                     count=opt.count)


def adam_reset_slots(opt: AdamState, dest_safe) -> AdamState:
    """Zero moments for freshly added slots (reference
    cat_params_to_optimizer concatenates zeros)."""
    def zero_at(v):
        return v.at[dest_safe].set(jnp.zeros((dest_safe.shape[0],) + v.shape[1:],
                                             v.dtype), mode="drop")
    return AdamState(mu=jax.tree.map(zero_at, opt.mu),
                     nu=jax.tree.map(zero_at, opt.nu),
                     count=opt.count)
