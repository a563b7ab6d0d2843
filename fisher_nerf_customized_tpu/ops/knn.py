"""K-nearest-neighbor kernels.

The reference uses three different NN backends for the same job
(SURVEY.md §2.1): FAISS (models/SLAM/utils/neighbor_search.py:5
torch_3d_knn), Open3D (gs_helpers.py:176 o3d_knn), and scipy cKDTree
(eval + the known-env novelty mask, test_utils.py:503).  One TPU kernel
covers all of them: a tiled brute-force top-k over query/reference chunks —
XLA maps each (Q_chunk x R_chunk) distance block onto the MXU as a matmul
(|q - r|² = |q|² + |r|² − 2 q·r) and a running top-k merge keeps memory
flat.  Exact (no approximation), O(Q·R) FLOPs, which at point-cloud sizes
here (≤ ~1M) is faster on TPU than tree construction would be.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def knn(queries, refs, k: int = 1, ref_mask=None, chunk: int = 65536):
    """For each query, the k smallest distances to refs.

    queries: (Q, D), refs: (R, D), ref_mask: (R,) bool (inactive refs are
    +inf away).  Returns (dists (Q, k) — EUCLIDEAN, idx (Q, k) int32).
    """
    # center on the ref centroid: |q-r|² is translation-invariant, and the
    # q²+r²−2qr expansion cancels catastrophically when |p|² >> |q-r|²
    # (room-scale coords vs cm-scale NN distances); HIGHEST matmul
    # precision for the same reason — the default TPU f32 dot rounds
    # through bf16 passes, which alone skewed 5 cm coverage by ~5 points.
    # the centroid is a MASKED mean: a non-finite value in a masked-out ref
    # row must not poison the center (masked rows only ever contribute
    # their own +inf columns)
    if ref_mask is None:
        center = jnp.mean(refs, axis=0, keepdims=True)
    else:
        cnt = jnp.maximum(jnp.sum(ref_mask), 1)
        center = (jnp.sum(jnp.where(ref_mask[:, None], refs, 0.0), axis=0,
                          keepdims=True) / cnt)
    queries = queries - center
    refs = jnp.where((ref_mask[:, None] if ref_mask is not None
                      else jnp.ones((refs.shape[0], 1), bool)),
                     refs - center, 0.0)
    q2 = jnp.sum(queries * queries, axis=-1, keepdims=True)      # (Q, 1)
    r = refs.shape[0]
    n_chunks = -(-r // chunk)
    pad = n_chunks * chunk - r
    refs_p = jnp.pad(refs, ((0, pad), (0, 0)))
    mask_p = jnp.ones((r,), bool) if ref_mask is None else ref_mask
    mask_p = jnp.pad(mask_p, (0, pad), constant_values=False)

    def body(carry, i):
        best_d, best_i = carry
        r0 = i * chunk
        rc = jax.lax.dynamic_slice(refs_p, (r0, 0), (chunk, refs.shape[1]))
        mc = jax.lax.dynamic_slice(mask_p, (r0,), (chunk,))
        rc2 = jnp.sum(rc * rc, axis=-1)                          # (C,)
        d2 = q2 + rc2[None, :] - 2.0 * jax.lax.dot(
            queries, rc.T, precision=jax.lax.Precision.HIGHEST)  # (Q, C) MXU
        d2 = jnp.where(mc[None, :], jnp.maximum(d2, 0.0), jnp.inf)
        # merge with running top-k
        cand_d = jnp.concatenate([best_d, d2], axis=1)           # (Q, k+C)
        cand_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(r0 + jnp.arange(chunk, dtype=jnp.int32),
                                      d2.shape)], axis=1)
        neg_d, top_idx = jax.lax.top_k(-cand_d, k)
        return (-neg_d, jnp.take_along_axis(cand_i, top_idx, axis=1)), None

    best_d0 = jnp.full((queries.shape[0], k), jnp.inf)
    best_i0 = jnp.zeros((queries.shape[0], k), jnp.int32)
    (best_d, best_i), _ = jax.lax.scan(body, (best_d0, best_i0),
                                       jnp.arange(n_chunks))
    return jnp.sqrt(best_d), best_i


def knn_self(points, k: int = 4, mask=None, chunk: int = 65536):
    """KNN within one cloud, excluding self-matches (FAISS torch_3d_knn
    semantics: query k+1, drop the zero-distance self column)."""
    d, i = knn(points, points, k=k + 1, ref_mask=mask, chunk=chunk)
    return d[:, 1:], i[:, 1:]


def mean_sq_neighbor_dist(points, k: int = 3, mask=None):
    """Mean squared distance to the k nearest neighbors — the 3DGS scale
    initializer backed by simple-knn in the original pipeline (the
    reference's configs use the 'projective' method instead; this covers
    the knn method for completeness)."""
    d, _ = knn_self(points, k=k, mask=mask)
    return jnp.mean(d * d, axis=-1)


@functools.partial(jax.jit, static_argnames=("min_pixels",))
def novelty_mask_from_pcd_nn(gt_points, depth, inv_k, c2w,
                             dist_thresh: float = 0.05,
                             min_pixels: int = 20):
    """Pixels whose back-projected point is > dist_thresh from the known
    GT cloud — object discovery in known environments (reference
    test_utils.py:503-578 novelty_mask_from_pcd_nn, cKDTree-based).

    depth: (H, W); inv_k: (3, 3) inverse intrinsics; c2w: (4, 4).
    Returns (mask (H, W) bool, n_novel ()) — mask is all-False when fewer
    than min_pixels are novel (the reference's minimum blob size).
    """
    h, w = depth.shape
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    pix = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)
    rays = jnp.einsum("ij,hwj->hwi", inv_k, pix)
    pts_cam = rays * depth[..., None]
    pts_w = jnp.einsum("ij,hwj->hwi", c2w[:3, :3], pts_cam) + c2w[:3, 3]

    d, _ = knn(pts_w.reshape(-1, 3), gt_points, k=1)
    novel = (d[:, 0] > dist_thresh) & (depth.reshape(-1) > 0)
    n_novel = jnp.sum(novel.astype(jnp.int32))
    mask = jnp.where(n_novel >= min_pixels, novel, False).reshape(h, w)
    return mask, n_novel
