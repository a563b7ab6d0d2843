import jax.numpy as jnp
import numpy as np

from fisher_nerf_customized_tpu.utils import geometry as geo


def test_quat_rotmat_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(32, 4)).astype(np.float32)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    R = geo.quat_to_rotmat(jnp.asarray(q))
    q2 = geo.rotmat_to_quat(R)
    # q and -q are the same rotation
    dot = np.abs(np.sum(np.asarray(q2) * q, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_rotation_orthonormal():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(8, 4)).astype(np.float32)
    R = np.asarray(geo.quat_to_rotmat(jnp.asarray(q)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_invert_se3():
    rng = np.random.default_rng(2)
    q = rng.normal(size=(4,)).astype(np.float32)
    M = np.asarray(geo.pose_matrix(jnp.asarray(q), jnp.asarray(rng.normal(size=3).astype(np.float32))))
    Minv = np.asarray(geo.invert_se3(jnp.asarray(M)))
    np.testing.assert_allclose(M @ Minv, np.eye(4), atol=1e-5)


def test_quat_mult_matches_matrix_product():
    rng = np.random.default_rng(3)
    q1 = rng.normal(size=(5, 4)).astype(np.float32)
    q2 = rng.normal(size=(5, 4)).astype(np.float32)
    q1 /= np.linalg.norm(q1, axis=-1, keepdims=True)
    q2 /= np.linalg.norm(q2, axis=-1, keepdims=True)
    q12 = geo.quat_mult(jnp.asarray(q1), jnp.asarray(q2))
    R12 = np.asarray(geo.quat_to_rotmat(q12))
    R1 = np.asarray(geo.quat_to_rotmat(jnp.asarray(q1)))
    R2 = np.asarray(geo.quat_to_rotmat(jnp.asarray(q2)))
    np.testing.assert_allclose(R12, np.einsum("nij,njk->nik", R1, R2), atol=1e-5)


def test_compute_next_campos_forward_moves_along_z():
    H = np.eye(4)
    out = geo.compute_next_campos(H, 1, forward_step_size=0.5)
    np.testing.assert_allclose(out[:3, 3], [0, 0, 0.5], atol=1e-8)
    # turning left then right returns to the original heading
    H2 = geo.compute_next_campos(geo.compute_next_campos(H, 2), 3)
    np.testing.assert_allclose(H2, H, atol=1e-12)


def test_compute_next_campos_jax_matches_numpy():
    rng = np.random.default_rng(4)
    q = rng.normal(size=(4,)).astype(np.float32)
    H = np.asarray(geo.pose_matrix(jnp.asarray(q), jnp.asarray(rng.normal(size=3).astype(np.float32))))
    for action in (0, 1, 2, 3):
        ref = geo.compute_next_campos(H, action, 0.065, 10.0)
        got = np.asarray(geo.compute_next_campos_jax(jnp.asarray(H), action, 0.065, 10.0))
        np.testing.assert_allclose(got, ref, atol=1e-5)
