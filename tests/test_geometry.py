"""Golden-value and round-trip tests for the geometry layer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scnerf_tpu.geometry import (
    align_c2w_trajectories,
    ate_rmse,
    axis_angle_to_rotation,
    embed_rotation_44,
    euler_to_rotation,
    intrinsic_param_to_K,
    K_inverse_3x3,
    ndc_rays,
    ortho2rotation,
    rotation2orth,
    rotation_to_axis_angle,
    rotation_to_euler,
    se3_inverse,
    umeyama,
)

TOL = 1e-5


def random_rotations(key, n):
    axes = jax.random.normal(key, (n, 3))
    axes = axes / jnp.linalg.norm(axes, axis=-1, keepdims=True)
    angles = jax.random.uniform(jax.random.fold_in(key, 1), (n,), minval=0.01, maxval=3.0)
    return axis_angle_to_rotation(axes, angles)


class TestSO3:
    def test_ortho2rotation_is_rotation(self):
        key = jax.random.key(0)
        poses = jax.random.normal(key, (16, 6))
        R = ortho2rotation(poses)
        eye = jnp.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), np.ones(16), atol=1e-5)

    def test_sixd_roundtrip(self):
        R = random_rotations(jax.random.key(1), 8)
        R2 = ortho2rotation(rotation2orth(R))
        np.testing.assert_allclose(R, R2, atol=1e-5)

    def test_axis_angle_roundtrip(self):
        R = random_rotations(jax.random.key(2), 8)
        ax, ang = rotation_to_axis_angle(R)
        R2 = axis_angle_to_rotation(ax, ang)
        np.testing.assert_allclose(R, R2, atol=1e-4)

    def test_axis_angle_golden(self):
        # 90 deg about z: x -> y.
        R = axis_angle_to_rotation(jnp.array([[0.0, 0.0, 1.0]]), jnp.array([jnp.pi / 2]))
        np.testing.assert_allclose(R[0] @ jnp.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)

    def test_euler_roundtrip(self):
        e = jnp.array([[0.3, -0.2, 0.7], [0.0, 0.1, -0.4]])
        R = euler_to_rotation(e)
        R2 = euler_to_rotation(rotation_to_euler(R))
        np.testing.assert_allclose(R, R2, atol=1e-5)

    def test_se3_inverse(self):
        R = random_rotations(jax.random.key(3), 4)
        E = embed_rotation_44(R)
        E = E.at[:, :3, 3].set(jax.random.normal(jax.random.key(4), (4, 3)))
        inv = se3_inverse(E)
        np.testing.assert_allclose(
            jnp.einsum("nij,njk->nik", E, inv),
            np.broadcast_to(np.eye(4), (4, 4, 4)),
            atol=1e-5,
        )

    def test_K_inverse(self):
        K = intrinsic_param_to_K(jnp.array([420.0, 410.0, 200.0, 150.0]))
        Kinv = K_inverse_3x3(K)
        np.testing.assert_allclose(Kinv @ np.array(K[:3, :3]), np.eye(3), atol=1e-6)


class TestNDC:
    def test_matches_manual_formula(self):
        H, W, f = 40, 60, 50.0
        rays_o = jnp.array([[0.1, -0.2, -1.5]])
        rays_d = jnp.array([[0.01, 0.02, -1.0]])
        o, d = ndc_rays(H, W, f, f, 1.0, rays_o, rays_d)
        # After the warp, origin z should be 1 + 2*near/oz for the shifted origin.
        t = -(1.0 + rays_o[0, 2]) / rays_d[0, 2]
        o_shift = rays_o[0] + t * rays_d[0]
        np.testing.assert_allclose(o[0, 2], 1.0 + 2.0 / o_shift[2], atol=1e-6)
        # o + d should map toward the far plane (z -> o2 + d2 = 1 - ... <= 1).
        assert float(o[0, 2] + d[0, 2]) <= 1.0 + 1e-6


class TestUmeyama:
    def test_recovers_similarity(self):
        key = jax.random.key(5)
        src = jax.random.normal(key, (20, 3))
        R = random_rotations(jax.random.key(6), 1)[0]
        s, t = 1.7, jnp.array([0.3, -1.0, 2.0])
        dst = s * src @ R.T + t
        s2, R2, t2 = umeyama(src, dst)
        np.testing.assert_allclose(s2, s, atol=1e-4)
        np.testing.assert_allclose(R2, R, atol=1e-4)
        np.testing.assert_allclose(t2, t, atol=1e-4)

    def test_trajectory_alignment_zeroes_ate(self):
        key = jax.random.key(7)
        R = random_rotations(key, 10)
        poses = embed_rotation_44(R)
        poses = poses.at[:, :3, 3].set(jax.random.normal(jax.random.key(8), (10, 3)))
        Rg = random_rotations(jax.random.key(9), 1)[0]
        transformed = poses.at[:, :3, :3].set(jnp.einsum("ij,njk->nik", Rg, poses[:, :3, :3]))
        transformed = transformed.at[:, :3, 3].set(
            2.0 * jnp.einsum("ij,nj->ni", Rg, poses[:, :3, 3]) + jnp.array([1.0, 2.0, 3.0])
        )
        assert float(ate_rmse(poses, transformed)) < 1e-4
        aligned, _ = align_c2w_trajectories(poses, transformed)
        np.testing.assert_allclose(aligned[:, :3, 3], transformed[:, :3, 3], atol=1e-4)
