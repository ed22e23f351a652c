"""SO(3)/SE(3) numerics vs scipy (test-only cross-check)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as R

from thor_slam_tpu.ops import lie

jax.config.update("jax_enable_x64", False)


def rand_rotvec(rng, scale=np.pi * 0.9):
    v = rng.normal(size=3)
    return v / np.linalg.norm(v) * rng.uniform(0, scale)


class TestSO3:
    def test_exp_matches_scipy(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            phi = rand_rotvec(rng)
            ours = np.asarray(lie.so3_exp(jnp.asarray(phi, jnp.float32)))
            np.testing.assert_allclose(ours, R.from_rotvec(phi).as_matrix(), atol=1e-5)

    def test_exp_small_angle(self):
        phi = jnp.asarray([1e-9, -1e-9, 1e-9], jnp.float32)
        np.testing.assert_allclose(np.asarray(lie.so3_exp(phi)), np.eye(3), atol=1e-6)

    def test_log_roundtrip(self):
        rng = np.random.default_rng(1)
        for _ in range(20):
            phi = rand_rotvec(rng)
            r = lie.so3_exp(jnp.asarray(phi, jnp.float32))
            phi2 = np.asarray(lie.so3_log(r))
            np.testing.assert_allclose(phi2, phi, atol=2e-4)

    def test_log_near_pi(self):
        phi = np.array([np.pi - 1e-4, 0.0, 0.0])
        r = R.from_rotvec(phi).as_matrix()
        phi2 = np.asarray(lie.so3_log(jnp.asarray(r, jnp.float32)))
        np.testing.assert_allclose(phi2, phi, atol=1e-3)

    def test_log_identity(self):
        np.testing.assert_allclose(np.asarray(lie.so3_log(jnp.eye(3))), 0.0, atol=1e-6)

    def test_hat_vee(self):
        v = jnp.asarray([1.0, 2.0, 3.0])
        np.testing.assert_allclose(np.asarray(lie.vee(lie.hat(v))), [1, 2, 3])
        m = np.asarray(lie.hat(v))
        np.testing.assert_allclose(m, -m.T)

    def test_left_jacobian_first_order(self):
        """exp(phi + dphi) ~ exp(J_l(phi) dphi) exp(phi)."""
        rng = np.random.default_rng(2)
        phi = rand_rotvec(rng, scale=1.0)
        dphi = rng.normal(size=3) * 1e-4
        lhs = np.asarray(lie.so3_exp(jnp.asarray(phi + dphi, jnp.float32)))
        jl = np.asarray(lie.so3_left_jacobian(jnp.asarray(phi, jnp.float32)))
        rhs = np.asarray(
            lie.so3_exp(jnp.asarray(jl @ dphi, jnp.float32))
        ) @ np.asarray(lie.so3_exp(jnp.asarray(phi, jnp.float32)))
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)


class TestSE3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(3)
        for _ in range(20):
            xi = np.concatenate([rng.normal(size=3), rand_rotvec(rng, 2.5)])
            m = lie.se3_exp(jnp.asarray(xi, jnp.float32))
            xi2 = np.asarray(lie.se3_log(m))
            np.testing.assert_allclose(xi2, xi, atol=5e-4)

    def test_exp_zero(self):
        np.testing.assert_allclose(np.asarray(lie.se3_exp(jnp.zeros(6))), np.eye(4), atol=1e-7)

    def test_inverse(self):
        rng = np.random.default_rng(4)
        xi = np.concatenate([rng.normal(size=3), rand_rotvec(rng)])
        m = lie.se3_exp(jnp.asarray(xi, jnp.float32))
        np.testing.assert_allclose(
            np.asarray(lie.se3_inverse(m) @ m), np.eye(4), atol=1e-5
        )

    def test_transform_points(self):
        m = lie.se3_exp(jnp.asarray([1.0, 2, 3, 0, 0, 0], jnp.float32))
        pts = jnp.asarray([[0.0, 0, 0], [1, 1, 1]])
        out = np.asarray(lie.transform_points(m, pts))
        np.testing.assert_allclose(out, [[1, 2, 3], [2, 3, 4]], atol=1e-6)

    def test_vmap_batching(self):
        rng = np.random.default_rng(5)
        xis = jnp.asarray(rng.normal(size=(8, 6)) * 0.3, jnp.float32)
        ms = jax.vmap(lie.se3_exp)(xis)
        assert ms.shape == (8, 4, 4)
        back = jax.vmap(lie.se3_log)(ms)
        np.testing.assert_allclose(np.asarray(back), np.asarray(xis), atol=5e-4)


class TestQuat:
    def test_matrix_roundtrip(self):
        rng = np.random.default_rng(6)
        for _ in range(20):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            r = lie.quat_to_matrix(jnp.asarray(q, jnp.float32))
            np.testing.assert_allclose(np.asarray(r), R.from_quat(q).as_matrix(), atol=1e-5)
            q2 = np.asarray(lie.matrix_to_quat(r))
            assert min(np.linalg.norm(q2 - q), np.linalg.norm(q2 + q)) < 1e-4

    def test_matrix_to_quat_180s(self):
        """All four dominance branches of the branch-free conversion."""
        for axis in [[1, 0, 0], [0, 1, 0], [0, 0, 1], [0.577, 0.577, 0.577]]:
            r = R.from_rotvec(np.array(axis) / np.linalg.norm(axis) * np.pi).as_matrix()
            q = np.asarray(lie.matrix_to_quat(jnp.asarray(r, jnp.float32)))
            r2 = R.from_quat(q).as_matrix()
            np.testing.assert_allclose(r2, r, atol=1e-4)

    def test_multiply_matches_scipy(self):
        rng = np.random.default_rng(7)
        q1, q2 = rng.normal(size=4), rng.normal(size=4)
        q1, q2 = q1 / np.linalg.norm(q1), q2 / np.linalg.norm(q2)
        ours = np.asarray(lie.quat_multiply(jnp.asarray(q1, jnp.float32), jnp.asarray(q2, jnp.float32)))
        expected = (R.from_quat(q1) * R.from_quat(q2)).as_quat()
        assert min(np.linalg.norm(ours - expected), np.linalg.norm(ours + expected)) < 1e-5
