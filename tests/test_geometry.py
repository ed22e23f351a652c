"""Golden-value tests for host geometry: quaternions, Euler, frame conventions.

Cross-validated against scipy.spatial.transform (test-only dependency) —
the reference uses scipy for all its rotation math, so agreement here locks
behavioral parity (reference: thor_slam/camera/utils.py:116-119,
thor_slam/slam/interface.py:63,83).
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from thor_slam_tpu import geometry as geo


def random_quat(rng):
    q = rng.normal(size=4)
    return q / np.linalg.norm(q)


class TestQuaternions:
    def test_identity(self):
        np.testing.assert_allclose(geo.quat_to_matrix(geo.quat_identity()), np.eye(3), atol=1e-12)

    def test_matrix_roundtrip_matches_scipy(self):
        rng = np.random.default_rng(0)
        for _ in range(50):
            q = random_quat(rng)
            np.testing.assert_allclose(
                geo.quat_to_matrix(q), R.from_quat(q).as_matrix(), atol=1e-10
            )
            q2 = geo.matrix_to_quat(geo.quat_to_matrix(q))
            # Same rotation up to sign.
            assert min(np.linalg.norm(q2 - q), np.linalg.norm(q2 + q)) < 1e-9

    def test_multiply_matches_scipy(self):
        rng = np.random.default_rng(1)
        for _ in range(20):
            q1, q2 = random_quat(rng), random_quat(rng)
            ours = geo.quat_to_matrix(geo.quat_multiply(q1, q2))
            scipys = (R.from_quat(q1) * R.from_quat(q2)).as_matrix()
            np.testing.assert_allclose(ours, scipys, atol=1e-10)

    def test_conjugate_inverts(self):
        rng = np.random.default_rng(2)
        q = random_quat(rng)
        qq = geo.quat_multiply(q, geo.quat_conjugate(q))
        np.testing.assert_allclose(np.abs(qq[3]), 1.0, atol=1e-12)
        np.testing.assert_allclose(qq[:3], 0.0, atol=1e-12)

    def test_rotate_vector(self):
        q = geo.axis_angle_to_quat(np.array([0, 0, 1.0]), np.pi / 2)
        v = geo.quat_rotate(q, np.array([1.0, 0, 0]))
        np.testing.assert_allclose(v, [0, 1, 0], atol=1e-12)

    def test_zero_quat_raises(self):
        with pytest.raises(ValueError):
            geo.quat_normalize(np.zeros(4))


class TestEuler:
    def test_extrinsic_xyz_matches_scipy(self):
        """URDF rpy semantics: extrinsic (fixed-axis) XYZ == scipy lowercase 'xyz'.

        Note: the reference calls scipy with uppercase 'XYZ' (INTRINSIC,
        utils.py:118) while its own comment claims extrinsic — a convention
        bug for multi-axis rpy. We implement the URDF spec (extrinsic), which
        is also what the reference documents as its intent.
        """
        rng = np.random.default_rng(3)
        for _ in range(30):
            r, p, y = rng.uniform(-np.pi, np.pi, 3)
            ours = geo.euler_xyz_extrinsic_to_matrix(r, p, y)
            scipys = R.from_euler("xyz", [r, p, y]).as_matrix()
            np.testing.assert_allclose(ours, scipys, atol=1e-12)

    def test_pure_rotations(self):
        np.testing.assert_allclose(
            geo.euler_xyz_extrinsic_to_matrix(np.pi / 2, 0, 0) @ np.array([0, 1, 0]),
            [0, 0, 1],
            atol=1e-12,
        )
        np.testing.assert_allclose(
            geo.euler_xyz_extrinsic_to_matrix(0, 0, np.pi / 2) @ np.array([1, 0, 0]),
            [0, 1, 0],
            atol=1e-12,
        )


class TestFrameConventions:
    """The load-bearing basis changes (reference isaac_ros.py:42-49, run_slam.py:258-265)."""

    def test_rdf_to_flu_axes(self):
        # RDF forward (+z) must become FLU forward (+x).
        np.testing.assert_allclose(geo.FLU_FROM_RDF[:3, :3] @ [0, 0, 1], [1, 0, 0], atol=1e-12)
        # RDF right (+x) -> FLU -y (right = negative left).
        np.testing.assert_allclose(geo.FLU_FROM_RDF[:3, :3] @ [1, 0, 0], [0, -1, 0], atol=1e-12)
        # RDF down (+y) -> FLU -z.
        np.testing.assert_allclose(geo.FLU_FROM_RDF[:3, :3] @ [0, 1, 0], [0, 0, -1], atol=1e-12)

    def test_rdf_to_flu_exact_reference_matrix(self):
        expected = np.array(
            [[0, 0, 1, 0], [-1, 0, 0, 0], [0, -1, 0, 0], [0, 0, 0, 1]], dtype=float
        )
        np.testing.assert_array_equal(geo.RDF_TO_FLU_MATRIX, expected)

    def test_drb_to_rdf_exact_reference_matrix(self):
        expected = np.array(
            [[0, 1, 0, 0], [1, 0, 0, 0], [0, 0, -1, 0], [0, 0, 0, 1]], dtype=float
        )
        np.testing.assert_array_equal(geo.DRB_TO_RDF_MATRIX, expected)

    def test_round_trips(self):
        np.testing.assert_allclose(geo.RDF_FROM_FLU @ geo.FLU_FROM_RDF, np.eye(4), atol=1e-12)

    def test_conventions_are_rotations(self):
        for m in (geo.FLU_FROM_RDF, geo.RDF_FROM_DRB):
            np.testing.assert_allclose(np.linalg.det(m[:3, :3]), 1.0, atol=1e-12)


class TestSE3:
    def test_inverse(self):
        rng = np.random.default_rng(4)
        m = geo.se3_from_pose(rng.normal(size=3), random_quat(rng))
        np.testing.assert_allclose(geo.se3_inverse(m) @ m, np.eye(4), atol=1e-12)

    def test_pose_roundtrip(self):
        rng = np.random.default_rng(5)
        pos, q = rng.normal(size=3), random_quat(rng)
        m = geo.se3_from_pose(pos, q)
        pos2, q2 = geo.pose_from_se3(m)
        np.testing.assert_allclose(pos2, pos, atol=1e-12)
        assert min(np.linalg.norm(q2 - q), np.linalg.norm(q2 + q)) < 1e-9
