"""Synthetic world / trajectory / source self-consistency tests."""

import numpy as np
import pytest

from thor_slam_tpu import geometry as geo
from thor_slam_tpu.camera.sources.synthetic import (
    BODY_T_OPTICAL,
    GRAVITY_W,
    OrbitTrajectory,
    SyntheticCameraSource,
    SyntheticRigSpec,
    SyntheticWorld,
    make_synthetic_rig,
    procedural_texture,
)
from thor_slam_tpu.camera.types import Intrinsics


def small_intrinsics(w=64, h=48):
    f = 0.8 * w
    k = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])
    return Intrinsics(width=w, height=h, matrix=k, coeffs=np.zeros(5))


class TestWorld:
    def test_render_deterministic(self):
        world = SyntheticWorld(seed=3)
        traj = OrbitTrajectory()
        pose = traj.pose(0.5) @ BODY_T_OPTICAL
        img1 = world.render(small_intrinsics(), pose)
        img2 = world.render(small_intrinsics(), pose)
        np.testing.assert_array_equal(img1, img2)
        assert img1.shape == (48, 64)
        assert img1.dtype == np.float32

    def test_render_has_texture(self):
        world = SyntheticWorld()
        pose = OrbitTrajectory().pose(0.0) @ BODY_T_OPTICAL
        img = world.render(small_intrinsics(), pose)
        assert img.std() > 0.05  # non-degenerate contrast
        assert 0.0 <= img.min() and img.max() <= 1.0

    def test_depth_positive_and_bounded(self):
        world = SyntheticWorld(half_extents=(8.0, 8.0, 3.0))
        pose = OrbitTrajectory(radius=3.0).pose(1.0) @ BODY_T_OPTICAL
        depth = world.render_depth(small_intrinsics(), pose)
        assert np.all(depth > 0.1)
        # Max possible distance inside the box is its diagonal.
        assert np.all(depth < 2 * np.linalg.norm([8, 8, 3]))

    def test_depth_consistent_with_reprojection(self):
        """Back-projecting pixel depth must land on the box surface."""
        world = SyntheticWorld(half_extents=(8.0, 8.0, 3.0))
        intr = small_intrinsics()
        pose = OrbitTrajectory(radius=3.0).pose(0.7) @ BODY_T_OPTICAL
        depth = world.render_depth(intr, pose)
        v, u = 24, 32
        d = depth[v, u]
        ray = np.linalg.inv(intr.matrix) @ np.array([u + 0.5, v + 0.5, 1.0])
        p_cam = ray * d
        p_world = (pose @ np.append(p_cam, 1.0))[:3]
        he = np.array(world.half_extents)
        # On the surface: at least one coordinate at a face (within tolerance).
        assert np.any(np.abs(np.abs(p_world) - he) < 1e-3)

    def test_texture_range(self):
        pts = np.random.default_rng(0).uniform(-8, 8, size=(100, 3))
        tex = procedural_texture(pts)
        assert np.all(tex >= 0) and np.all(tex <= 1.0)


class TestTrajectory:
    def test_pose_is_rigid(self):
        traj = OrbitTrajectory()
        for t in [0.0, 0.3, 2.7]:
            m = traj.pose(t)
            r = m[:3, :3]
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-9)
            np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-9)

    def test_velocity_matches_position_derivative(self):
        traj = OrbitTrajectory()
        v = traj.velocity(1.0)
        dt = 1e-5
        v_num = (traj.pose(1.0 + dt)[:3, 3] - traj.pose(1.0 - dt)[:3, 3]) / (2 * dt)
        np.testing.assert_allclose(v, v_num, atol=1e-4)

    def test_imu_gravity_at_rest_frame(self):
        """Accelerometer must read ~(-gravity rotated into body) plus motion."""
        traj = OrbitTrajectory(radius=3.0, angular_rate=0.25)
        gyro, accel = traj.imu_sample(2.0)
        r_wb = traj.pose(2.0)[:3, :3]
        # Centripetal acceleration magnitude: r * w^2 ~ 0.1875 m/s^2 (small).
        a_w_expected_mag = 3.0 * 0.25**2
        accel_w = r_wb @ accel + GRAVITY_W  # recover world linear acceleration
        assert np.linalg.norm(accel_w) < a_w_expected_mag + 0.5
        # Gyro z-component should be near the orbit rate.
        gyro_w = r_wb @ gyro
        assert abs(gyro_w[2] - 0.25) < 0.05

    def test_imu_integration_reproduces_pose(self):
        """Dead-reckoning the analytic IMU must track the analytic pose."""
        traj = OrbitTrajectory()
        dt = 1.0 / 400.0
        steps = 400  # one second
        m = traj.pose(0.0)
        r, p = m[:3, :3], m[:3, 3]
        v = traj.velocity(0.0)
        for i in range(steps):
            t = i * dt
            gyro, accel = traj.imu_sample(t + 0.5 * dt)
            a_w = r @ accel + GRAVITY_W
            # Integrate rotation with the midpoint gyro.
            angle = np.linalg.norm(gyro) * dt
            if angle > 0:
                q = geo.axis_angle_to_quat(gyro, angle)
                r = r @ geo.quat_to_matrix(q)
            p = p + v * dt + 0.5 * a_w * dt * dt
            v = v + a_w * dt
        m_true = traj.pose(steps * dt)
        assert np.linalg.norm(p - m_true[:3, 3]) < 0.02  # < 2 cm drift over 1 s
        rot_err = np.arccos(np.clip((np.trace(r.T @ m_true[:3, :3]) - 1) / 2, -1, 1))
        assert rot_err < 0.01  # < 0.6 degrees


class TestSyntheticSource:
    def test_deterministic_frames(self):
        spec = SyntheticRigSpec(width=32, height=24)
        world, traj = SyntheticWorld(), OrbitTrajectory()
        s1 = SyntheticCameraSource("a", world, traj, np.eye(4), spec)
        s2 = SyntheticCameraSource("a", world, traj, np.eye(4), spec)
        s1.start()
        s2.start()
        f1, f2 = s1.get_latest_frames(), s2.get_latest_frames()
        np.testing.assert_array_equal(f1[0].image, f2[0].image)
        assert f1[0].timestamp == f2[0].timestamp

    def test_stereo_baseline_in_extrinsics(self):
        spec = SyntheticRigSpec(width=32, height=24, stereo=True, baseline_m=0.1)
        s = SyntheticCameraSource("a", SyntheticWorld(), OrbitTrajectory(), np.eye(4), spec)
        exts = s.get_extrinsics()
        assert len(exts) == 2
        # Extrinsics are FLU-source -> optical: optical +x (right) = body -y.
        np.testing.assert_allclose(exts[0].to_4x4_matrix(), BODY_T_OPTICAL, atol=1e-12)
        np.testing.assert_allclose(exts[1].translation, [0.0, -0.1, 0.0], atol=1e-12)
        # Relative left->right transform is a pure +x optical baseline.
        rel = np.linalg.inv(exts[0].to_4x4_matrix()) @ exts[1].to_4x4_matrix()
        np.testing.assert_allclose(rel[:3, 3], [0.1, 0, 0], atol=1e-12)

    def test_stereo_images_shifted(self):
        """Right image should look like the left shifted by positive disparity."""
        spec = SyntheticRigSpec(width=96, height=64, stereo=True, baseline_m=0.2)
        s = SyntheticCameraSource("a", SyntheticWorld(), OrbitTrajectory(), np.eye(4), spec)
        s.start()
        left, right = (f.image.astype(np.float32) for f in s.get_latest_frames())
        # Cross-correlate middle rows at several candidate disparities; the
        # best alignment must be at disparity > 0.
        row_l = left[32, :]
        best_d, best_err = 0, np.inf
        for d in range(0, 24):
            err = np.mean((row_l[d:] - right[32, : 96 - d]) ** 2) if d else np.mean((row_l - right[32]) ** 2)
            if err < best_err:
                best_d, best_err = d, err
        assert best_d > 0

    def test_not_started_raises(self):
        spec = SyntheticRigSpec(width=32, height=24)
        s = SyntheticCameraSource("a", SyntheticWorld(), OrbitTrajectory(), np.eye(4), spec)
        with pytest.raises(RuntimeError):
            s.get_latest_frames()
        assert s.try_get_latest_frames() is None

    def test_imu_batch_timestamps_monotonic(self):
        spec = SyntheticRigSpec(width=32, height=24, fps=10.0, imu_rate_hz=100.0)
        s = SyntheticCameraSource(
            "a", SyntheticWorld(), OrbitTrajectory(), np.eye(4), spec, emit_imu=True
        )
        s.start()
        s.get_latest_frames()
        s.get_latest_frames()
        data, ts = s.get_timestamped_sensor_data()
        assert data is not None
        assert np.all(np.diff(data["timestamps"]) > 0)
        assert ts == pytest.approx(data["timestamps"][-1])
        # ~100 Hz IMU over 2 frames at 10 fps => ~20 samples.
        assert 15 <= len(data["timestamps"]) <= 25

    def test_make_synthetic_rig(self):
        sources, rig_ext, world, traj = make_synthetic_rig(
            SyntheticRigSpec(num_sources=4, width=32, height=24), render=False
        )
        assert len(sources) == 4
        assert sources[0].has_sensor_data and not sources[1].has_sensor_data
        assert set(rig_ext) == {s.name for s in sources}
