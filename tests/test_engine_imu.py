"""IMU preintegration vs the analytic synthetic trajectory."""

import jax.numpy as jnp
import numpy as np

from thor_slam_tpu.camera.sources.synthetic import GRAVITY_W, OrbitTrajectory
from thor_slam_tpu.engine import imu


def window_from_trajectory(traj, t0, t1, rate=400.0, capacity=64):
    ts = np.arange(np.floor(t0 * rate) + 1, np.floor(t1 * rate) + 1) / rate
    gyros, accels = [], []
    for t in ts:
        g, a = traj.imu_sample(float(t) - 0.5 / rate)  # midpoint of each interval
        gyros.append(g)
        accels.append(a)
    return imu.pack_imu_window(ts, gyros, accels, t0, t1, capacity)


class TestPreintegrate:
    def test_zero_samples_identity(self):
        pre = imu.preintegrate(jnp.zeros((8, 3)), jnp.zeros((8, 3)), jnp.zeros(8), jnp.zeros(8))
        np.testing.assert_allclose(np.asarray(pre.delta_r), np.eye(3), atol=1e-7)
        np.testing.assert_allclose(np.asarray(pre.delta_p), 0.0, atol=1e-7)
        assert float(pre.dt) == 0.0 and int(pre.count) == 0

    def test_pure_rotation(self):
        n, dt = 40, 0.0025
        gyro = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))  # 1 rad/s yaw
        pre = imu.preintegrate(gyro, jnp.zeros((n, 3)), jnp.full(n, dt), jnp.ones(n))
        angle = n * dt
        expected = np.array(
            [[np.cos(angle), -np.sin(angle), 0], [np.sin(angle), np.cos(angle), 0], [0, 0, 1]]
        )
        np.testing.assert_allclose(np.asarray(pre.delta_r), expected, atol=1e-5)

    def test_padding_mask_ignored(self):
        n = 16
        gyro = jnp.asarray(np.random.default_rng(0).normal(0, 1, (n, 3)), jnp.float32)
        accel = jnp.asarray(np.random.default_rng(1).normal(0, 1, (n, 3)), jnp.float32)
        dts = jnp.full(n, 0.005)
        mask_half = jnp.asarray([1.0] * 8 + [0.0] * 8)
        pre_half = imu.preintegrate(gyro, accel, dts, mask_half)
        pre_ref = imu.preintegrate(gyro[:8], accel[:8], dts[:8], jnp.ones(8))
        np.testing.assert_allclose(np.asarray(pre_half.delta_r), np.asarray(pre_ref.delta_r), atol=1e-6)
        np.testing.assert_allclose(np.asarray(pre_half.delta_p), np.asarray(pre_ref.delta_p), atol=1e-6)

    def test_bias_subtraction(self):
        n = 20
        bias = jnp.asarray([0.01, -0.02, 0.005])
        gyro = jnp.tile(bias[None], (n, 1))
        pre = imu.preintegrate(gyro, jnp.zeros((n, 3)), jnp.full(n, 0.005), jnp.ones(n), gyro_bias=bias)
        np.testing.assert_allclose(np.asarray(pre.delta_r), np.eye(3), atol=1e-6)


class TestGyroDeltaR:
    """The vectorized rotation-only host path matches preintegrate_np."""

    def test_matches_preintegrate_np(self):
        rng = np.random.default_rng(7)
        n = 90
        gyro = rng.normal(0, 2.0, (n, 3))
        dts = np.full(n, 1.0 / 400.0)
        mask = np.asarray([1.0] * 70 + [0.0] * 20)
        ref = imu.preintegrate_np(gyro, rng.normal(0, 1, (n, 3)), dts, mask)
        fast = imu.gyro_delta_r_np(gyro, dts, mask)
        np.testing.assert_allclose(fast, np.asarray(ref.delta_r), atol=1e-12)

    def test_bias_and_empty(self):
        bias = np.asarray([0.01, -0.02, 0.005])
        gyro = np.tile(bias[None], (12, 1))
        dts = np.full(12, 0.0025)
        out = imu.gyro_delta_r_np(gyro, dts, np.ones(12), gyro_bias=bias)
        np.testing.assert_allclose(out, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(
            imu.gyro_delta_r_np(gyro, dts, np.zeros(12)), np.eye(3), atol=0
        )


class TestPredictPose:
    def test_free_fall(self):
        """No samples, but gravity propagation over dt... dt=0 here -> identity."""
        pre = imu.Preintegrated(
            delta_r=jnp.eye(3), delta_v=jnp.zeros(3), delta_p=jnp.zeros(3),
            dt=jnp.asarray(0.5), count=jnp.asarray(1),
        )
        pose0 = jnp.eye(4)
        pose1, v1 = imu.predict_pose(pose0, jnp.zeros(3), pre)
        np.testing.assert_allclose(np.asarray(pose1)[:3, 3], [0, 0, -0.5 * 9.81 * 0.25], atol=1e-5)
        np.testing.assert_allclose(np.asarray(v1), [0, 0, -9.81 * 0.5], atol=1e-5)

    def test_tracks_synthetic_trajectory(self):
        """Preintegrated prediction over 1/30 s windows tracks the analytic pose."""
        traj = OrbitTrajectory()
        fps, rate = 30.0, 400.0
        pose = jnp.asarray(traj.pose(0.0), jnp.float32)
        vel = jnp.asarray(traj.velocity(0.0), jnp.float32)
        max_pos_err = 0.0
        for k in range(15):  # half a second
            t0, t1 = k / fps, (k + 1) / fps
            g, a, d, m = window_from_trajectory(traj, t0, t1, rate)
            pre = imu.preintegrate(jnp.asarray(g), jnp.asarray(a), jnp.asarray(d), jnp.asarray(m))
            pose, vel = imu.predict_pose(pose, vel, pre)
            true = traj.pose(t1)
            max_pos_err = max(max_pos_err, np.linalg.norm(np.asarray(pose)[:3, 3] - true[:3, 3]))
        assert max_pos_err < 0.01  # < 1 cm over 0.5 s of dead reckoning
        rel = np.linalg.inv(traj.pose(0.5)) @ np.asarray(pose, np.float64)
        rot_err = np.arccos(np.clip((np.trace(rel[:3, :3]) - 1) / 2, -1, 1))
        assert rot_err < 0.01

    def test_gravity_consistency(self):
        """GRAVITY_W constants agree between synthetic source and engine."""
        np.testing.assert_allclose(np.asarray(imu.GRAVITY_W), GRAVITY_W)


class TestPackWindow:
    def test_selects_interval(self):
        ts = np.arange(10) * 0.01
        g = np.tile([[1.0, 0, 0]], (10, 1))
        a = np.tile([[0.0, 1, 0]], (10, 1))
        gy, ac, d, m = imu.pack_imu_window(ts, g, a, t_start=0.025, t_end=0.065, capacity=8)
        assert m.sum() == 4  # samples at 0.03, 0.04, 0.05, 0.06
        np.testing.assert_allclose(d[:4].sum(), 0.065 - 0.025 - 0.005, atol=1e-9)

    def test_capacity_truncation_keeps_latest(self):
        ts = np.arange(100) * 0.001
        g = np.zeros((100, 3))
        a = np.zeros((100, 3))
        gy, ac, d, m = imu.pack_imu_window(ts, g, a, 0.0, 0.2, capacity=16)
        assert m.sum() == 16


class TestIngestRobustness:
    """_ingest_imu must reject malformed payloads instead of buffering garbage.

    Regression: np.asarray(None) is an object array (never None), so the
    old guards could not trigger — a sensor_data dict lacking accelerometer/
    gyroscope buffered garbage that crashed pack_imu_window ticks later, and
    a batched payload without 'timestamps' raised IndexError.
    """

    def _engine(self):
        from thor_slam_tpu.engine.tpu_engine import TpuSlamEngine

        return TpuSlamEngine()

    def test_missing_accelerometer_ignored(self):
        eng = self._engine()
        eng._ingest_imu({"gyroscope": np.zeros(3)}, 1.0)
        assert eng._imu_ts == []

    def test_missing_gyroscope_ignored(self):
        eng = self._engine()
        eng._ingest_imu({"accelerometer": np.zeros(3)}, 1.0)
        assert eng._imu_ts == []

    def test_batched_without_timestamps_uses_sensor_ts(self):
        eng = self._engine()
        eng._ingest_imu(
            {"accelerometer": np.zeros((3, 3)), "gyroscope": np.zeros((3, 3))}, 2.5
        )
        # All samples collapse onto sensor_ts; strictly-increasing filter
        # keeps exactly one — but no IndexError.
        assert eng._imu_ts == [2.5]

    def test_batched_with_short_timestamps_rejected(self):
        eng = self._engine()
        eng._ingest_imu(
            {
                "accelerometer": np.zeros((4, 3)),
                "gyroscope": np.zeros((4, 3)),
                "timestamps": np.asarray([0.1, 0.2]),
            },
            1.0,
        )
        assert eng._imu_ts == []

    def test_wellformed_batch_survives(self):
        eng = self._engine()
        eng._ingest_imu(
            {
                "accelerometer": np.ones((3, 3)),
                "gyroscope": np.ones((3, 3)),
                "timestamps": np.asarray([0.1, 0.2, 0.3]),
            },
            0.3,
        )
        assert eng._imu_ts == [0.1, 0.2, 0.3]


class TestPreintegrateFastNp:
    """The vectorized full host path matches preintegrate_np exactly."""

    def test_matches_loop_reference(self):
        rng = np.random.default_rng(11)
        n = 48
        gyro = rng.normal(0, 1.5, (n, 3))
        accel = rng.normal(0, 4.0, (n, 3))
        dts = rng.uniform(0.001, 0.004, n)
        mask = (rng.uniform(size=n) > 0.25).astype(float)
        bg = np.array([0.01, -0.02, 0.005])
        ba = np.array([0.1, 0.0, -0.05])
        ref = imu.preintegrate_np(gyro, accel, dts, mask, bg, ba)
        fast = imu.preintegrate_fast_np(gyro, accel, dts, mask, bg, ba)
        np.testing.assert_allclose(fast.delta_r, ref.delta_r, atol=1e-12)
        np.testing.assert_allclose(fast.delta_v, ref.delta_v, atol=1e-12)
        np.testing.assert_allclose(fast.delta_p, ref.delta_p, atol=1e-12)
        assert abs(fast.dt - ref.dt) < 1e-12
        assert fast.count == ref.count

    def test_empty_mask_identity(self):
        fast = imu.preintegrate_fast_np(
            np.ones((8, 3)), np.ones((8, 3)), np.full(8, 0.01), np.zeros(8)
        )
        np.testing.assert_allclose(fast.delta_r, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(fast.delta_v, 0.0, atol=1e-12)
        np.testing.assert_allclose(fast.delta_p, 0.0, atol=1e-12)
        assert fast.dt == 0.0 and fast.count == 0


class TestForsterPrediction:
    """Accel-aided translation prediction vs constant velocity, analytic.

    The engine's full-IMU prediction form (``p + v dt + 1/2 g dt^2 +
    R delta_p``) must beat constant-velocity extrapolation wherever real
    acceleration exists — here the centripetal acceleration of a fast
    orbit (a = r w^2 = 2.9 m/s^2).
    """

    def test_beats_constant_velocity_on_orbit(self):
        traj = OrbitTrajectory(radius=2.0, angular_rate=1.2)
        fps = 30.0
        worst_cv = worst_full = 0.0
        for k in range(10):
            t0, t1 = 1.0 + k / fps, 1.0 + (k + 1) / fps
            g, a, d, m = window_from_trajectory(traj, t0, t1)
            pre = imu.preintegrate_fast_np(g, a, d, m)
            pose0, pose1 = traj.pose(t0), traj.pose(t1)
            v0 = traj.velocity(t0)
            dt = t1 - t0
            p_cv = pose0[:3, 3] + v0 * dt
            p_full = (
                pose0[:3, 3]
                + v0 * dt
                + 0.5 * GRAVITY_W * pre.dt**2
                + pose0[:3, :3] @ pre.delta_p
            )
            worst_cv = max(worst_cv, float(np.linalg.norm(p_cv - pose1[:3, 3])))
            worst_full = max(worst_full, float(np.linalg.norm(p_full - pose1[:3, 3])))
        assert worst_cv > 1e-4  # the regime genuinely accelerates
        assert worst_full < 0.25 * worst_cv


class TestEngineGravityEstimate:
    """The engine estimates odom-frame gravity online and engages the
    accel term of the pose prediction (use_accel default ON)."""

    def test_gravity_converges_and_accel_engages(self):
        from thor_slam_tpu.camera.rig import CameraRig
        from thor_slam_tpu.camera.sources.synthetic import (
            OrbitTrajectory as Orbit,
            SyntheticRigSpec,
            SyntheticWorld,
            make_synthetic_rig,
        )
        from thor_slam_tpu.engine.tpu_engine import TpuSlamEngine
        from thor_slam_tpu.slam.interface import SlamConfig

        spec = SyntheticRigSpec(
            num_sources=1, stereo=True, width=128, height=96, fps=30.0, baseline_m=0.12
        )
        world = SyntheticWorld(half_extents=(4.0, 4.0, 2.0))
        traj = Orbit(radius=1.5, angular_rate=0.8)
        sources, rig_ext, _, _ = make_synthetic_rig(spec, world=world, trajectory=traj)
        engine = TpuSlamEngine(
            params=dict(max_keypoints=128, keyframe_min_inliers=40),
            enable_ba=False,
            gravity_min_ticks=20,
        )
        gt0 = None
        with CameraRig(
            sources, rig_extrinsics=rig_ext, imu_source=sources[0].name
        ) as rig:
            engine.initialize(rig.calibration, SlamConfig(num_cameras=2))
            for _ in range(80):
                sync = rig.get_synchronized_frames()
                engine.process_frames(sync)
                if gt0 is None:
                    gt0 = traj.pose(sync.timestamp)
        g_est = engine._gravity_w
        assert g_est is not None and engine._gravity_n >= 20
        g_true = np.linalg.inv(gt0)[:3, :3] @ GRAVITY_W
        cos = float(
            g_est @ g_true / (np.linalg.norm(g_est) * np.linalg.norm(g_true))
        )
        angle_deg = float(np.degrees(np.arccos(np.clip(cos, -1.0, 1.0))))
        assert angle_deg < 15.0, f"gravity direction off by {angle_deg:.1f} deg"
        assert 8.0 < float(np.linalg.norm(g_est)) < 12.0
        assert engine.last_diagnostics.get("accel_pred") is True
        assert np.isfinite(engine.last_diagnostics.get("imu_pred_err_m", np.nan))
