"""IMU noise-model consumption: online gyro-bias estimation.

The reference feeds measured OAK-D Pro noise densities into cuVSLAM's
fusion (reference launch/thor_visual_slam.launch.py:82-104). Here the
same declared constants (engine/imu.py) set the gyro-bias and gravity
Kalman gains in the ImuFusion backend; these tests verify the bias
estimator converges on the injected-bias fixture and that the engine
consumes the estimate (VERDICT r3 missing #2).
"""

from __future__ import annotations

import numpy as np
import pytest

import thor_slam_tpu as tst
from thor_slam_tpu.camera.rig import CameraRig
from thor_slam_tpu.camera.sources.synthetic import (
    OrbitTrajectory,
    SyntheticRigSpec,
    SyntheticWorld,
    make_synthetic_rig,
)
from thor_slam_tpu.engine.backends.imu_fusion import ImuFusion
from thor_slam_tpu.engine.tpu_engine import TpuSlamEngine
from thor_slam_tpu.utils.evaluation import ate_rmse

BIAS = np.array([0.004, -0.002, 0.01])  # rad/s, IMU frame


def _drive_fusion(fusion: ImuFusion, bias: np.ndarray, seconds: float = 8.0):
    """Feed ground-truth poses + biased gyro for a yawing trajectory."""
    rng = np.random.default_rng(3)
    omega = np.array([0.0, 0.0, 0.5])  # rad/s, constant yaw
    imu_rate, tick_rate = 200.0, 30.0
    epoch = object()

    def pose(t: float) -> np.ndarray:
        a = omega[2] * t
        m = np.eye(4)
        m[0, 0] = m[1, 1] = np.cos(a)
        m[0, 1], m[1, 0] = -np.sin(a), np.sin(a)
        return m

    n_imu = int(seconds * imu_rate)
    ts = np.arange(1, n_imu + 1) / imu_rate
    gyro = np.tile(omega + bias, (n_imu, 1))
    accel = np.tile([0.0, 0.0, 9.81], (n_imu, 1))  # ignored (use_accel off)
    next_imu = 0
    for k in range(1, int(seconds * tick_rate)):
        t = k / tick_rate
        hi = int(np.searchsorted(ts, t, side="right"))
        if hi > next_imu:
            fusion.ingest(
                {
                    "gyroscope": gyro[next_imu:hi],
                    "accelerometer": accel[next_imu:hi],
                    "timestamps": ts[next_imu:hi],
                },
                t,
            )
            next_imu = hi
        p = pose(t)
        # Solve noise at the declared vis_rot_sigma: small rotation jitter.
        jit = rng.normal(0.0, fusion.vis_rot_sigma, 3)
        ang = float(np.linalg.norm(jit))
        if ang > 0:
            from thor_slam_tpu import geometry

            p = p @ geometry.se3_matrix(
                geometry.quat_to_matrix(geometry.axis_angle_to_quat(jit, ang)),
                np.zeros(3),
            )
        fusion.on_finalized(p, t, tracked=True, epoch=epoch)
    return fusion


class TestBiasKalman:
    def test_converges_to_injected_bias(self):
        fusion = _drive_fusion(ImuFusion(use_accel=False), BIAS)
        err = np.linalg.norm(fusion.gyro_bias - BIAS)
        assert err < 0.35 * np.linalg.norm(BIAS), (
            f"bias estimate {fusion.gyro_bias} vs injected {BIAS}"
        )
        # Variance collapsed from the (0.02)^2 prior.
        assert fusion.bias_p < 1e-4

    def test_zero_bias_stays_near_zero(self):
        fusion = _drive_fusion(ImuFusion(use_accel=False), np.zeros(3))
        assert np.linalg.norm(fusion.gyro_bias) < 0.003

    def test_estimation_can_be_disabled(self):
        fusion = _drive_fusion(
            ImuFusion(use_accel=False, estimate_gyro_bias=False), BIAS
        )
        np.testing.assert_array_equal(fusion.gyro_bias, np.zeros(3))

    def test_declared_constants_are_the_defaults(self):
        from thor_slam_tpu.engine import imu

        f = ImuFusion()
        assert f.gyro_nd == imu.GYRO_NOISE_DENSITY
        assert f.gyro_rw == imu.GYRO_RANDOM_WALK
        assert f.accel_nd == imu.ACCEL_NOISE_DENSITY
        assert f.accel_rw == imu.ACCEL_RANDOM_WALK

    def test_window_covariance_grows_with_dt(self):
        f = ImuFusion()
        c1 = f.window_covariance(1.0 / 30.0)
        c2 = f.window_covariance(1.0)
        assert c2[3, 3] > c1[3, 3] > 0.0
        assert c2[0, 0] > c1[0, 0] > 0.0


def _run_engine(gyro_bias: tuple, frames: int = 90, estimate: bool = True):
    spec = SyntheticRigSpec(
        num_sources=2, stereo=True, width=160, height=120, fps=30.0,
        baseline_m=0.12, imu_rate_hz=200.0, imu_gyro_bias=gyro_bias,
    )
    world = SyntheticWorld(half_extents=(4.0, 4.0, 2.0))
    traj = OrbitTrajectory(radius=1.5, angular_rate=0.5)
    sources, rig_ext, _, _ = make_synthetic_rig(spec, world=world, trajectory=traj)
    engine = TpuSlamEngine(
        params=dict(max_keypoints=256, keyframe_min_inliers=40),
        imu_noise=dict(estimate_gyro_bias=estimate),
    )
    est, gt = [], []
    with CameraRig(
        sources, rig_extrinsics=rig_ext, imu_source=sources[0].name
    ) as rig:
        engine.initialize(rig.calibration, tst.SlamConfig(num_cameras=4))
        gt0 = None
        for _ in range(frames):
            sync = rig.get_synchronized_frames()
            pose = engine.process_frames(sync)
            g = traj.pose(sync.timestamp)
            gt0 = g if gt0 is None else gt0
            if pose is not None:
                est.append(pose.position.copy())
                gt.append((np.linalg.inv(gt0) @ g)[:3, 3])
        bias_est = np.array(engine._imu.gyro_bias)
        engine.shutdown()
    return ate_rmse(np.array(est), np.array(gt)), bias_est


@pytest.mark.slow
class TestBiasedSequenceE2E:
    def test_biased_imu_ate_matches_unbiased(self):
        """VERDICT r3 done-criterion: inject 0.01 rad/s gyro bias; ATE with
        bias estimation ~ unbiased ATE, and the estimator finds the bias."""
        ate_unbiased, _ = _run_engine((0.0, 0.0, 0.0))
        ate_biased, bias_est = _run_engine((0.0, 0.0, 0.01))
        assert abs(bias_est[2] - 0.01) < 0.006, f"bias estimate {bias_est}"
        assert ate_biased < max(1.5 * ate_unbiased, ate_unbiased + 0.01), (
            f"biased {ate_biased:.4f} vs unbiased {ate_unbiased:.4f}"
        )


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-v"])
