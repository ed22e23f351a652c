"""IMU readout + dead-reckoning check (reference examples/test_imu.py role).

Streams IMU batches from the synthetic rig, integrates them, and compares
against the analytic trajectory — the hardware-free version of the
reference's live-plot IMU demo.

Usage: python -m examples.test_imu [--seconds 2.0]
"""

from __future__ import annotations

import argparse

import numpy as np


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--seconds", type=float, default=2.0)
    args = parser.parse_args()

    from thor_slam_tpu.camera.sources.synthetic import (
        OrbitTrajectory,
        SyntheticCameraSource,
        SyntheticRigSpec,
        SyntheticWorld,
    )
    from thor_slam_tpu.engine import imu as imu_mod

    spec = SyntheticRigSpec(num_sources=1, width=64, height=48, fps=30.0, imu_rate_hz=400.0)
    traj = OrbitTrajectory()
    src = SyntheticCameraSource(
        "imu-cam", SyntheticWorld(), traj, np.eye(4), spec, emit_imu=True, render=False
    )
    src.start()

    frames = int(args.seconds * spec.fps)
    all_ts, all_gyro, all_accel = [], [], []
    for _ in range(frames):
        src.get_latest_frames()
        data, _ = src.get_timestamped_sensor_data()
        if data is None:
            continue
        all_ts.extend(data["timestamps"])
        all_gyro.extend(data["gyroscope"])
        all_accel.extend(data["accelerometer"])

    rate = len(all_ts) / args.seconds
    g = np.linalg.norm(np.mean(all_accel, axis=0))
    print(f"{len(all_ts)} IMU samples in {args.seconds:.1f}s  (~{rate:.0f} Hz)")
    print(f"mean |accel| = {g:.2f} m/s^2 (gravity + centripetal)")

    # Dead-reckon through the preintegrator and compare with ground truth.
    g_, a_, d_, m_ = imu_mod.pack_imu_window(
        all_ts, all_gyro, all_accel, t_start=0.0, t_end=args.seconds, capacity=len(all_ts)
    )
    pre = imu_mod.preintegrate_np(g_, a_, d_, m_)
    true_rel = np.linalg.inv(traj.pose(all_ts[0])) @ traj.pose(all_ts[-1])
    rot_err = np.degrees(
        np.arccos(np.clip((np.trace(np.asarray(pre.delta_r).T @ true_rel[:3, :3]) - 1) / 2, -1, 1))
    )
    print(f"gyro-integrated rotation error over {args.seconds:.1f}s: {rot_err:.3f} deg")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
