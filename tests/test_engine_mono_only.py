"""ALL-mono SLAM: bootstrap from motion, track up-to-scale.

The cuVSLAM mono-only capability (reference luxonis.py:551-568; mono
sources count 1 in num_cameras, reference run_slam.py:112-114): a rig
with NO stereo source bootstraps its first map from a two-view
essential-matrix init (engine/epipolar.py, tracker.make_mono_init) and
mints steady-state landmarks by motion triangulation between keyframes
(tracker.mint_bank pending promotion). Monocular scale is unobservable —
trajectories are evaluated with scale-aligned ATE.
"""

from __future__ import annotations

import numpy as np
import pytest

import thor_slam_tpu as tst
from thor_slam_tpu.camera.rig import CameraRig
from thor_slam_tpu.camera.sources.synthetic import (
    OrbitTrajectory,
    SyntheticCameraSource,
    SyntheticRigSpec,
    SyntheticWorld,
)
from thor_slam_tpu.camera.types import Extrinsics
from thor_slam_tpu.engine.tpu_engine import TpuSlamEngine
from thor_slam_tpu import geometry
from thor_slam_tpu.utils.evaluation import ate_rmse

W, H = 160, 120


def _mono_rig(num_cams: int = 1):
    """num_cams mono sources at spread yaws on the standard orbit."""
    world = SyntheticWorld(half_extents=(4.0, 4.0, 2.0), seed=9)
    traj = OrbitTrajectory(radius=1.5, angular_rate=0.5)
    sources, rig_ext = [], {}
    for i in range(num_cams):
        yaw = 0.5 * i
        name = f"192.168.2.{21 + i}"
        spec = SyntheticRigSpec(
            num_sources=1, stereo=False, width=W, height=H, fps=30.0
        )
        mount = geometry.se3_matrix(
            geometry.euler_xyz_extrinsic_to_matrix(0.0, 0.0, yaw),
            np.array([0.12 * np.cos(yaw), 0.12 * np.sin(yaw), 0.0]),
        )
        sources.append(
            SyntheticCameraSource(
                name=name, world=world, trajectory=traj, rig_t_source=mount,
                spec=spec, emit_imu=(i == 0),
            )
        )
        rig_ext[name] = Extrinsics.from_4x4_matrix(mount)
    return sources, rig_ext, traj


def _run(num_cams: int, frames: int = 70):
    sources, rig_ext, traj = _mono_rig(num_cams)
    engine = TpuSlamEngine(
        params=dict(max_keypoints=256, keyframe_min_inliers=40),
    )
    est, gt = [], []
    with CameraRig(
        sources, rig_extrinsics=rig_ext, imu_source=sources[0].name
    ) as rig:
        engine.initialize(
            rig.calibration,
            tst.SlamConfig(num_cameras=num_cams, enable_loop_closure=False),
        )
        gt0 = None
        boot_at = None
        for i in range(frames):
            sync = rig.get_synchronized_frames()
            pose = engine.process_frames(sync)
            g = traj.pose(sync.timestamp)
            gt0 = g if gt0 is None else gt0
            if boot_at is None and engine._mono_boot_done:
                boot_at = i
            if pose is not None:
                est.append(pose.position.copy())
                gt.append((np.linalg.inv(gt0) @ g)[:3, 3])
        engine.flush()
        state = engine._tracker_state
        real = np.asarray(state.lm_valid & ~state.lm_pending).sum(1)
        tracking = engine.get_tracking_state()
    engine.shutdown()
    return {
        "est": np.asarray(est),
        "gt": np.asarray(gt),
        "boot_at": boot_at,
        "real_per_cam": real,
        "tracking": tracking,
    }


@pytest.mark.slow
class TestAllMonoSlam:
    def test_single_mono_camera_tracks(self):
        """One mono camera: bootstrap fires within the first ~second and
        PnP tracking holds to the end; the scale-aligned trajectory
        matches ground truth."""
        r = _run(1)
        assert r["boot_at"] is not None, "bootstrap never fired"
        assert r["boot_at"] < 35, f"bootstrap too late (tick {r['boot_at']})"
        assert r["tracking"] == tst.TrackingState.TRACKING
        assert r["real_per_cam"][0] > 40, (
            f"too few promoted landmarks: {r['real_per_cam']}"
        )
        # Up-to-scale evaluation (monocular gauge): Sim(3)-aligned ATE.
        n = len(r["est"])
        ate = ate_rmse(r["est"][n // 2 :], r["gt"][n // 2 :], with_scale=True)
        path = np.linalg.norm(np.diff(r["gt"][n // 2 :], axis=0), axis=1).sum()
        assert ate < 0.15 * max(path, 0.1), (
            f"scale-aligned ATE {ate:.3f} m over {path:.2f} m path"
        )

    def test_second_mono_camera_joins_gauge(self):
        """Two mono cameras: camera 0 bootstraps; camera 1's pending
        detections promote by motion triangulation THROUGH THE SHARED
        POSE TRAJECTORY — same gauge, no second bootstrap — and tracking
        still holds."""
        r = _run(2)
        assert r["boot_at"] is not None
        assert r["tracking"] == tst.TrackingState.TRACKING
        assert r["real_per_cam"][0] > 40
        assert r["real_per_cam"][1] > 20, (
            f"camera 1 never promoted landmarks: {r['real_per_cam']}"
        )


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-v"])
