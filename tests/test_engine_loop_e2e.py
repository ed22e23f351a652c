"""End-to-end loop closure through TpuSlamEngine.

Drives a revisit orbit long enough that (a) a loop actually closes and
(b) more keyframes exist than the place database retains — exercising the
map/odom frame split (closures compose into ``_map_t_odom``; the live
tracker state is never rewritten) and the trajectory-continuity guarantee
for keyframes older than the DB window (the pose graph gauge-anchors the
window's oldest node, so the rewritten window connects to the pre-window
trajectory without a seam).
"""

import numpy as np
import pytest

from thor_slam_tpu.camera.rig import CameraRig
from thor_slam_tpu.camera.sources.synthetic import (
    OrbitTrajectory,
    SyntheticRigSpec,
    SyntheticWorld,
    make_synthetic_rig,
)
from thor_slam_tpu.engine.tpu_engine import TpuSlamEngine
from thor_slam_tpu.slam.interface import SlamConfig
from thor_slam_tpu.utils.evaluation import ate_rmse


BLACKOUT = range(60, 74)  # ticks with no usable imagery (sensor dropout)


@pytest.fixture(scope="module")
def loop_run():
    """A revisit orbit with a mid-orbit sensor blackout.

    The blackout forces a VO restart at the predicted pose, accumulating
    REAL drift (tens of cm) — so the revisit closure has something genuine
    to correct (a no-drift orbit would only offer noise-level constraints,
    which the covariance gate rightly refuses). Reused across tests.
    """
    spec = SyntheticRigSpec(
        num_sources=2, stereo=True, width=160, height=120, fps=20.0, baseline_m=0.12
    )
    world3d = SyntheticWorld(half_extents=(4.0, 4.0, 2.0))
    traj = OrbitTrajectory(radius=1.5, angular_rate=1.0)  # ~2pi/1.0 s orbit
    sources, rig_ext, _, _ = make_synthetic_rig(spec, world=world3d, trajectory=traj)
    engine = TpuSlamEngine(
        # Keyframe cadence relaxed (~5 frames) so the 30-entry DB spans a
        # full orbit of keyframes: the revisit target must still be IN the
        # DB while the total keyframe count exceeds the capacity.
        params=dict(
            max_keypoints=256, keyframe_min_inliers=40,
            keyframe_max_translation=0.3, keyframe_max_rotation=0.35,
        ),
        enable_ba=False,
        use_imu=False,
        loop_db_capacity=30,  # < keyframe count: old keyframes outlive the DB
        loop_exclude_recent=6,
        loop_cooldown_kfs=8,
        loop_min_votes=40,
        loop_min_inliers=25,
    )
    est, world, gt, ts = [], [], [], []
    gt0 = None
    with CameraRig(sources, rig_extrinsics=rig_ext) as rig:
        engine.initialize(rig.calibration, SlamConfig(num_cameras=4, enable_loop_closure=True))
        for i in range(170):  # ~1.35 orbits at 20 fps
            sync = rig.get_synchronized_frames()
            if i in BLACKOUT:  # sensor dropout: black frames
                for fs in sync.frame_sets.values():
                    for f in fs.frames:
                        f.image = np.zeros_like(f.image)
            pose = engine.process_frames(sync)
            g = traj.pose(sync.timestamp)
            if gt0 is None:
                gt0 = g
            if pose is not None and i not in BLACKOUT:
                est.append(pose.position.copy())
                world.append(engine.get_world_pose(pose).position)
                gt.append((np.linalg.inv(gt0) @ g)[:3, 3])
                ts.append(sync.timestamp)
    return {
        "engine": engine,
        "est": np.asarray(est),
        "world": np.asarray(world),
        "gt": np.asarray(gt),
        "ts": np.asarray(ts),
        "map": engine.get_map(),
    }


@pytest.mark.slow
class TestLoopClosureE2E:
    def test_a_loop_closed(self, loop_run):
        assert loop_run["engine"]._loops_closed >= 1

    def test_more_keyframes_than_db(self, loop_run):
        eng = loop_run["engine"]
        assert len(eng._keyframe_poses) > eng._loop_db_capacity

    def test_correction_lives_in_map_t_odom_not_tracker(self, loop_run):
        """The closure must express itself as the map<-odom transform; the
        returned odometry stream stays smooth (the reference's
        odometry-topic semantics) and the live tracker is untouched."""
        eng = loop_run["engine"]
        corr = np.linalg.norm(eng.map_t_odom[:3, 3])
        assert corr > 1e-4  # a real correction was composed
        # The returned pose IS the tracker's smooth odom pose...
        odom_pose = np.asarray(eng._tracker_state.world_t_body, np.float64)
        np.testing.assert_allclose(odom_pose[:3, 3], loop_run["est"][-1], atol=1e-5)
        # ...and the world estimate lifts through map<-odom.
        world_pos = (eng.map_t_odom @ odom_pose)[:3, 3]
        np.testing.assert_allclose(world_pos, loop_run["world"][-1], atol=1e-5)

    def test_world_estimate_recovers_drift(self, loop_run):
        """Post-closure, the map-composed world estimate must be closer to
        ground truth than the raw (drifted) odometry — the drift-recovery
        capability, without ever snapping the odometry stream."""
        gt, est, world = loop_run["gt"], loop_run["est"], loop_run["world"]
        err_odo = np.linalg.norm(est[-1] - gt[-1])
        err_world = np.linalg.norm(world[-1] - gt[-1])
        assert err_world < 0.7 * err_odo, (
            f"world {err_world:.3f} m vs odometry {err_odo:.3f} m at stream end"
        )

    def test_keyframe_trajectory_has_no_seam(self, loop_run):
        """Keyframes older than the DB window must connect continuously to
        the rewritten window: no consecutive keyframe step may exceed the
        physically possible inter-keyframe motion by a wide margin."""
        kf = loop_run["map"].keyframe_poses
        pos = np.asarray([p.position for p in kf])
        t = np.asarray([p.timestamp for p in kf])
        steps = np.linalg.norm(np.diff(pos, axis=0), axis=1)
        dt = np.maximum(np.diff(t), 1e-3)
        speeds = steps / dt  # m/s between consecutive keyframes
        # The orbit moves at radius * rate = 1.5 m/s; a seam from an
        # unrewritten tail would appear as a teleport far above that.
        assert speeds.max() < 3.0, (
            f"trajectory seam: {speeds.max():.2f} m/s jump at keyframe "
            f"{int(np.argmax(speeds))} of {len(kf)}"
        )

    def test_map_trajectory_not_worse_than_odometry(self, loop_run):
        """The retro-corrected keyframe (map) trajectory should be at
        least as accurate as the live odometry stream (GT at keyframe
        times by per-axis interpolation over the synced GT samples)."""
        kf = loop_run["map"].keyframe_poses
        kf_ts = np.asarray([p.timestamp for p in kf])
        kf_pos = np.asarray([p.position for p in kf])
        gt, est, sync_ts = loop_run["gt"], loop_run["est"], loop_run["ts"]
        gt_at_kf = np.stack(
            [np.interp(kf_ts, sync_ts, gt[:, i]) for i in range(3)], -1
        )
        ate_map = ate_rmse(kf_pos, gt_at_kf)
        ate_odo = ate_rmse(est, gt)
        assert ate_map <= ate_odo * 1.25
