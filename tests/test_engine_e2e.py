"""End-to-end visual odometry: TpuSlamEngine on the synthetic rig.

This is the milestone-4 acceptance test of the build plan (SURVEY.md §7.2):
full pipeline rig -> sync -> rectify -> features -> KLT -> PnP -> pose, with
trajectory accuracy measured as ATE against the analytic ground truth.
"""

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
from thor_slam_tpu.engine.tpu_engine import TpuSlamEngine
from thor_slam_tpu.slam.interface import SlamConfig, TrackingState
from thor_slam_tpu.utils.evaluation import ate_rmse


@pytest.fixture(scope="module")
def vo_run(tmp_path_factory):
    """Run 60 frames of 2-camera stereo VO once; reuse across tests."""
    spec = SyntheticRigSpec(
        num_sources=2, stereo=True, width=160, height=120, fps=30.0, baseline_m=0.12
    )
    world = SyntheticWorld(half_extents=(4.0, 4.0, 2.0))
    traj = OrbitTrajectory(radius=1.5, angular_rate=0.5)
    sources, rig_ext, _, _ = make_synthetic_rig(spec, world=world, trajectory=traj)
    engine = TpuSlamEngine(params=dict(max_keypoints=256, keyframe_min_inliers=40))

    est, gt, states, confs, covs = [], [], [], [], []
    with CameraRig(sources, rig_extrinsics=rig_ext) as rig:
        engine.initialize(rig.calibration, SlamConfig(num_cameras=4))
        gt0 = None
        for _ in range(60):
            sync = rig.get_synchronized_frames()
            pose = engine.process_frames(sync)
            g = traj.pose(sync.timestamp)
            if gt0 is None:
                gt0 = g
            if pose is not None:
                est.append(pose.position.copy())
                gt.append((np.linalg.inv(gt0) @ g)[:3, 3])
                states.append(pose.tracking_state)
                confs.append(pose.confidence)
                covs.append(pose.covariance)
        slam_map = engine.get_map()
        landmark_cloud = engine.get_landmark_cloud()
        save_path = str(tmp_path_factory.mktemp("maps") / "map.npz")
        saved = engine.save_map(save_path)
    return {
        "landmark_cloud": landmark_cloud,
        "est": np.array(est),
        "gt": np.array(gt),
        "states": states,
        "confs": confs,
        "covs": covs,
        "map": slam_map,
        "engine": engine,
        "saved": saved,
        "save_path": save_path,
    }


@pytest.mark.slow
class TestVisualOdometry:
    def test_ate_below_threshold(self, vo_run):
        ate = ate_rmse(vo_run["est"], vo_run["gt"])
        path = np.linalg.norm(np.diff(vo_run["gt"], axis=0), axis=1).sum()
        assert path > 1.0  # the rig actually moved
        assert ate < 0.05, f"ATE {ate:.3f} m too high over {path:.1f} m path"

    def test_final_drift_below_1pct(self, vo_run):
        path = np.linalg.norm(np.diff(vo_run["gt"], axis=0), axis=1).sum()
        final = np.linalg.norm(vo_run["est"][-1] - vo_run["gt"][-1])
        assert final / path < 0.02

    def test_reaches_tracking_state(self, vo_run):
        assert TrackingState.TRACKING in vo_run["states"]
        # Majority of frames tracked.
        frac = np.mean([s == TrackingState.TRACKING for s in vo_run["states"]])
        assert frac > 0.9

    def test_confidence_high_while_tracking(self, vo_run):
        tracked_confs = [
            c for s, c in zip(vo_run["states"], vo_run["confs"]) if s == TrackingState.TRACKING
        ]
        assert np.median(tracked_confs) > 0.9

    def test_covariance_populated_and_calibrated(self, vo_run):
        """Every returned pose carries the 6x6 solve covariance (the field
        the reference declares but its engine never populates through the
        API, reference interface.py:62 / isaac_ros.py:308-325), and while
        tracking its translation sigma is in a physically plausible band
        for this rig (sub-mm..cm), consistent with the measured ATE."""
        tracked = [
            c for s, c in zip(vo_run["states"], vo_run["covs"])
            if s == TrackingState.TRACKING
        ]
        assert len(tracked) > 10
        for cov in tracked:
            assert cov is not None and cov.shape == (6, 6)
            np.testing.assert_allclose(cov, cov.T, atol=1e-9)
        sig_t = np.asarray([np.sqrt(np.trace(c[:3, :3])) for c in tracked])
        assert 1e-5 < np.median(sig_t) < 0.05
        # Confidence is the reference's formula over the same matrix.
        confs = [
            c for s, c in zip(vo_run["states"], vo_run["confs"])
            if s == TrackingState.TRACKING
        ]
        assert np.allclose(
            confs, [1.0 / (1.0 + np.trace(c)) for c in tracked], atol=1e-6
        )

    def test_map_populated(self, vo_run):
        m = vo_run["map"]
        assert len(m.points) > 100
        assert len(m.keyframe_poses) >= 2
        cloud = m.to_point_cloud()
        # Landmarks live on the room walls (box +/-4 m): mostly within the
        # box (triangulation noise can push outliers past it) and spread out.
        assert np.mean(np.abs(cloud[:, 0]) < 4.5) > 0.9
        assert cloud.std(axis=0).max() > 0.5

    def test_landmark_cloud_superset_of_live_map(self, vo_run):
        """get_landmark_cloud = live bank + place-DB history (the RViz
        landmarks_cloud feed); at least as large as the live tracked set
        and in the same (map) frame."""
        cloud = vo_run["landmark_cloud"]
        live = vo_run["map"].to_point_cloud()
        assert cloud.shape[1] == 3
        assert cloud.shape[0] >= live.shape[0] > 100
        # Same world: cloud points also concentrate inside the room box.
        assert np.mean(np.all(np.abs(cloud) < 5.0, axis=1)) > 0.8

    def test_save_map(self, vo_run):
        assert vo_run["saved"]

    def test_load_map_restores_landmarks(self, vo_run):
        engine = vo_run["engine"]
        # engine was shut down by the context? No — rig context closed, engine lives.
        n_before = int(np.asarray(engine._tracker_state.lm_valid).sum())
        engine.reset()
        assert int(np.asarray(engine._tracker_state.lm_valid).sum()) == 0
        assert engine.load_map(vo_run["save_path"])
        assert int(np.asarray(engine._tracker_state.lm_valid).sum()) == n_before


@pytest.mark.slow
class TestEngineContract:
    def test_requires_initialize(self):
        engine = TpuSlamEngine()
        with pytest.raises(RuntimeError):
            engine.process_frames(None)

    def test_all_mono_rig_bootstraps(self):
        """An ALL-mono rig initializes with the MOTION-bootstrap tracker
        (two-view essential-matrix init + per-keyframe motion
        triangulation — the cuVSLAM mono-only capability, reference
        luxonis.py:551-568). Metric subsystems are auto-disabled: the
        odometry is up-to-scale. End-to-end tracking is proven by
        tests/test_engine_mono_only.py; this pins the contract surface.
        """
        spec = SyntheticRigSpec(num_sources=1, stereo=False, width=64, height=48)
        sources, rig_ext, _, _ = make_synthetic_rig(spec, render=False)
        rig = CameraRig(sources, rig_extrinsics=rig_ext)
        engine = TpuSlamEngine(params=dict(max_keypoints=64))
        engine.initialize(rig.calibration)
        assert engine._all_mono
        assert engine._params.mono_bootstrap
        assert engine._mono_init is not None
        assert engine._enable_ba is False  # monocular gauge: BA off
        engine.shutdown()

    def test_reset_and_shutdown(self):
        spec = SyntheticRigSpec(num_sources=1, stereo=True, width=64, height=48)
        sources, rig_ext, _, _ = make_synthetic_rig(spec, render=False)
        rig = CameraRig(sources, rig_extrinsics=rig_ext)
        engine = TpuSlamEngine(params=dict(max_keypoints=64))
        engine.initialize(rig.calibration)
        assert engine.get_tracking_state() == TrackingState.INITIALIZING
        engine.reset()
        assert engine.get_tracking_state() == TrackingState.INITIALIZING
        engine.shutdown()
        assert engine.get_tracking_state() == TrackingState.NOT_INITIALIZED

    def test_relocalize_flags_state(self):
        spec = SyntheticRigSpec(num_sources=1, stereo=True, width=64, height=48)
        sources, rig_ext, _, _ = make_synthetic_rig(spec, render=False)
        rig = CameraRig(sources, rig_extrinsics=rig_ext)
        engine = TpuSlamEngine(params=dict(max_keypoints=64))
        assert not engine.relocalize()  # before initialize
        engine.initialize(rig.calibration)
        assert engine.relocalize()
        assert engine.get_tracking_state() == TrackingState.RELOCALIZING


@pytest.mark.slow
def test_save_load_state_roundtrip(tmp_path):
    """Full-state checkpoint/resume (SURVEY §5.4: real, unlike the reference)."""
    from thor_slam_tpu.camera.sources.synthetic import SyntheticRigSpec, make_synthetic_rig

    spec = SyntheticRigSpec(num_sources=1, stereo=True, width=96, height=64)
    sources, rig_ext, _, _ = make_synthetic_rig(spec)
    engine = TpuSlamEngine(params=dict(max_keypoints=64))
    with CameraRig(sources, rig_extrinsics=rig_ext) as rig:
        engine.initialize(rig.calibration)
        for _ in range(4):
            sync = rig.get_synchronized_frames()
            engine.process_frames(sync)
        path = str(tmp_path / "state")
        assert engine.save_state(path)
        before = np.asarray(engine._tracker_state.lm_pos_w).copy()
        pose_before = np.asarray(engine._tracker_state.world_t_body).copy()
        engine.reset()
        assert engine.load_state(path)
        np.testing.assert_array_equal(np.asarray(engine._tracker_state.lm_pos_w), before)
        np.testing.assert_array_equal(np.asarray(engine._tracker_state.world_t_body), pose_before)
        # Engine keeps tracking after resume.
        sync = rig.get_synchronized_frames()
        # rig was stopped by reset? no - rig still running inside context
        pose = engine.process_frames(sync)
        assert pose is not None


@pytest.mark.slow
def test_relocalize_against_loaded_map(tmp_path):
    """save_map -> new engine -> load_map -> relocalize -> track in the
    original map frame (the capability the reference stubs out,
    reference interface.py:250-256)."""
    spec = SyntheticRigSpec(
        num_sources=2, stereo=True, width=160, height=120, fps=30.0, baseline_m=0.12
    )
    world = SyntheticWorld(half_extents=(4.0, 4.0, 2.0))
    traj = OrbitTrajectory(radius=1.5, angular_rate=0.5)

    # Session 1: build + save a map.
    sources, rig_ext, _, _ = make_synthetic_rig(spec, world=world, trajectory=traj)
    eng1 = TpuSlamEngine(params=dict(max_keypoints=256, keyframe_min_inliers=40), loop_min_votes=50)
    gt0 = None
    with CameraRig(sources, rig_extrinsics=rig_ext) as rig:
        eng1.initialize(rig.calibration)
        for _ in range(60):
            sync = rig.get_synchronized_frames()
            eng1.process_frames(sync)
            if gt0 is None:
                gt0 = traj.pose(sync.timestamp)
    map_path = str(tmp_path / "map")
    assert eng1.save_map(map_path)
    assert len(eng1._loop_db) >= 3

    # Session 2: fresh engine, rig starting 1 s later ON the old trajectory.
    sources2, rig_ext2, _, _ = make_synthetic_rig(
        spec, world=world, trajectory=traj, clock_offsets=(1.0, 1.0)
    )
    eng2 = TpuSlamEngine(params=dict(max_keypoints=256, keyframe_min_inliers=40), loop_min_votes=50)
    with CameraRig(sources2, rig_extrinsics=rig_ext2) as rig2:
        eng2.initialize(rig2.calibration)
        assert eng2.load_map(map_path)
        assert eng2.relocalize()
        assert eng2.get_tracking_state() == TrackingState.RELOCALIZING
        errs = []
        for _ in range(10):
            sync = rig2.get_synchronized_frames()
            pose = eng2.process_frames(sync)
            g_map = np.linalg.inv(gt0) @ traj.pose(sync.timestamp)
            if pose is not None:
                errs.append(np.linalg.norm(pose.position - g_map[:3, 3]))
        assert not eng2._want_reloc  # relocalization succeeded
        assert eng2.get_tracking_state() == TrackingState.TRACKING
        # Pose is expressed in the ORIGINAL map's frame, within a few cm.
        assert np.median(errs) < 0.05


@pytest.mark.slow
def test_auto_relocalize_on_lost_with_loaded_map(tmp_path):
    """load_map -> blackout -> LOST -> AUTO reacquire in the map frame,
    with no relocalize() call (the cuVSLAM contract the reference
    declares, reference interface.py:248-256; VERDICT r3 missing #3).
    Sessions without a loaded map keep the VO-restart path (their own DB
    is the loop-closure working set, tests/test_engine_loop_e2e.py)."""
    spec = SyntheticRigSpec(
        num_sources=2, stereo=True, width=160, height=120, fps=30.0, baseline_m=0.12
    )
    world = SyntheticWorld(half_extents=(4.0, 4.0, 2.0))
    traj = OrbitTrajectory(radius=1.5, angular_rate=0.5)

    # Session 1: build + save a map.
    sources, rig_ext, _, _ = make_synthetic_rig(spec, world=world, trajectory=traj)
    eng1 = TpuSlamEngine(
        params=dict(max_keypoints=256, keyframe_min_inliers=40), loop_min_votes=50
    )
    gt0 = None
    with CameraRig(sources, rig_extrinsics=rig_ext) as rig:
        eng1.initialize(rig.calibration)
        for _ in range(60):
            sync = rig.get_synchronized_frames()
            eng1.process_frames(sync)
            if gt0 is None:
                gt0 = traj.pose(sync.timestamp)
    map_path = str(tmp_path / "map")
    assert eng1.save_map(map_path)

    # Session 2: load the map, track, then a sensor blackout drives LOST.
    sources2, rig_ext2, _, _ = make_synthetic_rig(
        spec, world=world, trajectory=traj, clock_offsets=(1.0, 1.0)
    )
    eng2 = TpuSlamEngine(
        params=dict(max_keypoints=256, keyframe_min_inliers=40),
        loop_min_votes=50, lost_after=3,
    )
    with CameraRig(sources2, rig_extrinsics=rig_ext2) as rig2:
        eng2.initialize(rig2.calibration)
        assert eng2.load_map(map_path)
        # NO relocalize() call anywhere in this session.
        saw_lost = False
        errs = []
        for i in range(40):
            sync = rig2.get_synchronized_frames()
            if 8 <= i < 16:  # blackout: black frames -> inliers collapse
                for fs in sync.frame_sets.values():
                    for f in fs.frames:
                        f.image = np.zeros_like(f.image)
            pose = eng2.process_frames(sync)
            if eng2.get_tracking_state() == TrackingState.LOST:
                saw_lost = True
            if i >= 25 and pose is not None:
                g_map = np.linalg.inv(gt0) @ traj.pose(sync.timestamp)
                errs.append(np.linalg.norm(pose.position - g_map[:3, 3]))
        assert saw_lost, "blackout never drove the engine LOST"
        assert not eng2._want_reloc, "auto relocalization never succeeded"
        assert eng2.get_tracking_state() == TrackingState.TRACKING
        # Reacquired in the ORIGINAL map's frame.
        assert np.median(errs) < 0.06


@pytest.mark.slow
class TestPipelinedMode:
    """pipelined=True: identical poses, shifted by exactly one tick."""

    def _run(self, pipelined: bool, light_ticks):
        spec = SyntheticRigSpec(
            num_sources=2, stereo=True, width=128, height=96, fps=30.0, baseline_m=0.12
        )
        world = SyntheticWorld(half_extents=(4.0, 4.0, 2.0))
        traj = OrbitTrajectory(radius=1.5, angular_rate=0.5)
        sources, rig_ext, _, _ = make_synthetic_rig(spec, world=world, trajectory=traj)
        # Defaults on (BA + IMU): the shipped config runs this exact
        # combination pipelined, so equivalence must hold with the full
        # feature set, not the pure-VO subset.
        engine = TpuSlamEngine(
            params=dict(max_keypoints=128, keyframe_min_inliers=40),
            pipelined=pipelined,
            light_ticks=light_ticks,
        )
        poses = []
        with CameraRig(
            sources, rig_extrinsics=rig_ext, imu_source=sources[0].name
        ) as rig:
            engine.initialize(rig.calibration, SlamConfig(num_cameras=4))
            for _ in range(12):
                sync = rig.get_synchronized_frames()
                pose = engine.process_frames(sync)
                poses.append(pose)
            tail = engine.flush()
            if tail is not None:
                poses.append(tail)
        engine.shutdown()
        return [p for p in poses if p is not None]

    def test_matches_synchronous_shifted(self):
        """Pipeline equivalence proper: with the SAME tick schedule, the
        pipelined stream is the synchronous stream shifted by one tick.

        Light scheduling is pinned OFF: it is HOST policy over
        finalize-lagged diagnostics, so the light/full schedule is
        allowed to differ with pipeline depth (each mode sees different-
        age diagnostics) — which shifts keyframe timing by design. The
        device semantics under an identical schedule are what this test
        pins, bit-for-bit."""
        sync_poses = self._run(pipelined=False, light_ticks=False)
        pipe_poses = self._run(pipelined=True, light_ticks=False)
        # First pipelined call returns None; flush() yields the final tick —
        # the surviving pose sequences are identical.
        assert len(sync_poses) == len(pipe_poses)
        for a, b in zip(sync_poses, pipe_poses):
            np.testing.assert_allclose(a.position, b.position, atol=1e-6)
            assert a.timestamp == b.timestamp

    def test_default_config_stays_close(self):
        """With the SHIPPED defaults (light scheduling on), sync and
        pipelined may schedule light ticks differently (lagged
        diagnostics) — trajectories must still agree to well under a
        centimeter on this short orbit (measured: ~8 mm max with the
        schedules maximally divergent)."""
        sync_poses = self._run(pipelined=False, light_ticks=None)
        pipe_poses = self._run(pipelined=True, light_ticks=None)
        assert len(sync_poses) == len(pipe_poses)
        for a, b in zip(sync_poses, pipe_poses):
            assert np.linalg.norm(a.position - b.position) < 0.02
            assert a.timestamp == b.timestamp

    def test_flush_idempotent(self):
        engine = TpuSlamEngine(pipelined=True)
        assert engine.flush() is None
