"""Deep pipelining must carry the FULL feature set, not just pure VO.

Round-2 verdict item: the shipped engine (BA + IMU + loop closure) could
only run at pipeline depth 1, because every host backend read the live
device state at the tick it finalized. The redesign feeds each backend
from finalized-tick data only — packed outputs, the ``ba_obs`` landmark
snapshot, the ``kf_sig`` keyframe signature — and pushes BA corrections
to the device as async delta updates, so ``pipeline_depth > 1`` is now a
product configuration (``config/slam_config.yaml backend.pipeline_depth``),
not a pure-VO streaming trick.

These tests gate that claim: the default-featured engine at depth 4 must
track the same synthetic drift sequence as depth 1 with comparable ATE,
with BA actually solving and loop closure actually enabled.
"""

import numpy as np
import pytest

import thor_slam_tpu as tst
from thor_slam_tpu.camera.sources.synthetic import (
    OrbitTrajectory,
    SyntheticRigSpec,
    SyntheticWorld,
    make_synthetic_rig,
)
from thor_slam_tpu.engine.tpu_engine import TpuSlamEngine
from thor_slam_tpu.slam.interface import SlamConfig
from thor_slam_tpu.utils.evaluation import ate_rmse


def _run_default_featured(depth: int, frames: int = 60):
    """Full default engine (BA + IMU + loop on) at a pipeline depth."""
    spec = SyntheticRigSpec(
        num_sources=2, stereo=True, width=160, height=120, fps=30.0, baseline_m=0.12
    )
    world = SyntheticWorld(half_extents=(4.0, 4.0, 2.0))
    traj = OrbitTrajectory(radius=1.5, angular_rate=0.5)
    sources, rig_ext, _, _ = make_synthetic_rig(spec, world=world, trajectory=traj)
    engine = TpuSlamEngine(
        params=dict(max_keypoints=256, keyframe_min_inliers=40),
        pipelined=True,
        pipeline_depth=depth,
    )
    est, gt, ts = [], [], []
    ba_runs = 0
    with tst.CameraRig(
        sources, rig_extrinsics=rig_ext, imu_source=sources[0].name
    ) as rig:
        engine.initialize(rig.calibration, SlamConfig(num_cameras=4))
        assert engine._config.enable_loop_closure, (
            "deep pipelining must NOT force loop closure off anymore"
        )
        gt0 = None
        for _ in range(frames):
            sync = rig.get_synchronized_frames()
            pose = engine.process_frames(sync)
            d = engine.last_diagnostics
            # A SOLVE proves the finalized-data window machinery (what
            # this test gates). "ba_rms" = solved AND applied; a gate-
            # stage skip ("rms ..."/"corr ...") = solved, correction
            # correctly withheld under the noise floor — on this low-
            # drift orbit that is the DESIGNED outcome (BASELINE.md
            # ablations), so counting only applications made the test
            # flake on keyframe-timing jitter. Only "window="/"joined_"
            # skips mean no solve happened.
            if "ba_rms" in d or (
                "ba_skip" in d
                and not d["ba_skip"].startswith(("window", "joined"))
            ):
                ba_runs += 1
            g = traj.pose(sync.timestamp)
            if gt0 is None:
                gt0 = g
            if pose is not None:
                est.append(pose.position.copy())
                gt.append((np.linalg.inv(gt0) @ traj.pose(pose.timestamp))[:3, 3])
        tail = engine.flush()
        if tail is not None:
            est.append(tail.position.copy())
            gt.append((np.linalg.inv(gt0) @ traj.pose(tail.timestamp))[:3, 3])
    diag = dict(engine.last_diagnostics)
    empty_windows = engine.imu_empty_windows
    engine.shutdown()
    return ate_rmse(np.array(est), np.array(gt)), ba_runs, diag, empty_windows


@pytest.mark.slow
def test_deep_pipeline_full_features_matches_depth1():
    """Depth 4 with BA+IMU+loop tracks within 1.5x of depth 1's ATE.

    Depth changes the IMU prediction window (it spans the in-flight
    ticks) and defers BA corrections by the pipeline latency, so bitwise
    equality is not expected — but the trajectory quality must hold.
    """
    ate_d1, ba_d1, _, empty_d1 = _run_default_featured(depth=1)
    ate_d4, ba_d4, _, empty_d4 = _run_default_featured(depth=4)
    assert ba_d1 >= 1, "BA never solved at depth 1 — harness broken"
    assert ba_d4 >= 1, "BA never solved at depth 4 — finalized-data window broken"
    # IMU prediction must actually run (non-empty windows) at both depths.
    assert empty_d1 <= 2 and empty_d4 <= 2
    assert ate_d4 < 1.5 * ate_d1 + 0.02, (
        f"deep pipeline degraded tracking: depth4={ate_d4 * 100:.2f} cm "
        f"vs depth1={ate_d1 * 100:.2f} cm"
    )


@pytest.mark.slow
def test_deep_pipeline_pose_latency_contract():
    """At depth d the first d calls return None, then poses stream."""
    spec = SyntheticRigSpec(
        num_sources=2, stereo=True, width=128, height=96, fps=30.0, baseline_m=0.12
    )
    sources, rig_ext, _, _ = make_synthetic_rig(
        spec, world=SyntheticWorld(half_extents=(4.0, 4.0, 2.0)),
        trajectory=OrbitTrajectory(radius=1.5, angular_rate=0.5),
    )
    engine = TpuSlamEngine(
        params=dict(max_keypoints=128), pipelined=True, pipeline_depth=3
    )
    returned = []
    with tst.CameraRig(
        sources, rig_extrinsics=rig_ext, imu_source=sources[0].name
    ) as rig:
        engine.initialize(rig.calibration, SlamConfig(num_cameras=4))
        for _ in range(8):
            sync = rig.get_synchronized_frames()
            returned.append(engine.process_frames(sync))
        tail = engine.flush()
    engine.shutdown()
    # The pipeline fills for `depth` calls before the first pose comes back.
    assert all(p is None for p in returned[:3])
    # The first full call finalizes at least one tick; a ready-batch
    # finalize may drain several ticks in one call (returning the newest),
    # so later calls can legitimately return None — but the stream plus
    # flush() must surface progress: monotone timestamps, ending at the
    # final tick.
    stream = [p for p in returned if p is not None] + ([tail] if tail else [])
    assert len(stream) >= 2
    ts = [p.timestamp for p in stream]
    assert ts == sorted(ts)
    assert tail is not None  # flush drains to the last dispatched tick
