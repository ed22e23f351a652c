"""Track-level bundle adjustment must IMPROVE trajectory accuracy.

The acceptance gate for shipping BA on by default (VERDICT round 1 item 3):
on a drift-accumulating synthetic sequence, enable_ba=True must beat
enable_ba=False on ATE by a measurable margin. Observations are per-tick
KLT positions joined by persistent lm_id (tracker.TrackOutput.obs_norm),
so keyframe-boundary landmark-id hops cannot poison the window — the
failure mode that made the round-1 keyframe-snapshot backend net-neutral.
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


def _run(enable_ba: bool):
    spec = SyntheticRigSpec(
        num_sources=2, stereo=True, width=160, height=120, fps=30.0, baseline_m=0.12
    )
    world = SyntheticWorld(half_extents=(4.0, 4.0, 2.0))
    traj = OrbitTrajectory(radius=1.5, angular_rate=0.5)
    sources, rig_ext, _, _ = make_synthetic_rig(spec, world=world, trajectory=traj)
    engine = TpuSlamEngine(
        params=dict(max_keypoints=256, keyframe_min_inliers=40),
        enable_ba=enable_ba,
        use_imu=False,
    )
    est, gt = [], []
    ba_runs = 0
    with tst.CameraRig(sources, rig_extrinsics=rig_ext) as rig:
        engine.initialize(rig.calibration, SlamConfig(num_cameras=4, enable_loop_closure=False))
        gt0 = None
        for _ in range(60):
            sync = rig.get_synchronized_frames()
            pose = engine.process_frames(sync)
            # A "run" = the window SOLVED (applied, or a solved correction
            # withheld by the rms/noise-floor/junk acceptance gates).
            d = engine.last_diagnostics
            if d.get("refreshed") and (
                "ba_rms" in d
                or str(d.get("ba_skip", "")).split("=")[0] in ("rms", "corr", "correction")
                or str(d.get("ba_skip", "")).startswith(("rms", "corr"))
            ):
                ba_runs += 1
            g = traj.pose(sync.timestamp)
            if gt0 is None:
                gt0 = g
            if pose is not None:
                est.append(pose.position.copy())
                gt.append((np.linalg.inv(gt0) @ g)[:3, 3])
    engine.shutdown()
    return ate_rmse(np.array(est), np.array(gt)), ba_runs


@pytest.mark.slow
def test_ba_improves_ate():
    ate_off, runs_off = _run(enable_ba=False)
    ate_on, runs_on = _run(enable_ba=True)
    assert runs_off == 0
    assert runs_on >= 2, "BA never ran — window/stride plumbing broken"
    # Reference measurement: 7.2 cm -> 5.2 cm (-28%). Gate at -10% so the
    # test fails when BA regresses to net-neutral, without being flaky.
    assert ate_on < 0.9 * ate_off, (
        f"BA did not improve ATE: on={ate_on * 100:.2f} cm off={ate_off * 100:.2f} cm"
    )


def test_ba_obs_ids_exact_beyond_float24():
    """lm_id rides the packed float32 tensor as a BITCAST, not a cast:
    a numeric cast is exact only to 2^24 and production id counters pass
    that within minutes, silently merging distinct landmarks in the join."""
    import jax.numpy as jnp

    from thor_slam_tpu.engine import tracker as trk

    c, n = 2, 4
    ids = jnp.asarray([[16777217, 16777219, 2000000001, -1]] * c, jnp.int32)
    out = trk.TrackOutput(
        world_t_body=jnp.eye(4), num_inliers=jnp.int32(1), num_matches=jnp.int32(1),
        num_landmarks=jnp.int32(1), rms_error=jnp.float32(0), refreshed=jnp.bool_(False),
        obs_norm=jnp.zeros((c, n, 2)), robs_norm=jnp.zeros((c, n, 2)),
        lm_id=ids, lm_valid=jnp.ones((c, n), bool), robs_valid=jnp.zeros((c, n), bool),
        covariance=jnp.eye(6),
    )
    rec = trk.unpack_ba_obs(trk.pack_ba_obs(out, jnp.zeros((c, n, 3))))
    assert rec["ids"][0].tolist() == [16777217, 16777219, 2000000001, -1]
