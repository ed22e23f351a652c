"""Camera-sharded SPMD tracking on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thor_slam_tpu.engine import tracker as trk
from thor_slam_tpu.parallel import make_camera_mesh, make_sharded_track_step, shard_state
from thor_slam_tpu.utils.flagship import flagship_rig, render_sequence


@pytest.fixture(scope="module")
def rig8():
    return flagship_rig(num_cams=8, width=96, height=64, max_keypoints=64)


@pytest.mark.slow
class TestShardedTracking:
    def test_eight_devices(self, rig8):
        params, setup, _, sources, world, traj = rig8
        mesh = make_camera_mesh(8)
        step = make_sharded_track_step(params, setup, mesh)
        state = shard_state(trk.init_state(params), mesh)
        seq = np.asarray(render_sequence(sources, 6))
        gt0 = None
        for i in range(6):
            state, out = step(state, jnp.asarray(seq[i]))
            t = sources[0].frame_time(i)
            g = traj.pose(t)
            if gt0 is None:
                gt0 = g
        # Pose is replicated and accurate.
        gt_rel = np.linalg.inv(gt0) @ g
        err = np.linalg.norm(np.asarray(out.world_t_body)[:3, 3] - gt_rel[:3, 3])
        assert err < 0.05
        assert int(out.num_inliers) > 50

    def test_matches_singlechip_closely(self, rig8):
        """SPMD solve must land near the single-chip solve on the same data."""
        params, setup, _, sources, world, traj = rig8
        seq = np.asarray(render_sequence(sources, 4))

        # Single chip.
        step1 = trk.make_track_step(params, setup)
        s1 = trk.init_state(params)
        for i in range(4):
            s1, o1 = step1(s1, jnp.asarray(seq[i]))

        # 8-way sharded.
        mesh = make_camera_mesh(8)
        step8 = make_sharded_track_step(params, setup, mesh)
        s8 = shard_state(trk.init_state(params), mesh)
        for i in range(4):
            s8, o8 = step8(s8, jnp.asarray(seq[i]))

        # Different robust solvers (RANSAC vs distributed IRLS) => near, not
        # identical.
        d = np.linalg.norm(
            np.asarray(o1.world_t_body)[:3, 3] - np.asarray(o8.world_t_body)[:3, 3]
        )
        assert d < 0.02

    def test_indivisible_cameras_fall_back_to_slot_axis(self, rig8):
        """Cameras not divisible by the mesh -> landmark-slot sharding."""
        from thor_slam_tpu.parallel.mesh import choose_axis

        assert choose_axis(6, 128, 8) == "slot"
        assert choose_axis(8, 128, 8) == "cam"

    def test_nothing_divisible_rejected(self, rig8):
        params, setup, *_ = rig8
        mesh = make_camera_mesh(8)
        bad = trk.TrackerParams(
            **{**params.__dict__, "num_cams": 6, "max_keypoints": 100}
        )
        with pytest.raises(ValueError, match="divisible"):
            make_sharded_track_step(bad, setup, mesh)

    def test_landmark_ids_unique_across_shards(self, rig8):
        """Keyframe refreshes must mint globally unique lm_ids per shard.

        Regression: the replicated lm_id_counter used to mint identical id
        ranges on every device, merging distinct physical landmarks under
        one BA/loop join key.
        """
        params, setup, _, sources, *_ = rig8
        mesh = make_camera_mesh(8)
        step = make_sharded_track_step(params, setup, mesh)
        state = shard_state(trk.init_state(params), mesh)
        seq = np.asarray(render_sequence(sources, 3))
        for i in range(3):
            state, out = step(state, jnp.asarray(seq[i]))
        lm_id = np.asarray(state.lm_id)
        lm_valid = np.asarray(state.lm_valid)
        per_cam = [set(lm_id[c][lm_valid[c]].tolist()) for c in range(params.num_cams)]
        total = sum(len(s) for s in per_cam)
        assert len(set().union(*per_cam)) == total
        # Counter advanced by the GLOBAL mint count at the bootstrap refresh.
        assert int(np.asarray(state.lm_id_counter)) >= params.num_cams * params.max_keypoints

    def test_two_device_mesh(self, rig8):
        params, setup, _, sources, *_ = rig8
        mesh = make_camera_mesh(2)
        step = make_sharded_track_step(params, setup, mesh)
        state = shard_state(trk.init_state(params), mesh)
        images = jnp.zeros((8, 2, 64, 96), jnp.float32)
        state, out = step(state, images)
        assert np.isfinite(np.asarray(out.world_t_body)).all()


@pytest.mark.slow
def test_graft_entry_hooks():
    """The driver hooks must import and execute."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("graft", "__graft_entry__.py")
    g = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(g)
    g.dryrun_multichip(4)


@pytest.mark.slow
class TestSlotSharding:
    """Landmark-slot SPMD: one stereo camera over an 8-device mesh (the
    EuRoC topology — more chips than cameras)."""

    @pytest.fixture(scope="class")
    def rig1(self):
        import dataclasses

        params, setup, calib, sources, world, traj = flagship_rig(
            num_cams=1, width=128, height=96, max_keypoints=128
        )
        # Tight keyframe gate so the sequence exercises a refresh (the
        # slot-sharded mint path with gathered inheritance candidates).
        params = dataclasses.replace(params, keyframe_max_translation=0.02)
        return params, setup, sources, traj

    def test_tracks_and_refreshes(self, rig1):
        params, setup, sources, traj = rig1
        mesh = make_camera_mesh(8)
        step = make_sharded_track_step(params, setup, mesh)  # auto -> slot
        state = shard_state(trk.init_state(params), mesh, axis_mode="slot")
        seq = np.asarray(render_sequence(sources, 5))
        refreshes = 0
        for i in range(5):
            state, out = step(state, jnp.asarray(seq[i]))
            if i > 0:
                refreshes += int(out.refreshed)
        assert int(out.num_inliers) >= params.min_track_inliers
        assert refreshes >= 1, "no tracked keyframe refresh under slot sharding"
        # Ids unique across slot shards (same invariant as camera shards).
        lm_id = np.asarray(state.lm_id)
        lm_valid = np.asarray(state.lm_valid)
        ids = lm_id[lm_valid]
        # Within one camera duplicate ids can only come from inheritance
        # (two detections near one landmark) — identical to single-chip.
        assert ids.size > 32

    def test_matches_singlechip_closely(self, rig1):
        params, setup, sources, traj = rig1
        seq = np.asarray(render_sequence(sources, 4))

        step1 = trk.make_track_step(params, setup)
        s1 = trk.init_state(params)
        for i in range(4):
            s1, o1 = step1(s1, jnp.asarray(seq[i]))

        mesh = make_camera_mesh(8)
        step8 = make_sharded_track_step(params, setup, mesh, axis_mode="slot")
        s8 = shard_state(trk.init_state(params), mesh, axis_mode="slot")
        for i in range(4):
            s8, o8 = step8(s8, jnp.asarray(seq[i]))

        d = np.linalg.norm(
            np.asarray(o1.world_t_body)[:3, 3] - np.asarray(o8.world_t_body)[:3, 3]
        )
        assert d < 0.02

    def test_pose_prediction_accepted(self, rig1):
        """IMU fusion must be expressible under SPMD: the step takes an
        external pose prediction (round-2 gap: make_sharded_track_step
        could not express it)."""
        params, setup, sources, traj = rig1
        mesh = make_camera_mesh(8)
        step = make_sharded_track_step(params, setup, mesh, axis_mode="slot")
        state = shard_state(trk.init_state(params), mesh, axis_mode="slot")
        seq = np.asarray(render_sequence(sources, 3))
        state, out = step(state, jnp.asarray(seq[0]))
        state, out = step(state, jnp.asarray(seq[1]), jnp.asarray(out.world_t_body))
        assert np.isfinite(np.asarray(out.world_t_body)).all()
        assert int(out.num_inliers) >= params.min_track_inliers
