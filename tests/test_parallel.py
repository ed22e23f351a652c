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

    def test_indivisible_cameras_rejected(self, rig8):
        params, setup, *_ = rig8
        mesh = make_camera_mesh(8)
        bad = trk.TrackerParams(**{**params.__dict__, "num_cams": 6})
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
