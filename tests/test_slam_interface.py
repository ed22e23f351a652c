"""SlamPose / SlamMap / SlamEngine contract tests (reference parity: slam/interface.py)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from thor_slam_tpu.camera.rig import CameraRig
from thor_slam_tpu.slam.adapters import NullSlamEngine
from thor_slam_tpu.slam.interface import MapPoint, SlamConfig, SlamMap, SlamPose, TrackingState
from tests.test_rig_sync import make_sources


class TestSlamPose:
    def test_identity(self):
        p = SlamPose.identity(timestamp=3.0)
        np.testing.assert_array_equal(p.position, np.zeros(3))
        np.testing.assert_array_equal(p.rotation, [0, 0, 0, 1])
        assert p.timestamp == 3.0
        np.testing.assert_array_equal(p.to_4x4_matrix(), np.eye(4))

    def test_matrix_roundtrip_matches_scipy(self):
        rng = np.random.default_rng(11)
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        pos = rng.normal(size=3)
        pose = SlamPose(position=pos, rotation=q, timestamp=1.0)
        m = pose.to_4x4_matrix()
        np.testing.assert_allclose(m[:3, :3], R.from_quat(q).as_matrix(), atol=1e-10)
        pose2 = SlamPose.from_4x4_matrix(m, timestamp=1.0)
        np.testing.assert_allclose(pose2.position, pos, atol=1e-12)
        assert (
            min(np.linalg.norm(pose2.rotation - q), np.linalg.norm(pose2.rotation + q)) < 1e-9
        )

    def test_default_state_and_confidence(self):
        p = SlamPose.identity()
        assert p.tracking_state == TrackingState.TRACKING
        assert p.confidence == 1.0
        assert p.covariance is None


class TestSlamMap:
    def test_empty_point_cloud_shape(self):
        assert SlamMap().to_point_cloud().shape == (0, 3)

    def test_point_cloud(self):
        m = SlamMap(points=[MapPoint(position=np.array([1.0, 2, 3])), MapPoint(position=np.array([4.0, 5, 6]))])
        np.testing.assert_array_equal(m.to_point_cloud(), [[1, 2, 3], [4, 5, 6]])


class TestNullEngineContract:
    def test_full_lifecycle(self):
        with CameraRig(make_sources([0.0, 0.0], stereo=True)) as rig:
            engine = NullSlamEngine()
            assert engine.get_tracking_state() == TrackingState.NOT_INITIALIZED
            engine.initialize(rig.calibration, SlamConfig(num_cameras=4))
            assert engine.get_tracking_state() == TrackingState.INITIALIZING
            assert len(engine.cameras) == 4  # 2 stereo sources flattened

            for _ in range(3):
                sync = rig.get_synchronized_frames()
                pose = engine.process_frames(sync)
            assert pose is not None
            assert pose.timestamp == sync.timestamp
            assert engine.get_tracking_state() == TrackingState.TRACKING

            engine.reset()
            assert engine.get_tracking_state() == TrackingState.INITIALIZING
            engine.shutdown()
            assert engine.get_tracking_state() == TrackingState.NOT_INITIALIZED

    def test_process_before_initialize_raises(self):
        engine = NullSlamEngine()
        with pytest.raises(RuntimeError):
            engine.process_frames(None)

    def test_context_manager_shuts_down(self):
        with CameraRig(make_sources([0.0])) as rig:
            with NullSlamEngine() as engine:
                engine.initialize(rig.calibration)
            assert engine.get_tracking_state() == TrackingState.NOT_INITIALIZED

    def test_optional_methods_raise(self):
        engine = NullSlamEngine()
        with pytest.raises(NotImplementedError):
            engine.save_map("/tmp/x")
        with pytest.raises(NotImplementedError):
            engine.load_map("/tmp/x")
        with pytest.raises(NotImplementedError):
            engine.relocalize()

    def test_camera_truncation_matches_reference(self):
        """Cameras are flattened sorted by source then truncated at num_cameras
        (reference isaac_ros.py:138-157)."""
        with CameraRig(make_sources([0.0, 0.0], stereo=True)) as rig:
            engine = NullSlamEngine()
            engine.initialize(rig.calibration, SlamConfig(num_cameras=3))
            assert len(engine.cameras) == 3
            assert [c.source_name for c in engine.cameras] == ["cam0", "cam0", "cam1"]
            assert [c.cam_idx for c in engine.cameras] == [0, 1, 0]
