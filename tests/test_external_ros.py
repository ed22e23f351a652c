"""Input-side external-engine bridge: wire-format logic, ROS-free.

The adapter's message construction lives in pure module functions
(thor_slam_tpu/slam/adapters/external_ros.py) precisely so the DDS wire
contract the reference establishes (reference isaac_ros.py:327-430) is
testable without rclpy: camera flattening order, stereo projection
matrices (Tx = -fx * baseline), distortion-model dispatch, BGR->RGB image
packing, TF quaternions, and IMU batch handling.
"""

from __future__ import annotations

import numpy as np
import pytest

from thor_slam_tpu import geometry
from thor_slam_tpu.camera.rig import CameraRig
from thor_slam_tpu.camera.sources.synthetic import SyntheticRigSpec, make_synthetic_rig
from thor_slam_tpu.camera.types import Extrinsics, Intrinsics
from thor_slam_tpu.slam.adapters import external_ros as ext


def _calibration(num_sources=2):
    spec = SyntheticRigSpec(num_sources=num_sources, stereo=True, width=64, height=48)
    sources, rig_ext, _, _ = make_synthetic_rig(spec)
    with CameraRig(sources, rig_extrinsics=rig_ext, imu_source=sources[0].name) as rig:
        return rig.calibration


class TestExtractCameras:
    def test_sorted_flatten_and_truncate(self):
        cal = _calibration(2)
        cams = ext.extract_cameras(cal, 3)
        assert len(cams) == 3
        names = [c.source_name for c in cams]
        assert names == sorted(names)
        assert [c.cam_idx for c in cams] == [0, 1, 0]

    def test_world_extrinsics_used(self):
        cal = _calibration(2)
        cams = ext.extract_cameras(cal, 4)
        name = cams[0].source_name
        expected = cal.get_world_extrinsics(name)[0]
        np.testing.assert_allclose(cams[0].extrinsics.translation, expected.translation)


class TestImageWire:
    def test_mono8(self):
        img = (np.arange(12, dtype=np.uint8)).reshape(3, 4)
        enc, h, w, step, data = ext.image_wire(img)
        assert (enc, h, w, step) == ("mono8", 3, 4, 4)
        assert data == img.tobytes()

    def test_bgr_to_rgb(self):
        img = np.zeros((2, 2, 3), np.uint8)
        img[..., 0] = 255  # blue channel (DepthAI BGR)
        enc, h, w, step, data = ext.image_wire(img)
        assert (enc, step) == ("rgb8", 6)
        px = np.frombuffer(data, np.uint8).reshape(2, 2, 3)
        assert px[0, 0, 2] == 255 and px[0, 0, 0] == 0  # blue is LAST in rgb8

    def test_float_clamped(self):
        img = np.full((2, 2), 300.0, np.float32)
        _, _, _, _, data = ext.image_wire(img)
        assert np.frombuffer(data, np.uint8).max() == 255


class TestDistortionWire:
    def test_dispatch_by_count(self):
        assert ext.distortion_wire(np.zeros(8))[0] == "rational_polynomial"
        assert ext.distortion_wire(np.zeros(14))[0] == "rational_polynomial"
        assert ext.distortion_wire(np.zeros(5))[0] == "plumb_bob"
        assert ext.distortion_wire(np.zeros(4))[0] == "equidistant"
        model, d = ext.distortion_wire(np.zeros(2))
        assert model == "plumb_bob" and len(d) == 5


class TestProjectionMatrix:
    def _pair(self, baseline=0.12, fx=400.0):
        k = np.array([[fx, 0, 32.0], [0, fx, 24.0], [0, 0, 1]])
        intr = Intrinsics(width=64, height=48, matrix=k, coeffs=np.zeros(5))
        left = ext.CameraConfig(intr, Extrinsics.identity(), "cam", 0)
        right = ext.CameraConfig(
            intr, Extrinsics(np.eye(3), np.array([baseline, 0.0, 0.0])), "cam", 1
        )
        return [left, right]

    def test_right_camera_tx(self):
        cams = self._pair(baseline=0.12, fx=400.0)
        p = ext.projection_matrix(cams, 1)
        assert p[0, 3] == pytest.approx(-400.0 * 0.12)
        np.testing.assert_allclose(p[:3, :3], cams[1].intrinsics.matrix)

    def test_left_camera_no_tx(self):
        cams = self._pair()
        assert ext.projection_matrix(cams, 0)[0, 3] == 0.0

    def test_baseline_in_left_frame(self):
        # Rotated left camera: the x component must be measured in ITS frame.
        cams = self._pair(baseline=0.12, fx=400.0)
        rot = geometry.euler_xyz_extrinsic_to_matrix(0.0, 0.0, np.pi / 2)
        cams[0] = ext.CameraConfig(
            cams[0].intrinsics, Extrinsics(rot, np.zeros(3)), "cam", 0
        )
        cams[1] = ext.CameraConfig(
            cams[1].intrinsics, Extrinsics(rot, rot @ np.array([0.12, 0, 0])), "cam", 1
        )
        p = ext.projection_matrix(cams, 1)
        assert p[0, 3] == pytest.approx(-400.0 * 0.12)


class TestTfAndStamp:
    def test_optical_quaternion_is_flu_to_rdf(self):
        r = geometry.quat_to_matrix(ext.OPTICAL_FROM_CAMERA_QUAT)
        np.testing.assert_allclose(r, geometry.RDF_FROM_FLU[:3, :3], atol=1e-12)

    def test_camera_tf_pairs(self):
        cal = _calibration(1)
        cams = ext.extract_cameras(cal, 2)
        tfs = ext.camera_tf_list(cams)
        assert [t["child"] for t in tfs] == [
            "camera_0", "camera_0_optical_frame", "camera_1", "camera_1_optical_frame",
        ]
        assert all(t["parent"] == "base_link" for t in tfs[::2])

    def test_split_stamp_no_nanosecond_overflow(self):
        sec, nsec = ext.split_stamp(5.9999999999)
        assert (sec, nsec) == (6, 0)
        sec, nsec = ext.split_stamp(1.5)
        assert sec == 1 and abs(nsec - 500_000_000) <= 1


class TestImuSample:
    def test_batched_takes_newest(self):
        data = {
            "accelerometer": np.arange(9, dtype=float).reshape(3, 3),
            "gyroscope": np.arange(9, 18, dtype=float).reshape(3, 3),
        }
        acc, gyr = ext.latest_imu_sample(data)
        np.testing.assert_array_equal(acc, [6, 7, 8])
        np.testing.assert_array_equal(gyr, [15, 16, 17])

    def test_single_sample_and_missing(self):
        acc, gyr = ext.latest_imu_sample(
            {"accelerometer": [1.0, 2, 3], "gyroscope": [4.0, 5, 6]}
        )
        np.testing.assert_array_equal(acc, [1, 2, 3])
        assert ext.latest_imu_sample({"accelerometer": [1.0, 2, 3]}) is None
        assert (
            ext.latest_imu_sample(
                {"accelerometer": np.zeros((0, 3)), "gyroscope": np.zeros((0, 3))}
            )
            is None
        )


def test_module_imports_without_ros():
    """The adapter module must import with rclpy absent (HAVE_ROS gates
    the class; the wire-format functions stay usable)."""
    assert hasattr(ext, "HAVE_ROS")
    if not ext.HAVE_ROS:
        with pytest.raises(ImportError):
            ext.ExternalRosEngine()


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-v"])
