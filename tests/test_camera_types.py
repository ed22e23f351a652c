"""Semantics of the camera type vocabulary (reference parity: camera/types.py)."""

import numpy as np
import pytest

from thor_slam_tpu.camera.types import (
    CameraFrame,
    Extrinsics,
    FrameSet,
    IMUData,
    IMUExtrinsics,
    Intrinsics,
    IPv4,
    SynchronizedFrameSet,
)


class TestIPv4:
    def test_valid(self):
        assert IPv4("192.168.2.21").ip == "192.168.2.21"
        assert str(IPv4("10.0.0.1")) == "10.0.0.1"

    @pytest.mark.parametrize("bad", ["256.1.1.1", "1.2.3", "a.b.c.d", "1.2.3.4.5", ""])
    def test_invalid(self, bad):
        with pytest.raises(ValueError):
            IPv4(bad)

    def test_usable_as_dict_key(self):
        d = {IPv4("192.168.2.21"): 1}
        assert d["192.168.2.21"] == 1


class TestIntrinsics:
    def test_accessors(self):
        k = np.array([[500.0, 0, 320.0], [0, 510.0, 200.0], [0, 0, 1]])
        intr = Intrinsics(width=640, height=400, matrix=k, coeffs=np.zeros(5))
        assert (intr.fx, intr.fy, intr.cx, intr.cy) == (500.0, 510.0, 320.0, 200.0)

    def test_scaled(self):
        k = np.array([[500.0, 0, 320.0], [0, 500.0, 200.0], [0, 0, 1]])
        intr = Intrinsics(width=640, height=400, matrix=k, coeffs=np.zeros(5))
        half = intr.scaled(320, 200)
        assert half.width == 320 and half.height == 200
        np.testing.assert_allclose(half.matrix[0, 0], 250.0)
        np.testing.assert_allclose(half.matrix[1, 2], 100.0)
        np.testing.assert_allclose(half.matrix[2], [0, 0, 1])


class TestExtrinsics:
    def test_4x4_roundtrip(self):
        m = np.eye(4)
        m[:3, 3] = [1.0, 2.0, 3.0]
        ext = Extrinsics.from_4x4_matrix(m)
        np.testing.assert_array_equal(ext.translation, [1, 2, 3])
        np.testing.assert_array_equal(ext.to_4x4_matrix(), m)

    def test_rejects_bad_shape(self):
        with pytest.raises(ValueError):
            Extrinsics.from_4x4_matrix(np.eye(3))

    def test_compose_and_inverse(self):
        rng = np.random.default_rng(0)
        a = np.eye(4)
        a[:3, 3] = rng.normal(size=3)
        b = np.eye(4)
        b[:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
        b[:3, 3] = rng.normal(size=3)
        ea, eb = Extrinsics.from_4x4_matrix(a), Extrinsics.from_4x4_matrix(b)
        np.testing.assert_allclose(ea.compose(eb).to_4x4_matrix(), a @ b, atol=1e-12)
        np.testing.assert_allclose(
            ea.compose(ea.inverse()).to_4x4_matrix(), np.eye(4), atol=1e-12
        )

    def test_imu_extrinsics(self):
        imu = IMUExtrinsics(source_name="cam0", extrinsics=Extrinsics.identity())
        np.testing.assert_array_equal(imu.to_4x4_matrix(), np.eye(4))


class TestIMUData:
    def test_is_instantiable_sensor_data(self):
        """The reference's IMUData is annotation-only and broken (types.py:113-128);
        ours is a real dataclass."""
        d = IMUData(
            accelerometer=np.array([0.0, 0, 9.81]),
            gyroscope=np.zeros(3),
            timestamp=1.5,
            sequence_num=7,
        )
        assert d.get_timestamp() == 1.5
        assert d.get_sequence_num() == 7
        assert set(d.get_data()) == {"accelerometer", "gyroscope"}


def _frame(ts, name="c", seq=0):
    return CameraFrame(image=np.zeros((4, 4), np.uint8), timestamp=ts, sequence_num=seq, camera_name=name)


class TestFrameSet:
    def test_from_frames_reference_ts_is_first(self):
        fs = FrameSet.from_frames([_frame(1.0), _frame(1.2)], "src")
        assert fs.timestamp == 1.0
        assert fs.get_timestamps() == [1.0, 1.2]
        assert fs.get_max_timestamp() == 1.2
        assert fs.get_min_timestamp() == 1.0
        np.testing.assert_allclose(fs.get_timestamp_spread(), 0.2)

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            FrameSet.from_frames([], "src")


class TestSynchronizedFrameSet:
    def _make(self):
        fs_a = FrameSet.from_frames([_frame(1.0, "a0"), _frame(1.01, "a1")], "a")
        fs_b = FrameSet.from_frames([_frame(1.02, "b0")], "b")
        return SynchronizedFrameSet(timestamp=1.0, frame_sets={"a": fs_a, "b": fs_b}, max_time_delta=0.02)

    def test_flatten(self):
        s = self._make()
        assert len(s.get_all_frames()) == 3

    def test_per_source_access(self):
        s = self._make()
        assert len(s.get_frames_for_source("a")) == 2
        assert s.get_frames_for_source("nope") is None
        assert s.get_timestamp_for_frame("a", 1) == 1.01
        assert s.get_timestamp_for_frame("a", 5) is None
        assert s.get_timestamp_for_frame("zz", 0) is None
        assert s.get_all_timestamps() == {"a": [1.0, 1.01], "b": [1.02]}
