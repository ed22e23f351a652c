"""Exact synchronization semantics of CameraRig.

The algorithm under test is the reference's contract (reference rig.py:358-415):
reference timestamp = slowest camera's newest frame; per source pick the
queued set closest to it; attach the closest IMU sample; report the worst
deviation as max_time_delta. Synthetic sources with controlled clock offsets
make every expectation computable in closed form.
"""

import numpy as np
import pytest

from thor_slam_tpu.camera.rig import CameraRig, stack_synchronized_images
from thor_slam_tpu.camera.sources.synthetic import (
    OrbitTrajectory,
    SyntheticCameraSource,
    SyntheticRigSpec,
    SyntheticWorld,
)
from thor_slam_tpu.camera.types import Extrinsics, IMUExtrinsics


def make_sources(offsets, fps=10.0, stereo=False, imu_first=False, render=False):
    spec = SyntheticRigSpec(
        num_sources=len(offsets), stereo=stereo, width=32, height=24, fps=fps, imu_rate_hz=100.0
    )
    world = SyntheticWorld()
    traj = OrbitTrajectory()
    return [
        SyntheticCameraSource(
            name=f"cam{i}",
            world=world,
            trajectory=traj,
            rig_t_source=np.eye(4),
            spec=spec,
            clock_offset=off,
            emit_imu=(imu_first and i == 0),
            render=render,
        )
        for i, off in enumerate(offsets)
    ]


class TestSyncAlgorithm:
    def test_none_before_start(self):
        rig = CameraRig(make_sources([0.0, 0.0]))
        assert rig.get_synchronized_frames() is None
        assert rig.get_latest_frames() is None

    def test_reference_is_slowest_cameras_newest(self):
        # cam1 lags cam0 by 40 ms: its newest frame defines the reference.
        offsets = [0.0, -0.04]
        with CameraRig(make_sources(offsets, fps=10.0)) as rig:
            for _ in range(5):
                sync = rig.get_synchronized_frames()
            assert sync is not None
            # After n polls, source i's newest timestamp is (n-1)/fps + offset_i.
            n = 5
            newest = [(n - 1) / 10.0 + off for off in offsets]
            assert sync.timestamp == pytest.approx(min(newest), abs=1e-9)

    def test_picks_closest_frame_per_source(self):
        offsets = [0.0, 0.033]  # cam1 offset by a third of a frame
        with CameraRig(make_sources(offsets, fps=10.0)) as rig:
            for _ in range(6):
                sync = rig.get_synchronized_frames()
            assert sync is not None
            ref = sync.timestamp
            for name, fs in sync.frame_sets.items():
                # No queued frame of this source may be closer than the pick.
                src_offset = offsets[int(name[-1])]
                all_ts = [k / 10.0 + src_offset for k in range(6)]
                best = min(all_ts, key=lambda t: abs(t - ref))
                assert fs.timestamp == pytest.approx(best, abs=1e-9)

    def test_max_time_delta(self):
        offsets = [0.0, 0.02]
        with CameraRig(make_sources(offsets, fps=10.0)) as rig:
            for _ in range(4):
                sync = rig.get_synchronized_frames()
            assert sync is not None
            deltas = [abs(fs.timestamp - sync.timestamp) for fs in sync.frame_sets.values()]
            assert sync.max_time_delta == pytest.approx(max(deltas), abs=1e-12)
            assert sync.max_time_delta <= 0.02 + 1e-9

    def test_imu_attached_and_closest(self):
        with CameraRig(make_sources([0.0, 0.0], imu_first=True), imu_source="cam0") as rig:
            sync = None
            for _ in range(8):
                sync = rig.get_synchronized_frames()
            assert sync is not None
            assert sync.sensor_data is not None
            assert sync.sensor_timestamp is not None
            # Batched IMU payload: [N, 3] arrays plus per-sample timestamps.
            assert sync.sensor_data["accelerometer"].ndim == 2
            assert sync.sensor_data["accelerometer"].shape[1] == 3
            assert sync.sensor_data["gyroscope"].shape == sync.sensor_data["accelerometer"].shape

    def test_requires_all_sources(self):
        sources = make_sources([0.0, 0.0])
        rig = CameraRig(sources)
        rig.start()
        # Manually enqueue only one source's frames.
        frames = sources[0].get_latest_frames()
        from thor_slam_tpu.camera.types import FrameSet

        rig._frame_queues["cam0"].append(FrameSet.from_frames(frames, "cam0"))
        assert rig._get_reference_timestamp() is None
        rig.stop()

    def test_stereo_frame_sets(self):
        with CameraRig(make_sources([0.0], stereo=True)) as rig:
            sync = rig.get_synchronized_frames()
            assert sync is not None
            assert len(sync.frame_sets["cam0"].frames) == 2


class TestLatestFrames:
    def test_latest_uses_newest_reference(self):
        offsets = [0.0, -0.04]
        with CameraRig(make_sources(offsets, fps=10.0)) as rig:
            for _ in range(3):
                latest = rig.get_latest_frames()
            assert latest is not None
            newest = [(3 - 1) / 10.0 + off for off in offsets]
            assert latest.timestamp == pytest.approx(max(newest), abs=1e-9)
            assert latest.max_time_delta == pytest.approx(max(newest) - min(newest), abs=1e-9)


class TestQueueManagement:
    def test_depths_and_clear(self):
        with CameraRig(make_sources([0.0, 0.0]), queue_size=5) as rig:
            for _ in range(8):
                rig.get_synchronized_frames()
            depths = rig.get_queue_depths()
            assert all(d == 5 for d in depths.values())  # bounded by queue_size
            rig.clear_queues()
            assert all(d == 0 for d in rig.get_queue_depths().values())

    def test_prune_old_frames(self):
        with CameraRig(make_sources([0.0, 0.0], fps=10.0), queue_size=50) as rig:
            for _ in range(20):
                rig.get_synchronized_frames()
            # Newest ts = 1.9 s; cutoff 1.9 - 0.5 => frames older than 1.4 s go.
            pruned = rig.prune_old_frames(max_age_seconds=0.5)
            assert pruned > 0
            for q in rig._frame_queues.values():
                assert all(fs.timestamp >= 1.9 - 0.5 - 1e-9 for fs in q)

    def test_duplicate_names_rejected(self):
        srcs = make_sources([0.0])
        with pytest.raises(ValueError):
            CameraRig([srcs[0], srcs[0]])

    def test_imu_source_validation(self):
        with pytest.raises(ValueError, match="not found"):
            CameraRig(make_sources([0.0]), imu_source="nope")
        with pytest.raises(ValueError, match="sensor data"):
            CameraRig(make_sources([0.0]), imu_source="cam0")  # IMU not enabled


class TestCalibration:
    def test_world_extrinsics_composition_order(self):
        """world_T_cam = rig_T_source @ source_T_cam (reference rig.py:35-70)."""
        sources = make_sources([0.0], stereo=True)
        rig_t_source = np.eye(4)
        rig_t_source[:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
        rig_t_source[:3, 3] = [1.0, 2.0, 3.0]
        rig = CameraRig(sources, rig_extrinsics={"cam0": Extrinsics.from_4x4_matrix(rig_t_source)})
        world_exts = rig.get_world_extrinsics("cam0")
        cam_exts = sources[0].get_extrinsics()
        for w, c in zip(world_exts, cam_exts):
            np.testing.assert_allclose(
                w.to_4x4_matrix(), rig_t_source @ c.to_4x4_matrix(), atol=1e-12
            )

    def test_missing_rig_extrinsics_passthrough(self):
        sources = make_sources([0.0])
        rig = CameraRig(sources)
        cal = rig.calibration
        del cal.rig_extrinsics["cam0"]
        world = cal.get_world_extrinsics("cam0")
        # Passthrough: camera extrinsics returned unchanged.
        np.testing.assert_array_equal(
            world[0].to_4x4_matrix(), sources[0].get_extrinsics()[0].to_4x4_matrix()
        )
        assert cal.get_world_extrinsics("unknown") is None

    def test_load_rig_extrinsics(self):
        rig = CameraRig(make_sources([0.0, 0.0]))
        new = Extrinsics.from_4x4_matrix(np.diag([1.0, 1, 1, 1]))
        new.translation = np.array([5.0, 0, 0])
        rig.load_rig_extrinsics({"cam0": new})
        np.testing.assert_array_equal(rig.get_rig_extrinsics("cam0").translation, [5, 0, 0])
        with pytest.raises(ValueError):
            rig.load_rig_extrinsics({"bogus": new})

    def test_imu_extrinsics_defaults(self):
        rig = CameraRig(make_sources([0.0]))
        assert rig.calibration.imu_extrinsics is not None
        np.testing.assert_array_equal(rig.calibration.imu_extrinsics.to_4x4_matrix(), np.eye(4))

    def test_custom_imu_extrinsics_kept(self):
        m = np.eye(4)
        m[:3, 3] = [0.1, 0.2, 0.3]
        imu_ext = IMUExtrinsics(source_name="cam0", extrinsics=Extrinsics.from_4x4_matrix(m))
        rig = CameraRig(make_sources([0.0]), imu_extrinsics=imu_ext)
        np.testing.assert_array_equal(rig.calibration.imu_extrinsics.to_4x4_matrix(), m)


class TestStacking:
    def test_stack_synchronized_images(self):
        with CameraRig(make_sources([0.0, 0.0], stereo=True)) as rig:
            sync = rig.get_synchronized_frames()
            arr = stack_synchronized_images(sync)
            assert arr.shape == (2, 2, 24, 32)
            assert arr.dtype == np.uint8


class TestClockAgreementGuard:
    """Bring-up guard: frame and IMU timestamps must share a clock.

    A driver stamping frames with device time but IMU with host time (or
    vice versa) produces a constant multi-second skew; downstream every
    IMU preintegration window is empty and fusion silently dies. The rig
    measures the skew at the first poll that sees both streams.
    """

    def _rig_with_imu_offset(self, imu_offset, **rig_kw):
        spec = SyntheticRigSpec(num_sources=1, stereo=False, width=32, height=24,
                                fps=10.0, imu_rate_hz=100.0)
        src = SyntheticCameraSource(
            name="cam0", world=SyntheticWorld(), trajectory=OrbitTrajectory(),
            rig_t_source=np.eye(4), spec=spec, emit_imu=True, render=False,
            imu_clock_offset=imu_offset,
        )
        return CameraRig([src], imu_source="cam0", **rig_kw)

    def test_agreeing_clocks_measure_small_skew(self):
        with self._rig_with_imu_offset(None) as rig:
            for _ in range(3):
                rig.get_synchronized_frames()
            assert rig.clock_skew_s is not None
            assert rig.clock_skew_s < 0.2  # within one frame/IMU period

    def test_skewed_imu_clock_flagged(self, caplog):
        import logging

        with self._rig_with_imu_offset(1000.0) as rig:
            with caplog.at_level(logging.ERROR, logger="thor_slam_tpu.camera.rig"):
                for _ in range(3):
                    rig.get_synchronized_frames()
            assert rig.clock_skew_s == pytest.approx(1000.0, abs=1.0)
            assert any("clock disagreement" in r.message for r in caplog.records)

    def test_guard_is_one_shot(self):
        with self._rig_with_imu_offset(1000.0) as rig:
            for _ in range(2):
                rig.get_synchronized_frames()
            first = rig.clock_skew_s
            for _ in range(3):
                rig.get_synchronized_frames()
            assert rig.clock_skew_s == first  # measured once, at bring-up

    def test_no_imu_source_never_measures(self):
        with CameraRig(make_sources([0.0])) as rig:
            for _ in range(3):
                rig.get_synchronized_frames()
            assert rig.clock_skew_s is None
