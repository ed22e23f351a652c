"""Pipeline layer: bus, transfer, RGB-D product, config, profiling."""

import threading
import time

import numpy as np
import pytest

from thor_slam_tpu.camera.rig import CameraRig
from thor_slam_tpu.camera.sources.synthetic import (
    OrbitTrajectory,
    SyntheticCameraSource,
    SyntheticRigSpec,
    SyntheticWorld,
)
from thor_slam_tpu.pipeline.bus import MessageBus
from thor_slam_tpu.pipeline.rgbd import RGBDProcessor
from thor_slam_tpu.pipeline.transfer import DoubleBufferedUploader
from thor_slam_tpu.utils.config import RunConfig, load_config
from thor_slam_tpu.utils.profiling import PipelineStats, RateCounter


class TestBus:
    def test_pub_sub(self):
        bus = MessageBus()
        t = bus.topic("/a", queue_size=4)
        sub = t.subscribe()
        t.publish(1)
        t.publish(2)
        assert sub.get() == 1 and sub.get() == 2
        assert sub.try_get() is None

    def test_bounded_drop(self):
        bus = MessageBus()
        t = bus.topic("/a", queue_size=2)
        sub = t.subscribe()
        for i in range(5):
            t.publish(i)
        assert len(sub) == 2
        assert sub.dropped == 3
        assert sub.get() == 3  # oldest surviving

    def test_keep_latest_only(self):
        bus = MessageBus()
        t = bus.topic("/imu", keep_latest_only=True)
        sub = t.subscribe()
        for i in range(10):
            t.publish(i)
        assert sub.latest() == 9
        assert len(sub) == 1

    def test_callback_subscription(self):
        bus = MessageBus()
        t = bus.topic("/cb")
        got = []
        t.subscribe(callback=got.append)
        t.publish("x")
        assert got == ["x"]

    def test_blocking_get_across_threads(self):
        bus = MessageBus()
        t = bus.topic("/x")
        sub = t.subscribe()

        def later():
            time.sleep(0.05)
            t.publish(42)

        threading.Thread(target=later).start()
        assert sub.get(timeout=2.0) == 42

    def test_get_timeout(self):
        bus = MessageBus()
        sub = bus.topic("/y").subscribe()
        assert sub.get(timeout=0.05) is None


class TestUploader:
    def test_roundtrip(self):
        up = DoubleBufferedUploader(stage_fn=lambda x: x)
        a = np.ones((4, 4), np.float32)
        up.submit(a)
        out = np.asarray(up.get())
        np.testing.assert_array_equal(out, a)
        up.close()

    def test_uint8_ships_unconverted(self):
        # uint8 must arrive on device AS uint8: the jitted consumer
        # normalizes on device (4x smaller host->device transfer).
        up = DoubleBufferedUploader(stage_fn=lambda x: x)
        up.submit(np.full((2, 2), 255, np.uint8))
        out = up.get()
        assert out.dtype == np.uint8
        np.testing.assert_array_equal(np.asarray(out), 255)
        up.close()

    def test_pipelining_order(self):
        up = DoubleBufferedUploader(stage_fn=lambda x: np.asarray([x], np.float32))
        for i in range(5):
            up.submit(float(i))
            assert float(np.asarray(up.get())[0]) == float(i)
        up.close()

    def test_get_before_submit_raises(self):
        up = DoubleBufferedUploader(stage_fn=lambda x: x)
        with pytest.raises(RuntimeError):
            up.get()
        up.close()


class TestRGBD:
    @pytest.mark.slow
    def test_product_stream(self):
        spec = SyntheticRigSpec(
            num_sources=1, stereo=True, width=160, height=120, baseline_m=0.3
        )
        world = SyntheticWorld(half_extents=(2.5, 2.5, 1.5))
        src = SyntheticCameraSource(
            "cam0", world, OrbitTrajectory(radius=1.0), np.eye(4), spec
        )
        rig = CameraRig([src])
        rig.start()
        sync = rig.get_synchronized_frames()
        proc = RGBDProcessor("cam0", src.get_intrinsics(), src.get_extrinsics())
        frame = proc.process(sync)
        rig.stop()

        assert frame is not None
        assert frame.depth_mm.dtype == np.uint16
        assert frame.rgb.dtype == np.uint8
        assert frame.depth_mm.shape == (120, 160)
        valid = frame.depth_mm > 0
        assert valid.mean() > 0.2
        # Depth should be room-scale: 0.3..6 m.
        d = frame.depth_mm[valid] / 1000.0
        assert 0.2 < np.median(d) < 6.0
        assert frame.intrinsics.width == 160

    @pytest.mark.slow
    def test_fetchless_product_device_resident(self):
        """process(fetch=False) returns device arrays that never synced;
        fetched() matches the fetch=True product bitwise."""
        import jax

        spec = SyntheticRigSpec(
            num_sources=1, stereo=True, width=160, height=120, baseline_m=0.3
        )
        world = SyntheticWorld(half_extents=(2.5, 2.5, 1.5))
        src = SyntheticCameraSource(
            "cam0", world, OrbitTrajectory(radius=1.0), np.eye(4), spec
        )
        rig = CameraRig([src])
        rig.start()
        sync = rig.get_synchronized_frames()
        proc = RGBDProcessor("cam0", src.get_intrinsics(), src.get_extrinsics())
        host = proc.process(sync)  # warms the compile outside the guard
        with jax.transfer_guard_device_to_host("disallow"):
            dev = proc.process(sync, fetch=False)
        rig.stop()
        assert dev.device_resident and not host.device_resident
        back = dev.fetched()
        np.testing.assert_array_equal(back.depth_mm, host.depth_mm)
        np.testing.assert_array_equal(back.rgb, host.rgb)

    @pytest.mark.slow
    def test_independent_output_resolution(self):
        spec = SyntheticRigSpec(
            num_sources=1, stereo=True, width=160, height=120, baseline_m=0.3
        )
        world = SyntheticWorld(half_extents=(2.5, 2.5, 1.5))
        src = SyntheticCameraSource(
            "cam0", world, OrbitTrajectory(radius=1.0), np.eye(4), spec
        )
        rig = CameraRig([src])
        rig.start()
        sync = rig.get_synchronized_frames()
        proc = RGBDProcessor(
            "cam0", src.get_intrinsics(), src.get_extrinsics(), output_resolution=(80, 60)
        )
        frame = proc.process(sync)
        rig.stop()
        assert frame.depth_mm.shape == (60, 80)
        assert frame.intrinsics.width == 80
        # Intrinsics scaled with the resolution.
        assert frame.intrinsics.fx == pytest.approx(proc._sr.fx * 0.5)

    def test_missing_camera_returns_none(self):
        spec = SyntheticRigSpec(num_sources=1, stereo=True, width=64, height=48)
        src = SyntheticCameraSource(
            "cam0", SyntheticWorld(), OrbitTrajectory(), np.eye(4), spec, render=False
        )
        rig = CameraRig([src])
        rig.start()
        sync = rig.get_synchronized_frames()
        rig.stop()
        proc = RGBDProcessor("cam0", src.get_intrinsics(), src.get_extrinsics())
        sync.frame_sets.pop("cam0")
        assert proc.process(sync) is None


class TestConfig:
    def test_defaults(self):
        cfg = RunConfig()
        assert cfg.fps == 30.0
        assert cfg.num_cameras == 0
        assert cfg.rgbd_camera_ips() == []

    def test_yaml_roundtrip(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text(
            """
cameras:
  - ip: "192.168.2.21"
    stereo: true
    resolution: [640, 400]
    enable_rgbd: true
  - ip: "192.168.2.22"
    stereo: false
fps: 15
rig_queue_size: 20
nvblox_cameras: ["192.168.2.21"]
backend:
  max_keypoints: 256
  enable_ba: true
  pipelined: false
synthetic:
  enabled: true
  num_cameras: 2
"""
        )
        cfg = load_config(p)
        assert len(cfg.cameras) == 2
        assert cfg.num_cameras == 3  # stereo(2) + mono(1)
        assert cfg.cameras[0].resolution == (640, 400)
        assert cfg.fps == 15
        assert cfg.rgbd_camera_ips() == ["192.168.2.21"]
        assert cfg.backend.max_keypoints == 256
        assert cfg.backend.enable_ba
        assert not cfg.backend.pipelined
        assert cfg.synthetic.enabled and cfg.synthetic.num_cameras == 2

    def test_rgbd_fallback_to_flags(self):
        cfg = RunConfig.from_dict(
            {"cameras": [{"ip": "1.2.3.4", "enable_rgbd": True}, {"ip": "1.2.3.5"}]}
        )
        assert cfg.rgbd_camera_ips() == ["1.2.3.4"]

    def test_repo_config_loads(self):
        cfg = load_config("config/slam_config.yaml")
        assert cfg.num_cameras >= 2
        assert cfg.backend.max_keypoints == 512
        # The shipped config runs the reference's async-pose semantics.
        assert cfg.backend.pipelined


class TestRosBridgeHelpers:
    """Pure parts of the ROS edge (no rclpy needed)."""

    def test_pack_xyz_cloud_layout_and_frame(self):
        from thor_slam_tpu import geometry
        from thor_slam_tpu.slam.adapters.ros_bridge import pack_xyz_cloud

        pts = np.array([[1.0, 2.0, 3.0], [-0.5, 0.25, 4.0]])
        data, step, count = pack_xyz_cloud(pts)
        assert (step, count) == (12, 2)
        assert len(data) == step * count
        unpacked = np.frombuffer(data, np.float32).reshape(-1, 3)
        expected = pts @ geometry.FLU_FROM_RDF[:3, :3].T
        np.testing.assert_allclose(unpacked, expected.astype(np.float32))

    def test_pack_xyz_cloud_empty(self):
        from thor_slam_tpu.slam.adapters.ros_bridge import pack_xyz_cloud

        data, step, count = pack_xyz_cloud(np.zeros((0, 3)))
        assert count == 0 and data == b""


class TestProfiling:
    def test_rate_counter(self):
        rc = RateCounter()
        for i in range(10):
            rc.tick(t=i * 0.1)
        assert rc.rate_hz == pytest.approx(10.0, rel=0.01)

    def test_stage_timer_and_status(self):
        stats = PipelineStats()
        with stats.stage("track").time():
            time.sleep(0.01)
        line = stats.status_line(5)
        assert "track=" in line and "FPS" in line
        snap = stats.snapshot(5)
        assert snap["frame"] == 5 and "track" in snap["stages_ms"]


class TestConfigErrors:
    """Operator typos produce ConfigError with the file and field named."""

    def _write(self, tmp_path, text):
        p = tmp_path / "cfg.yaml"
        p.write_text(text)
        return p

    def test_invalid_ip(self, tmp_path):
        from thor_slam_tpu.utils.config import ConfigError

        p = self._write(tmp_path, "cameras: [{ip: notanip}]\n")
        with pytest.raises(ConfigError, match="invalid ip 'notanip'"):
            load_config(p)

    def test_missing_ip(self, tmp_path):
        from thor_slam_tpu.utils.config import ConfigError

        p = self._write(tmp_path, "cameras: [{stereo: true}]\n")
        with pytest.raises(ConfigError, match="missing required key 'ip'"):
            load_config(p)

    def test_bad_scalar(self, tmp_path):
        from thor_slam_tpu.utils.config import ConfigError

        p = self._write(tmp_path, 'fps: "fast"\n')
        with pytest.raises(ConfigError, match="fast"):
            load_config(p)

    def test_not_yaml(self, tmp_path):
        from thor_slam_tpu.utils.config import ConfigError

        p = self._write(tmp_path, "cameras: [unclosed\n")
        with pytest.raises(ConfigError, match="not valid YAML"):
            load_config(p)

    def test_non_mapping_top_level(self, tmp_path):
        from thor_slam_tpu.utils.config import ConfigError

        p = self._write(tmp_path, "- just\n- a\n- list\n")
        with pytest.raises(ConfigError, match="must be a mapping"):
            load_config(p)


class TestColorAlignedRGBD:
    """Color RGB-D at independent resolutions: the nvblox feed the
    reference produces with CAM_A + ASIC depth alignment (reference
    luxonis.py:464-549, run_pipeline.py:138-148)."""

    def _make_source(self, color_res=(96, 64)):
        spec = SyntheticRigSpec(
            num_sources=1, stereo=True, width=160, height=120, baseline_m=0.3,
            color_camera=True, color_resolution=color_res,
        )
        world = SyntheticWorld(half_extents=(2.5, 2.5, 1.5))
        return SyntheticCameraSource(
            "cam0", world, OrbitTrajectory(radius=1.0), np.eye(4), spec
        )

    @pytest.mark.slow
    def test_color_frame_and_independent_resolution(self):
        src = self._make_source(color_res=(96, 64))
        rig = CameraRig([src])
        rig.start()
        sync = rig.get_synchronized_frames()
        color = src.try_get_latest_rgb_frame()
        assert color is not None and color.image.shape == (64, 96, 3)

        proc = RGBDProcessor(
            "cam0", src.get_intrinsics(), src.get_extrinsics(),
            color_intrinsics=src.get_rgb_intrinsics(),
            left_t_color=src.get_rgb_extrinsics().to_4x4_matrix(),
        )
        assert proc.color_mode
        frame = proc.process(sync, color_frame=color)
        rig.stop()

        assert frame is not None
        # SLAM stream is 160x120; the RGB-D product is 96x64 COLOR rgb8.
        assert frame.rgb.shape == (64, 96, 3) and frame.rgb.dtype == np.uint8
        assert frame.depth_mm.shape == (64, 96)
        assert frame.intrinsics.width == 96 and frame.intrinsics.height == 64
        assert frame.timestamp == color.timestamp
        assert (frame.depth_mm > 0).mean() > 0.2

    @pytest.mark.slow
    def test_aligned_depth_matches_ground_truth(self):
        """Aligned depth must agree with the analytic depth along the
        COLOR camera's own rays (not the left camera's)."""
        src = self._make_source(color_res=(160, 120))
        rig = CameraRig([src])
        rig.start()
        sync = rig.get_synchronized_frames()
        color = src.try_get_latest_rgb_frame()
        proc = RGBDProcessor(
            "cam0", src.get_intrinsics(), src.get_extrinsics(),
            color_intrinsics=src.get_rgb_intrinsics(),
            left_t_color=src.get_rgb_extrinsics().to_4x4_matrix(),
        )
        frame = proc.process(sync, color_frame=color)
        rig.stop()

        gt = src.render_color_depth(0)  # (H, W) meters along color rays
        est = frame.depth_mm.astype(np.float64) / 1000.0
        valid = (est > 0) & (gt > 0.2) & (gt < 8.0)
        assert valid.mean() > 0.3
        err = np.abs(est[valid] - gt[valid])
        med = np.median(err)
        rel = np.median(err / gt[valid])
        assert rel < 0.05, f"median relative depth error {rel:.3f} (abs {med:.3f} m)"

    def test_grayscale_mode_unchanged_without_color(self):
        src = self._make_source()
        proc = RGBDProcessor("cam0", src.get_intrinsics(), src.get_extrinsics())
        assert not proc.color_mode
