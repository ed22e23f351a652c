"""SLAM runner: config -> sources -> rig -> TpuSlamEngine -> pose stream.

The counterpart of the reference's primary entry point (reference
scripts/run_slam.py): loads the YAML config, builds camera sources
(synthetic by default — no hardware needed; Luxonis when depthai is
installed and the config lists real IPs), loads URDF rig extrinsics,
applies the IMU DRB->RDF convention fix for OAK-D Pro hardware (reference
run_slam.py:254-276), and runs the tracking hot loop with the same
status-line UX.

Usage:
    python -m scripts.run_slam --config config/slam_config.yaml
    python -m scripts.run_slam --synthetic --frames 120
"""

from __future__ import annotations

import argparse
import logging
import signal
import sys
import time

import numpy as np

logger = logging.getLogger("run_slam")

_shutdown = False


def _handle_signal(signum, frame):
    global _shutdown
    _shutdown = True


def build_synthetic_sources(cfg):
    """Hardware-free rig from the config's synthetic section."""
    from thor_slam_tpu.camera.sources.synthetic import (
        OrbitTrajectory,
        SyntheticRigSpec,
        SyntheticWorld,
        make_synthetic_rig,
    )

    syn = cfg.synthetic
    spec = SyntheticRigSpec(
        num_sources=syn.num_cameras,
        stereo=True,
        width=syn.resolution[0],
        height=syn.resolution[1],
        baseline_m=syn.baseline_m,
        fps=cfg.fps,
        imu_rate_hz=cfg.imu_report_rate,
        color_camera=syn.color_camera,
        color_resolution=syn.color_resolution,
    )
    world = SyntheticWorld(half_extents=syn.room_half_extents)
    traj = OrbitTrajectory(radius=syn.trajectory_radius)
    sources, rig_ext, _, _ = make_synthetic_rig(spec, world=world, trajectory=traj)
    return sources, rig_ext


def build_hardware_sources(cfg):
    """Luxonis OAK sources from the config's camera list (requires depthai)."""
    from thor_slam_tpu import geometry
    from thor_slam_tpu.camera.sources.luxonis import LuxonisCameraConfig, LuxonisCameraSource
    from thor_slam_tpu.camera.types import Extrinsics, IMUExtrinsics, IPv4
    from thor_slam_tpu.camera.utils import load_rig_extrinsics_from_urdf

    from thor_slam_tpu.camera.sources.luxonis import LuxonisRGBDCameraConfig

    rgbd_ips = set(cfg.rgbd_camera_ips())
    sources = []
    for i, cam in enumerate(cfg.cameras):
        # RGB-D cameras get the CAM_A color leg at its own (sensor, output)
        # resolutions — independent of the SLAM stream (reference
        # run_pipeline.py:138-148, luxonis.py:92-115).
        rgbd = None
        if cam.ip in rgbd_ips and cam.stereo:
            rgbd = LuxonisRGBDCameraConfig(
                rgb_sensor_resolution=cam.rgb_sensor_resolution,
                rgb_output_resolution=cam.rgb_output_resolution,
            )
        lux_cfg = LuxonisCameraConfig(
            ip=IPv4(cam.ip),
            fps=cfg.fps,
            stereo=cam.stereo,
            sensor_type=cam.sensor_type,
            resolution=cam.resolution,
            output_resolution=cam.output_resolution,
            queue_size=cfg.queue_size,
            read_imu=(i == 0),  # IMU from the first camera (reference run_slam.py:160)
            imu_report_rate=cfg.imu_report_rate,
            rgbd=rgbd,
        )
        sources.append(LuxonisCameraSource(lux_cfg))

    rig_ext = {}
    imu_ext = None
    if cfg.urdf_path:
        camera_map = {c.ip: f"link_Camera_{i + 1}" for i, c in enumerate(cfg.cameras)}
        rig_ext = load_rig_extrinsics_from_urdf(cfg.urdf_path, camera_map)

    # IMU extrinsics: sensor frame is DRB on OAK-D Pro -> convert to RDF and
    # compose into the rig frame (reference run_slam.py:254-276).
    imu_src = sources[0]
    sensor_ext = imu_src.get_sensor_extrinsics()
    if sensor_ext is not None:
        imu_rdf = geometry.DRB_TO_RDF_MATRIX @ sensor_ext.to_4x4_matrix()
        base = rig_ext.get(cfg.cameras[0].ip)
        world_imu = (base.to_4x4_matrix() @ imu_rdf) if base else imu_rdf
        imu_ext = IMUExtrinsics(
            source_name=cfg.cameras[0].ip, extrinsics=Extrinsics.from_4x4_matrix(world_imu)
        )
    return sources, rig_ext, imu_ext


def _display_frames(sync) -> None:
    """Per-camera OpenCV windows (reference run_slam.py:331-347); no-op on
    headless hosts."""
    try:
        import cv2
    except ImportError:
        return
    try:
        for name, fs in sync.frame_sets.items():
            cv2.imshow(name, fs.frames[0].image)
        cv2.waitKey(1)
    except cv2.error:  # headless build / no display
        pass


def run(
    cfg,
    max_frames: int | None = None,
    save_map_path: str | None = None,
    use_ros: bool = False,
) -> int:
    from thor_slam_tpu.camera.rig import CameraRig
    from thor_slam_tpu.engine.tpu_engine import TpuSlamEngine
    from thor_slam_tpu.pipeline.bus import MessageBus
    from thor_slam_tpu.slam.interface import SlamConfig
    from thor_slam_tpu.utils.profiling import PipelineStats

    imu_ext = None
    if cfg.synthetic.enabled or not cfg.cameras:
        sources, rig_ext = build_synthetic_sources(cfg)
    else:
        try:
            sources, rig_ext, imu_ext = build_hardware_sources(cfg)
        except ImportError as e:  # depthai absent: say so, don't traceback
            logger.error("%s", e)
            return 2

    bus = MessageBus()
    pose_topic = bus.topic("/slam/pose", queue_size=30)
    stats = PipelineStats()

    ros_bridge = None
    if use_ros:
        from thor_slam_tpu.slam.adapters.ros_bridge import HAVE_ROS, RosBridge

        if not HAVE_ROS:
            logger.error("--ros requested but rclpy is not installed")
            return 2
        ros_bridge = RosBridge()

    engine = TpuSlamEngine(
        params=dict(max_keypoints=cfg.backend.max_keypoints, **cfg.backend.tracker),
        enable_ba=cfg.backend.enable_ba,
        use_imu=cfg.backend.use_imu,
        use_accel=cfg.backend.use_accel,
        prewarm_degraded=cfg.watchdog_timeout_s is not None,
        pipelined=cfg.backend.pipelined,
        pipeline_depth=cfg.backend.pipeline_depth,
        devices=cfg.backend.devices,
        light_ticks=cfg.backend.light_ticks,
        light_half_res=cfg.backend.light_half_res,
        adaptive_half_res=cfg.backend.adaptive_half_res,
        imu_noise=cfg.backend.imu_noise,
    )
    rig = CameraRig(
        sources,
        queue_size=cfg.rig_queue_size,
        rig_extrinsics=rig_ext,
        imu_extrinsics=imu_ext,
        imu_source=sources[0].name if sources[0].has_sensor_data else None,
        watchdog_timeout_s=cfg.watchdog_timeout_s,
    )

    frame_count = 0
    try:
        rig.start()
        logger.info("Initializing engine (jit warm-up)...")
        engine.initialize(rig.calibration, SlamConfig(num_cameras=cfg.num_cameras, expected_fps=cfg.fps))

        last_status = time.monotonic()
        while not _shutdown and (max_frames is None or frame_count < max_frames):
            with stats.stage("sync").time():
                sync = rig.get_synchronized_frames()
            if sync is None:
                time.sleep(0.001)
                continue
            with stats.stage("track").time():
                pose = engine.process_frames(sync)
            frame_count += 1
            stats.fps.tick()
            stats.max_time_delta_ms = sync.max_time_delta * 1000.0
            stats.tracking_state = engine.get_tracking_state().name
            stats.num_inliers = engine.last_diagnostics.get("num_inliers", 0)
            if pose is not None:
                pose_topic.publish(pose)
                if ros_bridge is not None:
                    ros_bridge.publish_pose(pose)
                    ros_bridge.publish_map_tf(engine.map_t_odom, pose.timestamp)

            if cfg.display:
                _display_frames(sync)

            now = time.monotonic()
            if now - last_status >= 2.0:  # reference cadence (run_slam.py:349)
                print(stats.status_line(frame_count), flush=True)
                last_status = now
                if ros_bridge is not None and pose is not None:
                    # RViz parity: cuVSLAM's landmark/observation clouds
                    # (reference config/thor_visual_slam.rviz:78,110) at
                    # status cadence — the map changes at keyframe rate.
                    ros_bridge.publish_observations(
                        engine.get_map().to_point_cloud(), pose.timestamp
                    )
                    ros_bridge.publish_landmarks(
                        engine.get_landmark_cloud(), pose.timestamp
                    )
    finally:
        rig.stop()
        final = engine.flush()  # finalize the in-flight pipelined tick
        if final is not None:
            pose_topic.publish(final)
        if save_map_path:
            ok = engine.save_map(save_map_path)
            logger.info("Map save to %s: %s", save_map_path, "ok" if ok else "FAILED")
        m = engine.get_map()
        print(
            f"Done: {frame_count} frames | map: {len(m.points)} points, "
            f"{len(m.keyframe_poses)} keyframes",
            flush=True,
        )
        engine.shutdown()
        if ros_bridge is not None:
            ros_bridge.shutdown()
    return 0


def main() -> int:
    from thor_slam_tpu.utils.config import RunConfig, load_config

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default=None, help="YAML config path")
    parser.add_argument("--synthetic", action="store_true", help="Force the synthetic rig")
    parser.add_argument("--frames", type=int, default=None, help="Stop after N frames")
    parser.add_argument("--save-map", default=None, help="Save the map on exit (npz)")
    parser.add_argument(
        "--ros", action="store_true",
        help="Publish odometry/TF to ROS 2 (requires rclpy; reference topics)",
    )
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(name)s: %(message)s")

    # Fail fast on operator mistakes before the (slow) JAX bring-up.
    if args.ros:
        from thor_slam_tpu.slam.adapters.ros_bridge import HAVE_ROS

        if not HAVE_ROS:
            logger.error("--ros requested but rclpy is not installed")
            return 2
    from thor_slam_tpu.utils.config import ConfigError

    try:
        cfg = load_config(args.config) if args.config else RunConfig()
    except (ConfigError, FileNotFoundError) as e:
        logger.error("%s", e)
        return 2
    if args.synthetic:
        cfg.synthetic.enabled = True

    from thor_slam_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    signal.signal(signal.SIGINT, _handle_signal)
    signal.signal(signal.SIGTERM, _handle_signal)
    return run(cfg, max_frames=args.frames, save_map_path=args.save_map, use_ros=args.ros)


if __name__ == "__main__":
    sys.exit(main())
