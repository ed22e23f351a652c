"""SLAM engine layer: engine-agnostic interface plus concrete engines."""

from thor_slam_tpu.slam.interface import (
    CameraConfig,
    MapPoint,
    SlamConfig,
    SlamEngine,
    SlamMap,
    SlamPose,
    TrackingState,
)

__all__ = [
    "CameraConfig",
    "MapPoint",
    "SlamConfig",
    "SlamEngine",
    "SlamMap",
    "SlamPose",
    "TrackingState",
]
