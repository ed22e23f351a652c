"""Camera acquisition layer: types, sources, rig synchronization."""

from thor_slam_tpu.camera.rig import CameraRig, RigCalibration
from thor_slam_tpu.camera.types import (
    CameraFrame,
    CameraSensorType,
    CameraSource,
    Extrinsics,
    FrameSet,
    IMUData,
    IMUExtrinsics,
    Intrinsics,
    IPv4,
    SensorData,
    SynchronizedFrameSet,
)

__all__ = [
    "CameraFrame",
    "CameraRig",
    "CameraSensorType",
    "CameraSource",
    "Extrinsics",
    "FrameSet",
    "IMUData",
    "IMUExtrinsics",
    "IPv4",
    "Intrinsics",
    "RigCalibration",
    "SensorData",
    "SynchronizedFrameSet",
]
