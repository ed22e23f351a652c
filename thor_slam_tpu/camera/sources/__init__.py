"""Concrete camera sources: synthetic, dataset replay, and hardware drivers."""

from thor_slam_tpu.camera.sources.dataset import (
    EurocCameraSource,
    RecordedCameraSource,
    record_frames,
)
from thor_slam_tpu.camera.sources.synthetic import (
    OrbitTrajectory,
    SyntheticCameraSource,
    SyntheticRigSpec,
    SyntheticWorld,
    make_synthetic_rig,
)

__all__ = [
    "EurocCameraSource",
    "OrbitTrajectory",
    "RecordedCameraSource",
    "SyntheticCameraSource",
    "SyntheticRigSpec",
    "SyntheticWorld",
    "make_synthetic_rig",
    "record_frames",
]
