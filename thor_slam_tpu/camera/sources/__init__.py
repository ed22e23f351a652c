"""Concrete camera sources: synthetic, dataset replay, and hardware drivers."""

from thor_slam_tpu.camera.sources.synthetic import (
    OrbitTrajectory,
    SyntheticCameraSource,
    SyntheticRigSpec,
    SyntheticWorld,
    make_synthetic_rig,
)

__all__ = [
    "OrbitTrajectory",
    "SyntheticCameraSource",
    "SyntheticRigSpec",
    "SyntheticWorld",
    "make_synthetic_rig",
]
