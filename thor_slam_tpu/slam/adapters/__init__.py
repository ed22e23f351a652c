"""Concrete SLAM engine adapters."""

from thor_slam_tpu.slam.adapters.null_engine import NullSlamEngine

__all__ = ["NullSlamEngine"]
