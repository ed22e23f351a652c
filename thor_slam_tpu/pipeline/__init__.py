"""Host orchestration: pub/sub bus, device transfer, RGB-D product stream."""

from thor_slam_tpu.pipeline.bus import MessageBus, Topic
from thor_slam_tpu.pipeline.rgbd import RGBDFrame, RGBDProcessor
from thor_slam_tpu.pipeline.transfer import DoubleBufferedUploader

__all__ = [
    "DoubleBufferedUploader",
    "MessageBus",
    "RGBDFrame",
    "RGBDProcessor",
    "Topic",
]
