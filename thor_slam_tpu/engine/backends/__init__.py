"""Host-side engine backends (the pieces around the jitted tracker).

Each backend consumes only FINALIZED-tick data and pushes corrections to
the device as async updates, so all of them run unchanged at any
pipeline depth (the invariant that makes deep pipelining legal — see
``TpuSlamEngine``). Extracted from the engine so each subsystem has one
owner and an explicit interface:

* :class:`ImuFusion` — sample buffering, online gravity estimation, and
  the per-tick preintegrated pose prediction (plus the finalized-pose
  shadow every prediction integrates from).
* :class:`TrackBA` — the sliding-window track-level bundle-adjustment
  backend (window assembly, gates, async device write-back).
* :class:`LoopBackend` — place database, async loop detection and
  geometric verification, pose-graph application, relocalization.
"""

from thor_slam_tpu.engine.backends.imu_fusion import ImuFusion
from thor_slam_tpu.engine.backends.track_ba import TrackBA
from thor_slam_tpu.engine.backends.loop_closure import LoopBackend

__all__ = ["ImuFusion", "TrackBA", "LoopBackend"]
