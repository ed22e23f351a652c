"""TpuSlamEngine: the SlamEngine implementation backed by the JAX tracker.

This is the drop-in replacement for the reference's ``IsaacRosAdapter``
(reference thor_slam/slam/adapters/isaac_ros.py:59-458): instead of
republishing frames over DDS to an external CUDA process, frames are staged
into one dense device transfer and tracked by the fused jit step in
:mod:`thor_slam_tpu.engine.tracker`.

Host responsibilities (everything the device graph can't do):
* build per-camera rectification maps from :class:`RigCalibration` at
  :meth:`initialize` (and jit warm-up — the reference contract explicitly
  allows heavy work here, reference interface.py:176-189);
* run the TrackingState machine — including LOST / RELOCALIZING, which the
  reference defines but never sets (reference isaac_ros.py:323-325);
* accumulate keyframe poses for :meth:`get_map`, serialize with save/load.
"""

from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from thor_slam_tpu.camera.rig import RigCalibration, stack_synchronized_images
from thor_slam_tpu.camera.types import SynchronizedFrameSet
from thor_slam_tpu.engine import tracker as trk
from thor_slam_tpu.engine.setup import build_camera_setup
from thor_slam_tpu.slam.interface import (
    MapPoint,
    SlamConfig,
    SlamEngine,
    SlamMap,
    SlamPose,
    TrackingState,
)

logger = logging.getLogger(__name__)


class TpuSlamEngine(SlamEngine):
    """Multi-camera stereo visual odometry on TPU (JAX/XLA).

    Args:
        params: Optional tracker parameter overrides (dict of
            :class:`~thor_slam_tpu.engine.tracker.TrackerParams` fields;
            num_cams/height/width are derived from calibration).
        lost_after: Consecutive low-inlier frames before LOST.
    """

    def __init__(self, params: dict | None = None, lost_after: int = 5) -> None:
        self._param_overrides = dict(params or {})
        self._lost_after = lost_after
        self._state_enum = TrackingState.NOT_INITIALIZED
        self._config = SlamConfig()
        self._step = None
        self._tracker_state = None
        self._params: trk.TrackerParams | None = None
        self._setup: trk.CameraSetup | None = None
        self._source_order: list[str] = []
        self._keyframe_poses: list[SlamPose] = []
        self._low_inlier_streak = 0
        self._last_timestamp: float | None = None
        self._frame_count = 0

    # ------------------------------------------------------------- setup

    def initialize(self, calibration: RigCalibration, config: SlamConfig | None = None) -> None:
        if config is not None:
            self._config = config

        setup, self._source_order, height, width = build_camera_setup(calibration)
        self._setup = setup

        self._params = trk.TrackerParams(
            num_cams=len(self._source_order),
            height=height,
            width=width,
            **self._param_overrides,
        )
        self._step = trk.make_track_step(self._params, setup)
        self._tracker_state = trk.init_state(self._params)
        self._keyframe_poses = []
        self._low_inlier_streak = 0
        self._last_timestamp = None
        self._frame_count = 0
        self._state_enum = TrackingState.INITIALIZING

        # jit warm-up so the first real tick doesn't pay compilation.
        t0 = time.monotonic()
        dummy = jnp.zeros(
            (self._params.num_cams, 2, height, width), jnp.float32
        )
        warm_state, _ = self._step(self._tracker_state, dummy)
        jax.block_until_ready(warm_state.world_t_body)
        logger.info(
            "TpuSlamEngine initialized: %d cams @ %dx%d (warm-up %.1fs)",
            self._params.num_cams, width, height, time.monotonic() - t0,
        )

    # ------------------------------------------------------------ tracking

    def process_frames(self, frame_set: SynchronizedFrameSet) -> SlamPose | None:
        if self._step is None:
            raise RuntimeError("initialize() must be called before process_frames()")

        images = stack_synchronized_images(frame_set, self._source_order)
        if images.dtype == np.uint8:
            images = images.astype(np.float32) / 255.0
        images = jnp.asarray(images)

        self._tracker_state, out = self._step(self._tracker_state, images)
        num_inliers = int(out.num_inliers)
        refreshed = bool(out.refreshed)
        world_t_body = np.asarray(out.world_t_body, np.float64)

        # Velocity estimate for the constant-velocity model.
        ts = frame_set.timestamp
        if self._last_timestamp is not None and ts > self._last_timestamp:
            dt = ts - self._last_timestamp
            vel = (world_t_body[:3, 3] - np.asarray(self._tracker_state.prev_world_t_body)[:3, 3]) / dt
            self._tracker_state = self._tracker_state._replace(
                velocity_w=jnp.asarray(vel, jnp.float32)
            )
        self._last_timestamp = ts
        self._frame_count += 1

        # -- TrackingState machine ------------------------------------
        min_inl = self._params.min_track_inliers
        if self._frame_count <= 1:
            self._state_enum = TrackingState.INITIALIZING
        elif num_inliers >= min_inl:
            self._state_enum = TrackingState.TRACKING
            self._low_inlier_streak = 0
        else:
            self._low_inlier_streak += 1
            if self._state_enum == TrackingState.LOST:
                self._state_enum = TrackingState.RELOCALIZING
            elif self._low_inlier_streak >= self._lost_after:
                self._state_enum = TrackingState.LOST

        if refreshed and self._state_enum == TrackingState.TRACKING:
            self._keyframe_poses.append(
                SlamPose.from_4x4_matrix(world_t_body, timestamp=ts)
            )
            if len(self._keyframe_poses) > 10000:
                self._keyframe_poses = self._keyframe_poses[-10000:]

        confidence = float(min(1.0, num_inliers / max(2.0 * min_inl, 1.0)))
        pose = SlamPose.from_4x4_matrix(
            world_t_body,
            timestamp=ts,
            tracking_state=self._state_enum,
            confidence=confidence,
        )
        if self._state_enum == TrackingState.LOST and num_inliers < min_inl // 2:
            return None
        return pose

    def get_tracking_state(self) -> TrackingState:
        return self._state_enum

    # ------------------------------------------------------------ mapping

    def get_map(self) -> SlamMap:
        if self._tracker_state is None:
            return SlamMap()
        pos = np.asarray(self._tracker_state.lm_pos_w).reshape(-1, 3)
        valid = np.asarray(self._tracker_state.lm_valid).reshape(-1)
        points = [MapPoint(position=p) for p in pos[valid]]
        if self._config.max_map_size and len(points) > self._config.max_map_size:
            points = points[: self._config.max_map_size]
        return SlamMap(
            points=points,
            keyframe_poses=list(self._keyframe_poses),
            timestamp=self._last_timestamp or 0.0,
        )

    def save_map(self, path: str) -> bool:
        if self._tracker_state is None:
            return False
        try:
            kf = np.stack([p.to_4x4_matrix() for p in self._keyframe_poses]) if self._keyframe_poses else np.zeros((0, 4, 4))
            kf_ts = np.asarray([p.timestamp for p in self._keyframe_poses])
            np.savez_compressed(
                path,
                lm_pos_w=np.asarray(self._tracker_state.lm_pos_w),
                lm_desc=np.asarray(self._tracker_state.lm_desc),
                lm_valid=np.asarray(self._tracker_state.lm_valid),
                world_t_body=np.asarray(self._tracker_state.world_t_body),
                keyframes=kf,
                keyframe_ts=kf_ts,
            )
            return True
        except OSError:
            logger.exception("Failed to save map to %s", path)
            return False

    def load_map(self, path: str) -> bool:
        if self._tracker_state is None:
            return False
        if not str(path).endswith(".npz"):
            path = f"{path}.npz"  # np.savez appends the suffix on save
        try:
            data = np.load(path)
        except OSError:
            logger.exception("Failed to load map from %s", path)
            return False
        self._tracker_state = self._tracker_state._replace(
            lm_pos_w=jnp.asarray(data["lm_pos_w"]),
            lm_desc=jnp.asarray(data["lm_desc"]),
            lm_valid=jnp.asarray(data["lm_valid"]),
        )
        self._keyframe_poses = [
            SlamPose.from_4x4_matrix(m, timestamp=float(t))
            for m, t in zip(data["keyframes"], data["keyframe_ts"])
        ]
        return True

    def relocalize(self) -> bool:
        """Match the current frame's features against the loaded landmarks.

        The tracker does this continuously (landmarks persist until a
        keyframe refresh), so relocalization here means: flag the state
        machine and let the next process_frames() attempt the match.
        """
        if self._tracker_state is None:
            return False
        self._state_enum = TrackingState.RELOCALIZING
        return True

    # ------------------------------------------------------------ lifecycle

    def reset(self) -> None:
        if self._params is not None:
            self._tracker_state = trk.init_state(self._params)
        self._keyframe_poses = []
        self._low_inlier_streak = 0
        self._last_timestamp = None
        self._frame_count = 0
        if self._state_enum != TrackingState.NOT_INITIALIZED:
            self._state_enum = TrackingState.INITIALIZING

    def shutdown(self) -> None:
        self._step = None
        self._tracker_state = None
        self._state_enum = TrackingState.NOT_INITIALIZED
