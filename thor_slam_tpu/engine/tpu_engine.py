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
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from thor_slam_tpu.camera.rig import RigCalibration
from thor_slam_tpu.camera.types import SynchronizedFrameSet
from thor_slam_tpu.engine import ba, loop, posegraph
from thor_slam_tpu.engine import tracker as trk
from thor_slam_tpu.engine.setup import build_camera_setup
from thor_slam_tpu.ops import rectify
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
        enable_ba: Run sliding-window bundle adjustment at every keyframe.
            Default off: on short, feature-rich sequences the landmark-
            persistent VO is already at ~0.3% drift and window BA measured
            net-neutral (landmark-id hops across keyframe refreshes inject
            structural outliers). Enable for long drift-heavy trajectories.
        ba_window: Keyframes per BA window (static shape K).
        ba_landmarks: Landmark slots per BA window (static shape L).
        pipelined: Overlap host staging/upload with device compute via a
            one-slot pipeline (:class:`DoubleBufferedUploader`): each
            ``process_frames(k)`` returns the pose of tick ``k-1`` (None on
            the first tick) while tick ``k`` is staged, uploaded and
            dispatched. This matches the reference's async-pose semantics —
            its ``process_frames`` also returns a cached earlier pose set
            asynchronously by the odometry callback (reference
            isaac_ros.py:308-325). Call :meth:`flush` at stream end for the
            final pose. Default off: synchronous same-tick pose.
        pipeline_depth: Number of in-flight ticks when ``pipelined`` (pose
            latency = depth ticks). Depth > 1 is throughput mode for
            remote/tunneled TPUs where every host sync costs a network
            RTT: output fetches are batched across ready ticks
            (:meth:`_finalize_ready`). Pure VO streaming only — requires
            ``enable_ba=False, use_imu=False`` and forces loop closure off.
    """

    def __init__(
        self,
        params: dict | None = None,
        lost_after: int = 5,
        enable_ba: bool = False,
        ba_window: int = 6,
        ba_landmarks: int = 384,
        use_imu: bool = True,
        imu_buffer_capacity: int = 256,
        loop_db_capacity: int = 256,
        loop_min_votes: int = 60,
        loop_min_inliers: int = 40,
        loop_exclude_recent: int = 12,
        loop_cooldown_kfs: int = 20,
        loop_min_correction_m: float = 0.05,
        prewarm_degraded: bool = False,
        pipelined: bool = False,
        pipeline_depth: int = 1,
    ) -> None:
        self._param_overrides = dict(params or {})
        self._prewarm_degraded = prewarm_degraded
        self._pipelined = pipelined
        if pipeline_depth < 1:
            raise ValueError("pipeline_depth must be >= 1")
        if pipeline_depth > 1:
            # Deep pipelining defers the host's view of the tracker by up
            # to `depth` ticks; host subsystems that read tracker state at
            # the tick they finalize (IMU prediction, BA snapshots) would
            # silently read the wrong tick — reject instead.
            if enable_ba:
                raise ValueError("pipeline_depth > 1 is incompatible with enable_ba")
            if use_imu:
                raise ValueError("pipeline_depth > 1 is incompatible with use_imu")
        self._pipeline_depth = pipeline_depth
        self._uploader = None
        self._pending_q: deque[dict] = deque()
        self._lost_after = lost_after
        self._enable_ba = enable_ba
        self._ba_window = ba_window
        self._ba_landmarks = ba_landmarks
        self._use_imu = use_imu
        self._imu_capacity = imu_buffer_capacity
        self._imu_ts: list[float] = []
        self._imu_gyro: list[np.ndarray] = []
        self._imu_accel: list[np.ndarray] = []
        self._body_r_imu = np.eye(3)
        self._kf_snapshots: list[dict] = []
        self._loop_db: list[dict] = []
        self._loop_db_capacity = loop_db_capacity
        self._loop_min_votes = loop_min_votes
        self._loop_min_inliers = loop_min_inliers
        self._loop_exclude_recent = loop_exclude_recent
        self._loop_cooldown_kfs = loop_cooldown_kfs
        self._loop_min_correction = loop_min_correction_m
        self._loop_cooldown = 0
        self._loops_closed = 0
        self._want_reloc = False
        #: Per-frame tracking diagnostics (updated by process_frames).
        self.last_diagnostics: dict = {}
        #: Count of IMU preintegration windows that contained no samples
        #: (nonzero growth while use_imu=True means the IMU path is dead).
        self.imu_empty_windows = 0
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
        if self._pipeline_depth > 1 and self._config.enable_loop_closure:
            # Loop closure rewrites the live tracker state at the finalized
            # tick; with a deep pipeline that state is ticks ahead. Disable
            # rather than corrupt (throughput mode is pure VO streaming).
            logger.warning(
                "pipeline_depth=%d: disabling loop closure (incompatible "
                "with deep pipelining)", self._pipeline_depth,
            )
            import dataclasses

            self._config = dataclasses.replace(self._config, enable_loop_closure=False)

        setup, self._source_order, height, width = build_camera_setup(calibration)
        self._setup = setup
        if calibration.imu_extrinsics is not None:
            self._body_r_imu = np.asarray(
                calibration.imu_extrinsics.extrinsics.rotation, np.float64
            )

        self._params = trk.TrackerParams(
            num_cams=len(self._source_order),
            height=height,
            width=width,
            **self._param_overrides,
        )
        self._step = trk.make_track_step(self._params, setup)
        self._tracker_state = trk.init_state(self._params)
        self._pending_q.clear()
        if self._pipelined:
            from thor_slam_tpu.pipeline.transfer import DoubleBufferedUploader

            if self._uploader is not None:
                self._uploader.close()
            self._uploader = DoubleBufferedUploader(stage_fn=self._stage_array)
        self._keyframe_poses = []
        self._kf_snapshots = []
        self._low_inlier_streak = 0
        self._last_timestamp = None
        self._frame_count = 0
        self._state_enum = TrackingState.INITIALIZING

        # jit warm-up so the first real tick doesn't pay compilation.
        # uint8 is the runtime dtype (camera drivers and dataset replay all
        # produce uint8; the step normalizes on device) — float frames are
        # the rare case and pay one compile on their first tick.
        t0 = time.monotonic()
        dummy = jnp.zeros(
            (self._params.num_cams, 2, height, width), jnp.uint8
        )
        # Each warm-up call mirrors a runtime (pose_prediction, cam_active)
        # pattern EXACTLY, including arity: jax.jit caches per call signature,
        # so step(s, i) and step(s, i, None, None) are two separate traces —
        # warming one does not warm the other (measured: a silent full
        # recompile on the first real frame). process_frames always uses the
        # 4-argument form; so must every warm-up.
        warm_state, _ = self._step(self._tracker_state, dummy, None, None)
        if self._use_imu:  # also compile the explicit-prediction variant
            warm_state2, _ = self._step(self._tracker_state, dummy, jnp.eye(4), None)
            jax.block_until_ready(warm_state2.world_t_body)
        if self._prewarm_degraded:
            # Compile the cam_active variant now so a camera dying at runtime
            # costs one masked tick, not a mid-flight jit compile (set this
            # when the rig has a watchdog).
            ones = jnp.ones(self._params.num_cams, bool)
            warm_state3, _ = self._step(self._tracker_state, dummy, None, ones)
            if self._use_imu:  # masked + IMU-predicted variant
                warm_state4, _ = self._step(self._tracker_state, dummy, jnp.eye(4), ones)
                jax.block_until_ready(warm_state4.world_t_body)
            jax.block_until_ready(warm_state3.world_t_body)
        jax.block_until_ready(warm_state.world_t_body)
        logger.info(
            "TpuSlamEngine initialized: %d cams @ %dx%d (warm-up %.1fs)",
            self._params.num_cams, width, height, time.monotonic() - t0,
        )

    # ------------------------------------------------------------ tracking

    def process_frames(self, frame_set: SynchronizedFrameSet) -> SlamPose | None:
        if self._step is None:
            raise RuntimeError("initialize() must be called before process_frames()")

        if not self._pipelined:
            images = jnp.asarray(self._stage_array(frame_set))
            return self._finalize_tick(self._dispatch_tick(images, frame_set))

        # Pipelined: stage/upload tick k on the uploader thread while the
        # device still computes earlier ticks and the host finalizes them.
        # `pipeline_depth` ticks of pose latency (see class docstring).
        self._uploader.submit(frame_set)
        pose = None
        if len(self._pending_q) >= self._pipeline_depth:
            pose = self._finalize_ready()
        images = self._uploader.get()
        self._pending_q.append(self._dispatch_tick(images, frame_set))
        return pose

    def flush(self) -> SlamPose | None:
        """Finalize all in-flight ticks (pipelined mode; no-op otherwise)."""
        pose = None
        while self._pending_q:
            pose = self._finalize_ready()
        return pose

    def _dispatch_tick(self, images: jnp.ndarray, frame_set: SynchronizedFrameSet) -> dict:
        """Front half of a tick: IMU ingest/prediction + async step dispatch.

        Returns the pending record for :meth:`_finalize_tick`; the device
        computes while the host goes on (JAX dispatch is asynchronous).
        """
        if self._want_reloc and self._attempt_relocalization(frame_set):
            self._want_reloc = False

        pose_prediction = None
        if self._use_imu and frame_set.sensor_data is not None:
            self._ingest_imu(frame_set.sensor_data, frame_set.sensor_timestamp)
            pose_prediction = self._imu_pose_prediction(frame_set.timestamp)

        # Watchdog: mask dead cameras out of the solve (their frozen frames
        # would otherwise feed zero-motion KLT tracks into PnP).
        cam_active = None
        if frame_set.stale_sources:
            cam_active = jnp.asarray(
                [name not in frame_set.stale_sources for name in self._source_order]
            )

        self._tracker_state, out = self._step(
            self._tracker_state, images, pose_prediction, cam_active
        )
        return {
            "out": out,
            "ts": frame_set.timestamp,
            "stale_sources": frame_set.stale_sources,
        }

    @staticmethod
    def _output_tuple(pending: dict) -> tuple:
        out = pending["out"]
        return (out.world_t_body, out.num_inliers, out.refreshed, out.rms_error, out.num_landmarks)

    def _finalize_tick(self, pending: dict) -> SlamPose | None:
        """Back half of a tick: fetch outputs, run the host state machine.

        ONE host transfer for all per-frame outputs: scalar-by-scalar
        fetches each pay a device round trip (expensive on remote TPUs).
        """
        return self._finalize_values(pending, jax.device_get(self._output_tuple(pending)))

    def _finalize_ready(self) -> SlamPose | None:
        """Finalize the oldest pending tick — and, in the SAME device
        round trip, every newer tick whose outputs are already computed.

        On a remote/tunneled TPU a host sync costs a full network RTT
        (measured ~27 ms here); batching the fetches amortizes that across
        `pipeline_depth` ticks instead of paying it per tick.
        """
        q = self._pending_q
        take = 1
        while take < len(q) and q[take]["out"].world_t_body.is_ready():
            take += 1
        records = [q.popleft() for _ in range(take)]
        values = jax.device_get(tuple(self._output_tuple(r) for r in records))
        pose = None
        for rec, vals in zip(records, values):
            pose = self._finalize_values(rec, vals)
        return pose

    def _finalize_values(self, pending: dict, vals: tuple) -> SlamPose | None:
        """Host state machine for one tick, given fetched output values."""
        world_t_body, num_inliers, refreshed, rms, n_lm = vals
        num_inliers = int(num_inliers)
        refreshed = bool(refreshed)
        world_t_body = np.asarray(world_t_body, np.float64)
        self.last_diagnostics = {
            "num_inliers": num_inliers,
            "num_landmarks": int(n_lm),
            "rms_error": float(rms),
            "refreshed": refreshed,
            "stale_sources": sorted(pending["stale_sources"]),
        }

        # Velocity estimate for the constant-velocity model. Depth-1 only:
        # with a deeper pipeline the live tracker state is ahead of the
        # tick being finalized, so differencing against it mixes ticks
        # (and reading its arrays would sync on in-flight compute).
        ts = pending["ts"]
        if (
            self._pipeline_depth == 1
            and self._last_timestamp is not None
            and ts > self._last_timestamp
        ):
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
            if self._enable_ba:
                self._snapshot_keyframe(ts)
                world_t_body = self._run_bundle_adjustment(world_t_body)
            self._keyframe_poses.append(
                SlamPose.from_4x4_matrix(world_t_body, timestamp=ts)
            )
            if self._config.enable_loop_closure:
                world_t_body = self._loop_closure_tick(world_t_body, ts)
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

    def _stage_array(self, frame_set: SynchronizedFrameSet) -> np.ndarray:
        """Stage the tick into one (C, 2, H, W) host array.

        uint8 frames stay uint8 — the device normalizes inside the jitted
        step (tracker.track_step), so the host→device transfer ships 1/4
        the bytes and the host never runs a multi-megabyte float conversion
        (which measured 300-600 ms/tick at 4x720p on a weak host CPU).
        A watchdog-stale source that died before producing any frame has no
        entry in ``frame_sets`` — it is zero-filled here (and masked out of
        the solve via ``cam_active``).
        """
        h, w = self._params.height, self._params.width
        flat: list[np.ndarray] = []
        for name in self._source_order:
            fs = frame_set.frame_sets.get(name)
            if fs is None:
                flat.extend([np.zeros((h, w), np.uint8)] * 2)
            else:
                flat.extend(f.image for f in fs.frames)
        c = len(self._source_order)
        arr = np.stack(flat).reshape(c, len(flat) // c, *flat[0].shape)
        if arr.dtype not in (np.uint8, np.float32):
            arr = arr.astype(np.float32)
        return arr

    # ----------------------------------------------------- IMU fusion

    def _ingest_imu(self, sensor_data: dict, sensor_ts: float | None) -> None:
        """Buffer IMU samples (single dict or driver-batched arrays)."""
        # Guard the RAW dict values: np.asarray(None) is an object array
        # (never None), so converting first would let a malformed payload
        # through to crash pack_imu_window ticks later.
        raw_acc = sensor_data.get("accelerometer")
        raw_gyr = sensor_data.get("gyroscope")
        if raw_acc is None or raw_gyr is None:
            return
        acc = np.asarray(raw_acc, np.float64)
        gyr = np.asarray(raw_gyr, np.float64)
        if acc.ndim == 2:  # batched packet (synthetic source / DepthAI batching)
            raw_ts = sensor_data.get("timestamps")
            ts = None if raw_ts is None else np.asarray(raw_ts, np.float64)
            if ts is not None and len(ts) < acc.shape[0]:
                return  # malformed batch: fewer timestamps than samples
            for i in range(acc.shape[0]):
                t = float(ts[i]) if ts is not None else (sensor_ts or 0.0)
                if not self._imu_ts or t > self._imu_ts[-1]:
                    self._imu_ts.append(t)
                    self._imu_gyro.append(gyr[i])
                    self._imu_accel.append(acc[i])
        else:
            t = float(sensor_data.get("timestamp", sensor_ts or 0.0))
            if not self._imu_ts or t > self._imu_ts[-1]:
                self._imu_ts.append(t)
                self._imu_gyro.append(gyr)
                self._imu_accel.append(acc)
        if len(self._imu_ts) > self._imu_capacity:
            del self._imu_ts[: -self._imu_capacity]
            del self._imu_gyro[: -self._imu_capacity]
            del self._imu_accel[: -self._imu_capacity]

    def _imu_pose_prediction(self, ts: float) -> np.ndarray | None:
        """Gyro-preintegrated rotation + constant-velocity translation.

        Full accelerometer dead reckoning needs a gravity-aligned world
        frame; the gyro alone gives the part that breaks constant-velocity
        models (fast rotation), so rotation comes from preintegration
        (reference fusion role: launch/thor_visual_slam.launch.py:80) and
        translation stays extrapolated.
        """
        if self._last_timestamp is None or len(self._imu_ts) < 2:
            return None
        from thor_slam_tpu.engine import imu as imu_mod

        g, a, d, m = imu_mod.pack_imu_window(
            self._imu_ts, self._imu_gyro, self._imu_accel,
            t_start=self._last_timestamp, t_end=ts, capacity=64,
        )
        if m.sum() < 1:
            # A dead IMU path must be VISIBLE: with use_imu=True the engine
            # silently degrades to constant-velocity when every window is
            # empty (e.g. a source delivering samples one tick late).
            self.imu_empty_windows += 1
            if self.imu_empty_windows in (10, 100) or self.imu_empty_windows % 1000 == 0:
                logger.warning(
                    "IMU enabled but %d preintegration windows were empty — "
                    "samples may be arriving late or not at all",
                    self.imu_empty_windows,
                )
            return None
        pre = imu_mod.preintegrate_np(g, a, d, m)  # host: no device round trip
        # IMU-frame rotation increment -> body frame.
        delta_r_imu = np.asarray(pre.delta_r, np.float64)
        rbi = self._body_r_imu
        delta_r_body = rbi @ delta_r_imu @ rbi.T

        st = self._tracker_state
        cur = np.asarray(st.world_t_body, np.float64)
        prev = np.asarray(st.prev_world_t_body, np.float64)
        pred = np.eye(4)
        pred[:3, :3] = cur[:3, :3] @ delta_r_body
        pred[:3, 3] = 2.0 * cur[:3, 3] - prev[:3, 3]  # constant velocity
        return jnp.asarray(pred, jnp.float32)

    # ----------------------------------------------------- loop closure

    def _loop_closure_tick(self, world_t_body: np.ndarray, ts: float) -> np.ndarray:
        """Keyframe hook: update the place DB, detect + close loops."""
        st = self._tracker_state
        # Camera-0 slice of the fresh keyframe is the place signature.
        entry = {
            "desc": np.asarray(st.lm_desc[0]),
            "valid": np.asarray(st.lm_valid[0]),
            "lm_w": np.asarray(st.lm_pos_w[0]),
            "obs_px": np.asarray(st.lm_obs_px[0]),
            "world_t_body": world_t_body.copy(),
            "ts": ts,
        }
        self._loop_db.append(entry)
        if len(self._loop_db) > self._loop_db_capacity:
            self._loop_db = self._loop_db[-self._loop_db_capacity :]

        k = len(self._loop_db)
        if self._loop_cooldown > 0:
            self._loop_cooldown -= 1
            return world_t_body
        if k <= self._loop_exclude_recent + 1:
            return world_t_body

        db_desc = np.stack([e["desc"] for e in self._loop_db[:-1]])
        db_valid = np.stack([e["valid"] for e in self._loop_db[:-1]])
        mask = np.ones(k - 1, np.float32)
        mask[-self._loop_exclude_recent :] = 0.0

        cand = loop.find_candidate(
            jnp.asarray(entry["desc"]), jnp.asarray(entry["valid"]),
            jnp.asarray(db_desc), jnp.asarray(db_valid), jnp.asarray(mask),
        )
        votes = int(cand.votes)
        if votes < self._loop_min_votes:
            return world_t_body
        ci = int(cand.keyframe)
        cand_e = self._loop_db[ci]

        # Geometric verification: candidate's landmarks vs our observations.
        k0 = np.asarray(self._setup.k_left[0])
        d0 = np.asarray(self._setup.dist_left[0])
        xn = np.stack(
            [(entry["obs_px"][:, 0] - k0[2]) / k0[0], (entry["obs_px"][:, 1] - k0[3]) / k0[1]], -1
        )
        obs_norm = rectify.undistort_normalized(xn, d0).astype(np.float32)
        ver = loop.verify_candidate(
            jax.random.PRNGKey(self._frame_count),
            jnp.asarray(cand_e["lm_w"], jnp.float32),
            jnp.asarray(cand_e["valid"]),
            jnp.asarray(cand_e["desc"]),
            jnp.asarray(obs_norm),
            jnp.asarray(entry["desc"]),
            jnp.asarray(entry["valid"]),
            jnp.asarray(self._setup.cam_r_body[0]),
            jnp.asarray(self._setup.cam_t_body[0]),
            jnp.asarray(np.linalg.inv(world_t_body), jnp.float32),
            min_inliers=self._loop_min_inliers,
        )
        if not bool(ver.accepted):
            return world_t_body

        # Discrepancy gate: the loop constraint must disagree with odometry
        # by more than the constraint's own noise floor — otherwise there is
        # no drift to fix and "closing" only injects noise.
        loop_pose_est = np.linalg.inv(np.asarray(ver.body_t_candidate, np.float64))
        disc = np.linalg.norm(loop_pose_est[:3, 3] - world_t_body[:3, 3])
        if disc < self._loop_min_correction:
            self._loop_cooldown = self._loop_cooldown_kfs
            return world_t_body

        # Pose-graph over the loop DB trajectory: odometry chain + loop edge.
        poses = np.stack([e["world_t_body"] for e in self._loop_db]).astype(np.float32)
        kk = poses.shape[0]
        e_cap = kk  # chain (kk-1 edges) + 1 loop edge
        ei, ej, et, w = posegraph.sequential_graph(poses, capacity_edges=e_cap)
        loop_pose = np.linalg.inv(np.asarray(ver.body_t_candidate, np.float64))
        ei[e_cap - 1], ej[e_cap - 1] = ci, kk - 1
        et[e_cap - 1] = np.linalg.inv(self._loop_db[ci]["world_t_body"]) @ loop_pose
        w[e_cap - 1] = 3.0
        graph = posegraph.PoseGraph(
            poses=jnp.asarray(poses), node_mask=jnp.ones(kk),
            edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
            edge_t=jnp.asarray(et), edge_weight=jnp.asarray(w),
        )
        opt_poses, _ = posegraph.optimize(graph)
        opt_poses = np.asarray(opt_poses, np.float64)

        # Apply: rewrite DB + keyframe trajectory; rigidly correct the live
        # pose and the landmark bank with the newest keyframe's correction.
        t_corr = opt_poses[-1] @ np.linalg.inv(poses[-1].astype(np.float64))
        for idx, e in enumerate(self._loop_db):
            e["world_t_body"] = opt_poses[idx]
        n_kf = min(len(self._keyframe_poses), kk)
        for j in range(n_kf):
            old = self._keyframe_poses[-n_kf + j]
            self._keyframe_poses[-n_kf + j] = SlamPose.from_4x4_matrix(
                opt_poses[kk - n_kf + j], timestamp=old.timestamp
            )

        new_world_t_body = t_corr @ world_t_body
        pos = np.asarray(st.lm_pos_w)
        pos = pos @ t_corr[:3, :3].T + t_corr[:3, 3]
        self._tracker_state = st._replace(
            lm_pos_w=jnp.asarray(pos, jnp.float32),
            world_t_body=jnp.asarray(new_world_t_body, jnp.float32),
            prev_world_t_body=jnp.asarray(
                t_corr @ np.asarray(st.prev_world_t_body, np.float64), jnp.float32
            ),
            kf_world_t_body=jnp.asarray(new_world_t_body, jnp.float32),
        )
        self._loops_closed += 1
        self._loop_cooldown = self._loop_cooldown_kfs
        logger.info(
            "Loop closed: kf %d <-> %d (votes=%d inliers=%d), |corr|=%.3f m",
            ci, kk - 1, votes, int(ver.num_inliers), float(np.linalg.norm(t_corr[:3, 3])),
        )
        return new_world_t_body

    # ----------------------------------------------------- BA backend

    def _snapshot_keyframe(self, ts: float) -> None:
        """Capture the fresh keyframe's landmark bank for the BA window."""
        st = self._tracker_state

        def normalize(px, k_all, dist_all):
            out = np.empty_like(px)
            for ci in range(px.shape[0]):
                k = np.asarray(k_all[ci])
                dist = np.asarray(dist_all[ci])
                xn = np.stack(
                    [(px[ci, :, 0] - k[2]) / k[0], (px[ci, :, 1] - k[3]) / k[1]], -1
                )
                out[ci] = rectify.undistort_normalized(xn, dist)
            return out

        self._kf_snapshots.append(
            {
                "ids": np.asarray(st.lm_id),
                "valid": np.asarray(st.lm_valid),
                "pos": np.asarray(st.lm_pos_w),
                "obs": normalize(
                    np.asarray(st.lm_obs_px), self._setup.k_left, self._setup.dist_left
                ),
                "robs": normalize(
                    np.asarray(st.lm_robs_px), self._setup.k_right, self._setup.dist_right
                ),
                "robs_valid": np.asarray(st.lm_robs_valid),
                "body_t_world": np.linalg.inv(np.asarray(st.world_t_body, np.float64)),
                "ts": ts,
            }
        )
        if len(self._kf_snapshots) > self._ba_window:
            self._kf_snapshots = self._kf_snapshots[-self._ba_window :]

    def _run_bundle_adjustment(self, world_t_body: np.ndarray) -> np.ndarray:
        """Optimize the keyframe window; push corrections into the tracker.

        Returns the (possibly corrected) current world_T_body.
        """
        snaps = self._kf_snapshots
        if len(snaps) < 3:
            return world_t_body
        k_win = self._ba_window
        c = self._params.num_cams
        l_cap = self._ba_landmarks

        # Join landmark ids across snapshots; keep those seen in >= 2 kfs.
        counts: dict[int, int] = {}
        for s in snaps:
            for lid in np.unique(s["ids"][s["valid"]]):
                counts[int(lid)] = counts.get(int(lid), 0) + 1
        multi = [lid for lid, n in counts.items() if n >= 3 and lid >= 0]
        if len(multi) < 24:
            return world_t_body
        multi.sort(key=lambda lid: -counts[lid])
        chosen = multi[:l_cap]
        id_to_idx = {lid: i for i, lid in enumerate(chosen)}
        l_n = len(chosen)

        # Camera axis of the BA problem is 2C: left imagers then right
        # imagers — keeping the stereo constraint in the window (without it,
        # landmark depth is only held by weak inter-keyframe parallax).
        obs = np.zeros((k_win, 2 * c, l_cap, 2), np.float32)
        mask = np.zeros((k_win, 2 * c, l_cap), np.float32)
        poses = np.tile(np.eye(4, dtype=np.float32), (k_win, 1, 1))
        pose_mask = np.zeros(k_win, np.float32)
        lms = np.zeros((l_cap, 3), np.float32)
        lm_mask = np.zeros(l_cap, np.float32)

        for ki, s in enumerate(snaps):
            poses[ki] = s["body_t_world"]
            pose_mask[ki] = 1.0
            ids, valid = s["ids"], s["valid"]
            for ci in range(c):
                for slot in np.nonzero(valid[ci])[0]:
                    li = id_to_idx.get(int(ids[ci, slot]))
                    if li is None:
                        continue
                    obs[ki, ci, li] = s["obs"][ci, slot]
                    mask[ki, ci, li] = 1.0
                    if s["robs_valid"][ci, slot]:
                        obs[ki, c + ci, li] = s["robs"][ci, slot]
                        mask[ki, c + ci, li] = 1.0
                    lms[li] = s["pos"][ci, slot]  # newest snapshot wins
                    lm_mask[li] = 1.0

        cam_rot = np.concatenate(
            [np.asarray(self._setup.cam_r_body), np.asarray(self._setup.cam_r_body_right)]
        )
        cam_trans = np.concatenate(
            [np.asarray(self._setup.cam_t_body), np.asarray(self._setup.cam_t_body_right)]
        )
        problem = ba.BAProblem(
            body_t_world=jnp.asarray(poses),
            landmarks_w=jnp.asarray(lms),
            obs=jnp.asarray(obs),
            obs_mask=jnp.asarray(mask),
            cam_rot=jnp.asarray(cam_rot),
            cam_trans=jnp.asarray(cam_trans),
            pose_mask=jnp.asarray(pose_mask),
            lm_mask=jnp.asarray(lm_mask),
        )
        result = ba.bundle_adjust(problem, huber_delta=0.004)

        refined_poses = np.asarray(result.body_t_world, np.float64)
        refined_lms = np.asarray(result.landmarks_w)

        # Write refined poses back into the snapshots (next window reuses them).
        for ki, s in enumerate(snaps):
            s["body_t_world"] = refined_poses[ki]

        # The live pose is NOT touched: the newest keyframe is the least-
        # constrained pose in the window (its landmarks are barely multi-
        # observed yet), so overwriting the tracker with its refinement
        # injects noise. Corrections flow through the refined LANDMARKS —
        # the tracker's next PnP solve snaps to the improved map — and
        # through the keyframe trajectory (map output).
        st = self._tracker_state
        ids = np.asarray(st.lm_id)
        pos = np.array(st.lm_pos_w)
        valid = np.asarray(st.lm_valid)
        for ci in range(c):
            for slot in np.nonzero(valid[ci])[0]:
                li = id_to_idx.get(int(ids[ci, slot]))
                if li is not None and lm_mask[li]:
                    pos[ci, slot] = refined_lms[li]

        self._tracker_state = st._replace(lm_pos_w=jnp.asarray(pos, jnp.float32))

        # Refined keyframe trajectory for the map output.
        n_past = min(len(self._keyframe_poses), len(snaps) - 1)
        for j in range(n_past):
            ki = len(snaps) - 1 - n_past + j
            old = self._keyframe_poses[len(self._keyframe_poses) - n_past + j]
            self._keyframe_poses[len(self._keyframe_poses) - n_past + j] = SlamPose.from_4x4_matrix(
                np.linalg.inv(refined_poses[ki]), timestamp=old.timestamp
            )
        del l_n
        return world_t_body

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
            extra = {}
            if self._loop_db:
                # The place-recognition database travels with the map — it
                # is what makes relocalize() work after load_map().
                extra = {
                    "db_desc": np.stack([e["desc"] for e in self._loop_db]),
                    "db_valid": np.stack([e["valid"] for e in self._loop_db]),
                    "db_lm_w": np.stack([e["lm_w"] for e in self._loop_db]),
                    "db_poses": np.stack([e["world_t_body"] for e in self._loop_db]),
                    "db_ts": np.asarray([e["ts"] for e in self._loop_db]),
                }
            np.savez_compressed(
                path,
                lm_pos_w=np.asarray(self._tracker_state.lm_pos_w),
                lm_desc=np.asarray(self._tracker_state.lm_desc),
                lm_valid=np.asarray(self._tracker_state.lm_valid),
                world_t_body=np.asarray(self._tracker_state.world_t_body),
                keyframes=kf,
                keyframe_ts=kf_ts,
                **extra,
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
        if "db_desc" in data:
            self._loop_db = [
                {
                    "desc": data["db_desc"][i],
                    "valid": data["db_valid"][i],
                    "lm_w": data["db_lm_w"][i],
                    "obs_px": np.zeros_like(data["db_lm_w"][i][:, :2]),
                    "world_t_body": data["db_poses"][i],
                    "ts": float(data["db_ts"][i]),
                }
                for i in range(data["db_desc"].shape[0])
            ]
        return True

    def save_state(self, path: str) -> bool:
        """Checkpoint the FULL tracker state (poses, landmark banks,
        pyramids, PRNG) — resume-capable, unlike save_map's map-only export.
        """
        if self._tracker_state is None:
            return False
        arrays = {f: np.asarray(v) for f, v in self._tracker_state._asdict().items()}
        try:
            np.savez_compressed(path, **arrays)
            return True
        except OSError:
            logger.exception("Failed to save engine state to %s", path)
            return False

    def load_state(self, path: str) -> bool:
        """Restore a checkpoint saved by :meth:`save_state`."""
        if self._tracker_state is None:
            return False
        if not str(path).endswith(".npz"):
            path = f"{path}.npz"
        try:
            data = np.load(path)
        except OSError:
            logger.exception("Failed to load engine state from %s", path)
            return False
        fields = {f: jnp.asarray(data[f]) for f in trk.TrackerState._fields}
        self._tracker_state = trk.TrackerState(**fields)
        return True

    def relocalize(self) -> bool:
        """Arm relocalization against the loaded map's place database.

        On each subsequent process_frames() (until success), the current
        frame's camera-0 features are matched against the keyframe database
        (MXU place recognition, engine/loop.py); a geometrically verified
        match re-anchors the tracker at the recovered pose in the MAP's
        world frame and restarts landmark tracking there.

        The reference declares this capability but never implements it
        (reference interface.py:250-256).
        """
        if self._tracker_state is None:
            return False
        self._want_reloc = True
        self._state_enum = TrackingState.RELOCALIZING
        return True

    def _attempt_relocalization(self, frame_set: SynchronizedFrameSet) -> bool:
        """One relocalization attempt against the loop DB. True on success."""
        if not self._loop_db:
            return False
        name = self._source_order[0]
        frames = frame_set.get_frames_for_source(name)
        if not frames:
            return False
        img = frames[0].image
        img = jnp.asarray(
            img.astype(np.float32) / 255.0 if img.dtype == np.uint8 else img
        )
        from thor_slam_tpu.ops import brief, fast
        from thor_slam_tpu.ops.image import gaussian_blur

        p = self._params
        kp = fast.detect_keypoints(
            img, threshold=p.fast_threshold, max_keypoints=p.max_keypoints,
            cell_size=p.cell_size, per_cell=p.per_cell, border_margin=p.border_margin,
        )
        desc = brief.compute_descriptors(
            gaussian_blur(img, 2.0, radius=4), kp.xy, kp.valid,
            oriented=p.oriented_descriptors,
        )

        db_desc = np.stack([e["desc"] for e in self._loop_db])
        db_valid = np.stack([e["valid"] for e in self._loop_db])
        cand = loop.find_candidate(
            desc.bits, desc.valid, jnp.asarray(db_desc), jnp.asarray(db_valid),
            jnp.ones(len(self._loop_db)),
        )
        if int(cand.votes) < self._loop_min_votes:
            return False
        ci = int(cand.keyframe)
        cand_e = self._loop_db[ci]

        k0 = np.asarray(self._setup.k_left[0])
        d0 = np.asarray(self._setup.dist_left[0])
        xy = np.asarray(kp.xy)
        xn = np.stack([(xy[:, 0] - k0[2]) / k0[0], (xy[:, 1] - k0[3]) / k0[1]], -1)
        obs_norm = rectify.undistort_normalized(xn, d0).astype(np.float32)
        ver = loop.verify_candidate(
            jax.random.PRNGKey(self._frame_count),
            jnp.asarray(cand_e["lm_w"], jnp.float32),
            jnp.asarray(cand_e["valid"]),
            jnp.asarray(cand_e["desc"]),
            jnp.asarray(obs_norm),
            desc.bits,
            desc.valid,
            jnp.asarray(self._setup.cam_r_body[0]),
            jnp.asarray(self._setup.cam_t_body[0]),
            jnp.asarray(np.linalg.inv(cand_e["world_t_body"]), jnp.float32),
            min_inliers=self._loop_min_inliers,
        )
        if not bool(ver.accepted):
            return False

        pose = np.linalg.inv(np.asarray(ver.body_t_candidate, np.float64))
        st = self._tracker_state
        self._tracker_state = st._replace(
            world_t_body=jnp.asarray(pose, jnp.float32),
            prev_world_t_body=jnp.asarray(pose, jnp.float32),
            kf_world_t_body=jnp.asarray(pose, jnp.float32),
            # Invalidate the bank + trip the restart path: the next tick
            # re-mints landmarks anchored at the recovered pose.
            lm_valid=jnp.zeros_like(st.lm_valid),
            untracked_streak=jnp.asarray(
                self._params.restart_after_untracked, jnp.int32
            ),
        )
        logger.info(
            "Relocalized against keyframe %d (votes=%d inliers=%d)",
            ci, int(cand.votes), int(ver.num_inliers),
        )
        return True

    # ------------------------------------------------------------ lifecycle

    def reset(self) -> None:
        if self._params is not None:
            self._tracker_state = trk.init_state(self._params)
        self._pending_q.clear()  # drop any in-flight pipelined ticks
        self._keyframe_poses = []
        self._kf_snapshots = []
        self._loop_db = []
        self._loops_closed = 0
        self._want_reloc = False
        self._imu_ts, self._imu_gyro, self._imu_accel = [], [], []
        self.imu_empty_windows = 0
        self._low_inlier_streak = 0
        self._last_timestamp = None
        self._frame_count = 0
        if self._state_enum != TrackingState.NOT_INITIALIZED:
            self._state_enum = TrackingState.INITIALIZING

    def shutdown(self) -> None:
        if self._uploader is not None:
            self._uploader.close()
            self._uploader = None
        self._pending_q.clear()
        self._step = None
        self._tracker_state = None
        self._state_enum = TrackingState.NOT_INITIALIZED
