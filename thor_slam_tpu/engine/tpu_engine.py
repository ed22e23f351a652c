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

from thor_slam_tpu import geometry
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


def _next_pow2(k: int, floor: int = 8) -> int:
    """Smallest power of two >= max(k, floor) (jit shape bucketing)."""
    cap = floor
    while cap < k:
        cap *= 2
    return cap


class TpuSlamEngine(SlamEngine):
    """Multi-camera stereo visual odometry on TPU (JAX/XLA).

    Args:
        params: Optional tracker parameter overrides (dict of
            :class:`~thor_slam_tpu.engine.tracker.TrackerParams` fields;
            num_cams/height/width are derived from calibration).
        lost_after: Consecutive low-inlier frames before LOST.
        enable_ba: Run track-level sliding-window bundle adjustment at
            every keyframe (default ON). Observations are the tracker's
            per-tick KLT positions joined across ticks by the persistent
            ``lm_id`` — immune to the keyframe-boundary id hops that made
            the earlier keyframe-snapshot backend net-neutral; measured
            -28% ATE on the synthetic orbit benchmark
            (tests/test_engine_ba_e2e.py). Runs at any pipeline depth:
            the window consumes only finalized-tick data and corrections
            land on the device as async delta updates (incompatible only
            with defer_sync, which never finalizes mid-stream).
        ba_window: Ticks per BA window (static pose count K).
        ba_landmarks: Landmark slots per BA window (static shape L).
        ba_tick_stride: Collect every Nth tick into the window (keyframe
            ticks always collected — they carry the stereo measurement).
        ba_max_correction_m: Reject a BA pose correction larger than this
            (junk guard).
        use_accel: Full-IMU translation prediction (default ON, requires
            ``use_imu``). The engine estimates gravity in its odom frame
            online — each pair of consecutive finalized windows measures
            ``g = a_world - R f`` from differenced average velocities and
            the mean specific force, folded into an EMA; no stationary
            period is needed and centripetal acceleration cancels exactly.
            Once converged (``gravity_min_ticks`` observations, plausible
            norm), the per-tick pose prediction upgrades from
            constant-velocity translation to the full preintegrated form
            ``p + v dt + 1/2 g dt^2 + R delta_p`` (the cuVSLAM IMU-fusion
            role, reference launch/thor_visual_slam.launch.py:80-104).
            Rotation is always gyro-preintegrated, as before.
        gravity_min_ticks: Gravity observations required before the accel
            term engages (constant-velocity fallback until then).
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
            (:meth:`_finalize_ready`). The FULL feature set runs at any
            depth — every host backend (IMU prediction, track-level BA,
            loop closure) consumes only finalized-tick data (packed
            outputs / ba_obs / kf_sig) and pushes corrections to the
            device as async delta updates, so nothing ever syncs on an
            in-flight tick.
        defer_sync: Offline/batch evaluation mode (dataset replay): no
            device sync happens until :meth:`flush`, which fetches every
            tick's outputs in one transfer and replays the host state
            machine. process_frames always returns None; collect poses
            from flush()/get_map(). Same restrictions as depth > 1. This
            is the fastest way through a recorded sequence — and on
            hosted/tunneled TPUs the ONLY fast way, since repeated small
            device_gets permanently degrade h2d throughput there.
        devices: Run the tracker SPMD over an N-device
            ``jax.sharding.Mesh`` (parallel/mesh.py). The sharding axis is
            chosen automatically: cameras when they divide the mesh (zero
            front-end communication), landmark slots otherwise (images
            replicated; KLT/PnP shard — the more-chips-than-cameras
            topology, e.g. EuRoC on a v5e-8 host). Every host subsystem
            (IMU prediction, track-level BA, loop closure, relocalize,
            save/load) runs unchanged against the sharded state. Default
            1 = single-chip.
    """

    def __init__(
        self,
        params: dict | None = None,
        lost_after: int = 5,
        enable_ba: bool = True,
        ba_window: int = 10,
        ba_landmarks: int = 384,
        ba_tick_stride: int = 2,
        ba_max_correction_m: float = 0.08,
        use_imu: bool = True,
        use_accel: bool = True,
        gravity_min_ticks: int = 30,
        imu_buffer_capacity: int = 256,
        loop_db_capacity: int = 256,
        loop_min_votes: int = 60,
        loop_min_inliers: int = 40,
        loop_exclude_recent: int = 12,
        loop_cooldown_kfs: int = 20,
        loop_min_correction_m: float = 0.05,
        loop_noise_gate_sigma: float = 3.0,
        prewarm_degraded: bool = False,
        pipelined: bool = False,
        pipeline_depth: int = 1,
        defer_sync: bool = False,
        devices: int | None = None,
    ) -> None:
        self._param_overrides = dict(params or {})
        self._devices = int(devices or 1)
        self._mesh = None
        self._prewarm_degraded = prewarm_degraded
        self._pipelined = pipelined
        if pipeline_depth < 1:
            raise ValueError("pipeline_depth must be >= 1")
        if defer_sync and not pipelined:
            raise ValueError("defer_sync requires pipelined=True")
        if defer_sync:
            # defer_sync never finalizes mid-stream, so no host subsystem
            # that needs per-tick finalized data (IMU prediction shadows,
            # the BA window, loop closure) can run — it is the pure-VO
            # dataset-replay mode. Deep pipelining (depth > 1) has no such
            # restriction: every host subsystem consumes only FINALIZED
            # tick data (packed outputs, ba_obs, kf_sig) and pushes
            # corrections to the device as async delta updates, so BA +
            # IMU + loop closure all run at any depth.
            if enable_ba:
                raise ValueError("defer_sync is incompatible with enable_ba")
            if use_imu:
                raise ValueError("defer_sync is incompatible with use_imu")
        self._pipeline_depth = pipeline_depth
        self._defer_sync = defer_sync
        self._uploader = None
        self._pending_q: deque[dict] = deque()
        self._lost_after = lost_after
        self._enable_ba = enable_ba
        self._ba_window = ba_window
        self._ba_landmarks = ba_landmarks
        self._ba_tick_stride = max(1, ba_tick_stride)
        self._ba_max_correction_m = ba_max_correction_m
        self._ba_ticks: deque[dict] = deque(maxlen=ba_window)
        self._ba_cam_rot: np.ndarray | None = None
        self._ba_cam_trans: np.ndarray | None = None
        self._use_imu = use_imu
        self._use_accel = bool(use_accel) and use_imu
        self._gravity_min_ticks = int(gravity_min_ticks)
        # Online gravity estimate in the ODOM frame (EMA over per-tick
        # observations g = a_w - R f; see _observe_gravity). None until the
        # first observation; accel-aided prediction engages only after
        # `gravity_min_ticks` observations with a plausible norm.
        self._gravity_w: np.ndarray | None = None
        self._gravity_n = 0
        self._imu_capacity = imu_buffer_capacity
        self._imu_ts: list[float] = []
        self._imu_gyro: list[np.ndarray] = []
        self._imu_accel: list[np.ndarray] = []
        self._body_r_imu = np.eye(3)
        self._loop_db: list[dict] = []
        self._loop_db_capacity = loop_db_capacity
        self._loop_min_votes = loop_min_votes
        self._loop_min_inliers = loop_min_inliers
        self._loop_exclude_recent = loop_exclude_recent
        self._loop_cooldown_kfs = loop_cooldown_kfs
        self._loop_min_correction = loop_min_correction_m
        self._loop_noise_gate_sigma = loop_noise_gate_sigma
        self._loop_cooldown = 0
        self._loops_closed = 0
        # Device-resident place-DB descriptor ring (fixed CAP shape,
        # donated in-place inserts): detection reads it where it lives
        # instead of re-uploading the multi-MB database per keyframe.
        self._dev_db_desc = None
        self._dev_db_valid = None
        self._db_insert = None
        self._kf_total = 0
        #: In-flight async loop detection/verification (see _poll_loop).
        self._loop_pending: dict | None = None
        self._want_reloc = False
        # MAP-frame correction of the tracker's smooth ODOM frame:
        # world(map)_T_world(odom). Loop closures compose into this
        # transform instead of rewriting the live tracker state — the
        # odometry stream stays smooth and the tracking front-end is never
        # perturbed mid-flight; everything the engine RETURNS (poses,
        # keyframes, map points) is lifted through it. This is the
        # map->odom factorization the reference's TF tree expresses
        # (reference scripts/publish_odom_tf.py:35-99).
        self._map_t_odom = np.eye(4)
        # ODOM-frame correction accumulated by track-level BA and applied
        # to the DEVICE state as async left-multiplied deltas
        # (_apply_ba_update). Each in-flight tick records the value at its
        # dispatch ("corr_epoch"); finalize left-applies the corrections
        # the device had not yet seen at that dispatch, so finalized poses
        # are consistent at any pipeline depth (identity at depth 1, where
        # every correction lands before the next dispatch). Replaced, never
        # mutated — records hold references.
        self._ba_corr_total = np.eye(4)
        # Host-side shadow of the most recent FINALIZED pose: what IMU
        # prediction and the velocity estimate read instead of the live
        # device state (reading the live state would sync on in-flight
        # ticks and, at depth > 1, read the wrong tick).
        self._fin_pose: np.ndarray | None = None
        self._fin_ts: float | None = None
        self._fin_vel = np.zeros(3)
        #: Timestamp of the finalized pose BEFORE the last one (None until
        #: two windows exist) — the gravity observation differentiates the
        #: average velocities of two consecutive finalized windows.
        self._fin_ts_prev: float | None = None
        # Correction-epoch identities at the last two finalizes. The
        # gravity observation double-differences three finalized poses; a
        # BA correction landing anywhere across that span would enter a_w
        # amplified 2/dt^2-fold (a 5 mm nudge at 30 fps reads as ~9 m/s^2
        # — inside the junk gate, and BA corrections are not zero-mean, so
        # the EMA would be directionally biased). Epochs are replaced,
        # never mutated, so identity comparison detects any correction.
        self._fin_epoch = None
        self._fin_epoch_prev = None
        # IMU prediction preintegrates (fin_ts, tick_ts] — a window that
        # spans `depth` ticks of samples when pipelined.
        self._imu_pred_capacity = 64 * max(1, pipeline_depth)
        #: Per-frame tracking diagnostics (updated by process_frames).
        self.last_diagnostics: dict = {}
        #: Count of IMU preintegration windows that contained no samples
        #: (nonzero growth while use_imu=True means the IMU path is dead).
        self.imu_empty_windows = 0
        #: Per-tick poses of the last defer_sync flush (same order as the
        #: processed frames; None entries where tracking was LOST).
        self.last_flush_poses: list[SlamPose | None] = []
        self._state_enum = TrackingState.NOT_INITIALIZED
        self._config = SlamConfig()
        self._step = None
        self._want_kf_sig = False
        self._apply_ba_update = None
        self._tracker_state = None
        self._assemble = None
        self._zero_img = None
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
        if self._defer_sync and self._config.enable_loop_closure:
            # defer_sync never finalizes mid-stream; the loop-closure hook
            # (which consumes finalized keyframe signatures) cannot run.
            logger.warning(
                "defer_sync: disabling loop closure (no mid-stream finalize)"
            )
            import dataclasses

            self._config = dataclasses.replace(self._config, enable_loop_closure=False)

        setup, self._source_order, height, width = build_camera_setup(calibration)
        self._setup = setup
        if calibration.imu_extrinsics is not None:
            ext = calibration.imu_extrinsics.extrinsics
            self._body_r_imu = np.asarray(ext.rotation, np.float64)
            if self._use_accel:
                # The accel path applies only the IMU ROTATION: with a
                # nonzero lever arm r the accelerometer also measures
                # w x (w x r) + alpha x r, which would leak into both the
                # gravity observation and delta_p under fast rotation.
                # OAK-family IMUs sit millimeters from CAM_A, so this is
                # noise-level there; warn when a rig claims otherwise.
                lever = float(
                    np.linalg.norm(np.asarray(ext.translation, np.float64))
                )
                if lever > 0.05:
                    logger.warning(
                        "use_accel with a %.0f cm IMU lever arm: centripetal"
                        "/tangential terms are uncompensated — expect accel-"
                        "prediction bias under fast rotation (set "
                        "use_accel=False or move the IMU extrinsic origin)",
                        lever * 100.0,
                    )

        self._params = trk.TrackerParams(
            num_cams=len(self._source_order),
            height=height,
            width=width,
            **self._param_overrides,
        )
        # donate: stream ticks reuse state buffers in place (per-tick churn
        # of the ~50 MB state otherwise degrades hosted-TPU h2d throughput
        # after ~60 ticks). pack: the host syncs on one fresh 228-byte
        # vector, never on the raw output tuple. "ba" adds the BA
        # measurement stream, "kf" the loop-closure keyframe signature —
        # all finalized-tick data, so every host backend runs without
        # touching the live device state. See make_track_step.
        want_kf_sig = self._config.enable_loop_closure
        if self._enable_ba:
            pack_mode = "ba+kf" if want_kf_sig else "ba"
        else:
            pack_mode = "kf" if want_kf_sig else True
        self._want_kf_sig = want_kf_sig
        if self._devices > 1:
            from thor_slam_tpu.parallel import mesh as mesh_mod

            n_avail = len(jax.devices())
            if n_avail < self._devices:
                raise RuntimeError(
                    f"devices={self._devices} requested but only {n_avail} "
                    "JAX devices are visible"
                )
            self._mesh = mesh_mod.make_camera_mesh(self._devices)
            axis_mode = mesh_mod.choose_axis(
                self._params.num_cams, self._params.max_keypoints, self._devices
            )
            self._step = mesh_mod.make_sharded_track_step(
                self._params, setup, self._mesh, axis_mode=axis_mode,
                donate=True, pack=pack_mode,
            )
            self._make_state = lambda: mesh_mod.shard_state(
                trk.init_state(self._params), self._mesh, axis_mode=axis_mode
            )
            logger.info(
                "SPMD tracking over %d devices (%s-sharded)", self._devices, axis_mode
            )
        else:
            self._step = trk.make_track_step(self._params, setup, donate=True, pack=pack_mode)
            self._make_state = lambda: trk.init_state(self._params)
        self._tracker_state = self._make_state()
        c_ = self._params.num_cams
        self._zero_img = np.zeros((height, width), np.uint8)
        #: Device-side batch assembly of the tick's 2C images (the host
        #: never materializes the dense stack — see _stage_list).
        self._assemble = jax.jit(
            lambda flat: jnp.stack(flat).reshape(c_, 2, height, width)
        )
        # BA camera axis (2C: left imagers then right imagers).
        self._ba_cam_rot = np.concatenate(
            [np.asarray(setup.cam_r_body), np.asarray(setup.cam_r_body_right)]
        )
        self._ba_cam_trans = np.concatenate(
            [np.asarray(setup.cam_t_body), np.asarray(setup.cam_t_body_right)]
        )
        self._pending_q.clear()
        if self._pipelined:
            from thor_slam_tpu.pipeline.transfer import DoubleBufferedUploader

            if self._uploader is not None:
                self._uploader.close()
            target = None
            if self._devices > 1:
                # SPMD: land the staged images mesh-replicated (an
                # explicit single-device put would COMMIT them to device 0
                # and conflict with the sharded step's inputs). Slot mode
                # consumes replicated images anyway; cam mode reshards
                # with a local slice — no collective.
                from jax.sharding import NamedSharding, PartitionSpec

                target = NamedSharding(self._mesh, PartitionSpec())
            self._uploader = DoubleBufferedUploader(
                stage_fn=self._stage_list, device=target
            )
        self._keyframe_poses = []
        self._ba_ticks.clear()
        self._low_inlier_streak = 0
        self._last_timestamp = None
        self._frame_count = 0
        self._ba_corr_total = np.eye(4)
        self._fin_pose = None
        self._fin_ts = None
        self._fin_vel = np.zeros(3)
        self._fin_ts_prev = None
        self._fin_epoch = None
        self._fin_epoch_prev = None
        self._gravity_w = None
        self._gravity_n = 0
        self._state_enum = TrackingState.INITIALIZING

        if self._enable_ba:
            # Async BA write-back: corrections land on the LIVE state as a
            # left-multiplied world-frame delta plus a by-id landmark
            # scatter — dispatched, never synced, so it is legal at any
            # pipeline depth (the delta transports through the relative
            # motion of ticks dispatched since the window's last tick).
            l_cap = self._ba_landmarks

            def _apply(state, t_corr, upd_ids, upd_pos, upd_ok):
                idx = jnp.clip(
                    jnp.searchsorted(upd_ids, state.lm_id), 0, l_cap - 1
                )
                hit = (upd_ids[idx] == state.lm_id) & state.lm_valid & upd_ok[idx]
                return state._replace(
                    world_t_body=t_corr @ state.world_t_body,
                    prev_world_t_body=t_corr @ state.prev_world_t_body,
                    kf_world_t_body=t_corr @ state.kf_world_t_body,
                    velocity_w=t_corr[:3, :3] @ state.velocity_w,
                    lm_pos_w=jnp.where(hit[..., None], upd_pos[idx], state.lm_pos_w),
                )

            self._apply_ba_update = jax.jit(_apply, donate_argnums=(0,))

        # jit warm-up so the first real tick doesn't pay compilation.
        # uint8 is the runtime dtype (camera drivers and dataset replay all
        # produce uint8; the step normalizes on device) — float frames are
        # the rare case and pay one compile on their first tick.
        t0 = time.monotonic()

        def dummy():  # fresh per call: the step donates its images argument
            return jnp.zeros((self._params.num_cams, 2, height, width), jnp.uint8)
        # Each warm-up call mirrors a runtime (pose_prediction, cam_active)
        # pattern EXACTLY, including arity: jax.jit caches per call signature,
        # so step(s, i) and step(s, i, None, None) are two separate traces —
        # warming one does not warm the other (measured: a silent full
        # recompile on the first real frame). process_frames always uses the
        # 4-argument form; so must every warm-up. Every call gets a FRESH
        # throwaway state: the step donates its state argument, so a state
        # must never be passed twice.
        warm_variants: list[tuple] = [(None, None)]
        if self._use_imu:
            warm_variants.append((jnp.eye(4), None))
        if self._prewarm_degraded:
            # Compile the cam_active variant now so a camera dying at runtime
            # costs one masked tick, not a mid-flight jit compile (set this
            # when the rig has a watchdog).
            ones = jnp.ones(self._params.num_cams, bool)
            warm_variants.append((None, ones))
            if self._use_imu:
                warm_variants.append((jnp.eye(4), ones))
        jax.block_until_ready(self._assemble([self._zero_img] * (2 * c_)))
        for pred, mask in warm_variants:
            outs = self._step(self._make_state(), dummy(), pred, mask)
            jax.block_until_ready(outs[2])  # the packed vector
        if self._enable_ba:
            # Warm the async BA write-back too (donates its state — use a
            # fresh throwaway, same rule as the step warm-ups above).
            warmed = self._apply_ba_update(
                self._make_state(),
                jnp.eye(4),
                jnp.full(self._ba_landmarks, np.iinfo(np.int32).max, jnp.int32),
                jnp.zeros((self._ba_landmarks, 3)),
                jnp.zeros(self._ba_landmarks, bool),
            )
            jax.block_until_ready(warmed.world_t_body)
        logger.info(
            "TpuSlamEngine initialized: %d cams @ %dx%d (warm-up %.1fs)",
            self._params.num_cams, width, height, time.monotonic() - t0,
        )

    # ------------------------------------------------------------ tracking

    def process_frames(self, frame_set: SynchronizedFrameSet) -> SlamPose | None:
        if self._step is None:
            raise RuntimeError("initialize() must be called before process_frames()")

        if not self._pipelined:
            images = self._assemble(jax.device_put(self._stage_list(frame_set)))
            return self._finalize_tick(self._dispatch_tick(images, frame_set))

        # Pipelined: stage/upload tick k on the uploader thread while the
        # device still computes earlier ticks and the host finalizes them.
        # `pipeline_depth` ticks of pose latency (see class docstring).
        # defer_sync: never sync mid-stream — on hosted/tunneled TPUs even
        # small per-tick device_gets permanently degrade h2d throughput
        # (measured); flush() fetches every tick's outputs in ONE transfer.
        self._uploader.submit(frame_set)
        pose = None
        if not self._defer_sync and len(self._pending_q) >= self._pipeline_depth:
            pose = self._finalize_ready()
        images = self._assemble(self._uploader.get())
        self._pending_q.append(self._dispatch_tick(images, frame_set))
        return pose

    def flush(self) -> SlamPose | None:
        """Finalize all in-flight ticks (pipelined mode; no-op otherwise).

        In ``defer_sync`` mode this is where the entire stream's outputs
        come back: one batched device_get over every deferred tick, then
        the host state machine replays them in order (poses land in
        ``get_map().keyframe_poses`` / the caller's collected returns).
        """
        if self._defer_sync and self._pending_q:
            records = list(self._pending_q)
            self._pending_q.clear()
            self._fetch_records(records)
            pose = None
            self.last_flush_poses = []
            for rec in records:
                pose = self._finalize_values(rec, rec["packed"])
                self.last_flush_poses.append(pose)
            return pose
        pose = None
        while self._pending_q:
            pose = self._finalize_ready()
        # Stream end: drain a loop detection still in flight (blocking —
        # the fetches are tiny) so a closure at the tail isn't dropped.
        self._poll_loop(block=True)
        return pose

    def _dispatch_tick(self, images: jnp.ndarray, frame_set: SynchronizedFrameSet) -> dict:
        """Front half of a tick: IMU ingest/prediction + async step dispatch.

        Returns the pending record for :meth:`_finalize_tick`; the device
        computes while the host goes on (JAX dispatch is asynchronous).
        """
        if self._want_reloc:
            # Relocalization rewrites the live state wholesale: finalize
            # every in-flight tick first so no pending record's outputs
            # straddle the discontinuity.
            while self._pending_q:
                self._finalize_ready()
            if self._attempt_relocalization(frame_set):
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

        # The raw output tuple may alias donated state buffers (invalid
        # after the NEXT dispatch) — only the packed vectors are retained.
        outs = self._step(self._tracker_state, images, pose_prediction, cam_active)
        self._tracker_state = outs[0]
        packed = outs[2]
        i = 3
        ba_obs = kf_sig = None
        if self._enable_ba:
            ba_obs = outs[i]
            i += 1
        if self._want_kf_sig:
            kf_sig = outs[i]
        rec = {
            "packed": packed,
            "ba_obs": ba_obs,
            "kf_sig": kf_sig,
            "corr_epoch": self._ba_corr_total,
            "ts": frame_set.timestamp,
            "stale_sources": frame_set.stale_sources,
            "pred": pose_prediction,  # diagnostics: residual at finalize
        }
        # Start the d2h copies at DISPATCH: the copy is enqueued behind the
        # producing computation and lands host-side while the record waits
        # in the pipeline queue, so the finalize-time fetch reads a cached
        # host value (~0.3 ms) instead of paying a device round trip
        # (~27 ms on a tunneled TPU, measured — the e2e limiter).
        for k in self._FETCH_KEYS:
            v = rec.get(k)
            if v is not None:
                v.copy_to_host_async()
        return rec

    #: Device-array record keys fetched at finalize, in order.
    _FETCH_KEYS = ("packed", "ba_obs", "kf_sig")

    def _fetch_records(self, records: list[dict]) -> None:
        """ONE batched device_get of every record's device outputs.

        Only the fresh packed vectors are fetched — touching any member of
        the raw output tuple can materialize the full ~50 MB output buffer
        set on remote TPUs (measured ~0.5 s/tick). The fetched numpy
        arrays replace the device arrays in each record in place.
        """
        keys = [
            [k for k in self._FETCH_KEYS if rec.get(k) is not None]
            for rec in records
        ]
        tree = tuple(tuple(rec[k] for k in ks) for rec, ks in zip(records, keys))
        # Start every leaf's d2h copy before blocking on any: device_get
        # materializes leaves sequentially, and on a remote/tunneled TPU
        # each blocking fetch pays a full network RTT (measured ~16 ms —
        # 3 leaves/tick made the RTT, not the bytes, the e2e limiter).
        for rec, ks in zip(records, keys):
            for k in ks:
                try:
                    rec[k].copy_to_host_async()
                except AttributeError:  # non-jax leaf (already numpy)
                    pass
        values = jax.device_get(tree)
        for rec, ks, vals in zip(records, keys, values):
            for k, v in zip(ks, vals):
                rec[k] = v

    def _finalize_tick(self, pending: dict) -> SlamPose | None:
        """Back half of a tick: fetch outputs, run the host state machine."""
        self._fetch_records([pending])
        return self._finalize_values(pending, pending["packed"])

    def _finalize_ready(self) -> SlamPose | None:
        """Finalize the oldest pending tick — and, in the SAME device
        round trip, every newer tick whose outputs are already computed.

        On a remote/tunneled TPU a host sync costs a full network RTT
        (measured ~27 ms here); batching the fetches amortizes that across
        `pipeline_depth` ticks instead of paying it per tick.
        """
        q = self._pending_q
        take = 1
        while take < len(q) and q[take]["packed"].is_ready():
            take += 1
        records = [q.popleft() for _ in range(take)]
        self._fetch_records(records)
        pose = None
        for rec in records:
            pose = self._finalize_values(rec, rec["packed"])
        return pose

    def _finalize_values(self, pending: dict, packed_vec) -> SlamPose | None:
        """Host state machine for one tick, given the fetched packed vector."""
        # Advance any in-flight loop detection first (non-blocking): a
        # keyframe's lookup dispatched N ticks ago resolves here without
        # the host ever syncing on it.
        self._poll_loop()
        vals = trk.unpack_output(packed_vec)
        world_t_body = vals["world_t_body"]
        num_inliers = vals["num_inliers"]
        refreshed = vals["refreshed"]
        rms = vals["rms_error"]
        n_lm = vals["num_landmarks"]
        covariance = vals["covariance"]
        refreshed = bool(refreshed)
        world_t_body = np.asarray(world_t_body, np.float64)

        # Prediction residual BEFORE the epoch lift: the prediction was
        # expressed in the device's dispatch-time frame, same as the raw
        # solved pose (both sides of the comparison pre-correction).
        pred = pending.get("pred")
        pred_err = (
            None
            if pred is None
            else float(
                np.linalg.norm(
                    np.asarray(pred, np.float64)[:3, 3] - world_t_body[:3, 3]
                )
            )
        )

        # Corrections the device had NOT yet seen when this tick was
        # dispatched (BA deltas applied to the live state after it):
        # left-apply them so every finalized pose is expressed in the same
        # odom frame regardless of pipeline depth. At depth 1 the epoch is
        # always current (`is` fast path — corrections land before the
        # next dispatch) and this is a no-op.
        epoch = pending.get("corr_epoch")
        if epoch is not None and epoch is not self._ba_corr_total:
            missing = self._ba_corr_total @ np.linalg.inv(epoch)
            world_t_body = missing @ world_t_body
            covariance = geometry.rotate_cov6(missing[:3, :3], covariance)
            # The landmark-position channels shipped with this tick are in
            # the same pre-correction frame — lift them too (channel
            # layouts: pack_ba_obs pos = 7:10, pack_kf_sig pos = 11:14).
            for key, sl in (("ba_obs", slice(7, 10)), ("kf_sig", slice(11, 14))):
                arr = pending.get(key)
                if arr is not None:
                    arr = np.array(arr)  # device_get arrays are read-only
                    arr[..., sl] = arr[..., sl] @ missing[:3, :3].T.astype(
                        arr.dtype
                    ) + missing[:3, 3].astype(arr.dtype)
                    pending[key] = arr

        self.last_diagnostics = {
            "num_inliers": num_inliers,
            "num_landmarks": int(n_lm),
            "rms_error": float(rms),
            "refreshed": refreshed,
            "stale_sources": sorted(pending["stale_sources"]),
        }
        if pred_err is not None:
            self.last_diagnostics["imu_pred_err_m"] = pred_err
        if self._use_accel:
            self.last_diagnostics["accel_pred"] = self._accel_pred_active()
            if self._gravity_w is not None:
                self.last_diagnostics["gravity_norm"] = float(
                    np.linalg.norm(self._gravity_w)
                )

        # Velocity estimate for the constant-velocity model — differenced
        # from the FINALIZED pose shadow (never the live device state,
        # which would sync on in-flight compute and, at depth > 1, read
        # the wrong tick). Consumed host-side by _imu_pose_prediction.
        ts = pending["ts"]
        if self._fin_ts is not None and ts > self._fin_ts:
            v_new = (world_t_body[:3, 3] - self._fin_pose[:3, 3]) / (
                ts - self._fin_ts
            )
            if (
                self._use_accel
                and self._fin_ts_prev is not None
                and num_inliers >= self._params.min_track_inliers
                and self._fin_epoch_prev is self._ba_corr_total
            ):
                # Only tracked solves observe gravity: warm-up poses are
                # noise and double-differencing amplifies them 2/dt^2-fold.
                # The epoch-identity gate skips any observation whose span
                # saw a BA correction (see _fin_epoch above).
                self._observe_gravity(v_new, ts)
            self._fin_ts_prev = self._fin_ts
            self._fin_epoch_prev = self._fin_epoch
            self._fin_vel = v_new
        self._fin_pose = world_t_body
        self._fin_ts = ts
        self._fin_epoch = self._ba_corr_total
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

        if self._enable_ba:
            tracked_now = num_inliers >= min_inl and self._frame_count > 1
            if tracked_now and (
                refreshed or (self._frame_count % self._ba_tick_stride == 0)
            ):
                self._push_ba_tick(pending, world_t_body, ts, refreshed)
            elif refreshed:
                # A refresh while untracked is a VO restart: landmark ids
                # are freshly minted and the old window cannot join.
                self._ba_ticks.clear()

        if refreshed and self._state_enum == TrackingState.TRACKING and self._enable_ba:
            world_t_body = self._run_tracklevel_ba(world_t_body, covariance)  # odom
            # Keep the shadow on the corrected pose: the device state just
            # received the same delta, and the next IMU prediction must
            # integrate from where the device actually is.
            self._fin_pose = world_t_body
            self._fin_epoch = self._ba_corr_total

        # MAP-side bookkeeping: keyframes and the place DB live in the map
        # frame (the smooth odom pose lifted through the accumulated
        # loop-closure correction). The live tracker state stays odom-frame
        # and is never perturbed by closures.
        if refreshed and self._state_enum == TrackingState.TRACKING:
            map_pose = self._map_t_odom @ world_t_body
            self._keyframe_poses.append(
                SlamPose.from_4x4_matrix(map_pose, timestamp=ts)
            )
            if self._config.enable_loop_closure:
                self._loop_closure_tick(map_pose, ts, pending.get("kf_sig"))
            if len(self._keyframe_poses) > 10000:
                self._keyframe_poses = self._keyframe_poses[-10000:]

        # The RETURNED pose is the SMOOTH odometry-frame estimate — the
        # reference's exact semantics: cuVSLAM publishes smooth VO on the
        # odometry topic (what the adapter's process_frames returns,
        # reference isaac_ros.py:308-325) and loop corrections ride the
        # map->odom transform published separately (the role of reference
        # scripts/publish_odom_tf.py). The corrected world estimate is
        # ``map_t_odom @ pose`` — see :attr:`map_t_odom`.
        # Confidence from the pose covariance, exactly the reference's
        # formula over the engine-provided 6x6 (reference isaac_ros.py:312:
        # confidence = 1 / (1 + trace)).
        confidence = float(1.0 / (1.0 + np.trace(covariance)))
        pose = SlamPose.from_4x4_matrix(
            world_t_body,
            timestamp=ts,
            tracking_state=self._state_enum,
            confidence=confidence,
        )
        pose.covariance = covariance
        if self._state_enum == TrackingState.LOST and num_inliers < min_inl // 2:
            return None
        return pose

    @property
    def map_t_odom(self) -> np.ndarray:
        """(4, 4) map<-odom correction accumulated by loop closures.

        ``process_frames`` returns the SMOOTH odometry-frame pose (the
        reference's odometry-topic semantics); the loop-corrected world
        estimate is ``map_t_odom @ pose.to_4x4_matrix()``. The ROS bridge
        publishes this as the map->odom transform (the reference completes
        the same TF tree with scripts/publish_odom_tf.py).
        """
        return self._map_t_odom.copy()

    def get_world_pose(self, pose: SlamPose) -> SlamPose:
        """Lift an odometry-frame pose into the loop-corrected map frame."""
        lifted = SlamPose.from_4x4_matrix(
            self._map_t_odom @ pose.to_4x4_matrix(),
            timestamp=pose.timestamp,
            tracking_state=pose.tracking_state,
            confidence=pose.confidence,
        )
        if pose.covariance is not None:
            from thor_slam_tpu import geometry

            lifted.covariance = geometry.rotate_cov6(self._map_t_odom[:3, :3], pose.covariance)
        return lifted

    def get_tracking_state(self) -> TrackingState:
        return self._state_enum

    def _stage_list(self, frame_set: SynchronizedFrameSet) -> list[np.ndarray]:
        """Stage the tick as a ZERO-COPY list of per-imager host arrays.

        No host-side stacking: a dense (C, 2, H, W) stack is a 7+ MB memcpy
        per tick that dominates the loop on weak hosts (measured ~50 ms on
        a 1-core box). Instead each image ships as its own (async)
        device_put straight from the driver's buffer and the device
        assembles the batch (:attr:`_assemble`) — per-put overhead is
        ~0.3 ms against tens of ms saved.

        uint8 frames stay uint8 (the jitted step normalizes on device: 1/4
        the transfer bytes). A watchdog-stale source that died before
        producing any frame has no entry in ``frame_sets`` — it is
        zero-filled here (and masked out of the solve via ``cam_active``).
        """
        flat: list[np.ndarray] = []
        for name in self._source_order:
            fs = frame_set.frame_sets.get(name)
            if fs is None:
                flat.extend([self._zero_img] * 2)
            else:
                flat.extend(np.ascontiguousarray(f.image) for f in fs.frames)
        if any(im.dtype != flat[0].dtype for im in flat):
            flat = [np.asarray(im, np.float32) for im in flat]
        return flat

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

    def _observe_gravity(self, v_new: np.ndarray, ts: float) -> None:
        """Fold one gravity observation (odom frame) into the EMA.

        Between the midpoints of two consecutive finalized windows the
        differenced average velocities measure the TOTAL world-frame
        acceleration; subtracting the rotated mean specific force over the
        same interval leaves gravity: ``f = R^T (a_w - g)`` so
        ``g = a_w - R f``. Valid under arbitrary motion — centripetal and
        linear acceleration appear identically in both terms and cancel —
        so no quasi-static gate is needed; the EMA absorbs the
        velocity-differencing noise.
        """
        m0 = 0.5 * (self._fin_ts_prev + self._fin_ts)
        m1 = 0.5 * (self._fin_ts + ts)
        dt = m1 - m0
        if dt <= 1e-6 or not self._imu_ts:
            return
        ts_arr = np.asarray(self._imu_ts)
        sel = (ts_arr > m0) & (ts_arr <= m1)
        if not np.any(sel):
            return
        f_imu = np.mean(np.asarray(self._imu_accel)[sel], axis=0)
        a_w = (v_new - self._fin_vel) / dt
        g_obs = a_w - self._fin_pose[:3, :3] @ (self._body_r_imu @ f_imu)
        # Junk-only guard (solve glitch, clock skew, teleport). Individual
        # observations are dominated by double-differencing noise (sigma ~
        # 2 sigma_p / dt^2 — tens of m/s^2 at millimeter solve noise), but
        # the noise is zero-mean; a TIGHT norm gate here would clip the
        # distribution asymmetrically and bias the mean low (measured:
        # a (4, 16) gate converged to |g| = 6.3).
        if float(np.linalg.norm(g_obs)) > 60.0:
            return
        if self._gravity_w is None:
            self._gravity_w = g_obs
        else:
            # Running mean first (the estimator must average the noise
            # down, not anchor on the earliest samples), then a slow EMA
            # so the estimate tracks odom-frame drift.
            alpha = max(1.0 / (self._gravity_n + 1.0), 0.005)
            self._gravity_w = (1.0 - alpha) * self._gravity_w + alpha * g_obs
        self._gravity_n += 1

    def _accel_pred_active(self) -> bool:
        """Whether the accel term of the pose prediction is engaged."""
        return (
            self._use_accel
            and self._gravity_w is not None
            and self._gravity_n >= self._gravity_min_ticks
            and 8.0 < float(np.linalg.norm(self._gravity_w)) < 12.0
        )

    def _imu_pose_prediction(self, ts: float) -> np.ndarray | None:
        """Preintegrated IMU pose prediction from the finalized shadow.

        Rotation is always gyro-preintegrated (the part that breaks
        constant-velocity models). Translation upgrades from
        constant-velocity extrapolation to the full Forster form
        ``p + v dt + 1/2 g dt^2 + R delta_p`` once the online odom-frame
        gravity estimate has converged (see :meth:`_observe_gravity`) —
        the cuVSLAM IMU-fusion role (reference
        launch/thor_visual_slam.launch.py:80-104).

        Known half-step bias: ``_fin_vel`` is the PREVIOUS interval's
        average velocity, which lags the instantaneous v(fin_ts) by
        ~a*dt/2; under constant acceleration the Forster term then cancels
        about half the constant-velocity error rather than all of it. The
        residual (~a*dt^2/2, sub-millimeter at 30 fps and 1 m/s^2) is well
        inside KLT's convergence basin, which is all this prediction
        feeds; propagating the velocity to the window start would couple
        the gravity EMA's noise into every tick for no measured ATE gain.
        """
        if self._fin_ts is None or len(self._imu_ts) < 2:
            return None
        from thor_slam_tpu.engine import imu as imu_mod

        # Window starts at the last FINALIZED tick (the pose shadow's
        # timestamp): at pipeline depth d the window spans d+1 ticks of
        # samples, so the prediction always integrates from a pose the
        # host actually has (never the in-flight live state).
        g, a, d, m = imu_mod.pack_imu_window(
            self._imu_ts, self._imu_gyro, self._imu_accel,
            t_start=self._fin_ts, t_end=ts, capacity=self._imu_pred_capacity,
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
        # Host (no device round trip). Before gravity convergence the
        # accel integral would be meaningless, so only delta_r is
        # integrated and translation stays constant-velocity.
        rbi = self._body_r_imu
        accel_active = self._accel_pred_active()
        if accel_active:
            pre = imu_mod.preintegrate_fast_np(g, a, d, m)
            delta_r_body = rbi @ pre.delta_r @ rbi.T
        else:
            delta_r_body = rbi @ imu_mod.gyro_delta_r_np(g, d, m) @ rbi.T

        # Integrate forward from the finalized-pose SHADOW: reading the
        # live device state here would block on every in-flight tick (a
        # full network RTT per tick on tunneled TPUs) and at depth > 1
        # would read a pose ticks ahead of the IMU window's start.
        fin = self._fin_pose
        pred = np.eye(4)
        pred[:3, :3] = fin[:3, :3] @ delta_r_body
        pred[:3, 3] = fin[:3, 3] + self._fin_vel * (ts - self._fin_ts)
        if accel_active:
            # Forster propagation: the specific-force double integral
            # (rotated into the body frame at the window start) plus the
            # gravity parabola over the integrated span. delta_p spans
            # pre.dt (the samples' coverage), which may trail ts by a
            # fraction of a sample period — the constant-velocity term
            # above already covers the full (fin_ts, ts] gap.
            pred[:3, 3] += 0.5 * self._gravity_w * pre.dt * pre.dt + fin[
                :3, :3
            ] @ (rbi @ pre.delta_p)
        # numpy, NOT jnp.asarray(..., f32): an eager dtype-converting
        # device op costs a dispatch round trip per tick on remote TPUs
        # (measured ~3.6 ms); the jitted step's call boundary uploads the
        # 64-byte operand for free.
        return pred.astype(np.float32)

    # ----------------------------------------------------- loop closure

    def _ensure_dev_db(self) -> None:
        """Allocate the device-resident descriptor ring + insert kernel."""
        if self._dev_db_desc is not None:
            return
        cap, n = self._loop_db_capacity, self._params.max_keypoints
        self._dev_db_desc = jnp.zeros((cap, n, 8), jnp.uint32)
        self._dev_db_valid = jnp.zeros((cap, n), bool)

        def insert(db_d, db_v, slot, d, v):
            return (
                jax.lax.dynamic_update_index_in_dim(db_d, d, slot, 0),
                jax.lax.dynamic_update_index_in_dim(db_v, v, slot, 0),
            )

        self._db_insert = jax.jit(insert, donate_argnums=(0, 1))

    def _rebuild_dev_db(self) -> None:
        """Re-seed the device ring from the host DB (map load / reset)."""
        self._dev_db_desc = None
        if not self._loop_db:
            return
        self._ensure_dev_db()
        cap = self._loop_db_capacity
        n = self._params.max_keypoints
        desc = np.zeros((cap, n, 8), np.uint32)
        valid = np.zeros((cap, n), bool)
        for e in self._loop_db:
            # A loaded map may have been recorded at a different keypoint
            # budget — crop/zero-pad its rows into this session's shape.
            k = min(n, e["desc"].shape[0])
            desc[e["slot"], :k] = e["desc"][:k]
            valid[e["slot"], :k] = e["valid"][:k]
        self._dev_db_desc = jnp.asarray(desc)
        self._dev_db_valid = jnp.asarray(valid)

    def _loop_closure_tick(
        self, world_t_body: np.ndarray, ts: float, kf_sig: np.ndarray | None
    ) -> None:
        """Keyframe hook: update the place DB, detect + close loops.

        ``world_t_body`` is the MAP-frame keyframe pose; ``kf_sig`` the
        tick's fetched camera-0 signature (``pack_kf_sig``) — the
        FINALIZED tick's own bank, so this hook never reads the live
        device state (which would sync on in-flight ticks and, under deep
        pipelining, belong to a later frame than the keyframe being
        recorded). A closure is applied by composing the pose-graph's
        correction into ``_map_t_odom`` and rewriting the MAP-side
        artifacts (place DB, keyframe trajectory); the live tracker state
        (odom frame) is never touched — the front-end keeps tracking
        against an unperturbed landmark bank, and the odometry stream
        stays smooth. Keyframes older than the DB window need no seam
        correction: the pose graph gauge-anchors the window's oldest node
        (posegraph.optimize), so the rewritten window connects to the
        pre-window trajectory continuously by construction (verified by
        tests/test_engine_loop_e2e.py long-run continuity).
        """
        if kf_sig is None:
            return
        sig = trk.unpack_kf_sig(kf_sig)
        m = self._map_t_odom
        # Camera-0 slice of the fresh keyframe is the place signature.
        # Landmark positions are stored in the MAP frame so verification
        # against them yields map-frame constraints directly.
        slot = self._kf_total % self._loop_db_capacity
        self._kf_total += 1
        entry = {
            "desc": sig["desc"],
            "valid": sig["valid"],
            "lm_w": sig["pos"] @ m[:3, :3].T + m[:3, 3],
            "obs_px": sig["obs_px"],
            "world_t_body": world_t_body.copy(),
            "ts": ts,
            "slot": slot,
        }
        self._loop_db.append(entry)
        if len(self._loop_db) > self._loop_db_capacity:
            # Insertion order == slot order, so truncating the host list
            # drops exactly the entry whose ring slot is being reused.
            self._loop_db = self._loop_db[-self._loop_db_capacity :]
        # Device-resident descriptor ring: ONE incremental ~10 KB insert
        # per keyframe instead of re-uploading the whole multi-MB database
        # at every detection (donated in-place update, fixed CAP shape —
        # compiles once).
        self._ensure_dev_db()
        self._dev_db_desc, self._dev_db_valid = self._db_insert(
            self._dev_db_desc, self._dev_db_valid,
            jnp.asarray(slot, jnp.int32),
            jnp.asarray(entry["desc"]), jnp.asarray(entry["valid"]),
        )

        if self._loop_cooldown > 0:
            self._loop_cooldown -= 1
            return
        if len(self._loop_db) <= self._loop_exclude_recent + 1:
            return
        if self._loop_pending is not None:
            return  # a detection/verification is still in flight

        # Eligibility mask over ring slots: present entries minus the
        # recent temporal neighbors (and the query itself).
        mask = np.zeros(self._loop_db_capacity, np.float32)
        for e in self._loop_db[: -self._loop_exclude_recent - 1]:
            mask[e["slot"]] = 1.0

        # ASYNC detection: dispatch the MXU lookup against the resident
        # ring and poll `votes.is_ready()` on later finalizes — the host
        # never blocks on it, so a keyframe costs zero device syncs here
        # (a closure lands a tick or two after its keyframe; loop
        # corrections are latency-tolerant by construction).
        cand = loop.find_candidate(
            jnp.asarray(entry["desc"]), jnp.asarray(entry["valid"]),
            self._dev_db_desc, self._dev_db_valid, jnp.asarray(mask),
        )
        self._loop_pending = {
            "stage": "find",
            "cand": cand,
            "query": entry,
            "query_map_pose": world_t_body.copy(),
        }

    def _poll_loop(self, block: bool = False) -> None:
        """Advance the async loop-closure machine (non-blocking by default).

        Stages: ``find`` (appearance lookup in flight) -> ``verify``
        (geometric RANSAC in flight) -> apply (pose graph, host-gated).
        Called at every finalize; with ``block=True`` (stream flush) it
        drains to completion.
        """
        p = self._loop_pending
        if p is None:
            return
        if p["stage"] == "find":
            if not (block or p["cand"].votes.is_ready()):
                return
            votes_a, slot_a = jax.device_get(
                (p["cand"].votes, p["cand"].keyframe)
            )  # one round trip
            votes = int(votes_a)
            if votes < self._loop_min_votes:
                self._loop_pending = None
                return
            slot = int(slot_a)
            cand_e = next((e for e in self._loop_db if e["slot"] == slot), None)
            if cand_e is None:  # evicted while the lookup was in flight
                self._loop_pending = None
                return
            entry = p["query"]
            # Geometric verification: candidate's landmarks vs the query's
            # observations — dispatched async, polled like the lookup.
            k0 = np.asarray(self._setup.k_left[0])
            d0 = np.asarray(self._setup.dist_left[0])
            xn = np.stack(
                [
                    (entry["obs_px"][:, 0] - k0[2]) / k0[0],
                    (entry["obs_px"][:, 1] - k0[3]) / k0[1],
                ],
                -1,
            )
            obs_norm = rectify.undistort_normalized(xn, d0).astype(np.float32)
            p["ver"] = loop.verify_candidate(
                jax.random.PRNGKey(self._frame_count),
                jnp.asarray(cand_e["lm_w"], jnp.float32),
                jnp.asarray(cand_e["valid"]),
                jnp.asarray(cand_e["desc"]),
                jnp.asarray(obs_norm),
                jnp.asarray(entry["desc"]),
                jnp.asarray(entry["valid"]),
                jnp.asarray(self._setup.cam_r_body[0]),
                jnp.asarray(self._setup.cam_t_body[0]),
                jnp.asarray(np.linalg.inv(p["query_map_pose"]), jnp.float32),
                min_inliers=self._loop_min_inliers,
            )
            p["votes"] = votes
            p["cand_e"] = cand_e
            p["stage"] = "verify"
            if not block:
                return
        if p["stage"] == "verify":
            if not (block or p["ver"].accepted.is_ready()):
                return
            ver = loop.LoopVerification(*jax.device_get(tuple(p["ver"])))
            self._loop_pending = None
            if not bool(ver.accepted):
                return
            self._apply_loop_closure(p, ver)

    def _apply_loop_closure(self, p: dict, ver) -> None:
        """Gate and apply a verified loop constraint (host, MAP side only)."""
        entry = p["query"]
        cand_e = p["cand_e"]
        world_t_body = p["query_map_pose"]
        # Discrepancy gate: the loop constraint must disagree with the
        # query's map-frame pose by more than the constraint's OWN noise
        # floor — the verification solve's covariance (its residual-scaled
        # inverse Hessian), not an arbitrary constant. A constraint that
        # cannot distinguish the drift from its own noise has nothing to
        # correct; "closing" it would only inject that noise into the map.
        loop_pose_est = np.linalg.inv(np.asarray(ver.body_t_candidate, np.float64))
        disc = np.linalg.norm(loop_pose_est[:3, 3] - world_t_body[:3, 3])
        sigma_t = float(np.sqrt(max(np.trace(np.asarray(ver.covariance)[:3, :3]), 0.0)))
        noise_floor = max(self._loop_min_correction, self._loop_noise_gate_sigma * sigma_t)
        if disc < noise_floor:
            self._loop_cooldown = self._loop_cooldown_kfs
            self.last_diagnostics["loop_skip"] = (
                f"disc {disc:.4f} m < floor {noise_floor:.4f} m (sigma {sigma_t:.4f})"
            )
            return
        try:
            ci = next(i for i, e in enumerate(self._loop_db) if e is cand_e)
            qi = next(i for i, e in enumerate(self._loop_db) if e is entry)
        except StopIteration:
            return  # evicted while verification was in flight

        # Pose-graph over the loop DB trajectory: odometry chain + loop
        # edge. Node/edge arrays are padded to a power of two (masked) so
        # the jitted solve compiles O(log capacity) times, not per-closure.
        # The loop edge sits between the CURRENT indices of the candidate
        # and the query (keyframes may have been appended while the
        # verification was in flight — the query need not be the last
        # node).
        poses = np.stack([e["world_t_body"] for e in self._loop_db]).astype(np.float32)
        kk = poses.shape[0]
        kk_pad = _next_pow2(kk)
        e_cap = kk_pad  # chain (kk-1 edges) + 1 loop edge + masked padding
        ei, ej, et, w = posegraph.sequential_graph(poses, capacity_edges=e_cap)
        ei[kk - 1], ej[kk - 1] = ci, qi
        et[kk - 1] = np.linalg.inv(cand_e["world_t_body"]) @ loop_pose_est
        w[kk - 1] = 3.0
        poses_pad = np.tile(np.eye(4, dtype=np.float32), (kk_pad, 1, 1))
        poses_pad[:kk] = poses
        node_mask = np.zeros(kk_pad, np.float32)
        node_mask[:kk] = 1.0
        graph = posegraph.PoseGraph(
            poses=jnp.asarray(poses_pad), node_mask=jnp.asarray(node_mask),
            edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
            edge_t=jnp.asarray(et), edge_weight=jnp.asarray(w),
        )
        opt_poses, _ = posegraph.optimize(graph)
        opt_poses = np.asarray(opt_poses, np.float64)[:kk]

        # Apply — MAP side only. The newest node's correction composes into
        # the map<-odom transform (every future pose/keyframe/map-point is
        # lifted through it), the pose graph's smoothed poses rewrite the
        # DB and the keyframe trajectory. The live tracker state (odom) is
        # deliberately untouched: rewriting the landmark bank mid-flight
        # perturbed KLT/PnP and measurably REGRESSED the live stream at
        # low-drift operating points (BASELINE.md ablation round 2:
        # odometry ATE 14.55 -> 15.98 cm) while the map barely gained.
        t_corr = opt_poses[-1] @ np.linalg.inv(poses[-1].astype(np.float64))
        for idx, e in enumerate(self._loop_db):
            e["world_t_body"] = opt_poses[idx]
            # Keep stored landmarks consistent with their rewritten anchor.
            node_corr = opt_poses[idx] @ np.linalg.inv(poses[idx].astype(np.float64))
            e["lm_w"] = e["lm_w"] @ node_corr[:3, :3].T + node_corr[:3, 3]
        n_kf = min(len(self._keyframe_poses), kk)
        for j in range(n_kf):
            old = self._keyframe_poses[-n_kf + j]
            self._keyframe_poses[-n_kf + j] = SlamPose.from_4x4_matrix(
                opt_poses[kk - n_kf + j], timestamp=old.timestamp
            )

        self._map_t_odom = t_corr @ self._map_t_odom
        self._loops_closed += 1
        self._loop_cooldown = self._loop_cooldown_kfs
        logger.info(
            "Loop closed: kf %d <-> %d (votes=%d inliers=%d), |corr|=%.3f m",
            ci, qi, p["votes"], int(ver.num_inliers), float(np.linalg.norm(t_corr[:3, 3])),
        )

    # ----------------------------------------------------- BA backend

    def _push_ba_tick(self, pending: dict, world_t_body: np.ndarray, ts: float, refreshed: bool) -> None:
        """Append this tick's observations to the sliding BA window.

        The measurement stream is the tracker's own per-tick output
        (``pack_ba_obs``): KLT positions at sub-keyframe rate joined across
        ticks by the persistent ``lm_id`` — so keyframe-boundary id hops
        can never poison a window (the id IS the join key, slots are not).
        """
        ba = pending.get("ba_obs")
        if ba is None:
            return
        rec = trk.unpack_ba_obs(ba)
        rec["body_t_world"] = np.linalg.inv(np.asarray(world_t_body, np.float64))
        rec["ts"] = ts
        rec["refreshed"] = bool(refreshed)
        self._ba_ticks.append(rec)

    def _run_tracklevel_ba(
        self, world_t_body: np.ndarray, covariance: np.ndarray | None = None
    ) -> np.ndarray:
        """Optimize the recent-tick window; push corrections into the tracker.

        Variables: one pose per window tick + landmarks observed in >= 3
        ticks (joined by ``lm_id``). Left observations attach at every
        tick; the stereo right observation attaches only at the tick that
        minted it (``refreshed`` ticks), anchoring scale. Returns the
        (possibly corrected) current world_T_body; refined landmark
        positions are written back into the live bank so the next PnP
        solves against the improved map.

        ``covariance`` is the tick's PnP pose covariance: a BA correction
        smaller than the solve's own noise floor is indistinguishable from
        noise and is NOT applied (same principle as the loop-closure
        discrepancy gate) — at low-drift operating points BA then leaves
        the stream untouched instead of reshuffling noise into it
        (measured +0.9% ATE at the 320x200 flagship point before this),
        while drift regimes whose corrections exceed the floor keep their
        -21/-42% wins (tests/test_engine_ba_e2e.py).
        """
        ticks = list(self._ba_ticks)
        if len(ticks) < 4:
            self.last_diagnostics["ba_skip"] = f"window={len(ticks)}"
            return world_t_body
        k_win = self._ba_window
        ticks = ticks[-k_win:]
        c = self._params.num_cams
        l_cap = self._ba_landmarks

        # Landmark snapshot: the window's LAST tick (the refreshed tick
        # that triggered this solve) ships its own post-tick bank inside
        # ``ba_obs`` (the "pos" channel) — ids not alive there cannot
        # receive corrections, so only optimize those. The live device
        # state is never read: this is what makes BA legal (and sync-free)
        # at any pipeline depth.
        last = ticks[-1]
        bank_ids = last["ids"]
        bank_valid = last["valid"]
        bank_pos = np.asarray(last["pos"], np.float64)
        alive = set(bank_ids[bank_valid].tolist())

        counts: dict[int, int] = {}
        for t in ticks:
            for lid in np.unique(t["ids"][t["valid"]]):
                ilid = int(lid)
                if ilid >= 0 and ilid in alive:
                    counts[ilid] = counts.get(ilid, 0) + 1
        multi = [lid for lid, n in counts.items() if n >= 3]
        if len(multi) < 24:
            self.last_diagnostics["ba_skip"] = f"joined_landmarks={len(multi)}"
            return world_t_body
        multi.sort(key=lambda lid: -counts[lid])
        chosen = np.sort(np.asarray(multi[:l_cap], np.int64))  # sorted: searchsorted joins
        l_n = len(chosen)

        # Camera axis of the BA problem is 2C: left imagers then right
        # imagers — the stereo constraint anchors scale inside the window.
        obs = np.zeros((k_win, 2 * c, l_cap, 2), np.float32)
        mask = np.zeros((k_win, 2 * c, l_cap), np.float32)
        poses = np.tile(np.eye(4, dtype=np.float32), (k_win, 1, 1))
        pose_mask = np.zeros(k_win, np.float32)
        lms = np.zeros((l_cap, 3), np.float32)
        lm_mask = np.zeros(l_cap, np.float32)

        for ki, t in enumerate(ticks):
            poses[ki] = t["body_t_world"]
            pose_mask[ki] = 1.0
            idx = np.searchsorted(chosen, t["ids"])
            np.clip(idx, 0, l_n - 1, out=idx)
            hit = (chosen[idx] == t["ids"]) & t["valid"]  # (C, N)
            for ci in range(c):
                sel = hit[ci]
                li = idx[ci, sel]
                obs[ki, ci, li] = t["obs"][ci, sel]
                mask[ki, ci, li] = 1.0
                if t["refreshed"]:  # fresh stereo measurement only at mint
                    rsel = sel & t["robs_valid"][ci]
                    rli = idx[ci, rsel]
                    obs[ki, c + ci, rli] = t["robs"][ci, rsel]
                    mask[ki, c + ci, rli] = 1.0

        # Initialize landmarks from the live bank.
        bidx = np.searchsorted(chosen, bank_ids)
        np.clip(bidx, 0, l_n - 1, out=bidx)
        bhit = (chosen[bidx] == bank_ids) & bank_valid
        lm_present = np.zeros(l_cap, np.float32)
        for ci in range(c):
            sel = bhit[ci]
            lms[bidx[ci, sel]] = bank_pos[ci, sel]
            lm_present[bidx[ci, sel]] = 1.0
        mask[:, :, lm_present == 0.0] = 0.0

        # Only landmarks with an in-window STEREO observation may move:
        # a landmark held by monocular tracks alone has weakly observable
        # depth, and letting the solver slide it along its ray injects a
        # small scale bias into the map that compounds into large drift
        # (measured: 28 -> 204 cm ATE on a fast low-res sequence).
        # lm_mask=0 landmarks stay FIXED but still constrain the poses
        # (their Schur cross-terms vanish; obs remain in the pose blocks).
        has_stereo = mask[:, c:, :].sum(axis=(0, 1)) > 0.0
        lm_mask = lm_present * has_stereo.astype(np.float32)

        problem = ba.BAProblem(
            body_t_world=jnp.asarray(poses),
            landmarks_w=jnp.asarray(lms),
            obs=jnp.asarray(obs),
            obs_mask=jnp.asarray(mask),
            cam_rot=jnp.asarray(self._ba_cam_rot),
            cam_trans=jnp.asarray(self._ba_cam_trans),
            pose_mask=jnp.asarray(pose_mask),
            lm_mask=jnp.asarray(lm_mask),
        )
        result = ba.bundle_adjust(problem, huber_delta=0.004)
        initial_rms, final_rms = jax.device_get((result.initial_rms, result.final_rms))
        # Accept only a MEANINGFUL improvement: near-neutral "refinements"
        # are noise reshuffling and their pose corrections compound as
        # drift of their own (measured: a 0.99x rms gate tripled ATE on a
        # fast-orbit sequence where a 0.9x gate improved it 18x).
        if not float(final_rms) < 0.9 * float(initial_rms):
            self.last_diagnostics["ba_skip"] = (
                f"rms {float(initial_rms):.5f}->{float(final_rms):.5f}"
            )
            return world_t_body

        refined_poses = np.asarray(result.body_t_world, np.float64)
        refined_lms = np.asarray(result.landmarks_w)

        k_last = len(ticks) - 1
        new_world = np.linalg.inv(refined_poses[k_last])
        corr = np.linalg.norm(new_world[:3, 3] - world_t_body[:3, 3])
        if corr > self._ba_max_correction_m:
            self.last_diagnostics["ba_skip"] = f"correction {corr:.3f} m"
            return world_t_body  # junk guard: implausible jump
        if covariance is not None:
            # Noise-floor gate: a correction the PnP solve cannot itself
            # distinguish from noise has nothing real to fix (see
            # docstring). The window keeps accumulating; only the
            # application is withheld.
            floor = self._loop_noise_gate_sigma * float(
                np.sqrt(max(np.trace(covariance[:3, :3]), 0.0))
            )
            if corr < floor:
                self.last_diagnostics["ba_skip"] = (
                    f"corr {corr:.4f} m < noise floor {floor:.4f} m"
                )
                return world_t_body

        # Write back: refined landmarks into the live bank (by id) plus
        # the pose delta, as ONE async on-device update
        # (_apply_ba_update): the delta transports correctly through any
        # relative motion the device computed since this window's last
        # tick, so the same dispatch is exact at depth 1 and valid under
        # deep pipelining. A landmark the solver moved implausibly far
        # disagrees structurally with the window (wrong association,
        # degenerate depth) — writing it back would poison every
        # subsequent PnP solve; keep the old position for those.
        lm_shift = np.linalg.norm(refined_lms - lms, axis=-1)
        lm_ok = lm_shift <= self._ba_max_correction_m
        t_corr = new_world @ np.linalg.inv(np.asarray(world_t_body, np.float64))
        upd_ids = np.full(l_cap, np.iinfo(np.int32).max, np.int32)  # sorted pad
        upd_ids[:l_n] = chosen
        upd_ok = np.zeros(l_cap, bool)
        upd_ok[:l_n] = lm_ok[:l_n]
        self._tracker_state = self._apply_ba_update(
            self._tracker_state,
            jnp.asarray(t_corr, jnp.float32),
            jnp.asarray(upd_ids),
            jnp.asarray(refined_lms, jnp.float32),
            jnp.asarray(upd_ok),
        )
        # Finalized poses of ticks dispatched BEFORE this update get the
        # missing delta applied at their finalize (epoch transport).
        self._ba_corr_total = t_corr @ self._ba_corr_total
        # The shadow velocity transforms like a free vector under the
        # left-applied correction (translation cancels in the difference
        # of two corrected endpoints) — same rotation _apply_ba_update
        # gives the device's velocity_w.
        self._fin_vel = t_corr[:3, :3] @ self._fin_vel
        # ... and refined poses into the window (the next solve starts warm).
        for ki, t in enumerate(ticks):
            t["body_t_world"] = refined_poses[ki]
        self.last_diagnostics["ba_rms"] = (float(initial_rms), float(final_rms))
        self.last_diagnostics["ba_landmarks"] = int(l_n)
        return new_world
    # ------------------------------------------------------------ mapping

    def get_map(self) -> SlamMap:
        if self._tracker_state is None:
            return SlamMap()
        pos = np.asarray(self._tracker_state.lm_pos_w, np.float64).reshape(-1, 3)
        valid = np.asarray(self._tracker_state.lm_valid).reshape(-1)
        # Live bank is odom-frame; the map output lifts through map<-odom.
        m = self._map_t_odom
        pos = pos @ m[:3, :3].T + m[:3, 3]
        points = [MapPoint(position=p) for p in pos[valid]]
        if self._config.max_map_size and len(points) > self._config.max_map_size:
            points = points[: self._config.max_map_size]
        return SlamMap(
            points=points,
            keyframe_poses=list(self._keyframe_poses),
            timestamp=self._last_timestamp or 0.0,
        )

    def get_landmark_cloud(self) -> np.ndarray:
        """(M, 3) map-frame landmark cloud: live bank + place-DB history.

        The live bank holds only the landmarks currently tracked (it is
        the working set, bounded by ``max_keypoints``); keyframes retired
        from tracking leave their landmarks behind in the place DB. The
        union is the accumulated sparse map — the role of cuVSLAM's
        ``/visual_slam/vis/landmarks_cloud`` (reference
        config/thor_visual_slam.rviz:78), which the ROS bridge publishes
        for RViz. ``get_map()`` remains the live tracked set (what
        ``observations_cloud`` shows).
        """
        if self._tracker_state is None:
            return np.zeros((0, 3))
        clouds = []
        pos = np.asarray(self._tracker_state.lm_pos_w, np.float64).reshape(-1, 3)
        valid = np.asarray(self._tracker_state.lm_valid).reshape(-1)
        m = self._map_t_odom
        clouds.append(pos[valid] @ m[:3, :3].T + m[:3, 3])
        for e in self._loop_db:
            clouds.append(np.asarray(e["lm_w"], np.float64)[np.asarray(e["valid"])])
        return np.concatenate(clouds) if clouds else np.zeros((0, 3))

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
            # Serialize in the MAP frame (keyframes/DB already are; the
            # live bank and pose lift through map<-odom) so a loaded map
            # is self-consistent regardless of this session's corrections.
            m = self._map_t_odom
            lm_map = np.asarray(self._tracker_state.lm_pos_w, np.float64) @ m[:3, :3].T + m[:3, 3]
            np.savez_compressed(
                path,
                lm_pos_w=lm_map.astype(np.float32),
                lm_desc=np.asarray(self._tracker_state.lm_desc),
                lm_valid=np.asarray(self._tracker_state.lm_valid),
                world_t_body=m @ np.asarray(self._tracker_state.world_t_body, np.float64),
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
        # The loaded bank is map-frame: this session's odom frame is
        # re-anchored to the map (relocalize() then snaps the pose).
        self._map_t_odom = np.eye(4)
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
                    "slot": i % self._loop_db_capacity,
                }
                for i in range(data["db_desc"].shape[0])
            ]
            self._kf_total = len(self._loop_db)
            self._loop_pending = None
            self._rebuild_dev_db()
        return True

    def save_state(self, path: str) -> bool:
        """Checkpoint the FULL tracker state (poses, landmark banks,
        pyramids, PRNG) — resume-capable, unlike save_map's map-only export.
        """
        if self._tracker_state is None:
            return False
        arrays = {f: np.asarray(v) for f, v in self._tracker_state._asdict().items()}
        arrays["map_t_odom"] = self._map_t_odom
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
        if "map_t_odom" in data:
            self._map_t_odom = np.asarray(data["map_t_odom"], np.float64)
        # The restored state defines a fresh shadow/correction epoch.
        self._fin_pose = None
        self._fin_ts = None
        self._fin_vel = np.zeros(3)
        self._fin_ts_prev = None
        self._fin_epoch = None
        self._fin_epoch_prev = None
        self._gravity_w = None
        self._gravity_n = 0
        self._ba_corr_total = np.eye(4)
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

        if self._dev_db_desc is None:
            self._rebuild_dev_db()
        mask = np.zeros(self._loop_db_capacity, np.float32)
        for e in self._loop_db:
            mask[e["slot"]] = 1.0
        cand = loop.find_candidate(
            desc.bits, desc.valid, self._dev_db_desc, self._dev_db_valid,
            jnp.asarray(mask),
        )
        if int(cand.votes) < self._loop_min_votes:
            return False
        slot = int(cand.keyframe)
        cand_e = next((e for e in self._loop_db if e["slot"] == slot), None)
        if cand_e is None:
            return False

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
        # The recovered pose is MAP-frame; snapping the tracker to it
        # re-anchors the odom frame onto the map.
        self._map_t_odom = np.eye(4)
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
        self._ba_ticks.clear()  # window poses are in the pre-reloc frame
        # The pose shadow is pre-reloc too: invalidate it so IMU
        # prediction waits for the first post-reloc finalize, and restart
        # the BA correction epoch (no pending ticks — the caller drained).
        self._fin_pose = None
        self._fin_ts = None
        self._fin_vel = np.zeros(3)
        self._fin_ts_prev = None
        self._fin_epoch = None
        self._fin_epoch_prev = None
        self._gravity_w = None
        self._gravity_n = 0
        self._ba_corr_total = np.eye(4)
        logger.info(
            "Relocalized against keyframe slot %d (votes=%d inliers=%d)",
            slot, int(cand.votes), int(ver.num_inliers),
        )
        return True

    # ------------------------------------------------------------ lifecycle

    def reset(self) -> None:
        if self._params is not None:
            self._tracker_state = self._make_state()
        self._pending_q.clear()  # drop any in-flight pipelined ticks
        self._keyframe_poses = []
        self._ba_ticks.clear()
        self._loop_db = []
        self._loops_closed = 0
        self._loop_pending = None
        self._kf_total = 0
        self._dev_db_desc = None
        self._dev_db_valid = None
        self._want_reloc = False
        self._map_t_odom = np.eye(4)
        self._ba_corr_total = np.eye(4)
        self._fin_pose = None
        self._fin_ts = None
        self._fin_vel = np.zeros(3)
        self._fin_ts_prev = None
        self._fin_epoch = None
        self._fin_epoch_prev = None
        self._gravity_w = None
        self._gravity_n = 0
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
