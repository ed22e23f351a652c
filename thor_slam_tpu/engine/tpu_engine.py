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
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from thor_slam_tpu import geometry
from thor_slam_tpu.camera.rig import RigCalibration
from thor_slam_tpu.camera.types import SynchronizedFrameSet
from thor_slam_tpu.engine import tracker as trk
from thor_slam_tpu.engine.backends import ImuFusion, LoopBackend, TrackBA
from thor_slam_tpu.engine.backends.light import (
    LightController,
    downsample2_host as _downsample2_host,
)
from thor_slam_tpu.engine.pipeline_exec import PipelineExecutor
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
            (``PipelineExecutor.finalize_ready``). The FULL feature set runs at any
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
        light_ticks: Halve steady-state upload bytes by shipping LEFT-ONLY
            images on ticks the host predicts won't keyframe. The right
            image's only consumer is the keyframe front-end (stereo
            mint); on a light tick that branch is statically absent
            (``track_step`` ``allow_refresh=False``) and the hot KLT/PnP
            path is bit-identical to a full tick that chose not to
            refresh. The host mirrors the device's keyframe policy at a
            0.7x safety margin (inliers, motion since the last keyframe)
            and force-schedules a FULL tick under pressure, at a cadence
            floor (``light_max_interval``), on the first tick, when not
            TRACKING, and when relocalization is armed — so keyframes are
            delayed at most a few ticks past the device's own decision.
            None (default) = auto: on for single-chip non-defer_sync
            engines (upload is the deployed bottleneck — BASELINE.md),
            off under SPMD/defer_sync.
        light_max_interval: Schedule a full tick at least every N ticks
            (bounds keyframe delay when the pressure heuristic lags the
            pipeline depth).
        light_half_res: Ship light ticks 2x-downsampled (2x2 mean on the
            host) and bilinearly upsample on device — 1/4 of a light
            tick's bytes, 1/8 of a full tick's, for upload-bound links.
            Level-0 KLT refinement then lacks the finest octave, costing
            some subpixel precision between keyframes (measure with the
            flagship ATE benchmark before enabling in an accuracy-
            critical deployment). Requires even frame dimensions.
        adaptive_half_res: Degrade-to-keep-up controller (None = on, the
            product default; ``THOR_SLAM_TPU_ADAPTIVE_HALF=0`` flips the
            None-resolution off for test harnesses that cannot afford the
            second light-executable compile per engine).
            The engine measures its busy wall time per tick against the
            camera period (``SlamConfig.expected_fps``); when the EMA
            stays over budget it switches LIGHT ticks to half-res staging
            (the ``light_half_res`` path) instead of silently falling
            behind the rig and dropping whole frames — on an upload-bound
            link, half-quality observations at full rate beat full-quality
            observations at a third of the rate. Recovers to full-res
            after a sustained under-budget stretch (wide hysteresis, so a
            flapping link doesn't oscillate the quality level). Both light
            executables are compiled at :meth:`initialize`, so the switch
            itself never pays a mid-flight jit. Inactive when
            ``light_half_res`` is already forced on, when light ticks are
            off, or when frame dims are odd. The reference has no
            equivalent (its on-camera ASIC never contends with SLAM
            compute for the link); this is the failure-recovery discipline
            of SURVEY.md §5.3 applied to link overload.
        auto_relocalize: When a LOADED map's place database is present and
            the state machine reaches LOST, arm relocalization
            automatically (the cuVSLAM contract: relocalize against the
            map without operator action — reference interface.py:248-256).
            Manual :meth:`relocalize` remains available as an override.
            Sessions WITHOUT a loaded map keep the VO-restart behavior on
            LOST (drift is later corrected by loop closure) — their own
            place DB is the loop-closure working set, not a reference map.
        reloc_attempt_interval: While relocalization is armed, attempt at
            most every N dispatches (first armed dispatch always tries).
            Each attempt is a synchronous find+verify device round trip;
            unthrottled attempts would stall a pipelined stream for the
            whole LOST stretch.
        imu_noise: IMU noise-model overrides forwarded to
            :class:`~thor_slam_tpu.engine.backends.imu_fusion.ImuFusion`
            (gyro/accel noise densities and random walks, visual solve
            sigmas, ``estimate_gyro_bias``). Defaults are the reference's
            measured OAK-D Pro densities (engine/imu.py) — they set the
            gyro-bias and gravity Kalman gains and the held-pose
            covariance growth. YAML: ``backend.imu_noise``.
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
        light_ticks: bool | None = None,
        light_max_interval: int = 4,
        light_half_res: bool = False,
        adaptive_half_res: bool | None = None,
        auto_relocalize: bool = True,
        reloc_attempt_interval: int = 3,
        imu_noise: dict | None = None,
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
        #: In-flight tick records + batched-fetch discipline
        #: (engine/pipeline_exec.py). Late-bound callbacks so tests/
        #: profilers that wrap the engine methods see every call.
        self._pending_q = PipelineExecutor(
            pipeline_depth, defer_sync,
            fetch=lambda recs: self._fetch_records(recs),
            finalize=lambda rec: self._finalize_values(rec, rec["packed"]),
        )
        self._lost_after = lost_after
        self._enable_ba = enable_ba
        self._use_imu = use_imu
        self._use_accel = bool(use_accel) and use_imu
        # The three host backends (engine/backends/): each consumes only
        # finalized-tick data and pushes corrections as async device
        # updates, so all run unchanged at any pipeline depth.
        self._ba = TrackBA(
            window=ba_window,
            landmarks=ba_landmarks,
            tick_stride=ba_tick_stride,
            max_correction_m=ba_max_correction_m,
            noise_gate_sigma=loop_noise_gate_sigma,
        )
        _imu_noise_keys = {
            "gyro_noise_density", "gyro_random_walk",
            "accel_noise_density", "accel_random_walk",
            "vis_rot_sigma", "vis_pos_sigma", "estimate_gyro_bias",
        }
        if imu_noise and not set(imu_noise) <= _imu_noise_keys:
            raise ValueError(
                f"unknown backend.imu_noise keys {sorted(set(imu_noise) - _imu_noise_keys)}; "
                f"valid: {sorted(_imu_noise_keys)}"
            )
        self._imu = ImuFusion(
            use_accel=self._use_accel,
            gravity_min_ticks=gravity_min_ticks,
            capacity=imu_buffer_capacity,
            # The prediction window spans `depth` ticks of samples when
            # pipelined.
            pred_capacity=64 * max(1, pipeline_depth),
            # Noise model (defaults: the reference's measured OAK-D Pro
            # densities, engine/imu.py) — sets the gyro-bias and gravity
            # Kalman gains and the held-pose covariance growth. YAML:
            # ``backend.imu_noise``.
            **(imu_noise or {}),
        )
        self._loop = LoopBackend(
            capacity=loop_db_capacity,
            min_votes=loop_min_votes,
            min_inliers=loop_min_inliers,
            exclude_recent=loop_exclude_recent,
            cooldown_kfs=loop_cooldown_kfs,
            min_correction_m=loop_min_correction_m,
            noise_gate_sigma=loop_noise_gate_sigma,
        )
        self._want_reloc = False
        self._auto_reloc = bool(auto_relocalize)
        self._reloc_interval = max(1, int(reloc_attempt_interval))
        self._reloc_countdown = 0
        self._map_loaded = False
        # All-mono bootstrap state (resolved at initialize()).
        self._all_mono = False
        self._mono_init = None
        self._mono_boot_done = False
        self._mono_boot_countdown = 2
        self._mono_rearm_after = 0
        if adaptive_half_res is None:
            # Default ON. The env escape hatch exists for test harnesses:
            # adaptivity compiles a second light executable at initialize,
            # which a CPU-backend suite constructing hundreds of engines
            # cannot afford (tests/conftest.py sets it; dedicated adaptive
            # tests opt back in explicitly).
            adaptive_half_res = (
                os.environ.get("THOR_SLAM_TPU_ADAPTIVE_HALF", "1") != "0"
            )
        #: Light-tick scheduling + adaptive half-res policy (all the
        #: upload-lever decisions live in the controller; the engine owns
        #: only the executables and staging). engine/backends/light.py.
        self._light_ctl = LightController(
            light_ticks, light_half_res, adaptive_half_res, light_max_interval
        )
        self._last_kf_odom: np.ndarray | None = None
        #: Light-step executables / assemblers keyed by half-res flag.
        self._step_light: dict[bool, object] = {}
        self._assemble_light: dict[bool, object] = {}
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
        #: Per-frame tracking diagnostics (updated by process_frames).
        self.last_diagnostics: dict = {}
        #: Staged-upload accounting since initialize()/reset(): tick counts
        #: by payload class and total staged image bytes. Benchmarks use
        #: this to compute EXACT payload-weighted link bounds per row
        #: (a row that mixed full/light/half ticks is otherwise
        #: uninterpretable against a single full-tick probe).
        self.upload_stats: dict = {
            "full": 0, "light": 0, "light_half": 0, "bytes": 0
        }
        #: Per-tick poses of the last defer_sync flush (same order as the
        #: processed frames; None entries where tracking was LOST).
        self.last_flush_poses: list[SlamPose | None] = []
        self._state_enum = TrackingState.NOT_INITIALIZED
        self._config = SlamConfig()
        self._step = None
        self._want_kf_sig = False
        self._tracker_state = None
        self._assemble = None
        self._zero_img = None
        self._params: trk.TrackerParams | None = None
        self._setup: trk.CameraSetup | None = None
        self._source_order: list[str] = []
        self._keyframe_poses: list[SlamPose] = []
        self._low_inlier_streak = 0
        self._held_cov: np.ndarray | None = None
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
            self._imu.body_r_imu = np.asarray(ext.rotation, np.float64)
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

        has_mono = not bool(np.asarray(setup.stereo_mask).all())
        if has_mono and self._devices > 1:
            raise RuntimeError(
                "mono sources are not supported under SPMD (devices > 1): "
                "cross-camera landmark seeding needs the full keyframe bank"
            )
        # ALL-mono rig: bootstrap from motion (the cuVSLAM mono-only
        # capability, reference luxonis.py:551-568). The odometry is
        # UP-TO-SCALE (monocular gauge): metric subsystems that assume
        # scale are disabled — window BA (its stereo residuals and
        # correction bounds are metric) and the accelerometer translation
        # prediction (gyro rotation prediction stays).
        all_mono = has_mono and not bool(np.asarray(setup.stereo_mask).any())
        self._all_mono = all_mono
        self._mono_boot_done = False
        if all_mono:
            if self._enable_ba:
                logger.warning(
                    "all-mono rig: window BA disabled (monocular scale gauge)"
                )
                self._enable_ba = False
            if self._use_accel:
                logger.warning(
                    "all-mono rig: accel translation prediction disabled "
                    "(up-to-scale odometry); gyro rotation prediction stays"
                )
                self._use_accel = False
                self._imu.use_accel = False
        self._params = trk.TrackerParams(
            num_cams=len(self._source_order),
            height=height,
            width=width,
            has_mono=has_mono,
            mono_bootstrap=all_mono,
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
        self._mono_init = (
            trk.make_mono_init(self._params, setup) if all_mono else None
        )
        # Light (left-only) tick scheduling + adaptive half-res policy —
        # resolved by the controller (engine/backends/light.py); the
        # engine compiles one executable per returned variant.
        fps = getattr(self._config, "expected_fps", 0.0) or 0.0
        light_variants = self._light_ctl.resolve(
            self._devices, self._defer_sync, height, width, fps
        )
        self._step_light = {
            h: trk.make_track_step(
                self._params, setup, donate=True, pack=pack_mode, light=True,
                half_res=h,
            )
            for h in light_variants
        }
        self._tracker_state = self._make_state()
        c_ = self._params.num_cams
        self._zero_img = np.zeros((height, width), np.uint8)
        #: Device-side batch assembly of the tick's 2C images (the host
        #: never materializes the dense stack — see _stage_list).
        self._assemble = jax.jit(
            lambda flat: jnp.stack(flat).reshape(c_, 2, height, width)
        )
        self._assemble_light = {}
        self._zero_img_light = {}
        self._light_shape = {}
        for h in light_variants:
            lh, lw = (height // 2, width // 2) if h else (height, width)
            self._light_shape[h] = (lh, lw)
            self._zero_img_light[h] = np.zeros((lh, lw), np.uint8)
            self._assemble_light[h] = jax.jit(
                lambda flat, lh=lh, lw=lw: jnp.stack(flat).reshape(c_, 1, lh, lw)
            )
        if self._enable_ba:
            # Async BA write-back: corrections land on the LIVE state as a
            # left-multiplied world-frame delta plus a by-id landmark
            # scatter — dispatched, never synced, so it is legal at any
            # pipeline depth (the delta transports through the relative
            # motion of ticks dispatched since the window's last tick).
            self._ba.bind(setup, c_, mono_obs_weight=self._params.mono_obs_weight)
        self._loop.bind(setup, self._params.max_keypoints)
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
                stage_fn=lambda item: self._stage_list(
                    item[0], light=item[1], half=item[2]
                ),
                device=target,
            )
        self._keyframe_poses = []
        self._ba.clear()
        self._imu.reset()
        self._low_inlier_streak = 0
        self._held_cov = None
        self._last_timestamp = None
        self._frame_count = 0
        self._ba_corr_total = np.eye(4)
        self._last_kf_odom = None
        self._mono_boot_countdown = 2  # KLT needs a couple of frames first
        self._mono_rearm_after = 0
        self.upload_stats = {"full": 0, "light": 0, "light_half": 0, "bytes": 0}
        self._state_enum = TrackingState.INITIALIZING

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
        for h, step_h in self._step_light.items():
            # Each light variant is its own (smaller) executable: same
            # warm-up discipline, left-only (possibly half-res) images.
            lh, lw = self._light_shape[h]

            def dummy_light(lh=lh, lw=lw):
                return jnp.zeros((c_, 1, lh, lw), jnp.uint8)

            jax.block_until_ready(
                self._assemble_light[h]([self._zero_img_light[h]] * c_)
            )
            for pred, mask in warm_variants:
                outs = step_h(self._make_state(), dummy_light(), pred, mask)
                jax.block_until_ready(outs[2])
        if self._enable_ba:
            # Warm the async BA write-back too (donates its state — uses a
            # fresh throwaway, same rule as the step warm-ups above).
            self._ba.warm(self._make_state)
        if self._mono_init is not None:
            # Warm the bootstrap attempt (donates its state — throwaway).
            _, flag = self._mono_init(self._make_state())
            jax.block_until_ready(flag)
        logger.info(
            "TpuSlamEngine initialized: %d cams @ %dx%d (warm-up %.1fs)",
            self._params.num_cams, width, height, time.monotonic() - t0,
        )

    # ------------------------------------------------------------ tracking

    def process_frames(self, frame_set: SynchronizedFrameSet) -> SlamPose | None:
        if self._step is None:
            raise RuntimeError("initialize() must be called before process_frames()")

        t_in = time.perf_counter() if self._light_ctl.adaptive else None
        light = self._schedule_light()
        half = light and self._light_ctl.half_active
        assemble = self._assemble_light[half] if light else self._assemble
        if not self._pipelined:
            images = assemble(
                jax.device_put(self._stage_list(frame_set, light, half))
            )
            pose = self._finalize_tick(
                self._dispatch_tick(images, frame_set, light, half)
            )
            if t_in is not None:
                t_out = time.perf_counter()
                self._light_ctl.on_tick(t_out - t_in, frame_set.timestamp, t_out)
            return pose

        # Pipelined: stage/upload tick k on the uploader thread while the
        # device still computes earlier ticks and the host finalizes them.
        # `pipeline_depth` ticks of pose latency (see class docstring).
        # defer_sync: never sync mid-stream — on hosted/tunneled TPUs even
        # small per-tick device_gets permanently degrade h2d throughput
        # (measured); flush() fetches every tick's outputs in ONE transfer.
        self._uploader.submit((frame_set, light, half))
        pose = None
        if not self._defer_sync and self._pending_q.at_depth:
            pose = self._pending_q.finalize_ready()
        images = assemble(self._uploader.get())
        self._pending_q.submit(self._dispatch_tick(images, frame_set, light, half))
        if t_in is not None:
            t_out = time.perf_counter()
            self._light_ctl.on_tick(t_out - t_in, frame_set.timestamp, t_out)
        return pose

    def flush(self) -> SlamPose | None:
        """Finalize all in-flight ticks (pipelined mode; no-op otherwise).

        In ``defer_sync`` mode this is where the entire stream's outputs
        come back: one batched device_get over every deferred tick, then
        the host state machine replays them in order (poses land in
        ``get_map().keyframe_poses`` / the caller's collected returns).
        """
        pose, per_tick = self._pending_q.drain()
        if per_tick is not None:  # defer_sync: the whole stream's poses
            self.last_flush_poses = per_tick
            return pose
        # Stream end: drain a loop detection still in flight (blocking —
        # the fetches are tiny) so a closure at the tail isn't dropped.
        self._poll_loop(block=True)
        return pose

    def _schedule_light(self) -> bool:
        """Light (left-only) or full tick for the NEXT dispatch — the
        LightController's policy over this engine's finalized state
        (engine/backends/light.py)."""
        return self._light_ctl.schedule(
            frame_count=self._frame_count,
            want_reloc=self._want_reloc,
            tracking=self._state_enum == TrackingState.TRACKING,
            num_inliers=self.last_diagnostics.get("num_inliers", 0),
            params=self._params,
            fin_pose=self._imu.fin_pose,
            last_kf_odom=self._last_kf_odom,
        )

    @property
    def light_half_active(self) -> bool:
        """True while light ticks ship half-res (forced or adaptive)."""
        return bool(self._light_ctl.half_active)

    def _dispatch_tick(
        self,
        images: jnp.ndarray,
        frame_set: SynchronizedFrameSet,
        light: bool = False,
        half: bool = False,
    ) -> dict:
        """Front half of a tick: IMU ingest/prediction + async step dispatch.

        Returns the pending record for :meth:`_finalize_tick`; the device
        computes while the host goes on (JAX dispatch is asynchronous).
        """
        if self._want_reloc:
            # Attempts are rate-limited (every reloc_attempt_interval
            # dispatches; the first armed dispatch always tries): each
            # attempt is a synchronous find+verify round trip, and paying
            # it on EVERY frame of a long LOST stretch would stall the
            # otherwise sync-free stream (~2 RTTs/frame on a tunneled
            # link) even when the scene is featureless.
            if self._reloc_countdown > 0:
                self._reloc_countdown -= 1
            else:
                # Relocalization rewrites the live state wholesale:
                # finalize every in-flight tick first so no pending
                # record's outputs straddle the discontinuity.
                while len(self._pending_q):
                    self._pending_q.finalize_ready()
                if self._attempt_relocalization(frame_set):
                    self._want_reloc = False
                    self._reloc_countdown = 0
                else:
                    self._reloc_countdown = self._reloc_interval - 1

        pose_prediction = None
        if self._use_imu and frame_set.sensor_data is not None:
            self._imu.ingest(frame_set.sensor_data, frame_set.sensor_timestamp)
            pose_prediction = self._imu.predict(frame_set.timestamp)

        # Watchdog: mask dead cameras out of the solve (their frozen frames
        # would otherwise feed zero-motion KLT tracks into PnP).
        cam_active = None
        if frame_set.stale_sources:
            cam_active = jnp.asarray(
                [name not in frame_set.stale_sources for name in self._source_order]
            )

        # The raw output tuple may alias donated state buffers (invalid
        # after the NEXT dispatch) — only the packed vectors are retained.
        step = self._step_light[half] if light else self._step
        self._light_ctl.note_dispatch(light)
        outs = step(self._tracker_state, images, pose_prediction, cam_active)
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
            "light": light,
            "half": half,
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

        # All-mono bootstrap: while unbootstrapped, attempt the two-view
        # essential-matrix init against the live state (the just-advanced
        # KLT tracks vs their keyframe anchors). Each attempt syncs on a
        # 4-float flag — paid only during the (short) init phase.
        if self._mono_init is not None and not self._mono_boot_done:
            if self._mono_boot_countdown > 0:
                self._mono_boot_countdown -= 1
            else:
                self._tracker_state, flag = self._mono_init(self._tracker_state)
                vals = np.asarray(jax.device_get(flag))
                if vals[0] > 0.5:
                    self._mono_boot_done = True
                    self._mono_rearm_after = (
                        self._frame_count + self._pipeline_depth + 2
                    )
                    logger.info(
                        "mono bootstrap accepted: %d epipolar inliers, %d "
                        "landmarks, mean parallax %.4f (up-to-scale gauge)",
                        int(vals[1]), int(vals[3]), float(vals[2]),
                    )
                else:
                    self._mono_boot_countdown = 1  # retry every other tick
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
        pred_err = None
        if pred is not None:
            pred_err = float(
                np.linalg.norm(
                    np.asarray(pred, np.float64)[:3, 3] - world_t_body[:3, 3]
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

        # Covariance of a HELD pose: when the solve lacked support the
        # device kept the prediction, so the low-inlier solve covariance
        # is meaningless — grow the last trusted covariance by the
        # prediction's own uncertainty (the declared IMU noise model,
        # ImuFusion.window_covariance) instead. Accumulates across an
        # untracked streak; a tracked solve re-anchors it.
        if (
            num_inliers < self._params.min_track_inliers
            and self._frame_count >= 1
            and self._held_cov is not None
        ):
            dt_w = (
                pending["ts"] - self._last_timestamp
                if self._last_timestamp is not None
                else 1.0 / 30.0
            )
            covariance = self._held_cov + self._imu.window_covariance(dt_w)
        self._held_cov = np.asarray(covariance, np.float64)

        self.last_diagnostics = {
            "num_inliers": num_inliers,
            "num_landmarks": int(n_lm),
            "rms_error": float(rms),
            "refreshed": refreshed,
            "stale_sources": sorted(pending["stale_sources"]),
            "light_tick": bool(pending.get("light", False)),
            # Quality level the tick actually shipped at — consumers can
            # alarm on silent adaptive degrades (VERDICT r4 weak #5).
            "light_half": bool(pending.get("half", False)),
        }
        if pred_err is not None:
            self.last_diagnostics["imu_pred_err_m"] = pred_err
        if self._use_imu and self._imu.estimate_gyro_bias:
            self.last_diagnostics["gyro_bias_rad_s"] = float(
                np.linalg.norm(self._imu.gyro_bias)
            )
        if self._use_accel:
            self.last_diagnostics["accel_pred"] = self._imu.accel_pred_active()
            if self._imu.gravity_w is not None:
                self.last_diagnostics["gravity_norm"] = float(
                    np.linalg.norm(self._imu.gravity_w)
                )

        # Advance the IMU backend's finalized-pose shadow (velocity
        # estimate + gravity observation) — differenced from FINALIZED
        # poses only, never the live device state (which would sync on
        # in-flight compute and, at depth > 1, read the wrong tick).
        ts = pending["ts"]
        self._imu.on_finalized(
            world_t_body,
            ts,
            tracked=num_inliers >= self._params.min_track_inliers,
            epoch=self._ba_corr_total,
        )
        self._last_timestamp = ts
        self._frame_count += 1

        # All-mono: a VO restart (blackout, long occlusion) empties the
        # real-landmark set — re-arm the bootstrap attempt loop. The
        # pipeline-lag guard keeps the ticks dispatched before a fresh
        # bootstrap from re-arming it spuriously.
        if (
            self._all_mono
            and self._mono_boot_done
            and int(n_lm) == 0
            and self._frame_count > self._mono_rearm_after
        ):
            self._mono_boot_done = False
            self._mono_boot_countdown = 1
            logger.info("mono bootstrap re-armed (landmark set emptied)")

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
                if self._auto_reloc and self._map_loaded and self._loop.db:
                    # Auto-relocalize against the LOADED map (the cuVSLAM
                    # contract — no operator action). Attempts run on
                    # subsequent dispatches (rate-limited) until one
                    # verifies.
                    self._want_reloc = True
                    self._reloc_countdown = 0

        if self._enable_ba:
            tracked_now = num_inliers >= min_inl and self._frame_count > 1
            if tracked_now and (
                refreshed or (self._frame_count % self._ba.tick_stride == 0)
            ):
                self._ba.push_tick(pending, world_t_body, ts, refreshed)
            elif refreshed:
                # A refresh while untracked is a VO restart: landmark ids
                # are freshly minted and the old window cannot join.
                self._ba.clear()

        if refreshed and self._state_enum == TrackingState.TRACKING and self._enable_ba:
            self._tracker_state, world_t_body, t_corr = self._ba.run(
                world_t_body, covariance, self._tracker_state, self.last_diagnostics
            )  # odom frame
            if t_corr is not None:
                # Finalized poses of ticks dispatched BEFORE this update
                # get the missing delta applied at their finalize (epoch
                # transport) — and the IMU shadow re-anchors on the
                # corrected pose (the device state just received the same
                # delta; the next prediction must integrate from where the
                # device actually is).
                self._ba_corr_total = t_corr @ self._ba_corr_total
                self._imu.on_correction(world_t_body, t_corr, self._ba_corr_total)
        if refreshed:
            # Host shadow of the device's keyframe anchor — the light-tick
            # scheduler measures motion-since-keyframe against it.
            self._last_kf_odom = world_t_body

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

    def _stage_list(
        self,
        frame_set: SynchronizedFrameSet,
        light: bool = False,
        half: bool = False,
    ) -> list[np.ndarray]:
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
        ``light`` stages the LEFT imager only (half the bytes — the light
        step statically never reads the right image); with
        ``light_half_res`` it additionally 2x-downsamples on the host
        (2x2 mean — anti-aliased, and its half-pixel-center alignment
        matches the device's bilinear upsample), 1/4 of a light tick's
        bytes.
        """
        per = 1 if light else 2
        zero = self._zero_img_light[half] if light else self._zero_img
        down = half and light
        flat: list[np.ndarray] = []
        for name in self._source_order:
            fs = frame_set.frame_sets.get(name)
            if fs is None:
                flat.extend([zero] * per)
            else:
                imgs = [np.ascontiguousarray(f.image) for f in fs.frames[:per]]
                if down:
                    imgs = [_downsample2_host(im) for im in imgs]
                # A mono source delivers one frame; its right slot ships a
                # zero fill (stereo products are masked off for it anyway).
                imgs.extend([zero] * (per - len(imgs)))
                flat.extend(imgs)
        if any(im.dtype != flat[0].dtype for im in flat):
            flat = [np.asarray(im, np.float32) for im in flat]
        s = self.upload_stats
        s["light_half" if down else ("light" if light else "full")] += 1
        staged = sum(im.nbytes for im in flat)
        s["bytes"] += staged
        # Feed the adaptive controller's restore gate the actual vs
        # full-quality byte counts (what a FULL tick would have staged).
        c_ = len(self._source_order)
        full_bytes = 2 * c_ * self._zero_img.size * flat[0].itemsize
        self._light_ctl.note_payload(staged, full_bytes)
        return flat

    # ------------------------------------------------- backend adapters
    #
    # IMU fusion, track-level BA and loop closure live in engine/backends/
    # (ImuFusion / TrackBA / LoopBackend). The engine keeps only the glue:
    # the correction-epoch composition, the keyframe trajectory, and the
    # map<-odom transform. The thin delegates below also preserve the
    # historical debugging surface (tests poke these).

    def _ingest_imu(self, sensor_data: dict, sensor_ts: float | None) -> None:
        self._imu.ingest(sensor_data, sensor_ts)

    @property
    def _imu_ts(self) -> list[float]:
        return self._imu._ts

    @property
    def _gravity_w(self):
        return self._imu.gravity_w

    @property
    def _gravity_n(self) -> int:
        return self._imu.gravity_n

    @property
    def imu_empty_windows(self) -> int:
        """Count of IMU preintegration windows that contained no samples
        (nonzero growth while use_imu=True means the IMU path is dead)."""
        return self._imu.empty_windows

    @property
    def _ba_ticks(self):
        return self._ba._ticks

    @property
    def _loop_db(self) -> list[dict]:
        return self._loop.db

    @property
    def _loops_closed(self) -> int:
        return self._loop.loops_closed

    @property
    def _loop_db_capacity(self) -> int:
        return self._loop.capacity

    # ----------------------------------------------------- loop closure

    def _loop_closure_tick(
        self, world_t_body: np.ndarray, ts: float, kf_sig: np.ndarray | None
    ) -> None:
        """Keyframe hook: update the place DB, maybe start a detection.

        ``world_t_body`` is the MAP-frame keyframe pose; ``kf_sig`` the
        tick's fetched all-camera signature (``pack_kf_sig``) — the
        FINALIZED tick's own bank, so this hook never reads the live
        device state (which would sync on in-flight ticks and, under deep
        pipelining, belong to a later frame than the keyframe being
        recorded). Detection and verification run asynchronously in the
        LoopBackend; a verified closure comes back through _poll_loop.
        """
        if kf_sig is None:
            return
        sig = trk.unpack_kf_sig(kf_sig)
        self._loop.on_keyframe(
            world_t_body, ts, sig, self._map_t_odom, self._frame_count
        )

    def _poll_loop(self, block: bool = False) -> None:
        """Advance the async loop-closure machine (non-blocking by default).

        A closure verified and gated by the backend is applied MAP side
        only: the newest node's correction composes into the map<-odom
        transform (every future pose/keyframe/map point is lifted through
        it) and the pose graph's smoothed trajectory rewrites the keyframe
        tail. The live tracker state (odom frame) is never touched — the
        front-end keeps tracking against an unperturbed landmark bank and
        the odometry stream stays smooth. Keyframes older than the DB
        window need no seam correction: the pose graph gauge-anchors the
        window's oldest node, so the rewritten window connects to the
        pre-window trajectory continuously by construction (verified by
        tests/test_engine_loop_e2e.py long-run continuity).
        """
        res = self._loop.poll(block=block, diagnostics=self.last_diagnostics)
        if res is None:
            return
        t_corr, opt_poses, kk, _info = res
        n_kf = min(len(self._keyframe_poses), kk)
        for j in range(n_kf):
            old = self._keyframe_poses[-n_kf + j]
            self._keyframe_poses[-n_kf + j] = SlamPose.from_4x4_matrix(
                opt_poses[kk - n_kf + j], timestamp=old.timestamp
            )
        self._map_t_odom = t_corr @ self._map_t_odom

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
            # The place-recognition database travels with the map — it
            # is what makes relocalize() work after load_map().
            extra = self._loop.export_arrays()
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
            self._loop.load_arrays(data)
            self._map_loaded = True  # enables auto-relocalize on LOST
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
        # Checkpoints from before a state field existed restore with that
        # field at its init default (fresh-state value).
        defaults = trk.init_state(self._params)._asdict()
        fields = {
            f: jnp.asarray(data[f]) if f in data else defaults[f]
            for f in trk.TrackerState._fields
        }
        self._tracker_state = trk.TrackerState(**fields)
        if "map_t_odom" in data:
            self._map_t_odom = np.asarray(data["map_t_odom"], np.float64)
        # The restored state defines a fresh shadow/correction epoch.
        self._imu.reset_shadow()
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
        self._reloc_countdown = 0  # manual arm: attempt on the next dispatch
        self._state_enum = TrackingState.RELOCALIZING
        return True

    def _attempt_relocalization(self, frame_set: SynchronizedFrameSet) -> bool:
        """One relocalization attempt against the loop DB. True on success."""
        name = self._source_order[0]
        frames = frame_set.get_frames_for_source(name)
        if not frames:
            return False
        img = frames[0].image
        img = img.astype(np.float32) / 255.0 if img.dtype == np.uint8 else img
        pose = self._loop.relocalize_attempt(img, self._params, self._frame_count)
        if pose is None:
            return False

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
        self._ba.clear()  # window poses are in the pre-reloc frame
        # The pose shadow is pre-reloc too: invalidate it so IMU
        # prediction waits for the first post-reloc finalize, and restart
        # the BA correction epoch (no pending ticks — the caller drained).
        self._imu.reset_shadow()
        self._ba_corr_total = np.eye(4)
        return True

    # ------------------------------------------------------------ lifecycle

    def reset(self) -> None:
        if self._params is not None:
            self._tracker_state = self._make_state()
        self._pending_q.clear()  # drop any in-flight pipelined ticks
        self._keyframe_poses = []
        self._ba.clear()
        self._loop.reset()
        self._imu.reset()
        self._want_reloc = False
        self._reloc_countdown = 0
        self._map_loaded = False
        self._map_t_odom = np.eye(4)
        self._ba_corr_total = np.eye(4)
        self._low_inlier_streak = 0
        self._held_cov = None
        self._last_timestamp = None
        self._frame_count = 0
        self._last_kf_odom = None
        self._mono_boot_done = False
        self._mono_boot_countdown = 2
        self._mono_rearm_after = 0
        self._light_ctl.reset()
        self.upload_stats = {"full": 0, "light": 0, "light_half": 0, "bytes": 0}
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
