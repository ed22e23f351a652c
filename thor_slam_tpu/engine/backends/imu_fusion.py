"""IMU fusion backend: buffering, gravity estimation, pose prediction.

The cuVSLAM IMU-fusion role (reference
launch/thor_visual_slam.launch.py:80-104) re-housed as an explicit
engine backend. Everything here is host-side scalar math on finalized
data — a device dispatch would cost a network round trip per tick on
remote-attached TPUs (measured), and the windows are <=64 samples.

Owns the finalized-pose SHADOW: the last pose/timestamp/velocity the
host has actually finalized. Every prediction integrates from the
shadow, never from the live device state (which would sync on in-flight
ticks and, at pipeline depth > 1, read the wrong tick).
"""

from __future__ import annotations

import logging

import numpy as np

logger = logging.getLogger(__name__)


class ImuFusion:
    """IMU ingest + online gravity + preintegrated pose prediction.

    Args:
        body_r_imu: (3, 3) rotation IMU -> body frame.
        use_accel: Enable the accelerometer path (gravity estimation +
            Forster translation prediction); gyro-only otherwise.
        gravity_min_ticks: Gravity observations required before the accel
            term engages (constant-velocity fallback until then).
        capacity: Raw-sample ring length.
        pred_capacity: Fixed preintegration-window size (samples).
    """

    def __init__(
        self,
        body_r_imu: np.ndarray | None = None,
        use_accel: bool = True,
        gravity_min_ticks: int = 30,
        capacity: int = 256,
        pred_capacity: int = 64,
    ) -> None:
        self.body_r_imu = np.eye(3) if body_r_imu is None else np.asarray(body_r_imu, np.float64)
        self.use_accel = use_accel
        self._gravity_min_ticks = int(gravity_min_ticks)
        self._capacity = capacity
        self._pred_capacity = pred_capacity
        self._ts: list[float] = []
        self._gyro: list[np.ndarray] = []
        self._accel: list[np.ndarray] = []
        # Online gravity estimate in the ODOM frame (EMA over per-tick
        # observations g = a_w - R f; see _observe_gravity). None until
        # the first observation.
        self.gravity_w: np.ndarray | None = None
        self.gravity_n = 0
        # Finalized-pose shadow (see module docstring). ``fin_vel`` is the
        # INSTANTANEOUS velocity estimate at fin_ts (what the prediction's
        # constant-velocity term wants); ``_fin_vel_avg`` the previous
        # window's AVERAGE velocity (what the gravity double-difference
        # derivation is written in terms of).
        self.fin_pose: np.ndarray | None = None
        self.fin_ts: float | None = None
        self.fin_vel = np.zeros(3)
        self._fin_vel_avg = np.zeros(3)
        #: Timestamp of the finalized pose BEFORE the last one (None until
        #: two windows exist) — the gravity observation differentiates the
        #: average velocities of two consecutive finalized windows.
        self.fin_ts_prev: float | None = None
        # Correction-epoch identities at the last two finalizes. The
        # gravity observation double-differences three finalized poses; a
        # BA correction landing anywhere across that span would enter a_w
        # amplified 2/dt^2-fold (a 5 mm nudge at 30 fps reads as ~9 m/s^2
        # — inside the junk gate, and BA corrections are not zero-mean, so
        # the EMA would be directionally biased). Epochs are replaced,
        # never mutated, so identity comparison detects any correction.
        self._fin_epoch = None
        self._fin_epoch_prev = None
        #: Count of preintegration windows that contained no samples
        #: (nonzero growth while enabled means the IMU path is dead).
        self.empty_windows = 0

    def reset(self) -> None:
        """Drop samples, the gravity estimate, and the pose shadow."""
        self._ts, self._gyro, self._accel = [], [], []
        self.gravity_w = None
        self.gravity_n = 0
        self.empty_windows = 0
        self.reset_shadow()

    def reset_shadow(self) -> None:
        """Invalidate the finalized-pose shadow (pose discontinuity:
        relocalization, state restore) — prediction waits for the next
        finalize; the gravity EMA restarts (the odom frame moved)."""
        self.fin_pose = None
        self.fin_ts = None
        self.fin_vel = np.zeros(3)
        self._fin_vel_avg = np.zeros(3)
        self.fin_ts_prev = None
        self._fin_epoch = None
        self._fin_epoch_prev = None
        self.gravity_w = None
        self.gravity_n = 0

    # --------------------------------------------------------- ingest

    def ingest(self, sensor_data: dict, sensor_ts: float | None) -> None:
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
                if not self._ts or t > self._ts[-1]:
                    self._ts.append(t)
                    self._gyro.append(gyr[i])
                    self._accel.append(acc[i])
        else:
            t = float(sensor_data.get("timestamp", sensor_ts or 0.0))
            if not self._ts or t > self._ts[-1]:
                self._ts.append(t)
                self._gyro.append(gyr)
                self._accel.append(acc)
        if len(self._ts) > self._capacity:
            del self._ts[: -self._capacity]
            del self._gyro[: -self._capacity]
            del self._accel[: -self._capacity]

    @property
    def num_samples(self) -> int:
        return len(self._ts)

    # --------------------------------------------- finalized-pose shadow

    def on_finalized(
        self,
        world_t_body: np.ndarray,
        ts: float,
        tracked: bool,
        epoch,
    ) -> None:
        """Advance the shadow with one finalized pose.

        Args:
            world_t_body: The finalized (epoch-lifted) odom-frame pose.
            ts: Its timestamp.
            tracked: Whether the solve had enough inliers — only tracked
                solves observe gravity (warm-up poses are noise and
                double-differencing amplifies them 2/dt^2-fold).
            epoch: The CURRENT correction-epoch object (identity-compared
                across finalizes; see ``_fin_epoch`` above).
        """
        if self.fin_ts is not None and ts > self.fin_ts:
            dt = ts - self.fin_ts
            v_avg = (world_t_body[:3, 3] - self.fin_pose[:3, 3]) / dt
            if (
                self.use_accel
                and self.fin_ts_prev is not None
                and tracked
                and self._fin_epoch_prev is epoch
            ):
                self._observe_gravity(v_avg, ts)
            # Half-step propagation: v_avg lags the instantaneous v(ts)
            # by ~a*dt/2 (under constant acceleration v(ts) = v_avg +
            # 0.5*a*dt with a*dt = g*dt + R0*delta_v); without it the
            # Forster term cancels only about half the constant-velocity
            # prediction error. Engaged with the accel term (needs the
            # gravity estimate); v_avg otherwise.
            v_inst = v_avg
            if self.accel_pred_active():
                from thor_slam_tpu.engine import imu as imu_mod

                g_, a_, d_, m_ = imu_mod.pack_imu_window(
                    self._ts, self._gyro, self._accel,
                    t_start=self.fin_ts, t_end=ts, capacity=self._pred_capacity,
                )
                if m_.sum() >= 1:
                    pre = imu_mod.preintegrate_fast_np(g_, a_, d_, m_)
                    v_inst = v_avg + 0.5 * (
                        self.gravity_w * dt
                        + self.fin_pose[:3, :3] @ (self.body_r_imu @ pre.delta_v)
                    )
            self.fin_ts_prev = self.fin_ts
            self._fin_epoch_prev = self._fin_epoch
            self.fin_vel = v_inst
            self._fin_vel_avg = v_avg
        self.fin_pose = world_t_body
        self.fin_ts = ts
        self._fin_epoch = epoch

    def on_correction(self, world_t_body: np.ndarray, t_corr: np.ndarray, epoch) -> None:
        """A BA correction just moved the live state: re-anchor the shadow.

        The next prediction must integrate from where the device actually
        is; the shadow velocity transforms like a free vector under the
        left-applied correction (translation cancels in the difference of
        two corrected endpoints) — same rotation the device's velocity_w
        receives.
        """
        self.fin_pose = world_t_body
        self._fin_epoch = epoch
        self.fin_vel = t_corr[:3, :3] @ self.fin_vel

    # ------------------------------------------------------ gravity

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
        m0 = 0.5 * (self.fin_ts_prev + self.fin_ts)
        m1 = 0.5 * (self.fin_ts + ts)
        dt = m1 - m0
        if dt <= 1e-6 or not self._ts:
            return
        ts_arr = np.asarray(self._ts)
        sel = (ts_arr > m0) & (ts_arr <= m1)
        if not np.any(sel):
            return
        f_imu = np.mean(np.asarray(self._accel)[sel], axis=0)
        a_w = (v_new - self.fin_vel) / dt
        g_obs = a_w - self.fin_pose[:3, :3] @ (self.body_r_imu @ f_imu)
        # Junk-only guard (solve glitch, clock skew, teleport). Individual
        # observations are dominated by double-differencing noise (sigma ~
        # 2 sigma_p / dt^2 — tens of m/s^2 at millimeter solve noise), but
        # the noise is zero-mean; a TIGHT norm gate here would clip the
        # distribution asymmetrically and bias the mean low (measured:
        # a (4, 16) gate converged to |g| = 6.3).
        if float(np.linalg.norm(g_obs)) > 60.0:
            return
        if self.gravity_w is None:
            self.gravity_w = g_obs
        else:
            # Running mean first (the estimator must average the noise
            # down, not anchor on the earliest samples), then a slow EMA
            # so the estimate tracks odom-frame drift.
            alpha = max(1.0 / (self.gravity_n + 1.0), 0.005)
            self.gravity_w = (1.0 - alpha) * self.gravity_w + alpha * g_obs
        self.gravity_n += 1

    def accel_pred_active(self) -> bool:
        """Whether the accel term of the pose prediction is engaged."""
        return (
            self.use_accel
            and self.gravity_w is not None
            and self.gravity_n >= self._gravity_min_ticks
            and 8.0 < float(np.linalg.norm(self.gravity_w)) < 12.0
        )

    # ----------------------------------------------------- prediction

    def predict(self, ts: float) -> np.ndarray | None:
        """Preintegrated IMU pose prediction from the finalized shadow.

        Rotation is always gyro-preintegrated (the part that breaks
        constant-velocity models). Translation upgrades from
        constant-velocity extrapolation to the full Forster form
        ``p + v dt + 1/2 g dt^2 + R delta_p`` once the online odom-frame
        gravity estimate has converged (see :meth:`_observe_gravity`) —
        the cuVSLAM IMU-fusion role (reference
        launch/thor_visual_slam.launch.py:80-104).

        ``fin_vel`` is the finalized-window average velocity propagated
        to the window end by the half-step correction in
        :meth:`on_finalized` (once the accel term is active), so the
        constant-velocity term extrapolates from the INSTANTANEOUS
        velocity rather than one lagging by ~a*dt/2.
        """
        if self.fin_ts is None or len(self._ts) < 2:
            return None
        from thor_slam_tpu.engine import imu as imu_mod

        # Window starts at the last FINALIZED tick (the pose shadow's
        # timestamp): at pipeline depth d the window spans d+1 ticks of
        # samples, so the prediction always integrates from a pose the
        # host actually has (never the in-flight live state).
        g, a, d, m = imu_mod.pack_imu_window(
            self._ts, self._gyro, self._accel,
            t_start=self.fin_ts, t_end=ts, capacity=self._pred_capacity,
        )
        if m.sum() < 1:
            # A dead IMU path must be VISIBLE: with use_imu=True the engine
            # silently degrades to constant-velocity when every window is
            # empty (e.g. a source delivering samples one tick late).
            self.empty_windows += 1
            if self.empty_windows in (10, 100) or self.empty_windows % 1000 == 0:
                logger.warning(
                    "IMU enabled but %d preintegration windows were empty — "
                    "samples may be arriving late or not at all",
                    self.empty_windows,
                )
            return None
        # Host (no device round trip). Before gravity convergence the
        # accel integral would be meaningless, so only delta_r is
        # integrated and translation stays constant-velocity.
        rbi = self.body_r_imu
        accel_active = self.accel_pred_active()
        if accel_active:
            pre = imu_mod.preintegrate_fast_np(g, a, d, m)
            delta_r_body = rbi @ pre.delta_r @ rbi.T
        else:
            delta_r_body = rbi @ imu_mod.gyro_delta_r_np(g, d, m) @ rbi.T

        # Integrate forward from the finalized-pose SHADOW: reading the
        # live device state here would block on every in-flight tick (a
        # full network RTT per tick on tunneled TPUs) and at depth > 1
        # would read a pose ticks ahead of the IMU window's start.
        fin = self.fin_pose
        pred = np.eye(4)
        pred[:3, :3] = fin[:3, :3] @ delta_r_body
        pred[:3, 3] = fin[:3, 3] + self.fin_vel * (ts - self.fin_ts)
        if accel_active:
            # Forster propagation: the specific-force double integral
            # (rotated into the body frame at the window start) plus the
            # gravity parabola over the integrated span. delta_p spans
            # pre.dt (the samples' coverage), which may trail ts by a
            # fraction of a sample period — the constant-velocity term
            # above already covers the full (fin_ts, ts] gap.
            pred[:3, 3] += 0.5 * self.gravity_w * pre.dt * pre.dt + fin[
                :3, :3
            ] @ (rbi @ pre.delta_p)
        # numpy, NOT jnp.asarray(..., f32): an eager dtype-converting
        # device op costs a dispatch round trip per tick on remote TPUs
        # (measured ~3.6 ms); the jitted step's call boundary uploads the
        # 64-byte operand for free.
        return pred.astype(np.float32)
