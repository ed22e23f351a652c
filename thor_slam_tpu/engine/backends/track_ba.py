"""Track-level sliding-window bundle adjustment backend.

The cuVSLAM sliding-window-BA role. The measurement stream is the
tracker's own per-tick output (``pack_ba_obs``): KLT positions at
sub-keyframe rate joined across ticks by the persistent ``lm_id`` — so
keyframe-boundary id hops can never poison a window (the id IS the join
key, slots are not). Consumes only FINALIZED-tick data and pushes
corrections to the device as one async delta update, so it is legal (and
sync-free) at any pipeline depth.
"""

from __future__ import annotations

from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from thor_slam_tpu.engine import ba
from thor_slam_tpu.engine import tracker as trk


class TrackBA:
    """Sliding-window BA over finalized tick observations.

    Args:
        window: Ticks per BA window (static pose count K).
        landmarks: Landmark slots per window (static shape L).
        tick_stride: Collect every Nth tick (keyframe ticks always
            collected — they carry the stereo measurement).
        max_correction_m: Reject a pose correction larger than this
            (junk guard); also the per-landmark write-back bound.
        noise_gate_sigma: A correction below this multiple of the PnP
            solve's own positional sigma is withheld (indistinguishable
            from noise — see :meth:`run`).
    """

    def __init__(
        self,
        window: int = 10,
        landmarks: int = 384,
        tick_stride: int = 2,
        max_correction_m: float = 0.08,
        noise_gate_sigma: float = 3.0,
    ) -> None:
        self.window = window
        self.landmarks = landmarks
        self.tick_stride = max(1, tick_stride)
        self.max_correction_m = max_correction_m
        self.noise_gate_sigma = noise_gate_sigma
        self._ticks: deque[dict] = deque(maxlen=window)
        self._cam_rot: np.ndarray | None = None
        self._cam_trans: np.ndarray | None = None
        self._cam_weight: np.ndarray | None = None
        self._num_cams = 0
        self._apply = None

    def bind(self, setup, num_cams: int, mono_obs_weight: float = 0.25) -> None:
        """Bind per-camera constants and build the async write-back.

        The write-back lands corrections on the LIVE tracker state as a
        left-multiplied world-frame delta plus a by-id landmark scatter —
        dispatched, never synced (the delta transports through the
        relative motion of ticks dispatched since the window's last tick).
        ``mono_obs_weight`` down-weights mono cameras' observations in the
        window (same rationale as the PnP weight — tracker.TrackerParams.
        mono_obs_weight).
        """
        self._num_cams = num_cams
        self._cam_weight = np.where(
            np.asarray(setup.stereo_mask, bool), 1.0, mono_obs_weight
        ).astype(np.float32)
        # Camera axis of the BA problem is 2C: left imagers then right
        # imagers — the stereo constraint anchors scale inside the window.
        self._cam_rot = np.concatenate(
            [np.asarray(setup.cam_r_body), np.asarray(setup.cam_r_body_right)]
        )
        self._cam_trans = np.concatenate(
            [np.asarray(setup.cam_t_body), np.asarray(setup.cam_t_body_right)]
        )
        l_cap = self.landmarks

        def _apply(state, t_corr, upd_ids, upd_pos, upd_ok):
            idx = jnp.clip(jnp.searchsorted(upd_ids, state.lm_id), 0, l_cap - 1)
            hit = (upd_ids[idx] == state.lm_id) & state.lm_valid & upd_ok[idx]
            return state._replace(
                world_t_body=t_corr @ state.world_t_body,
                prev_world_t_body=t_corr @ state.prev_world_t_body,
                kf_world_t_body=t_corr @ state.kf_world_t_body,
                velocity_w=t_corr[:3, :3] @ state.velocity_w,
                lm_pos_w=jnp.where(hit[..., None], upd_pos[idx], state.lm_pos_w),
            )

        self._apply = jax.jit(_apply, donate_argnums=(0,))

    def warm(self, make_state) -> None:
        """Compile the write-back (donates its state — fresh throwaway)."""
        warmed = self._apply(
            make_state(),
            jnp.eye(4),
            jnp.full(self.landmarks, np.iinfo(np.int32).max, jnp.int32),
            jnp.zeros((self.landmarks, 3)),
            jnp.zeros(self.landmarks, bool),
        )
        jax.block_until_ready(warmed.world_t_body)

    def clear(self) -> None:
        self._ticks.clear()

    def __len__(self) -> int:
        return len(self._ticks)

    def push_tick(
        self, pending: dict, world_t_body: np.ndarray, ts: float, refreshed: bool
    ) -> None:
        """Append this tick's observations to the sliding window."""
        obs = pending.get("ba_obs")
        if obs is None:
            return
        rec = trk.unpack_ba_obs(obs)
        rec["body_t_world"] = np.linalg.inv(np.asarray(world_t_body, np.float64))
        rec["ts"] = ts
        rec["refreshed"] = bool(refreshed)
        self._ticks.append(rec)

    def run(
        self,
        world_t_body: np.ndarray,
        covariance: np.ndarray | None,
        tracker_state,
        diagnostics: dict,
    ):
        """Optimize the recent-tick window; push corrections to the tracker.

        Variables: one pose per window tick + landmarks observed in >= 3
        ticks (joined by ``lm_id``). Left observations attach at every
        tick; the stereo right observation attaches only at the tick that
        minted it (``refreshed`` ticks), anchoring scale. Refined landmark
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

        Returns:
            ``(tracker_state, world_t_body, t_corr)`` — ``t_corr`` is the
            applied odom-frame delta, or None when no correction applied
            (the reason lands in ``diagnostics["ba_skip"]``).
        """
        ticks = list(self._ticks)
        if len(ticks) < 4:
            diagnostics["ba_skip"] = f"window={len(ticks)}"
            return tracker_state, world_t_body, None
        k_win = self.window
        ticks = ticks[-k_win:]
        c = self._num_cams
        l_cap = self.landmarks

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
            diagnostics["ba_skip"] = f"joined_landmarks={len(multi)}"
            return tracker_state, world_t_body, None
        multi.sort(key=lambda lid: -counts[lid])
        chosen = np.sort(np.asarray(multi[:l_cap], np.int64))  # sorted: searchsorted joins
        l_n = len(chosen)

        obs = np.zeros((k_win, 2 * c, l_cap, 2), np.float32)
        mask = np.zeros((k_win, 2 * c, l_cap), np.float32)
        poses = np.tile(np.eye(4, dtype=np.float32), (k_win, 1, 1))
        pose_mask = np.zeros(k_win, np.float32)
        lms = np.zeros((l_cap, 3), np.float32)

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
                mask[ki, ci, li] = self._cam_weight[ci]
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
            cam_rot=jnp.asarray(self._cam_rot),
            cam_trans=jnp.asarray(self._cam_trans),
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
            diagnostics["ba_skip"] = (
                f"rms {float(initial_rms):.5f}->{float(final_rms):.5f}"
            )
            return tracker_state, world_t_body, None

        refined_poses = np.asarray(result.body_t_world, np.float64)
        refined_lms = np.asarray(result.landmarks_w)

        k_last = len(ticks) - 1
        new_world = np.linalg.inv(refined_poses[k_last])
        corr = np.linalg.norm(new_world[:3, 3] - world_t_body[:3, 3])
        if corr > self.max_correction_m:
            diagnostics["ba_skip"] = f"correction {corr:.3f} m"
            return tracker_state, world_t_body, None  # junk guard
        if covariance is not None:
            # Noise-floor gate: a correction the PnP solve cannot itself
            # distinguish from noise has nothing real to fix (see
            # docstring). The window keeps accumulating; only the
            # application is withheld.
            floor = self.noise_gate_sigma * float(
                np.sqrt(max(np.trace(covariance[:3, :3]), 0.0))
            )
            if corr < floor:
                diagnostics["ba_skip"] = (
                    f"corr {corr:.4f} m < noise floor {floor:.4f} m"
                )
                return tracker_state, world_t_body, None

        # Write back: refined landmarks into the live bank (by id) plus
        # the pose delta, as ONE async on-device update: the delta
        # transports correctly through any relative motion the device
        # computed since this window's last tick, so the same dispatch is
        # exact at depth 1 and valid under deep pipelining. A landmark the
        # solver moved implausibly far disagrees structurally with the
        # window (wrong association, degenerate depth) — writing it back
        # would poison every subsequent PnP solve; keep the old position
        # for those.
        lm_shift = np.linalg.norm(refined_lms - lms, axis=-1)
        lm_ok = lm_shift <= self.max_correction_m
        t_corr = new_world @ np.linalg.inv(np.asarray(world_t_body, np.float64))
        upd_ids = np.full(l_cap, np.iinfo(np.int32).max, np.int32)  # sorted pad
        upd_ids[:l_n] = chosen
        upd_ok = np.zeros(l_cap, bool)
        upd_ok[:l_n] = lm_ok[:l_n]
        tracker_state = self._apply(
            tracker_state,
            jnp.asarray(t_corr, jnp.float32),
            jnp.asarray(upd_ids),
            jnp.asarray(refined_lms, jnp.float32),
            jnp.asarray(upd_ok),
        )
        # ... and refined poses into the window (the next solve starts warm).
        for ki, t in enumerate(ticks):
            t["body_t_world"] = refined_poses[ki]
        diagnostics["ba_rms"] = (float(initial_rms), float(final_rms))
        diagnostics["ba_landmarks"] = int(l_n)
        return tracker_state, new_world, t_corr
