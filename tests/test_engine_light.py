"""Light (left-only) tick scheduling: upload halving without behavior change.

The right image's only consumer is the keyframe front-end; a light tick
statically removes that branch (``track_step`` ``allow_refresh=False``)
and ships (C, 1, H, W). The engine's host-side scheduler mirrors the
device keyframe policy at a 0.7x margin, so keyframes land on full ticks
and the trajectory is unchanged (VERDICT r3 #2: cut per-tick upload
bytes at the deployed configuration; ATE unchanged).
"""

from __future__ import annotations

import numpy as np
import pytest

import thor_slam_tpu as tst
from thor_slam_tpu.camera.sources import SyntheticRigSpec, make_synthetic_rig
from thor_slam_tpu.engine import tracker as trk
from thor_slam_tpu.engine.setup import build_camera_setup
from thor_slam_tpu.engine.tpu_engine import TpuSlamEngine


def _rig(num_sources=2, width=160, height=100):
    spec = SyntheticRigSpec(
        num_sources=num_sources, stereo=True, width=width, height=height
    )
    return make_synthetic_rig(spec)


class TestTrackerLightStep:
    def test_light_matches_full_on_continue_tick(self):
        """On a tick where the full step does NOT refresh, the light step
        (left-only images) must produce bit-identical state and outputs."""
        sources, rig_ext, world, traj = _rig()
        with tst.CameraRig(sources, rig_extrinsics=rig_ext) as rig:
            setup, order, h, w = build_camera_setup(rig.calibration)
            params = trk.TrackerParams(
                num_cams=len(order), height=h, width=w, max_keypoints=128
            )
            step = trk.make_track_step(params, setup, pack=True)
            step_light = trk.make_track_step(params, setup, pack=True, light=True)

            def images_of(sync):
                flat = []
                for name in order:
                    for f in sync.frame_sets[name].frames:
                        flat.append(f.image.astype(np.float32) / 255.0)
                return np.stack(flat).reshape(len(order), 2, h, w)

            state = trk.init_state(params)
            im0 = images_of(rig.get_synchronized_frames())
            state, out0, _ = step(state, im0, None, None)
            assert bool(out0.refreshed)  # tick 0 mints the bank

            im1 = images_of(rig.get_synchronized_frames())
            full_state, full_out, full_packed = step(state, im1, None, None)
            assert not bool(full_out.refreshed), "pick a non-keyframe tick"
            light_state, light_out, light_packed = step_light(
                state, im1[:, :1], None, None
            )
            np.testing.assert_array_equal(
                np.asarray(full_packed), np.asarray(light_packed)
            )
            for f in trk.TrackerState._fields:
                np.testing.assert_array_equal(
                    np.asarray(getattr(full_state, f)),
                    np.asarray(getattr(light_state, f)),
                    err_msg=f,
                )

    def test_light_step_never_refreshes(self):
        """Even the restart path must not trip on a light tick (restart
        mints a bank, which needs the right image)."""
        sources, rig_ext, world, traj = _rig()
        with tst.CameraRig(sources, rig_extrinsics=rig_ext) as rig:
            setup, order, h, w = build_camera_setup(rig.calibration)
            params = trk.TrackerParams(
                num_cams=len(order), height=h, width=w, max_keypoints=64,
                restart_after_untracked=1,
            )
            step_light = trk.make_track_step(params, setup, pack=True, light=True)
            state = trk.init_state(params)  # empty bank: frame_idx==0 wants refresh
            sync = rig.get_synchronized_frames()
            flat = [
                sync.frame_sets[name].frames[0].image.astype(np.float32) / 255.0
                for name in order
            ]
            images = np.stack(flat).reshape(len(order), 1, h, w)
            new_state, out, _ = step_light(state, images, None, None)
            assert not bool(out.refreshed)
            assert int(np.asarray(new_state.lm_valid).sum()) == 0


class TestEngineLightScheduling:
    def _run(self, light, frames=40, half_res=False):
        sources, rig_ext, world, traj = _rig()
        poses, gts, lights, refreshed_on_light = [], [], 0, 0
        with tst.CameraRig(
            sources, rig_extrinsics=rig_ext, imu_source=sources[0].name
        ) as rig:
            eng = TpuSlamEngine(
                params=dict(max_keypoints=128), light_ticks=light,
                light_half_res=half_res,
            )
            eng.initialize(rig.calibration, tst.SlamConfig(num_cameras=4))
            first_tick_light = None
            gt0 = None
            for i in range(frames):
                sync = rig.get_synchronized_frames()
                p = eng.process_frames(sync)
                d = eng.last_diagnostics
                if first_tick_light is None:
                    first_tick_light = d.get("light_tick", False)
                lights += d.get("light_tick", False)
                if d.get("refreshed") and d.get("light_tick"):
                    refreshed_on_light += 1
                if p is not None:
                    if gt0 is None:
                        gt0 = traj.pose(sync.timestamp)
                    poses.append(p.position.copy())
                    g = np.linalg.inv(gt0) @ traj.pose(sync.timestamp)
                    gts.append(g[:3, 3])
            kf = len(eng._keyframe_poses)
            eng.shutdown()
        poses, gts = np.asarray(poses), np.asarray(gts)
        ate = float(np.sqrt(np.mean(np.sum((poses - gts) ** 2, axis=1)))) if len(poses) else np.inf
        return {
            "poses": poses,
            "ate": ate,
            "lights": lights,
            "kf": kf,
            "first_light": first_tick_light,
            "refreshed_on_light": refreshed_on_light,
        }

    @pytest.mark.slow
    def test_light_scheduling_preserves_trajectory(self):
        off = self._run(False)
        on = self._run(True)
        assert off["lights"] == 0
        assert on["lights"] > 10, "scheduler never went light"
        assert on["first_light"] is False, "first tick must be full"
        assert on["refreshed_on_light"] == 0, "keyframe landed on a light tick"
        # The 0.7x-margin scheduler predicted every keyframe on this
        # sequence: identical keyframes and identical trajectory.
        assert on["kf"] == off["kf"]
        np.testing.assert_allclose(on["poses"], off["poses"], atol=1e-6)

    @pytest.mark.slow
    def test_light_half_res_tracks_close_to_full_res(self):
        """light_half_res ships 1/4 of a light tick's bytes (VERDICT r3 #2
        upload lever); the device upsample keeps the trajectory close to
        the full-res run — same keyframes, small position drift."""
        full = self._run(True)
        half = self._run(True, half_res=True)
        assert half["lights"] > 10
        assert half["refreshed_on_light"] == 0
        # Keyframe timing may shift by a tick or two (coarser inlier
        # counts nudge the pressure heuristic) — judge by accuracy, not
        # keyframe-for-keyframe parity.
        assert abs(half["kf"] - full["kf"]) <= 2
        # Inter-keyframe subpixel loss only: the ground-truth ATE stays
        # within 1.5x of the full-resolution-upload run (and sane).
        assert half["ate"] < max(1.5 * full["ate"], full["ate"] + 2e-3), (
            half["ate"], full["ate"],
        )

    def test_half_res_staging_shapes(self):
        """Staged light images are (H/2, W/2); full ticks stay (H, W)."""
        sources, rig_ext, world, traj = _rig()
        with tst.CameraRig(
            sources, rig_extrinsics=rig_ext, imu_source=sources[0].name
        ) as rig:
            eng = TpuSlamEngine(
                params=dict(max_keypoints=128), light_ticks=True,
                light_half_res=True,
            )
            eng.initialize(rig.calibration, tst.SlamConfig(num_cameras=4))
            sync = rig.get_synchronized_frames()
            assert eng.light_half_active  # forced on by light_half_res=True
            full = eng._stage_list(sync, light=False)
            lite = eng._stage_list(sync, light=True, half=True)
            assert full[0].shape == (100, 160)
            assert lite[0].shape == (50, 80)
            assert len(lite) == len(full) // 2
            eng.shutdown()

    def test_spmd_engine_disables_light(self):
        eng = TpuSlamEngine(devices=2, light_ticks=True)
        # Resolution happens at initialize; just check the request is
        # stored and the resolver path exists (full init needs 2 devices).
        assert eng._light_ctl.light_requested is True
        assert eng._light_ctl.light is False  # not yet resolved


class TestAdaptiveHalfRes:
    """Degrade-to-keep-up: light ticks fall back to half-res staging when
    the engine cannot keep the camera cadence, and recover with hysteresis
    (TpuSlamEngine.adaptive_half_res; no reference equivalent — the
    reference's on-camera ASIC never contends with SLAM compute)."""

    def test_suite_default_is_off(self):
        # conftest sets THOR_SLAM_TPU_ADAPTIVE_HALF=0 so the suite's
        # hundreds of engines don't each compile a second light executable.
        eng = TpuSlamEngine(light_ticks=True)
        assert eng._light_ctl.adaptive_requested is False

    def test_forced_half_res_disables_adaptivity(self):
        sources, rig_ext, world, traj = _rig()
        with tst.CameraRig(
            sources, rig_extrinsics=rig_ext, imu_source=sources[0].name
        ) as rig:
            eng = TpuSlamEngine(
                params=dict(max_keypoints=128), light_ticks=True,
                light_half_res=True, adaptive_half_res=True,
            )
            eng.initialize(rig.calibration, tst.SlamConfig(num_cameras=4))
            assert eng._light_ctl.adaptive is False  # already pinned at half
            assert eng.light_half_active is True
            assert set(eng._step_light) == {True}  # one executable only
            eng.shutdown()

    @pytest.mark.slow
    def test_degrades_under_overload_then_recovers(self):
        """Overload (budget ≪ tick time) flips light ticks to half-res
        after the up-streak; slack (budget ≫ tick time) restores full-res
        after the down-streak. Tracking survives both switches mid-stream
        at pipeline depth 2."""
        sources, rig_ext, world, traj = _rig()
        with tst.CameraRig(
            sources, rig_extrinsics=rig_ext, imu_source=sources[0].name
        ) as rig:
            eng = TpuSlamEngine(
                params=dict(max_keypoints=128), light_ticks=True,
                adaptive_half_res=True, pipelined=True, pipeline_depth=2,
            )
            # Absurd camera rate -> every tick is over budget.
            eng.initialize(
                rig.calibration,
                tst.SlamConfig(num_cameras=4, expected_fps=1e6),
            )
            assert eng._light_ctl.adaptive is True
            assert set(eng._step_light) == {False, True}  # both compiled
            assert not eng.light_half_active
            eng._light_ctl.adapt_up_ticks = 3
            # Max-rate replay: pin the pace classification (the real-time
            # heuristic would rightly refuse to degrade a replay).
            eng._light_ctl.pace_override = True
            eng._light_ctl.adapt_down_ticks = 4
            half_light_ticks = 0
            pose = None
            for i in range(24):
                p = eng.process_frames(rig.get_synchronized_frames())
                pose = p or pose
                if eng.last_diagnostics.get("light_tick") and eng.light_half_active:
                    half_light_ticks += 1
            assert eng.light_half_active, "controller never degraded"
            assert half_light_ticks > 0, "no light tick shipped half-res"
            assert pose is not None and np.all(np.isfinite(pose.position))
            # Recovery: a huge budget puts every tick far under 45%.
            eng._light_ctl.budget_s = 1e6
            for i in range(12):
                p = eng.process_frames(rig.get_synchronized_frames())
                pose = p or pose
            assert not eng.light_half_active, "controller never recovered"
            eng.flush()
            assert np.all(np.isfinite(pose.position))
            eng.shutdown()
