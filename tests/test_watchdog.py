"""Camera watchdog: stale-source detection and degraded-rig tracking.

The reference has no failure detection — a dead camera freezes its sync
loop forever (SURVEY.md §5.3: "No reconnection, no watchdog"). Here the
rig detects sources that stop producing (``watchdog_timeout_s``), keeps
synchronizing on the live ones, and the tracker masks dead cameras out of
the pose solve via ``cam_active``.
"""

import time

import jax.numpy as jnp
import numpy as np

from thor_slam_tpu.camera.rig import CameraRig
from thor_slam_tpu.engine import tracker as trk
from thor_slam_tpu.utils.flagship import flagship_rig, render_sequence

from tests.test_rig_sync import make_sources


class Mortal:
    """Wraps a source; when killed it stops producing frames (stalled device)."""

    def __init__(self, src):
        self._src = src
        self.alive = True

    def __getattr__(self, attr):
        return getattr(self._src, attr)

    def try_get_latest_frames(self):
        return self._src.try_get_latest_frames() if self.alive else []

    def get_latest_frames(self):
        return self._src.get_latest_frames() if self.alive else []


class TestRigWatchdog:
    TIMEOUT = 0.05

    def _rig(self, n=2, **kw):
        sources = [Mortal(s) for s in make_sources([0.0] * n)]
        return sources, CameraRig(sources, watchdog_timeout_s=self.TIMEOUT, **kw)

    def test_no_stale_while_all_alive(self):
        _, rig = self._rig()
        with rig:
            for _ in range(3):
                sync = rig.get_synchronized_frames()
            assert sync.stale_sources == frozenset()

    def test_dead_source_goes_stale_and_sync_continues(self):
        sources, rig = self._rig()
        with rig:
            for _ in range(3):
                sync = rig.get_synchronized_frames()
            sources[1].alive = False
            time.sleep(self.TIMEOUT + 0.02)
            sync = rig.get_synchronized_frames()
            assert sync is not None
            assert sync.stale_sources == frozenset({"cam1"})
            # The reference timestamp now advances with the live camera
            # instead of freezing at the dead one's last frame.
            ts1 = sync.timestamp
            sync = rig.get_synchronized_frames()
            assert sync.timestamp > ts1
            # The dead source's last frame set is still attached (marked).
            assert "cam1" in sync.frame_sets

    def test_stale_does_not_inflate_max_time_delta(self):
        sources, rig = self._rig()
        with rig:
            for _ in range(3):
                rig.get_synchronized_frames()
            sources[1].alive = False
            time.sleep(self.TIMEOUT + 0.02)
            for _ in range(5):
                sync = rig.get_synchronized_frames()
            # cam1's last frame is ~0.5 s behind the reference by now; the
            # delta reported must describe the live cameras only.
            assert sync.max_time_delta < 0.1

    def test_dead_from_birth_is_omitted(self):
        sources, rig = self._rig()
        sources[1].alive = False
        with rig:
            time.sleep(self.TIMEOUT + 0.02)
            sync = rig.get_synchronized_frames()
            assert sync is not None
            assert sync.stale_sources == frozenset({"cam1"})
            assert "cam1" not in sync.frame_sets  # never produced anything

    def test_all_dead_yields_none_not_empty_sync(self):
        sources, rig = self._rig()
        for s in sources:
            s.alive = False
        with rig:
            time.sleep(self.TIMEOUT + 0.02)
            assert rig.get_synchronized_frames() is None

    def test_revival_clears_stale(self):
        sources, rig = self._rig()
        with rig:
            for _ in range(3):
                rig.get_synchronized_frames()
            sources[1].alive = False
            time.sleep(self.TIMEOUT + 0.02)
            assert rig.get_synchronized_frames().stale_sources == {"cam1"}
            sources[1].alive = True
            rig.get_synchronized_frames()  # poll ingests a fresh frame
            assert rig.get_synchronized_frames().stale_sources == frozenset()

    def test_source_health(self):
        sources, rig = self._rig()
        with rig:
            rig.get_synchronized_frames()
            health = rig.get_source_health()
            assert set(health) == {"cam0", "cam1"}
            assert all(age < 0.05 for age in health.values())

    def test_disabled_without_timeout(self):
        sources = [Mortal(s) for s in make_sources([0.0, 0.0])]
        with CameraRig(sources) as rig:
            for _ in range(3):
                rig.get_synchronized_frames()
            sources[1].alive = False
            time.sleep(0.1)
            sync = rig.get_synchronized_frames()
            # Reference behavior: no watchdog, reference timestamp frozen at
            # the dead camera's newest frame; nothing reported stale.
            assert sync.stale_sources == frozenset()
            ts1 = sync.timestamp
            assert rig.get_synchronized_frames().timestamp == ts1


class TestTrackerCamActive:
    def test_refresh_mints_nothing_for_masked_camera(self):
        params, setup, _, sources, world, traj = flagship_rig(
            num_cams=4, width=96, height=64, max_keypoints=64
        )
        step = trk.make_track_step(params, setup)
        seq = render_sequence(sources, 1)
        active = jnp.asarray([False, True, True, True])
        state, out = step(trk.init_state(params), jnp.asarray(seq[0]), None, active)
        assert bool(out.refreshed)
        assert int(np.asarray(state.lm_valid)[0].sum()) == 0
        assert int(np.asarray(state.lm_valid)[1:].sum()) > 0

    def test_tracking_survives_one_dead_camera(self):
        params, setup, _, sources, world, traj = flagship_rig(
            num_cams=4, width=96, height=64, max_keypoints=64
        )
        step = trk.make_track_step(params, setup)
        state = trk.init_state(params)
        seq = np.asarray(render_sequence(sources, 5))
        state, _ = step(state, jnp.asarray(seq[0]))  # bootstrap all-active

        active = jnp.asarray([False, True, True, True])
        gt0 = traj.pose(sources[0].frame_time(0))
        for i in range(1, 5):
            frame = seq[i].copy()
            frame[0] = seq[0][0]  # camera 0 frozen at its last live frame
            state, out = step(state, jnp.asarray(frame), None, active)
        gt_rel = np.linalg.inv(gt0) @ traj.pose(sources[0].frame_time(4))
        err = np.linalg.norm(np.asarray(out.world_t_body)[:3, 3] - gt_rel[:3, 3])
        assert int(out.num_inliers) > 30
        assert err < 0.08

    def test_mask_removes_frozen_camera_bias(self):
        """A frozen camera fed to the solver unmasked must not be better
        than masking it — the masked solve is the safety property."""
        params, setup, _, sources, world, traj = flagship_rig(
            num_cams=4, width=96, height=64, max_keypoints=64
        )
        step = trk.make_track_step(params, setup)
        seq = np.asarray(render_sequence(sources, 4))

        def run(mask):
            state = trk.init_state(params)
            state, _ = step(state, jnp.asarray(seq[0]))
            for i in range(1, 4):
                frame = seq[i].copy()
                frame[0] = seq[0][0]
                state, out = step(state, jnp.asarray(frame), None, mask)
            gt0 = traj.pose(sources[0].frame_time(0))
            gt_rel = np.linalg.inv(gt0) @ traj.pose(sources[0].frame_time(3))
            return np.linalg.norm(np.asarray(out.world_t_body)[:3, 3] - gt_rel[:3, 3])

        err_masked = run(jnp.asarray([False, True, True, True]))
        err_unmasked = run(None)
        assert err_masked <= err_unmasked + 1e-6
