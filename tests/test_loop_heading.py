"""Heading-tolerant place recognition via the multi-camera place DB.

A single forward camera cannot recognize a 180-degree-reversed revisit —
the views share no 3D content (measured + documented in
tests/test_reverse_revisit.py). The rig-level fix is indexing EVERY
camera's keyframe signature in the place DB: on a rig whose mounts cover
the yaw space (the reference's 4 cameras at spread yaws,
examples/assets/brackets.urdf), the query's forward camera matches what a
rear-facing camera recorded on the first pass. This file proves that fix
end to end:

* an engine-level corridor scenario — drive out, turn around, drive back
  with accumulated drift — closes a loop at the REVERSE-heading revisit;
* a recall-vs-heading curve (0/90/180 deg) at the signature level on the
  4-camera rig, the number recorded in BASELINE.md.

cuVSLAM role: loop closure / relocalization viewpoint tolerance
(reference launch/thor_visual_slam.launch.py:30-64).
"""

from __future__ import annotations

import numpy as np
import pytest

from thor_slam_tpu import geometry
from thor_slam_tpu.camera.rig import CameraRig
from thor_slam_tpu.camera.sources.synthetic import (
    SyntheticRigSpec,
    SyntheticWorld,
    make_synthetic_rig,
)
from thor_slam_tpu.engine.tpu_engine import TpuSlamEngine
from thor_slam_tpu.slam.interface import SlamConfig


class TurnAroundOrbit:
    """Orbit that turns in place at ``t_turn`` and retraces in reverse.

    First leg: standard tangent-heading orbit. At ``t_turn`` the body
    rotates in place by pi over ``turn_duration`` (the rig keeps tracking
    through the smooth rotation), then retraces the circle BACKWARDS with
    the reversed heading — the corridor-robot "return the way it came"
    geometry: every revisited position is faced from the opposite
    direction.
    """

    def __init__(
        self,
        radius: float = 1.5,
        angular_rate: float = 1.0,
        t_turn: float = 3.5,
        turn_duration: float = 1.2,
    ):
        self.radius = radius
        self.angular_rate = angular_rate
        self.t_turn = t_turn
        self.turn_duration = turn_duration

    def _a_yaw(self, t: float) -> tuple[float, float]:
        w = self.angular_rate
        if t < self.t_turn:
            a = w * t
            return a, a + np.pi / 2.0
        if t < self.t_turn + self.turn_duration:
            a = w * self.t_turn
            frac = (t - self.t_turn) / self.turn_duration
            return a, a + np.pi / 2.0 + np.pi * frac
        a = w * self.t_turn - w * (t - self.t_turn - self.turn_duration)
        return a, a + np.pi / 2.0 + np.pi

    def pose(self, t: float) -> np.ndarray:
        a, yaw = self._a_yaw(t)
        pos = np.array([self.radius * np.cos(a), self.radius * np.sin(a), 0.0])
        r = geometry.euler_xyz_extrinsic_to_matrix(0.0, 0.0, yaw)
        return geometry.se3_matrix(r, pos)


BLACKOUT = range(58, 68)  # return-leg dropout: accumulates real drift


@pytest.fixture(scope="module")
def reverse_run():
    """Out-and-back drive with a return-leg blackout.

    Two stereo sources at mount yaws (0, pi) — the minimal rig whose
    cameras cover the reverse heading. Keyframes recorded on the way out
    face forward on camera 0 and BACKWARD on camera 1; the drifted
    return pass (reversed body heading) must be recognized by camera 0
    against camera 1's entries.
    """
    spec = SyntheticRigSpec(
        num_sources=2, stereo=True, width=160, height=120, fps=20.0,
        baseline_m=0.12,
    )
    world3d = SyntheticWorld(half_extents=(4.0, 4.0, 2.0))
    traj = TurnAroundOrbit(radius=1.5, angular_rate=1.0, t_turn=2.6,
                           turn_duration=1.0)
    sources, rig_ext, _, _ = make_synthetic_rig(
        spec, world=world3d, trajectory=traj
    )
    engine = TpuSlamEngine(
        params=dict(
            max_keypoints=256, keyframe_min_inliers=40,
            keyframe_max_translation=0.3, keyframe_max_rotation=0.35,
        ),
        enable_ba=False,
        use_imu=False,
        loop_db_capacity=64,
        loop_exclude_recent=6,
        loop_cooldown_kfs=8,
        loop_min_votes=40,
        loop_min_inliers=25,
    )
    est, world, gt, closures_at = [], [], [], []
    gt0 = None
    with CameraRig(sources, rig_extrinsics=rig_ext) as rig:
        engine.initialize(
            rig.calibration, SlamConfig(num_cameras=4, enable_loop_closure=True)
        )
        # 150 ticks at 20 fps = 7.5 s: out (2.6 s), turn (1.0 s), back.
        for i in range(150):
            sync = rig.get_synchronized_frames()
            if i in BLACKOUT:
                for fs in sync.frame_sets.values():
                    for f in fs.frames:
                        f.image = np.zeros_like(f.image)
            pose = engine.process_frames(sync)
            g = traj.pose(sync.timestamp)
            if gt0 is None:
                gt0 = g
            if pose is not None and i not in BLACKOUT:
                est.append(pose.position.copy())
                world.append(engine.get_world_pose(pose).position)
                gt.append((np.linalg.inv(gt0) @ g)[:3, 3])
                if engine._loops_closed > len(closures_at):
                    closures_at.append(i)
        engine.flush()
    out = {
        "engine": engine,
        "est": np.asarray(est),
        "world": np.asarray(world),
        "gt": np.asarray(gt),
        "closures": engine._loops_closed,
        "closures_at": closures_at,
    }
    engine.shutdown()
    return out


class TestReverseHeadingClosure:
    def test_loop_closes_at_reverse_heading(self, reverse_run):
        """The return pass (body yaw ~pi off the outbound pass) closes a
        loop — only possible through a cross-camera DB match (camera 0's
        query against camera 1's stored signature): no outbound camera-0
        entry shares content with the return-pass camera-0 view."""
        assert reverse_run["closures"] >= 1, (
            "no loop closed on the reverse-heading return pass — the"
            " multi-camera place DB should match cam0's query against"
            " cam1's outbound entries"
        )

    def test_closure_reduces_world_frame_error(self, reverse_run):
        """The composed world estimate (map<-odom applied) ends closer to
        ground truth than the drifted odometry."""
        err_odom = np.linalg.norm(reverse_run["est"][-1] - reverse_run["gt"][-1])
        err_world = np.linalg.norm(reverse_run["world"][-1] - reverse_run["gt"][-1])
        assert err_world < err_odom * 0.85, (
            f"world-frame error {err_world:.3f} m vs odometry {err_odom:.3f} m"
            " — the reverse-heading closure should recover drift"
        )


class TestRecallVsHeading:
    """Signature-level recall curve: at 0/90/180 deg body-heading offsets
    on a 4-camera rig (mount yaws at 90 deg spacing), the query camera's
    signature finds a geometrically verified match in the all-camera DB —
    against the heading-appropriate camera's entry. The measured curve is
    recorded in BASELINE.md.
    """

    N = 256
    W, H = 320, 200
    FX = 260.0

    @pytest.fixture(scope="class")
    def db_views(self):
        """One keyframe's all-camera signature bank at body heading 0."""
        from thor_slam_tpu.camera.sources.synthetic import BODY_T_OPTICAL

        world = SyntheticWorld(half_extents=(5.0, 5.0, 2.5), seed=11)
        mount_yaws = [0.0, np.pi / 2, np.pi, 3 * np.pi / 2]
        body = geometry.se3_matrix(np.eye(3), np.array([0.4, 0.1, 0.0]))
        views = [
            self._view(world, body, yaw_mount) for yaw_mount in mount_yaws
        ]
        return world, body, mount_yaws, views

    def _view(self, world, world_t_body, mount_yaw, mount_offset=0.12):
        """Render + detect + describe one camera view; keep GT 3D points."""
        import jax.numpy as jnp

        from thor_slam_tpu.camera.sources.synthetic import BODY_T_OPTICAL
        from thor_slam_tpu.camera.types import Intrinsics
        from thor_slam_tpu.ops import brief, fast
        from thor_slam_tpu.ops import image as img_ops

        mount = geometry.se3_matrix(
            geometry.euler_xyz_extrinsic_to_matrix(0.0, 0.0, mount_yaw),
            np.array(
                [mount_offset * np.cos(mount_yaw),
                 mount_offset * np.sin(mount_yaw), 0.0]
            ),
        )
        pose = world_t_body @ mount @ BODY_T_OPTICAL
        k = np.array(
            [[self.FX, 0, self.W / 2], [0, self.FX, self.H / 2], [0, 0, 1.0]]
        )
        intr = Intrinsics(width=self.W, height=self.H, matrix=k,
                          coeffs=np.zeros(5))
        im = jnp.asarray(world.render(intr, pose), jnp.float32)
        depth = np.asarray(world.render_depth(intr, pose))
        sm = img_ops.gaussian_blur(im, sigma=2.0)
        kp = fast.detect_keypoints(im, max_keypoints=self.N)
        desc = brief.compute_descriptors(sm, kp.xy, kp.valid)
        xy = np.asarray(kp.xy)
        valid = np.asarray(kp.valid & desc.valid)
        u = np.clip(xy[:, 0].astype(int), 0, self.W - 1)
        v = np.clip(xy[:, 1].astype(int), 0, self.H - 1)
        z = depth[v, u]
        rays = np.stack(
            [(xy[:, 0] - self.W / 2) / self.FX,
             (xy[:, 1] - self.H / 2) / self.FX, np.ones(len(xy))], 1
        )
        p_w = (rays * z[:, None]) @ pose[:3, :3].T + pose[:3, 3]
        return {"pose": pose, "xy": xy, "valid": valid,
                "desc": np.asarray(desc.bits), "p_w": p_w}

    @pytest.mark.parametrize("heading_deg", [0, 90, 180])
    def test_recall_at_heading(self, db_views, heading_deg):
        import jax.numpy as jnp

        from thor_slam_tpu.engine import loop as loop_mod
        from thor_slam_tpu.ops import match as match_ops

        world, body0, mount_yaws, views = db_views
        # Query: same body position (small offset), heading rotated.
        body_q = body0 @ geometry.se3_matrix(
            geometry.euler_xyz_extrinsic_to_matrix(
                0.0, 0.0, np.deg2rad(heading_deg)
            ),
            np.array([0.05, -0.04, 0.01]),
        )
        q = self._view(world, body_q, 0.0)

        db_desc = jnp.asarray(np.stack([v["desc"] for v in views]))
        db_valid = jnp.asarray(np.stack([v["valid"] for v in views]))
        cand = loop_mod.find_candidate(
            jnp.asarray(q["desc"]), jnp.asarray(q["valid"]),
            db_desc, db_valid, jnp.ones(4),
        )
        cam = int(cand.keyframe)
        votes = int(cand.votes)
        expect_cam = heading_deg // 90
        assert cam == expect_cam, (
            f"heading {heading_deg}: matched DB camera {cam}, expected"
            f" {expect_cam} (votes={votes})"
        )
        assert votes >= 40, f"heading {heading_deg}: only {votes} votes"

        # Geometric verification (the loop verifier's inlier-gate role):
        # descriptor matches whose GROUND-TRUTH 3D point projects within
        # 3 px of the matched DB keypoint.
        d = views[cam]
        m = match_ops.match_descriptors(
            jnp.asarray(q["desc"]), jnp.asarray(q["valid"]),
            jnp.asarray(d["desc"]), jnp.asarray(d["valid"]),
            max_distance=48.0, ratio=0.9,
        )
        midx, mval = np.asarray(m.idx), np.asarray(m.valid)
        inv = np.linalg.inv(d["pose"])
        p_cam = q["p_w"] @ inv[:3, :3].T + inv[:3, 3]
        zsafe = np.maximum(p_cam[:, 2], 0.1)
        uv = np.stack(
            [self.FX * p_cam[:, 0] / zsafe + self.W / 2,
             self.FX * p_cam[:, 1] / zsafe + self.H / 2], 1
        )
        err = np.linalg.norm(uv - d["xy"][midx], axis=1)
        verified = int(np.sum(mval & (p_cam[:, 2] > 0.1) & (err < 3.0)))
        assert verified >= 40, (
            f"heading {heading_deg}: {verified} verified matches against"
            f" camera {cam} — below the loop verifier's gate"
        )


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-v"])
