"""Rectification: distortion model vs OpenCV, epipolar geometry end-to-end."""

import cv2
import jax.numpy as jnp
import numpy as np

from thor_slam_tpu.camera.types import Extrinsics, Intrinsics
from thor_slam_tpu.ops import rectify
from thor_slam_tpu.ops.image import remap_bilinear


def intr(w=160, h=120, f=130.0, coeffs=(0.0, 0, 0, 0, 0)):
    k = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])
    return Intrinsics(width=w, height=h, matrix=k, coeffs=np.array(coeffs))


class TestDistortionModel:
    def test_distort_matches_cv2(self):
        coeffs = np.array([-0.2, 0.05, 0.001, -0.002, 0.01])
        rng = np.random.default_rng(0)
        pts = rng.uniform(-0.4, 0.4, size=(50, 2))
        ours = rectify.distort_normalized(pts, coeffs)
        pts3 = np.concatenate([pts, np.ones((50, 1))], axis=1)
        cv_out, _ = cv2.projectPoints(
            pts3.reshape(-1, 1, 3), np.zeros(3), np.zeros(3), np.eye(3), coeffs
        )
        np.testing.assert_allclose(ours, cv_out.reshape(-1, 2), atol=1e-10)

    def test_undistort_inverts(self):
        coeffs = np.array([-0.15, 0.03, 0.0005, -0.001, 0.0])
        rng = np.random.default_rng(1)
        pts = rng.uniform(-0.35, 0.35, size=(50, 2))
        d = rectify.distort_normalized(pts, coeffs)
        u = rectify.undistort_normalized(d, coeffs, iters=10)
        np.testing.assert_allclose(u, pts, atol=1e-6)

    def test_short_coeff_vector_padded(self):
        pts = np.array([[0.1, 0.2]])
        a = rectify.distort_normalized(pts, np.array([0.1, 0.01]))
        b = rectify.distort_normalized(pts, np.array([0.1, 0.01, 0, 0, 0]))
        np.testing.assert_array_equal(a, b)


class TestUndistortRectifyMap:
    def test_matches_cv2(self):
        cam = intr(coeffs=(-0.2, 0.05, 0.001, -0.002, 0.0))
        r = cv2.Rodrigues(np.array([0.02, -0.03, 0.01]))[0]
        k_new = np.array([[120.0, 0, 80], [0, 120.0, 60], [0, 0, 1]])
        mx, my = rectify.init_undistort_rectify_map(cam, r, k_new, 160, 120)
        cv_mx, cv_my = cv2.initUndistortRectifyMap(
            cam.matrix, cam.coeffs, r, k_new, (160, 120), cv2.CV_32FC1
        )
        np.testing.assert_allclose(mx, cv_mx, atol=1e-3)
        np.testing.assert_allclose(my, cv_my, atol=1e-3)

    def test_identity_map_when_no_change(self):
        cam = intr()
        mx, my = rectify.init_undistort_rectify_map(cam, np.eye(3), cam.matrix, 160, 120)
        u, v = np.meshgrid(np.arange(160, dtype=np.float32), np.arange(120, dtype=np.float32))
        np.testing.assert_allclose(mx, u, atol=1e-4)
        np.testing.assert_allclose(my, v, atol=1e-4)


class TestStereoRectify:
    def test_trivial_rig_already_rectified(self):
        """Identity-rotation rig with x-baseline: rectification ~ no-op."""
        left, right = intr(), intr()
        t = np.eye(4)
        t[0, 3] = 0.08
        sr = rectify.stereo_rectify(left, right, t)
        np.testing.assert_allclose(sr.baseline_m, 0.08, atol=1e-12)
        np.testing.assert_allclose(sr.rect_rotation_left, np.eye(3), atol=1e-9)
        np.testing.assert_allclose(sr.rect_rotation_right, np.eye(3), atol=1e-9)

    def test_rotated_rig_baseline_preserved(self):
        left, right = intr(), intr()
        rvec = np.array([0.03, -0.05, 0.02])
        t = np.eye(4)
        t[:3, :3] = cv2.Rodrigues(rvec)[0]
        t[:3, 3] = [0.08, 0.002, -0.001]
        sr = rectify.stereo_rectify(left, right, t)
        np.testing.assert_allclose(sr.baseline_m, np.linalg.norm(t[:3, 3]), atol=1e-9)
        # Rectifying rotations must be valid rotations.
        for r in (sr.rect_rotation_left, sr.rect_rotation_right):
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-9)

    def test_epipolar_alignment_after_rectification(self):
        """World points project to the same row in both rectified images."""
        left, right = intr(), intr()
        rvec = np.array([0.02, -0.04, 0.03])
        t = np.eye(4)
        t[:3, :3] = cv2.Rodrigues(rvec)[0]
        t[:3, 3] = [0.08, 0.003, -0.002]
        sr = rectify.stereo_rectify(left, right, t)

        rng = np.random.default_rng(2)
        pts_l = rng.uniform([-0.5, -0.5, 1.5], [0.5, 0.5, 4.0], size=(30, 3))  # in left cam

        def project_rect(p_cam, rect_rot):
            p = p_cam @ rect_rot.T
            return (sr.new_matrix @ (p / p[:, 2:3]).T).T[:, :2]

        # Left camera: points already in left frame.
        uv_l = project_rect(pts_l, sr.rect_rotation_left)
        # Right camera: transform into right frame first.
        t_inv = np.linalg.inv(t)
        pts_r = pts_l @ t_inv[:3, :3].T + t_inv[:3, 3]
        uv_r = project_rect(pts_r, sr.rect_rotation_right)

        # Same row (epipolar lines horizontal) and positive disparity.
        np.testing.assert_allclose(uv_l[:, 1], uv_r[:, 1], atol=1e-6)
        disparity = uv_l[:, 0] - uv_r[:, 0]
        assert np.all(disparity > 0)
        # Disparity-depth relation: z = f*b/d.
        z_rect = (pts_l @ sr.rect_rotation_left.T)[:, 2]
        np.testing.assert_allclose(sr.fx * sr.baseline_m / disparity, z_rect, rtol=1e-6)

    def test_rectification_from_extrinsics(self):
        """source_T_cam convention: left identity, right offset along +x."""
        left, right = intr(), intr()
        le = Extrinsics.identity()
        m = np.eye(4)
        m[0, 3] = 0.075
        re = Extrinsics.from_4x4_matrix(m)
        sr = rectify.rectification_from_extrinsics(left, right, le, re)
        np.testing.assert_allclose(sr.baseline_m, 0.075, atol=1e-12)

    def test_rectify_synthetic_stereo_images(self):
        """Rectified synthetic stereo: rows align (photometric check)."""
        from thor_slam_tpu.camera.sources.synthetic import (
            OrbitTrajectory,
            SyntheticCameraSource,
            SyntheticRigSpec,
            SyntheticWorld,
        )

        spec = SyntheticRigSpec(num_sources=1, stereo=True, width=160, height=120, baseline_m=0.12)
        src = SyntheticCameraSource("a", SyntheticWorld(), OrbitTrajectory(), np.eye(4), spec)
        il = src.render_frame(0, 0).astype(np.float32) / 255.0
        ir = src.render_frame(0, 1).astype(np.float32) / 255.0

        intrs = src.get_intrinsics()
        exts = src.get_extrinsics()
        sr = rectify.rectification_from_extrinsics(intrs[0], intrs[1], exts[0], exts[1])

        rl = np.asarray(remap_bilinear(jnp.asarray(il), *map(jnp.asarray, sr.map_left)))
        rr = np.asarray(remap_bilinear(jnp.asarray(ir), *map(jnp.asarray, sr.map_right)))
        # For an already-rectified synthetic rig the remap is ~identity.
        np.testing.assert_allclose(rl[10:-10, 10:-10], il[10:-10, 10:-10], atol=0.06)

        # Epipolar check via features: matches between rectified left/right
        # must lie on the same row (|dy| small) with positive disparity.
        from thor_slam_tpu.ops import brief, fast, match
        from thor_slam_tpu.ops.image import gaussian_blur

        jl, jr = jnp.asarray(rl), jnp.asarray(rr)
        kl = fast.detect_keypoints(jl, max_keypoints=256)
        kr = fast.detect_keypoints(jr, max_keypoints=256)
        dl = brief.compute_descriptors(gaussian_blur(jl, 2.0), kl.xy, kl.valid)
        dr = brief.compute_descriptors(gaussian_blur(jr, 2.0), kr.xy, kr.valid)
        m = match.match_descriptors(dl.bits, dl.valid, dr.bits, dr.valid)
        sel = np.asarray(m.valid)
        assert sel.sum() >= 20
        xy_l = np.asarray(kl.xy)[sel]
        xy_r = np.asarray(kr.xy)[np.asarray(m.idx)[sel]]
        dy = np.abs(xy_l[:, 1] - xy_r[:, 1])
        disparity = xy_l[:, 0] - xy_r[:, 0]
        assert np.median(dy) <= 1.0  # epipolar-aligned (detector is integer-px)
        assert np.mean(disparity > 0) > 0.9
