"""FAST detection, BRIEF description, Hamming matching — behavioral tests."""

import cv2
import jax.numpy as jnp
import numpy as np

from thor_slam_tpu.ops import brief, fast, match
from thor_slam_tpu.ops.image import gaussian_blur


def corner_image(h=120, w=160):
    """A grid of bright squares on dark background: corners at known spots."""
    img = np.full((h, w), 0.2, np.float32)
    for cy in range(30, h - 20, 30):
        for cx in range(30, w - 20, 40):
            img[cy : cy + 10, cx : cx + 10] = 0.9
    return img


def textured_image(h=120, w=160, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 1, (h // 8, w // 8)).astype(np.float32)
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_NEAREST)
    return cv2.GaussianBlur(img, (3, 3), 0.8)


class TestFast:
    def test_detects_square_corners(self):
        img = corner_image()
        kps = fast.detect_keypoints(jnp.asarray(img), max_keypoints=128, border_margin=8)
        n = int(kps.valid.sum())
        assert n >= 8  # several squares => several corners
        # Every detection must be near a square corner (multiple of the grid).
        xy = np.asarray(kps.xy)[np.asarray(kps.valid)]
        for x, y in xy:
            # Distance to nearest square corner: square corners at
            # (30+{0,10}, 30+{0,10}) + k*(40, 30).
            dx = min((x - 30) % 40, 10 - (x - 30) % 40 % 10, abs((x - 30) % 40 - 10))
            assert dx < 6.0  # near a vertical edge of some square

    def test_no_corners_on_flat(self):
        img = jnp.full((64, 64), 0.5, jnp.float32)
        kps = fast.detect_keypoints(img, max_keypoints=64, border_margin=8)
        assert int(kps.valid.sum()) == 0

    def test_fixed_capacity_shapes(self):
        img = jnp.asarray(textured_image())
        kps = fast.detect_keypoints(img, max_keypoints=256)
        assert kps.xy.shape == (256, 2)
        assert kps.score.shape == (256,)
        assert kps.valid.shape == (256,)

    def test_border_margin_respected(self):
        img = jnp.asarray(textured_image())
        m = 24
        kps = fast.detect_keypoints(img, max_keypoints=256, border_margin=m)
        xy = np.asarray(kps.xy)[np.asarray(kps.valid)]
        assert np.all(xy[:, 0] >= m) and np.all(xy[:, 0] < 160 - m)
        assert np.all(xy[:, 1] >= m) and np.all(xy[:, 1] < 120 - m)

    def test_spatial_spread(self):
        """Grid bucketing must spread keypoints across the image quadrants."""
        img = jnp.asarray(textured_image())
        kps = fast.detect_keypoints(img, max_keypoints=256, cell_size=32, per_cell=4)
        xy = np.asarray(kps.xy)[np.asarray(kps.valid)]
        assert len(xy) > 40
        quads = set()
        for x, y in xy:
            quads.add((x > 80, y > 60))
        assert len(quads) == 4

    def test_matches_cv2_fast_locations(self):
        """Our detections should be a subset-neighborhood of OpenCV FAST."""
        img = textured_image()
        kps = fast.detect_keypoints(jnp.asarray(img), threshold=0.08, max_keypoints=256)
        cv_fast = cv2.FastFeatureDetector_create(threshold=int(0.08 * 255), nonmaxSuppression=True)
        cv_kps = cv_fast.detect((img * 255).astype(np.uint8), None)
        cv_xy = np.array([k.pt for k in cv_kps]) if cv_kps else np.zeros((0, 2))
        ours = np.asarray(kps.xy)[np.asarray(kps.valid)]
        assert len(ours) > 0 and len(cv_xy) > 0
        # Each of our corners within 3 px of some OpenCV corner (their NMS differs).
        d = np.linalg.norm(ours[:, None, :] - cv_xy[None, :, :], axis=-1).min(axis=1)
        # NMS, scoring, and our subpixel refinement differ slightly; expect
        # strong agreement, not identity.
        assert np.median(d) <= 1.5
        assert np.mean(d <= 3.0) >= 0.75


class TestBrief:
    def test_descriptor_shapes(self):
        img = jnp.asarray(gaussian_blur(jnp.asarray(textured_image()), 2.0))
        kps = fast.detect_keypoints(img, max_keypoints=128)
        desc = brief.compute_descriptors(img, kps.xy, kps.valid)
        assert desc.bits.shape == (128, 8)
        assert desc.bits.dtype == jnp.uint32

    def test_deterministic(self):
        img = jnp.asarray(textured_image())
        kps = fast.detect_keypoints(img, max_keypoints=64)
        d1 = brief.compute_descriptors(img, kps.xy, kps.valid)
        d2 = brief.compute_descriptors(img, kps.xy, kps.valid)
        np.testing.assert_array_equal(np.asarray(d1.bits), np.asarray(d2.bits))

    def test_rotation_invariance(self):
        """Descriptors of the same feature under in-plane rotation stay close."""
        img = textured_image(160, 160, seed=3)
        sm = gaussian_blur(jnp.asarray(img), 2.0)
        kps = fast.detect_keypoints(jnp.asarray(img), max_keypoints=64, border_margin=45)
        desc0 = brief.compute_descriptors(sm, kps.xy, kps.valid)

        angle = 30.0
        m = cv2.getRotationMatrix2D((80, 80), angle, 1.0)
        rot = cv2.warpAffine(img, m, (160, 160))
        sm_rot = gaussian_blur(jnp.asarray(rot), 2.0)
        # Transform keypoints with the same matrix.
        xy = np.asarray(kps.xy)
        xy_h = np.concatenate([xy, np.ones((len(xy), 1))], axis=1)
        xy_rot = (m @ xy_h.T).T.astype(np.float32)
        desc1 = brief.compute_descriptors(sm_rot, jnp.asarray(xy_rot), kps.valid)

        valid = np.asarray(kps.valid)
        # Keep keypoints that stay well inside the rotated image.
        inside = (
            (xy_rot[:, 0] > 40) & (xy_rot[:, 0] < 120) & (xy_rot[:, 1] > 40) & (xy_rot[:, 1] < 120)
        )
        sel = valid & inside
        assert sel.sum() >= 5
        d = np.asarray(match.hamming_matrix_swar(desc0.bits, desc1.bits))
        self_dist = np.diag(d)[sel]
        assert np.median(self_dist) < 60  # matched self under rotation


class TestMatch:
    def test_popcount(self):
        v = jnp.asarray([0, 1, 3, 0xFFFFFFFF, 0x80000000], jnp.uint32)
        np.testing.assert_array_equal(np.asarray(match.popcount_u32(v)), [0, 1, 2, 32, 1])

    def test_swar_equals_mxu(self):
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.integers(0, 2**32, (32, 8), dtype=np.uint64).astype(np.uint32))
        b = jnp.asarray(rng.integers(0, 2**32, (48, 8), dtype=np.uint64).astype(np.uint32))
        d_swar = np.asarray(match.hamming_matrix_swar(a, b))
        d_mxu = np.asarray(match.hamming_matrix_mxu(a, b))
        np.testing.assert_array_equal(d_swar, d_mxu)

    def test_self_matching(self):
        rng = np.random.default_rng(1)
        desc = jnp.asarray(rng.integers(0, 2**32, (64, 8), dtype=np.uint64).astype(np.uint32))
        valid = jnp.ones(64, bool)
        m = match.match_descriptors(desc, valid, desc, valid, max_distance=0.0, ratio=1.0)
        assert np.asarray(m.valid).all()
        np.testing.assert_array_equal(np.asarray(m.idx), np.arange(64))
        np.testing.assert_array_equal(np.asarray(m.distance), 0.0)

    def test_invalid_slots_never_match(self):
        rng = np.random.default_rng(2)
        desc = jnp.asarray(rng.integers(0, 2**32, (16, 8), dtype=np.uint64).astype(np.uint32))
        valid_a = jnp.asarray([True] * 8 + [False] * 8)
        m = match.match_descriptors(desc, valid_a, desc, jnp.ones(16, bool))
        assert not np.asarray(m.valid)[8:].any()

    def test_ratio_test_rejects_ambiguous(self):
        # A's query is equidistant from two B descriptors -> ambiguous.
        base = np.zeros((1, 8), np.uint32)
        base[0, 0] = 0b01  # d(base, b0) = 1
        b = np.zeros((2, 8), np.uint32)
        b[1, 0] = 0b11  # d(base, b1) = 1 as well
        m = match.match_descriptors(
            jnp.asarray(base), jnp.ones(1, bool), jnp.asarray(b), jnp.ones(2, bool), ratio=0.8
        )
        assert not bool(m.valid[0])

    def test_end_to_end_frame_matching(self):
        """Features of two nearby synthetic views must match consistently."""
        from thor_slam_tpu.camera.sources.synthetic import (
            OrbitTrajectory,
            SyntheticCameraSource,
            SyntheticRigSpec,
            SyntheticWorld,
        )

        spec = SyntheticRigSpec(num_sources=1, stereo=False, width=160, height=120, fps=30.0)
        src = SyntheticCameraSource(
            "a", SyntheticWorld(), OrbitTrajectory(), np.eye(4), spec
        )
        img0 = jnp.asarray(src.render_frame(0, 0).astype(np.float32) / 255.0)
        img1 = jnp.asarray(src.render_frame(1, 0).astype(np.float32) / 255.0)

        sm0, sm1 = gaussian_blur(img0, 2.0), gaussian_blur(img1, 2.0)
        k0 = fast.detect_keypoints(img0, max_keypoints=256)
        k1 = fast.detect_keypoints(img1, max_keypoints=256)
        d0 = brief.compute_descriptors(sm0, k0.xy, k0.valid)
        d1 = brief.compute_descriptors(sm1, k1.xy, k1.valid)
        m = match.match_descriptors(d0.bits, d0.valid, d1.bits, d1.valid)
        n_matches = int(np.asarray(m.valid).sum())
        assert n_matches >= 30
        # Matched keypoints should have moved only slightly between frames.
        xy0 = np.asarray(k0.xy)[np.asarray(m.valid)]
        xy1 = np.asarray(k1.xy)[np.asarray(m.idx)[np.asarray(m.valid)]]
        motion = np.linalg.norm(xy1 - xy0, axis=1)
        assert np.median(motion) < 10.0
