"""Image ops vs OpenCV/numpy references (cv2 is a test-only cross-check)."""

import cv2
import jax.numpy as jnp
import numpy as np

from thor_slam_tpu.ops import image as ops


def checker(h=64, w=96):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, size=(h, w)).astype(np.float32)
    return cv2.GaussianBlur(img, (5, 5), 1.0)


class TestConversions:
    def test_to_float_uint8(self):
        x = jnp.asarray(np.array([[0, 128, 255]], np.uint8))
        np.testing.assert_allclose(np.asarray(ops.to_float(x)), [[0, 128 / 255, 1.0]], atol=1e-6)

    def test_uint8_roundtrip(self):
        x = np.random.default_rng(1).uniform(0, 1, (8, 8)).astype(np.float32)
        y = np.asarray(ops.to_uint8(jnp.asarray(x)))
        np.testing.assert_allclose(y / 255.0, x, atol=1 / 255.0 + 1e-6)

    def test_rgb_to_gray_matches_cv2(self):
        rgb = np.random.default_rng(2).uniform(0, 1, (16, 16, 3)).astype(np.float32)
        ours = np.asarray(ops.rgb_to_gray(jnp.asarray(rgb)))
        cv = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY)
        np.testing.assert_allclose(ours, cv, atol=1e-4)

    def test_bgr_to_rgb(self):
        x = np.arange(12, dtype=np.float32).reshape(2, 2, 3)
        np.testing.assert_array_equal(np.asarray(ops.bgr_to_rgb(jnp.asarray(x))), x[..., ::-1])


class TestBlur:
    def test_matches_cv2_interior(self):
        img = checker()
        ours = np.asarray(ops.gaussian_blur(jnp.asarray(img), sigma=1.5, radius=4))
        cv = cv2.GaussianBlur(img, (9, 9), 1.5)
        # Compare away from borders (border handling differs: edge vs reflect).
        np.testing.assert_allclose(ours[6:-6, 6:-6], cv[6:-6, 6:-6], atol=2e-4)

    def test_preserves_mean_roughly(self):
        img = checker()
        out = np.asarray(ops.gaussian_blur(jnp.asarray(img), sigma=2.0))
        assert abs(out.mean() - img.mean()) < 1e-3


class TestRemap:
    def test_identity_map(self):
        img = checker()
        h, w = img.shape
        mx, my = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
        out = np.asarray(ops.remap_bilinear(jnp.asarray(img), jnp.asarray(mx), jnp.asarray(my)))
        np.testing.assert_allclose(out, img, atol=1e-6)

    def test_matches_cv2_random_map(self):
        img = checker()
        h, w = img.shape
        rng = np.random.default_rng(3)
        mx = rng.uniform(1, w - 2, size=(h, w)).astype(np.float32)
        my = rng.uniform(1, h - 2, size=(h, w)).astype(np.float32)
        ours = np.asarray(ops.remap_bilinear(jnp.asarray(img), jnp.asarray(mx), jnp.asarray(my)))
        cv = cv2.remap(img, mx, my, cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT)
        np.testing.assert_allclose(ours, cv, atol=1e-4)

    def test_out_of_bounds_zero(self):
        img = checker()
        mx = np.full((4, 4), -10.0, np.float32)
        my = np.full((4, 4), 5.0, np.float32)
        out = np.asarray(ops.remap_bilinear(jnp.asarray(img), jnp.asarray(mx), jnp.asarray(my)))
        np.testing.assert_array_equal(out, 0.0)


class TestResizePyramid:
    def test_resize_matches_cv2(self):
        img = checker(64, 96)
        ours = np.asarray(ops.resize_bilinear(jnp.asarray(img), 32, 48))
        cv = cv2.resize(img, (48, 32), interpolation=cv2.INTER_LINEAR)
        np.testing.assert_allclose(ours, cv, atol=2e-3)

    def test_batched_resize(self):
        imgs = np.stack([checker(), checker()])
        out = np.asarray(ops.batched_resize(jnp.asarray(imgs), 32, 48))
        assert out.shape == (2, 32, 48)

    def test_pyramid_shapes(self):
        img = jnp.asarray(checker(64, 96))
        pyr = ops.build_pyramid(img, 3)
        assert [p.shape for p in pyr] == [(64, 96), (32, 48), (16, 24)]

    def test_downsample_averages(self):
        img = jnp.asarray(np.ones((8, 8), np.float32))
        out = np.asarray(ops.downsample2(img, blur=False))
        np.testing.assert_allclose(out, 1.0)


class TestSobel:
    def test_matches_cv2_interior(self):
        img = checker()
        gx, gy = ops.sobel_gradients(jnp.asarray(img))
        cvx = cv2.Sobel(img, cv2.CV_32F, 1, 0, ksize=3)
        cvy = cv2.Sobel(img, cv2.CV_32F, 0, 1, ksize=3)
        np.testing.assert_allclose(np.asarray(gx)[2:-2, 2:-2], cvx[2:-2, 2:-2], atol=1e-4)
        np.testing.assert_allclose(np.asarray(gy)[2:-2, 2:-2], cvy[2:-2, 2:-2], atol=1e-4)


class TestMedian3x3:
    def test_matches_scipy(self):
        from scipy.ndimage import median_filter

        rng = np.random.default_rng(3)
        img = rng.random((41, 57)).astype(np.float32)
        ours = np.asarray(ops.median3x3(jnp.asarray(img)))
        np.testing.assert_allclose(ours, median_filter(img, size=3, mode="nearest"))

    def test_removes_salt_keeps_edges(self):
        img = np.zeros((20, 20), np.float32)
        img[:, 10:] = 1.0  # vertical step edge
        img[5, 3] = 1.0  # salt in the dark half
        img[12, 15] = 0.0  # pepper in the bright half
        out = np.asarray(ops.median3x3(jnp.asarray(img)))
        assert out[5, 3] == 0.0 and out[12, 15] == 1.0
        # The step edge survives exactly (median is edge-preserving).
        np.testing.assert_allclose(out[:, :9], 0.0)
        np.testing.assert_allclose(out[:, 11:], 1.0)
