"""Pallas DMA patch gather vs the one-hot-matmul reference."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from thor_slam_tpu.ops import brief, patches_pallas
from thor_slam_tpu.ops.image import extract_patches_mxu


class TestPatchGather:
    def test_matches_mxu_reference(self):
        rng = np.random.default_rng(5)
        c, h, w, n, s = 2, 48, 256, 8, 9
        imgs = jnp.asarray(rng.uniform(0, 1, (c, h, w)).astype(np.float32))
        # Centers including clip-inducing border cases on every side.
        centers = jnp.asarray(
            rng.integers(0, [w, h], size=(c, n, 2)).astype(np.int32)
        )
        assert patches_pallas.supports(h, w, n)
        got = patches_pallas.extract_patches_batched(imgs, centers, size=s, interpret=True)
        want = jax.vmap(lambda im, ct: extract_patches_mxu(im, ct, s))(imgs, centers)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_brief_patch_size(self):
        # The production geometry: BRIEF's 37px patches on a 720p-like image
        # (shrunk height to keep interpret mode fast), keypoints mid + border.
        rng = np.random.default_rng(9)
        h, w, s = 64, 1280, brief.PATCH_SIZE
        imgs = jnp.asarray(rng.uniform(0, 1, (1, h, w)).astype(np.float32))
        xs = np.array([18, 30, 640, 1222, 1261, 5, 1275, 700], np.int32)
        ys = np.array([18, 31, 32, 40, 45, 2, 62, 33], np.int32)
        centers = jnp.asarray(np.stack([xs, ys], -1)[None])
        got = patches_pallas.extract_patches_batched(imgs, centers, size=s, interpret=True)
        want = jax.vmap(lambda im, ct: extract_patches_mxu(im, ct, s))(imgs, centers)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_supports_gating(self):
        assert patches_pallas.supports(720, 1280, 256)
        assert patches_pallas.supports(400, 640, 256)
        assert not patches_pallas.supports(200, 320, 256)  # W not 128-aligned
        assert not patches_pallas.supports(720, 1280, 251)  # N not block-aligned
        assert not patches_pallas.supports(40, 1280, 256)  # too short for the window

    def test_batched_descriptors_match_single(self):
        # CPU path (XLA extraction) must agree with per-image descriptors.
        rng = np.random.default_rng(13)
        imgs = jnp.asarray(rng.uniform(0, 1, (2, 96, 160)).astype(np.float32))
        xy = jnp.asarray(rng.uniform(20, 80, (2, 16, 2)).astype(np.float32))
        valid = jnp.ones((2, 16), bool)
        batched = brief.compute_descriptors_batched(imgs, xy, valid, oriented=False)
        for c in range(2):
            single = brief.compute_descriptors(imgs[c], xy[c], valid[c], oriented=False)
            np.testing.assert_array_equal(np.asarray(batched.bits[c]), np.asarray(single.bits))
