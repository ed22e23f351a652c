"""Pallas FAST kernel vs the XLA reference formulation.

Runs the kernel in interpreter mode (CPU-safe) and asserts bit-equality
with :func:`thor_slam_tpu.ops.fast.fast_score_map` + :func:`nms3x3` on the
interior (the kernel zeroes a 4 px border by contract).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from thor_slam_tpu.ops import fast, fast_pallas


def _reference(images: np.ndarray, threshold: float) -> tuple[np.ndarray, np.ndarray]:
    raws, nmss = [], []
    for im in images:
        raw = fast.fast_score_map(jnp.asarray(im), threshold)
        nmss.append(np.asarray(fast.nms3x3(raw)))
        raws.append(np.asarray(raw))
    return np.stack(raws), np.stack(nmss)


def _interior(a: np.ndarray, b: int = fast_pallas.BORDER) -> np.ndarray:
    return a[:, b:-b, b:-b]


class TestFastPallasEquivalence:
    @pytest.mark.parametrize("shape", [(2, 48, 128), (1, 96, 256)])
    def test_matches_xla_reference(self, shape):
        rng = np.random.default_rng(7)
        imgs = rng.uniform(0.0, 1.0, size=shape).astype(np.float32)
        raw_p, nms_p = fast_pallas.fast_scores_batched(
            jnp.asarray(imgs), 0.06, interpret=True
        )
        raw_x, nms_x = _reference(imgs, 0.06)
        np.testing.assert_allclose(_interior(np.asarray(raw_p)), _interior(raw_x), atol=1e-6)
        np.testing.assert_allclose(_interior(np.asarray(nms_p)), _interior(nms_x), atol=1e-6)

    def test_multi_tile_grid(self):
        # Height > 272 forces the halo-DMA row tiling (tile 64 divides 320).
        rng = np.random.default_rng(3)
        imgs = rng.uniform(0.0, 1.0, size=(1, 320, 128)).astype(np.float32)
        assert fast_pallas.pick_tile_h(320) not in (None, 320)
        raw_p, nms_p = fast_pallas.fast_scores_batched(
            jnp.asarray(imgs), 0.05, interpret=True
        )
        raw_x, nms_x = _reference(imgs, 0.05)
        np.testing.assert_allclose(_interior(np.asarray(raw_p)), _interior(raw_x), atol=1e-6)
        np.testing.assert_allclose(_interior(np.asarray(nms_p)), _interior(nms_x), atol=1e-6)

    def test_real_corner_structure(self):
        # Isolated bright squares: their corners carry long dark arcs (a
        # FAST-9 response), unlike checkerboard X-junctions (two 8-arcs).
        # Both backends must agree on the NMS'd peak set, not just numerics.
        im = np.zeros((96, 128), np.float32)
        for y in range(16, 80, 24):
            for x in range(16, 112, 24):
                im[y : y + 10, x : x + 10] = 1.0
        imgs = im[None]
        raw_p, nms_p = fast_pallas.fast_scores_batched(
            jnp.asarray(imgs), 0.06, interpret=True
        )
        _, nms_x = _reference(imgs, 0.06)
        p = _interior(np.asarray(nms_p)) > 0
        x = _interior(nms_x) > 0
        assert p.sum() > 0
        np.testing.assert_array_equal(p, x)

    def test_supports_gating(self):
        assert fast_pallas.supports(720, 1280)
        assert fast_pallas.supports(400, 640)
        assert not fast_pallas.supports(200, 320)  # width not 128-aligned
        assert not fast_pallas.supports(721, 1280)  # height not 8-aligned

    def test_detect_batched_matches_single(self):
        # The dispatcher (XLA path on CPU) must agree with per-image detect.
        rng = np.random.default_rng(11)
        imgs = jnp.asarray(rng.uniform(0.0, 1.0, size=(2, 96, 128)).astype(np.float32))
        batched = fast.detect_keypoints_batched(imgs, max_keypoints=64, border_margin=8)
        for c in range(2):
            single = fast.detect_keypoints(imgs[c], max_keypoints=64, border_margin=8)
            np.testing.assert_array_equal(np.asarray(batched.valid[c]), np.asarray(single.valid))
            np.testing.assert_allclose(np.asarray(batched.xy[c]), np.asarray(single.xy), atol=1e-6)
