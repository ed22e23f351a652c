"""Stereo SGM depth vs synthetic ground truth."""

import jax.numpy as jnp
import numpy as np
import pytest

from thor_slam_tpu.camera.sources.synthetic import (
    OrbitTrajectory,
    SyntheticCameraSource,
    SyntheticRigSpec,
    SyntheticWorld,
)
from thor_slam_tpu.ops import stereo


@pytest.fixture(scope="module")
def stereo_pair():
    """Rectified synthetic stereo pair + ground-truth disparity."""
    # Small room + wide baseline => disparities ~8-25 px at 160x120.
    spec = SyntheticRigSpec(num_sources=1, stereo=True, width=160, height=120, baseline_m=0.3)
    world = SyntheticWorld(half_extents=(2.5, 2.5, 1.5))
    src = SyntheticCameraSource("a", world, OrbitTrajectory(radius=1.0), np.eye(4), spec)
    il = src.render_frame(0, 0).astype(np.float32) / 255.0
    ir = src.render_frame(0, 1).astype(np.float32) / 255.0
    intr = src.get_intrinsics()[0]
    depth_gt = np.asarray(src._world.render_depth(intr, src.world_t_optical(src.frame_time(0), 0)))
    disp_gt = intr.fx * spec.baseline_m / depth_gt
    return il, ir, disp_gt, intr, spec


class TestCensus:
    def test_census_shape_dtype(self):
        img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (32, 40)).astype(np.float32))
        c = stereo.census_transform(img)
        assert c.shape == (32, 40)
        assert c.dtype == jnp.uint32

    def test_census_invariant_to_gain(self):
        """Census depends only on intensity ordering -> gain/offset invariant."""
        rng = np.random.default_rng(1)
        img = rng.uniform(0.1, 0.8, (32, 40)).astype(np.float32)
        c1 = stereo.census_transform(jnp.asarray(img))
        c2 = stereo.census_transform(jnp.asarray(img * 1.2 + 0.05))
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))

    def test_cost_volume_zero_at_identical(self):
        img = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (16, 32)).astype(np.float32))
        c = stereo.census_transform(img)
        vol = stereo.census_cost_volume(c, c, 8)
        assert vol.shape == (8, 16, 32)
        np.testing.assert_array_equal(np.asarray(vol[0]), 0.0)


class TestSGM:
    def test_disparity_accuracy_vs_ground_truth(self, stereo_pair):
        il, ir, disp_gt, intr, spec = stereo_pair
        disp, valid = stereo.sgm_disparity(jnp.asarray(il), jnp.asarray(ir), num_disparities=48)
        disp, valid = np.asarray(disp), np.asarray(valid)
        # Ignore the left band (occlusion/out-of-range) and borders.
        sel = valid.copy()
        sel[:, :50] = False
        sel[:8, :] = False
        sel[-8:, :] = False
        assert sel.mean() > 0.25  # reasonable density
        err = np.abs(disp[sel] - disp_gt[sel])
        assert np.median(err) < 1.0  # subpixel-ish median accuracy
        assert np.mean(err < 2.0) > 0.85  # few gross outliers

    def test_depth_conversion(self, stereo_pair):
        il, ir, disp_gt, intr, spec = stereo_pair
        disp, valid = stereo.sgm_disparity(jnp.asarray(il), jnp.asarray(ir), num_disparities=48)
        depth = np.asarray(stereo.disparity_to_depth(disp, valid, intr.fx, spec.baseline_m))
        v = np.array(valid)
        v[:, :50] = False
        depth_gt = intr.fx * spec.baseline_m / disp_gt
        rel = np.abs(depth[v] - depth_gt[v]) / depth_gt[v]
        assert np.median(rel) < 0.08  # <8% median relative depth error

    def test_lr_check_invalidates_occlusions(self, stereo_pair):
        il, ir, *_ = stereo_pair
        _, valid = stereo.sgm_disparity(jnp.asarray(il), jnp.asarray(ir), num_disparities=48)
        valid = np.asarray(valid)
        # The left band cannot be truly matched (out of the right image's
        # frame): its validity must be much sparser than the interior's.
        assert valid[:, :6].mean() < 0.5 * valid[:, 60:].mean()

    def test_two_path_variant_runs(self, stereo_pair):
        il, ir, *_ = stereo_pair
        disp, valid = stereo.sgm_disparity(
            jnp.asarray(il), jnp.asarray(ir), num_disparities=32, num_paths=2
        )
        assert disp.shape == il.shape and bool(valid.any())

    def test_u16_encoding(self):
        depth = jnp.asarray([[0.0, 1.2343, 70.0]])
        mm = np.asarray(stereo.depth_to_millimeters_u16(depth))
        assert mm.dtype == np.uint16
        np.testing.assert_array_equal(mm, [[0, 1234, 65535]])
