"""Essential-matrix RANSAC + pose recovery (engine/epipolar.py).

The monocular bootstrap's geometric core, tested against synthetic
ground truth: known relative pose, projected 3D points, noise and
outliers injected.
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from thor_slam_tpu import geometry  # noqa: E402
from thor_slam_tpu.engine import epipolar  # noqa: E402


def _scene(n=200, noise=0.0, outlier_frac=0.0, seed=0, yaw=0.12, t=(0.3, 0.05, 0.1)):
    """Two calibrated views of random points; returns (x0, x1, valid, R_ba, t_ba)."""
    rng = np.random.default_rng(seed)
    pts_a = np.stack(
        [
            rng.uniform(-2.0, 2.0, n),
            rng.uniform(-1.5, 1.5, n),
            rng.uniform(3.0, 8.0, n),
        ],
        1,
    )
    r_ba = geometry.euler_xyz_extrinsic_to_matrix(0.03, -0.05, yaw)
    t_ba = np.asarray(t, float)
    pts_b = pts_a @ r_ba.T + t_ba
    x0 = pts_a[:, :2] / pts_a[:, 2:]
    x1 = pts_b[:, :2] / pts_b[:, 2:]
    x0 += rng.normal(0, noise, x0.shape)
    x1 += rng.normal(0, noise, x1.shape)
    n_out = int(outlier_frac * n)
    if n_out:
        x1[:n_out] = rng.uniform(-0.5, 0.5, (n_out, 2))
    valid = np.ones(n, bool)
    return (
        jnp.asarray(x0, jnp.float32),
        jnp.asarray(x1, jnp.float32),
        jnp.asarray(valid),
        r_ba,
        t_ba,
    )


def _angle(r_est, r_gt) -> float:
    rel = np.asarray(r_est) @ r_gt.T
    return float(np.arccos(np.clip(0.5 * (np.trace(rel) - 1.0), -1.0, 1.0)))


def _t_dir_err(t_est, t_gt) -> float:
    a = np.asarray(t_est) / np.linalg.norm(t_est)
    b = t_gt / np.linalg.norm(t_gt)
    return float(np.arccos(np.clip(abs(a @ b), -1.0, 1.0)))


class TestRansacEssential:
    def test_clean_recovery(self):
        x0, x1, valid, r_gt, t_gt = _scene()
        res = epipolar.ransac_essential(jax.random.PRNGKey(0), x0, x1, valid)
        assert int(res.num_inliers) >= 190
        assert _angle(res.r_ba, r_gt) < np.deg2rad(0.5)
        assert _t_dir_err(res.t_ba, t_gt) < np.deg2rad(1.0)
        # Sign of t matters (cheirality): the recovered direction must be
        # the true one, not its negation.
        tb = np.asarray(res.t_ba)
        assert tb @ (t_gt / np.linalg.norm(t_gt)) > 0.99

    def test_noise_and_outliers(self):
        x0, x1, valid, r_gt, t_gt = _scene(noise=1.5e-3, outlier_frac=0.25, seed=3)
        res = epipolar.ransac_essential(jax.random.PRNGKey(1), x0, x1, valid)
        # Measured at this operating point (0.75 px/coordinate noise, 25%
        # outliers): 151 inliers, 0.5 deg rotation, 1.6 deg translation
        # direction — the 5-DoF Sampson Gauss-Newton polish beats the raw
        # linear 8-point's own noise floor (f64 LS on the TRUE inlier set
        # reads 0.6 / 7.9 deg).
        assert int(res.num_inliers) >= 120
        assert _angle(res.r_ba, r_gt) < np.deg2rad(1.5)
        assert _t_dir_err(res.t_ba, t_gt) < np.deg2rad(4.0)
        inl = np.asarray(res.inliers)
        assert inl[:50].sum() < 10  # injected outliers rejected

    def test_triangulation_matches_scene_up_to_scale(self):
        x0, x1, valid, r_gt, t_gt = _scene(seed=5)
        res = epipolar.ransac_essential(jax.random.PRNGKey(2), x0, x1, valid)
        pts = np.asarray(res.points_a)
        ok = np.asarray(res.tri_valid)
        assert ok.sum() >= 150
        # Triangulated map is the true map scaled by 1/|t_gt| (unit-|t|
        # gauge): depth ratios match ground truth.
        rng = np.random.default_rng(5)
        true_a = np.stack(
            [
                rng.uniform(-2.0, 2.0, 200),
                rng.uniform(-1.5, 1.5, 200),
                rng.uniform(3.0, 8.0, 200),
            ],
            1,
        )
        scale = np.linalg.norm(t_gt)
        rel = np.linalg.norm(pts[ok] * scale - true_a[ok], axis=1)
        assert np.median(rel) < 0.05  # 5 cm at 3-8 m depth

    def test_pure_rotation_yields_no_triangulation(self):
        """Zero baseline: E is degenerate and parallax gating must keep
        everything out of the triangulated set (the bootstrap then simply
        waits for translation)."""
        x0, x1, valid, _, _ = _scene(t=(1e-7, 0.0, 0.0), yaw=0.2, seed=7)
        res = epipolar.ransac_essential(jax.random.PRNGKey(3), x0, x1, valid)
        assert int(jnp.sum(res.tri_valid)) < 10


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-v"])
