"""PnP solver tests on synthetic correspondences with known poses."""

import jax
import jax.numpy as jnp
import numpy as np

from thor_slam_tpu.engine import pnp, triangulate
from thor_slam_tpu.ops import lie


def make_scene(n=128, seed=0, noise=0.0, outlier_frac=0.0, num_cams=1):
    """Random landmarks seen by cameras on a rigid body at a known pose."""
    rng = np.random.default_rng(seed)
    pts_w = rng.uniform([-3, -2, 2.0], [3, 2, 8.0], size=(n, 3))

    # True body pose: modest rotation + translation.
    xi = np.concatenate([rng.uniform(-0.3, 0.3, 3), rng.uniform(-0.1, 0.1, 3)])
    body_t_world = np.asarray(lie.se3_exp(jnp.asarray(xi, jnp.float32)))

    # Cameras on the body: identity plus small offsets.
    cam_rots, cam_trans = [], []
    for ci in range(num_cams):
        r = np.eye(3)
        t = np.array([0.05 * ci, 0.0, 0.0])
        cam_rots.append(r)
        cam_trans.append(t)

    cam_idx = rng.integers(0, num_cams, size=n)
    cam_rot = np.stack([cam_rots[i] for i in cam_idx])
    cam_tr = np.stack([cam_trans[i] for i in cam_idx])

    p_b = pts_w @ body_t_world[:3, :3].T + body_t_world[:3, 3]
    p_c = np.einsum("nij,nj->ni", cam_rot, p_b) + cam_tr
    obs = p_c[:, :2] / p_c[:, 2:3]
    obs += rng.normal(0, noise, obs.shape)

    n_out = int(outlier_frac * n)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        obs[idx] += rng.uniform(0.05, 0.3, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))

    return (
        jnp.asarray(pts_w, jnp.float32),
        jnp.asarray(obs, jnp.float32),
        jnp.asarray(cam_rot, jnp.float32),
        jnp.asarray(cam_tr, jnp.float32),
        body_t_world,
    )


def pose_error(est, true):
    rel = np.linalg.inv(true) @ np.asarray(est)
    rot_err = np.arccos(np.clip((np.trace(rel[:3, :3]) - 1) / 2, -1, 1))
    return np.linalg.norm(rel[:3, 3]), rot_err


class TestGaussNewton:
    def test_converges_from_identity(self):
        pts, obs, cr, ct, true = make_scene()
        x, r = pnp.gauss_newton_pnp(pts, obs, jnp.ones(len(pts)), cr, ct, jnp.eye(4), iters=10)
        t_err, r_err = pose_error(x, true)
        assert t_err < 1e-3 and r_err < 1e-4
        assert float(jnp.max(r)) < 1e-3

    def test_with_noise(self):
        pts, obs, cr, ct, true = make_scene(noise=0.002)
        x, _ = pnp.gauss_newton_pnp(pts, obs, jnp.ones(len(pts)), cr, ct, jnp.eye(4), iters=10)
        t_err, r_err = pose_error(x, true)
        assert t_err < 0.02 and r_err < 0.01

    def test_multicamera(self):
        pts, obs, cr, ct, true = make_scene(num_cams=4)
        x, _ = pnp.gauss_newton_pnp(pts, obs, jnp.ones(len(pts)), cr, ct, jnp.eye(4), iters=10)
        t_err, r_err = pose_error(x, true)
        assert t_err < 1e-3 and r_err < 1e-4

    def test_masked_points_ignored(self):
        pts, obs, cr, ct, true = make_scene()
        # Corrupt half the observations but zero their weights.
        obs = obs.at[::2].add(10.0)
        w = jnp.asarray(np.tile([0.0, 1.0], len(pts) // 2), jnp.float32)
        x, _ = pnp.gauss_newton_pnp(pts, obs, w, cr, ct, jnp.eye(4), iters=10)
        t_err, r_err = pose_error(x, true)
        assert t_err < 1e-3

    def test_zero_weights_no_nan(self):
        pts, obs, cr, ct, _ = make_scene(n=16)
        x, _ = pnp.gauss_newton_pnp(pts, obs, jnp.zeros(16), cr, ct, jnp.eye(4), iters=5)
        assert bool(jnp.all(jnp.isfinite(x)))
        np.testing.assert_allclose(np.asarray(x), np.eye(4), atol=1e-5)


class TestRansac:
    def test_rejects_outliers(self):
        pts, obs, cr, ct, true = make_scene(n=256, noise=0.001, outlier_frac=0.35)
        res = pnp.ransac_pnp(
            jax.random.PRNGKey(0), pts, obs, jnp.ones(256, bool), cr, ct, jnp.eye(4)
        )
        t_err, r_err = pose_error(res.body_t_world, true)
        assert t_err < 0.02 and r_err < 0.01
        # Inlier count ~ 65% of 256.
        assert 0.5 * 256 < int(res.num_inliers) <= 0.75 * 256

    def test_outliers_not_in_inlier_set(self):
        rng_seed = 1
        pts, obs, cr, ct, true = make_scene(n=200, seed=rng_seed, outlier_frac=0.3)
        res = pnp.ransac_pnp(
            jax.random.PRNGKey(1), pts, obs, jnp.ones(200, bool), cr, ct, jnp.eye(4)
        )
        # Recompute which points were corrupted (same construction as make_scene).
        rng = np.random.default_rng(rng_seed)
        rng.uniform([-3, -2, 2.0], [3, 2, 8.0], size=(200, 3))
        rng.uniform(-0.3, 0.3, 3)
        rng.uniform(-0.1, 0.1, 3)
        rng.integers(0, 1, size=200)
        rng.normal(0, 0.0, (200, 2))
        out_idx = rng.choice(200, 60, replace=False)
        inl = np.asarray(res.inliers)
        assert inl[out_idx].mean() < 0.05  # outliers excluded

    def test_respects_validity_mask(self):
        pts, obs, cr, ct, true = make_scene(n=128)
        valid = jnp.asarray(np.arange(128) < 64)
        res = pnp.ransac_pnp(jax.random.PRNGKey(2), pts, obs, valid, cr, ct, jnp.eye(4))
        assert not np.asarray(res.inliers)[64:].any()
        t_err, _ = pose_error(res.body_t_world, true)
        assert t_err < 1e-2

    def test_deterministic_given_key(self):
        pts, obs, cr, ct, _ = make_scene(n=128, outlier_frac=0.2)
        r1 = pnp.ransac_pnp(jax.random.PRNGKey(7), pts, obs, jnp.ones(128, bool), cr, ct, jnp.eye(4))
        r2 = pnp.ransac_pnp(jax.random.PRNGKey(7), pts, obs, jnp.ones(128, bool), cr, ct, jnp.eye(4))
        np.testing.assert_array_equal(np.asarray(r1.body_t_world), np.asarray(r2.body_t_world))


class TestTriangulate:
    def test_stereo_roundtrip(self):
        rng = np.random.default_rng(3)
        fx, cx, cy, b = 200.0, 80.0, 60.0, 0.12
        pts = rng.uniform([-1, -1, 1.0], [1, 1, 6.0], size=(64, 3))
        u = fx * pts[:, 0] / pts[:, 2] + cx
        v = fx * pts[:, 1] / pts[:, 2] + cy
        disp = fx * b / pts[:, 2]
        out, valid = triangulate.stereo_triangulate(
            jnp.asarray(np.stack([u, v], -1), jnp.float32), jnp.asarray(disp, jnp.float32),
            fx, cx, cy, b,
        )
        assert bool(valid.all())
        np.testing.assert_allclose(np.asarray(out), pts, rtol=1e-5, atol=1e-5)

    def test_min_disparity_gate(self):
        out, valid = triangulate.stereo_triangulate(
            jnp.zeros((2, 2)), jnp.asarray([0.1, 5.0]), 200.0, 80.0, 60.0, 0.12
        )
        assert not bool(valid[0]) and bool(valid[1])

    def test_match_disparities_epipolar_gate(self):
        xy_l = jnp.asarray([[50.0, 30.0], [60.0, 40.0]])
        xy_r = jnp.asarray([[40.0, 30.2], [55.0, 48.0]])
        idx = jnp.asarray([0, 1])
        ok = jnp.asarray([True, True])
        disp, valid = triangulate.match_disparities(xy_l, xy_r, idx, ok, max_dy=1.5)
        assert bool(valid[0]) and not bool(valid[1])
        np.testing.assert_allclose(float(disp[0]), 10.0)

    def test_two_view_midpoint(self):
        rng = np.random.default_rng(4)
        pts0 = rng.uniform([-1, -1, 2.0], [1, 1, 5.0], size=(32, 3))
        cam0_t_cam1 = np.eye(4)
        cam0_t_cam1[:3, 3] = [0.3, 0.05, 0.0]
        pts1 = (pts0 - cam0_t_cam1[:3, 3]) @ cam0_t_cam1[:3, :3]
        rays0 = pts0 / pts0[:, 2:3]
        rays1 = pts1 / pts1[:, 2:3]
        out, valid = triangulate.two_view_midpoint(
            jnp.asarray(rays0, jnp.float32), jnp.asarray(rays1, jnp.float32),
            jnp.asarray(cam0_t_cam1, jnp.float32),
        )
        assert bool(valid.all())
        np.testing.assert_allclose(np.asarray(out), pts0, rtol=1e-4, atol=1e-4)


class TestPoseCovariance:
    """Residual-scaled inverse-Hessian covariance of the PnP solve."""

    def _solve(self, noise, n=128, seed=0):
        pts, obs, cr, ct, true = make_scene(n=n, seed=seed, noise=noise)
        return pnp.ransac_pnp(
            jax.random.PRNGKey(0), pts, obs, jnp.ones(len(pts), bool), cr, ct,
            jnp.asarray(true, jnp.float32),
        )

    def test_shape_symmetry_psd(self):
        res = self._solve(noise=1e-3)
        cov = np.asarray(res.covariance)
        assert cov.shape == (6, 6)
        np.testing.assert_allclose(cov, cov.T, atol=1e-12)
        eig = np.linalg.eigvalsh(cov)
        assert eig.min() > -1e-12  # PSD up to roundoff

    def test_scales_with_observation_noise(self):
        t_lo = np.trace(np.asarray(self._solve(noise=5e-4).covariance))
        t_hi = np.trace(np.asarray(self._solve(noise=5e-3).covariance))
        # sigma^2 scales ~100x between the two; allow slack for inlier
        # gating reshaping the problem.
        assert t_hi > 10 * t_lo

    def test_shrinks_with_more_observations(self):
        t_small = np.trace(np.asarray(self._solve(noise=2e-3, n=32).covariance))
        t_large = np.trace(np.asarray(self._solve(noise=2e-3, n=256).covariance))
        assert t_large < t_small

    def test_consistent_with_estimation_error(self):
        """1-sigma bands from the covariance should cover the actual
        translation error at ~1 sigma scale (order-of-magnitude check
        over seeds, not a strict chi^2 test)."""
        errs, sigmas = [], []
        for seed in range(6):
            pts, obs, cr, ct, true = make_scene(n=128, seed=seed, noise=2e-3)
            res = pnp.ransac_pnp(
                jax.random.PRNGKey(seed), pts, obs, jnp.ones(len(pts), bool),
                cr, ct, jnp.asarray(true, jnp.float32),
            )
            t_err, _ = pose_error(res.body_t_world, true)
            errs.append(t_err)
            sigmas.append(np.sqrt(np.trace(np.asarray(res.covariance)[:3, :3])))
        ratio = np.mean(errs) / np.mean(sigmas)
        assert 0.2 < ratio < 5.0, f"covariance miscalibrated: err/sigma={ratio:.2f}"
