"""Sliding-window bundle adjustment: convergence on synthetic windows."""

import jax.numpy as jnp
import numpy as np

from thor_slam_tpu.engine import ba
from thor_slam_tpu.ops import lie


def make_window(
    k=6, c=2, l=128, seed=0, pose_noise=0.02, lm_noise=0.05, obs_noise=0.0,
    drop_frac=0.2,
):
    """Ground-truth window + noisy initialization."""
    rng = np.random.default_rng(seed)
    lms = rng.uniform([-3, -2, 2.5], [3, 2, 7.0], size=(l, 3))

    # Keyframe poses along a small trajectory.
    poses_true = []
    for i in range(k):
        xi = np.concatenate([[0.15 * i, 0.01 * i, 0.0], [0, 0.03 * i, 0.0]])
        poses_true.append(np.asarray(lie.se3_exp(jnp.asarray(xi, jnp.float32))))
    poses_true = np.stack(poses_true)

    cam_rot = np.stack([np.eye(3) for _ in range(c)])
    cam_trans = np.stack([[0.1 * ci, 0.0, 0.0] for ci in range(c)])

    p_b = np.einsum("kij,lj->kli", poses_true[:, :3, :3], lms) + poses_true[:, None, :3, 3]
    p_c = np.einsum("cij,klj->kcli", cam_rot, p_b) + cam_trans[None, :, None, :]
    obs = p_c[..., :2] / p_c[..., 2:3]
    obs += rng.normal(0, obs_noise, obs.shape)
    mask = (p_c[..., 2] > 0.5) & (rng.uniform(size=p_c.shape[:3]) > drop_frac)

    # Noisy initial estimates (pose 0 anchored at the truth = gauge).
    poses_init = poses_true.copy()
    for i in range(1, k):
        xi = rng.normal(0, pose_noise, 6)
        poses_init[i] = np.asarray(lie.se3_exp(jnp.asarray(xi, jnp.float32))) @ poses_init[i]
    lms_init = lms + rng.normal(0, lm_noise, lms.shape)

    problem = ba.BAProblem(
        body_t_world=jnp.asarray(poses_init, jnp.float32),
        landmarks_w=jnp.asarray(lms_init, jnp.float32),
        obs=jnp.asarray(obs, jnp.float32),
        obs_mask=jnp.asarray(mask, jnp.float32),
        cam_rot=jnp.asarray(cam_rot, jnp.float32),
        cam_trans=jnp.asarray(cam_trans, jnp.float32),
        pose_mask=jnp.ones(k),
        lm_mask=jnp.ones(l),
    )
    return problem, poses_true, lms


def pose_errors(est, true):
    errs = []
    for e, t in zip(np.asarray(est), true):
        rel = np.linalg.inv(t) @ e
        errs.append(np.linalg.norm(rel[:3, 3]))
    return np.asarray(errs)


class TestBundleAdjust:
    def test_converges_to_ground_truth(self):
        problem, poses_true, lms_true = make_window()
        res = ba.bundle_adjust(problem, iters=8)
        assert float(res.final_rms) < float(res.initial_rms) * 0.05
        errs = pose_errors(res.body_t_world, poses_true)
        assert errs.max() < 2e-3
        lm_err = np.linalg.norm(np.asarray(res.landmarks_w) - lms_true, axis=1)
        assert np.median(lm_err) < 5e-3

    def test_noisy_observations(self):
        problem, poses_true, _ = make_window(obs_noise=0.002, seed=1)
        res = ba.bundle_adjust(problem, iters=8)
        errs = pose_errors(res.body_t_world, poses_true)
        before = pose_errors(problem.body_t_world, poses_true)
        assert errs.mean() < before.mean() * 0.5  # clearly improved

    def test_gauge_pose0_fixed(self):
        problem, poses_true, _ = make_window(seed=2)
        res = ba.bundle_adjust(problem, iters=6)
        np.testing.assert_allclose(
            np.asarray(res.body_t_world[0]), np.asarray(problem.body_t_world[0]), atol=1e-6
        )

    def test_partial_window_pose_mask(self):
        problem, poses_true, _ = make_window(k=6, seed=3)
        pm = jnp.asarray([1.0, 1, 1, 1, 0, 0])
        problem = problem._replace(
            pose_mask=pm,
            obs_mask=problem.obs_mask * pm[:, None, None],
        )
        res = ba.bundle_adjust(problem, iters=6)
        # Masked poses untouched.
        np.testing.assert_allclose(
            np.asarray(res.body_t_world[4:]), np.asarray(problem.body_t_world[4:]), atol=1e-6
        )
        errs = pose_errors(res.body_t_world[:4], poses_true[:4])
        assert errs.max() < 5e-3

    def test_empty_landmark_slots_stable(self):
        problem, *_ = make_window(l=64, seed=4)
        lm_mask = jnp.asarray(np.arange(64) < 40, jnp.float32)
        problem = problem._replace(
            lm_mask=lm_mask, obs_mask=problem.obs_mask * lm_mask[None, None, :]
        )
        res = ba.bundle_adjust(problem, iters=6)
        assert bool(jnp.all(jnp.isfinite(res.landmarks_w)))
        # Masked slots not moved.
        np.testing.assert_allclose(
            np.asarray(res.landmarks_w[40:]), np.asarray(problem.landmarks_w[40:]), atol=1e-6
        )

    def test_outliers_handled_by_huber(self):
        problem, poses_true, _ = make_window(seed=5, obs_noise=0.001)
        # Corrupt 10% of observations grossly.
        rng = np.random.default_rng(6)
        obs = np.array(problem.obs)
        k, c, l, _ = obs.shape
        idx = rng.uniform(size=(k, c, l)) < 0.1
        obs[idx] += 0.3
        problem = problem._replace(obs=jnp.asarray(obs))
        res = ba.bundle_adjust(problem, iters=10)
        errs = pose_errors(res.body_t_world, poses_true)
        assert errs.max() < 0.02

    def test_never_worse_than_input(self):
        """The divergence guard must hold even on a garbage problem."""
        problem, *_ = make_window(seed=7)
        problem = problem._replace(obs=problem.obs + 10.0)  # nonsense observations
        res = ba.bundle_adjust(problem, iters=4)
        assert float(res.final_rms) <= float(res.initial_rms) + 1e-6
