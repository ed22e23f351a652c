"""Pose graph + loop closure components."""

import jax
import jax.numpy as jnp
import numpy as np

from thor_slam_tpu.engine import loop, posegraph
from thor_slam_tpu.ops import lie


def chain_poses(k, step=0.2, yaw_step=0.05, seed=0, noise=0.0):
    """A noisy forward-walking chain of world_T_body poses."""
    rng = np.random.default_rng(seed)
    poses = [np.eye(4)]
    for _ in range(k - 1):
        xi = np.array([step, 0, 0, 0, 0, yaw_step]) + rng.normal(0, noise, 6)
        delta = np.asarray(lie.se3_exp(jnp.asarray(xi, jnp.float32)))
        poses.append(poses[-1] @ delta)
    return np.stack(poses).astype(np.float32)


class TestPoseGraph:
    def test_chain_consistent_is_fixed_point(self):
        poses = chain_poses(8)
        ei, ej, et, w = posegraph.sequential_graph(poses)
        g = posegraph.PoseGraph(
            poses=jnp.asarray(poses), node_mask=jnp.ones(8),
            edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
            edge_t=jnp.asarray(et), edge_weight=jnp.asarray(w),
        )
        out, rms = posegraph.optimize(g, iters=3)
        assert float(rms) < 1e-5
        np.testing.assert_allclose(np.asarray(out), poses, atol=1e-4)

    def test_loop_closure_corrects_drift(self):
        """Chain with accumulated drift + one loop edge to the start."""
        true = chain_poses(12, step=0.3, yaw_step=0.5)  # returns near start
        drift = chain_poses(12, step=0.3, yaw_step=0.5, noise=0.02, seed=3)
        # Odometry edges measured from the DRIFTED chain, loop edge TRUE.
        ei, ej, et, w = posegraph.sequential_graph(drift, capacity_edges=12)
        ei[11], ej[11] = 0, 11
        et[11] = np.linalg.inv(true[0]) @ true[11]
        w[11] = 3.0  # confident loop edge
        g = posegraph.PoseGraph(
            poses=jnp.asarray(drift), node_mask=jnp.ones(12),
            edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
            edge_t=jnp.asarray(et), edge_weight=jnp.asarray(w),
        )
        out, rms = posegraph.optimize(g, iters=10)
        out = np.asarray(out)
        # End-node error vs truth must shrink substantially.
        before = np.linalg.norm(drift[11][:3, 3] - true[11][:3, 3])
        after = np.linalg.norm(out[11][:3, 3] - true[11][:3, 3])
        assert after < before * 0.3

    def test_masked_nodes_untouched(self):
        poses = chain_poses(6)
        ei, ej, et, w = posegraph.sequential_graph(poses[:4], capacity_edges=5)
        g = posegraph.PoseGraph(
            poses=jnp.asarray(poses), node_mask=jnp.asarray([1.0, 1, 1, 1, 0, 0]),
            edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
            edge_t=jnp.asarray(et), edge_weight=jnp.asarray(w),
        )
        out, _ = posegraph.optimize(g, iters=3)
        np.testing.assert_allclose(np.asarray(out)[4:], poses[4:], atol=1e-5)


class TestLoopDetection:
    def make_db(self, k=6, n=64, seed=0):
        rng = np.random.default_rng(seed)
        db = rng.integers(0, 2**32, (k, n, 8), dtype=np.uint64).astype(np.uint32)
        return jnp.asarray(db), jnp.ones((k, n), bool)

    def test_finds_identical_keyframe(self):
        db, db_valid = self.make_db()
        query = db[3]
        cand = loop.find_candidate(
            query, jnp.ones(64, bool), db, db_valid, jnp.ones(6)
        )
        assert int(cand.keyframe) == 3
        assert int(cand.votes) == 64

    def test_temporal_mask_respected(self):
        db, db_valid = self.make_db()
        query = db[3]
        mask = jnp.asarray([1.0, 1, 1, 0, 1, 1])  # exclude the true match
        cand = loop.find_candidate(query, jnp.ones(64, bool), db, db_valid, mask)
        assert int(cand.keyframe) != 3

    def test_noisy_copy_still_found(self):
        rng = np.random.default_rng(1)
        db, db_valid = self.make_db(seed=1)
        query = np.array(db[2])
        # Flip ~16 random bits per descriptor (of 256).
        for _ in range(16):
            w = rng.integers(0, 8)
            b = rng.integers(0, 32)
            query[:, w] ^= np.uint32(1) << np.uint32(b)
        cand = loop.find_candidate(
            jnp.asarray(query), jnp.ones(64, bool), db, db_valid, jnp.ones(6)
        )
        assert int(cand.keyframe) == 2

    def test_verify_accepts_true_geometry(self):
        rng = np.random.default_rng(2)
        n = 128
        lm = rng.uniform([-2, -2, 2.0], [2, 2, 6.0], (n, 3)).astype(np.float32)
        xi = np.array([0.2, -0.1, 0.05, 0.02, -0.03, 0.1])
        body_t_world = np.asarray(lie.se3_exp(jnp.asarray(xi, jnp.float32)))
        p_b = lm @ body_t_world[:3, :3].T + body_t_world[:3, 3]
        obs = (p_b[:, :2] / p_b[:, 2:3]).astype(np.float32)
        desc = rng.integers(0, 2**32, (n, 8), dtype=np.uint64).astype(np.uint32)
        res = loop.verify_candidate(
            jax.random.PRNGKey(0),
            jnp.asarray(lm), jnp.ones(n, bool), jnp.asarray(desc),
            jnp.asarray(obs), jnp.asarray(desc), jnp.ones(n, bool),
            jnp.eye(3), jnp.zeros(3), jnp.eye(4),
        )
        assert bool(res.accepted)
        est = np.asarray(res.body_t_candidate)
        np.testing.assert_allclose(est, body_t_world, atol=5e-3)

    def test_verify_rejects_mismatched_geometry(self):
        rng = np.random.default_rng(3)
        n = 128
        lm = rng.uniform([-2, -2, 2.0], [2, 2, 6.0], (n, 3)).astype(np.float32)
        obs = rng.uniform(-0.4, 0.4, (n, 2)).astype(np.float32)  # random obs
        desc = rng.integers(0, 2**32, (n, 8), dtype=np.uint64).astype(np.uint32)
        res = loop.verify_candidate(
            jax.random.PRNGKey(1),
            jnp.asarray(lm), jnp.ones(n, bool), jnp.asarray(desc),
            jnp.asarray(obs), jnp.asarray(desc), jnp.ones(n, bool),
            jnp.eye(3), jnp.zeros(3), jnp.eye(4),
        )
        assert not bool(res.accepted)
