"""Unrolled SPD Cholesky solve/inverse vs numpy references."""

import numpy as np
import jax.numpy as jnp

from thor_slam_tpu.ops import linalg


def _spd(rng, batch, n, cond=10.0):
    a = rng.normal(size=batch + (n, n)).astype(np.float32)
    return a @ np.swapaxes(a, -1, -2) + cond * np.eye(n, dtype=np.float32)


def test_spd_solve_matches_numpy():
    rng = np.random.default_rng(0)
    for batch in [(), (24,), (4, 7)]:
        for n in (3, 6):
            a = _spd(rng, batch, n)
            b = rng.normal(size=batch + (n,)).astype(np.float32)
            got = np.asarray(linalg.spd_solve(jnp.asarray(a), jnp.asarray(b)))
            ref = np.linalg.solve(a, b[..., None])[..., 0]
            np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_spd_inverse_matches_numpy():
    rng = np.random.default_rng(1)
    for batch in [(), (16,)]:
        a = _spd(rng, batch, 6)
        got = np.asarray(linalg.spd_inverse(jnp.asarray(a)))
        ref = np.linalg.inv(a)
        np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-5)
        np.testing.assert_allclose(got, np.swapaxes(got, -1, -2), atol=1e-7)


def test_spd_solve_illconditioned_stays_finite():
    a = jnp.asarray(np.diag([1e-25, 1.0, 1.0, 1.0, 1.0, 1.0]).astype(np.float32))
    b = jnp.ones(6, jnp.float32)
    out = np.asarray(linalg.spd_solve(a, b))
    assert np.all(np.isfinite(out))
