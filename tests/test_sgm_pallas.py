"""Pallas SGM streaming-scan kernel vs the exact recurrence (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from thor_slam_tpu.ops import sgm_pallas


def exact_reference(cost_sdx: np.ndarray, p1: float, p2: float, reverse: bool) -> np.ndarray:
    """The textbook sequential SGM recurrence, step-major (S, D, X)."""
    c = np.asarray(cost_sdx, np.float32)
    if reverse:
        c = c[::-1]
    out = np.empty_like(c)
    big = 1e9
    l = c[0].copy()
    out[0] = l
    for s in range(1, c.shape[0]):
        pm = l.min(axis=0, keepdims=True)
        up = np.concatenate([l[1:], np.full_like(l[:1], big)], 0)
        dn = np.concatenate([np.full_like(l[:1], big), l[:-1]], 0)
        best = np.minimum(np.minimum(l, np.minimum(up, dn) + p1), pm + p2)
        l = c[s] + best - pm
        out[s] = l
    return out[::-1] if reverse else out


@pytest.mark.parametrize("reverse", [False, True])
def test_streaming_scan_is_exact(reverse):
    rng = np.random.default_rng(0)
    s, d, x = 64, 32, 256
    cost = rng.integers(0, 25, (s, d, x)).astype(np.float32)
    got = np.asarray(
        sgm_pallas.sgm_aggregate_dir(
            jnp.asarray(cost, jnp.bfloat16), 6.0, 96.0, reverse, step_block=16, interpret=True
        ),
        np.float32,
    )
    np.testing.assert_array_equal(got, exact_reference(cost, 6.0, 96.0, reverse))


def test_cross_dim_not_lane_multiple():
    rng = np.random.default_rng(1)
    s, d, x = 32, 16, 200  # X % 128 != 0: boundary tile padding must not leak
    cost = rng.integers(0, 25, (s, d, x)).astype(np.float32)
    got = np.asarray(
        sgm_pallas.sgm_aggregate_dir(
            jnp.asarray(cost, jnp.bfloat16), 6.0, 96.0, False, step_block=8, interpret=True
        ),
        np.float32,
    )
    np.testing.assert_array_equal(got, exact_reference(cost, 6.0, 96.0, False))


def test_4dir_matches_per_direction_sum():
    rng = np.random.default_rng(2)
    d, h, w = 16, 40, 64
    cost = rng.integers(0, 25, (d, h, w)).astype(np.float32)
    got = np.asarray(
        sgm_pallas.sgm_aggregate_4dir(jnp.asarray(cost, jnp.bfloat16), 6.0, 96.0, interpret=True),
        np.float32,
    )
    ref = (
        exact_reference(cost.transpose(2, 0, 1), 6.0, 96.0, False).transpose(1, 2, 0)
        + exact_reference(cost.transpose(2, 0, 1), 6.0, 96.0, True).transpose(1, 2, 0)
        + exact_reference(cost.transpose(1, 0, 2), 6.0, 96.0, False).transpose(1, 0, 2)
        + exact_reference(cost.transpose(1, 0, 2), 6.0, 96.0, True).transpose(1, 0, 2)
    )
    np.testing.assert_array_equal(got, ref)


def test_geometry_gate():
    assert sgm_pallas.supported_for(96, 720, 1280)
    assert sgm_pallas.supported_for(64, 400, 640)
    assert not sgm_pallas.supported_for(50, 720, 1280)  # D % 16 != 0
    assert not sgm_pallas.supported_for(64, 719, 1280)  # prime-ish path length


def test_winner_lr_matches_xla_tail():
    """The fused winner kernel must reproduce the XLA tail bit-for-bit."""
    rng = np.random.default_rng(3)
    d, h, w = 16, 32, 256
    agg = jnp.asarray(rng.integers(0, 400, (d, h, w)).astype(np.float32))

    db, c0, cm, cp, sec, dra = (
        np.asarray(v) for v in sgm_pallas.winner_lr(agg, d, interpret=True)
    )

    a = np.asarray(agg)
    ref_db = a.argmin(axis=0)
    idx = np.arange(d)[:, None, None]

    def at(dsel):
        dc = np.clip(dsel, 0, d - 1)
        return np.take_along_axis(a, dc[None], axis=0)[0]

    np.testing.assert_array_equal(db, ref_db)
    np.testing.assert_array_equal(c0, at(ref_db))
    np.testing.assert_array_equal(cm, at(ref_db - 1))
    np.testing.assert_array_equal(cp, at(ref_db + 1))
    masked = np.where(np.abs(idx - ref_db[None]) <= 1, 1e9, a)
    np.testing.assert_array_equal(sec, masked.min(axis=0))

    big = 1e9
    agg_r = np.stack(
        [np.concatenate([a[dd, :, dd:], np.full((h, dd), big, np.float32)], 1) for dd in range(d)]
    )
    ref_dbr = agg_r.argmin(axis=0)
    shifted = np.stack(
        [np.concatenate([np.zeros((h, dd), np.int64), ref_dbr[:, : w - dd]], 1) for dd in range(d)]
    )
    ref_dra = np.take_along_axis(shifted, ref_db[None], axis=0)[0]
    np.testing.assert_array_equal(dra, ref_dra)


def test_sgm_disparity_known_shift():
    """End-to-end sgm_disparity on a synthetic constant-disparity pair."""
    from thor_slam_tpu.ops import stereo

    rng = np.random.default_rng(4)
    h, w, shift = 64, 256, 5
    base = rng.uniform(0, 1, (h, w + shift)).astype(np.float32)
    import cv2

    base = cv2.GaussianBlur(base, (5, 5), 1.0)
    # left[x] = base[x]; right[x] = base[x + shift] => left matches right
    # at x - shift, i.e. constant disparity = +shift.
    left = jnp.asarray(base[:, :w])
    right = jnp.asarray(base[:, shift : shift + w])
    disp, valid = stereo.sgm_disparity(left, right, num_disparities=16)
    disp, valid = np.asarray(disp), np.asarray(valid)
    inner = valid[:, 24:]  # left margin can't match
    assert inner.mean() > 0.5
    err = np.abs(disp[:, 24:][inner] - shift)
    assert np.median(err) < 0.5
