"""Two-view epipolar geometry: essential-matrix RANSAC + pose recovery.

The monocular bootstrap path (the capability cuVSLAM provides for the
reference's mono capture mode, reference luxonis.py:551-568 and the
num_cameras formula run_slam.py:112-114): an all-mono rig has no stereo
baseline to triangulate from, so the first map comes from TWO VIEWS of
the same camera separated by motion — estimate the essential matrix from
tracked 2D-2D correspondences, decompose to the relative pose (up to
scale), and triangulate the inliers.

TPU shaping (same discipline as :mod:`thor_slam_tpu.engine.pnp`): a
fixed batch of RANSAC hypotheses solved in one ``vmap`` (each an 8-point
least-squares via a 9x9 symmetric eigendecomposition — MXU-friendly
small dense algebra, no data-dependent control flow), Sampson-error
inlier scoring over the full correspondence set, and a cheirality vote
over the 4 decomposition candidates by batched midpoint triangulation.

Monocular scale is unobservable: the recovered translation is unit-norm
and the triangulated map inherits that gauge (the engine documents the
odometry of an all-mono rig as up-to-scale; with an IMU the gyro still
anchors rotation prediction, and downstream consumers can align scale
against any metric reference).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from thor_slam_tpu.engine.triangulate import two_view_midpoint


class EssentialResult(NamedTuple):
    """Two-view relative pose estimate.

    Attributes:
        r_ba: (3, 3) rotation mapping frame-A points into frame B
            (``X_B = R X_A + t``).
        t_ba: (3,) unit-norm translation of the same map.
        inliers: (N,) bool Sampson-gated epipolar inliers.
        num_inliers: () int32.
        points_a: (N, 3) midpoint-triangulated positions in frame A
            (valid where ``tri_valid``; unit-|t| gauge).
        tri_valid: (N,) bool — inlier AND positive depth in both views
            AND parallax above the conditioning floor.
    """

    r_ba: jnp.ndarray
    t_ba: jnp.ndarray
    inliers: jnp.ndarray
    num_inliers: jnp.ndarray
    points_a: jnp.ndarray
    tri_valid: jnp.ndarray


def _eight_point(x0: jnp.ndarray, x1: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted 8-point essential matrix (smallest eigenvector of A^T A).

    Args:
        x0: (S, 2) normalized coords in view A.
        x1: (S, 2) normalized coords in view B.
        w: (S,) sample weights (0 disables a row).

    Returns:
        (3, 3) E with ``x1_h^T E x0_h = 0`` (not rank-2-projected; the
        decomposition step enforces the (1, 1, 0) spectrum).
    """
    h0 = jnp.concatenate([x0, jnp.ones_like(x0[:, :1])], axis=-1)  # (S, 3)
    h1 = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1)
    a = (h1[:, :, None] * h0[:, None, :]).reshape(-1, 9)  # rows: e_jk ~ x1_j x0_k
    a = a * w[:, None]
    ata = a.T @ a  # (9, 9) symmetric
    _, vecs = jnp.linalg.eigh(ata)
    return vecs[:, 0].reshape(3, 3)  # smallest eigenvalue's eigenvector


def _sampson_sq(e: jnp.ndarray, x0: jnp.ndarray, x1: jnp.ndarray) -> jnp.ndarray:
    """Squared Sampson distance of each correspondence to the epipolar
    constraint (first-order geometric error in normalized coords)."""
    h0 = jnp.concatenate([x0, jnp.ones_like(x0[:, :1])], axis=-1)
    h1 = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1)
    ex0 = h0 @ e.T  # (N, 3) = E x0
    etx1 = h1 @ e  # (N, 3) = E^T x1
    num = jnp.sum(h1 * ex0, axis=-1) ** 2
    den = ex0[:, 0] ** 2 + ex0[:, 1] ** 2 + etx1[:, 0] ** 2 + etx1[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def _decompose(e: jnp.ndarray):
    """E -> the 4 (R, t) candidates (rank-2 spectrum enforced via SVD)."""
    u, _, vt = jnp.linalg.svd(e)
    # Proper rotations: flip the sign of the last column/row as needed.
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    w = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    r1 = u @ w @ vt
    r2 = u @ w.T @ vt
    t = u[:, 2]
    return (
        jnp.stack([r1, r1, r2, r2]),  # (4, 3, 3)
        jnp.stack([t, -t, t, -t]),  # (4, 3)
    )


def _refine_pose(
    r0: jnp.ndarray,
    t0: jnp.ndarray,
    x0: jnp.ndarray,
    x1: jnp.ndarray,
    w: jnp.ndarray,
    iters: int = 8,
    damping: float = 1e-6,
):
    """Gauss-Newton refinement of (R, t-direction) on the Sampson error.

    The linear 8-point estimate's null space is weakly separated under
    low-parallax/noisy geometry (measured: two comparable small
    eigenvalues of A^T A, and the translation direction swinging tens of
    degrees with small inlier-set changes). Refining the 5-DoF relative
    pose (rotation tangent + 2-DoF translation direction on the unit
    sphere) on the first-order geometric error recovers the statistical
    optimum the linear solve can't reach. Jacobians by forward-mode
    autodiff over the 5 parameters; fixed iterations (jit-friendly).
    """
    # Orthonormal basis of t0^perp for the 2-DoF sphere parametrization.
    a = jnp.where(
        jnp.abs(t0[0]) < 0.9, jnp.asarray([1.0, 0.0, 0.0]),
        jnp.asarray([0.0, 1.0, 0.0]),
    )
    b1 = jnp.cross(t0, a)
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), 1e-9)
    b2 = jnp.cross(t0, b1)
    basis = jnp.stack([b1, b2], axis=1)  # (3, 2)

    h0 = jnp.concatenate([x0, jnp.ones_like(x0[:, :1])], axis=-1)
    h1 = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1)

    def _rodrigues(phi):
        # Autodiff-safe at phi = 0: the epsilon lives INSIDE the sqrt, so
        # the derivative of th w.r.t. phi is phi/th -> 0, never NaN — a
        # bare |phi| has an undefined gradient at the origin and jacfwd
        # would return NaN, silently freezing the solver (measured: every
        # delta zeroed by the finite-guard; the "refined" pose was the
        # unrefined one bit-for-bit).
        th2 = jnp.sum(phi * phi)
        # Taylor-switched coefficients with a CLAMPED denominator inside
        # the large-angle branch: a bare (1-cos)/th2 at th2 ~ 1e-24 hits
        # 1/th2^2 ~ 1e48 in the quotient rule — inf in f32, and the
        # where()'s zero multiplier cannot cancel an inf (0 * inf = NaN).
        th2_c = jnp.maximum(th2, 1e-8)
        th_c = jnp.sqrt(th2_c)
        a = jnp.where(th2 > 1e-8, jnp.sin(th_c) / th_c, 1.0 - th2 / 6.0)
        b = jnp.where(
            th2 > 1e-8, (1.0 - jnp.cos(th_c)) / th2_c, 0.5 - th2 / 24.0
        )
        px = jnp.asarray(
            [
                [0.0, -phi[2], phi[1]],
                [phi[2], 0.0, -phi[0]],
                [-phi[1], phi[0], 0.0],
            ]
        )
        return jnp.eye(3) + a * px + b * (px @ px)

    def residuals(params):
        phi, dt = params[:3], params[3:]
        r = _rodrigues(phi) @ r0
        t = t0 + basis @ dt
        t = t / jnp.sqrt(jnp.sum(t * t) + 1e-18)
        tx = jnp.asarray(
            [[0.0, -t[2], t[1]], [t[2], 0.0, -t[0]], [-t[1], t[0], 0.0]]
        )
        e = tx @ r
        ex0 = h0 @ e.T
        etx1 = h1 @ e
        num = jnp.sum(h1 * ex0, axis=-1)
        den = jnp.sqrt(
            jnp.maximum(
                ex0[:, 0] ** 2 + ex0[:, 1] ** 2
                + etx1[:, 0] ** 2 + etx1[:, 1] ** 2,
                1e-12,
            )
        )
        return num / den

    # Huber scale ~ the expected noise, well under the RANSAC gate: the
    # few false inliers that survive a hard threshold otherwise dominate
    # the weakly-determined translation direction (measured 46 deg off
    # from 3 contaminants in 130).
    huber = 2e-3

    def step(_, params):
        r = residuals(params)
        j = jax.jacfwd(residuals)(params)  # (N, 5)
        wr = w * jnp.minimum(1.0, huber / jnp.maximum(jnp.abs(r), 1e-12))
        jw = j * wr[:, None]
        h = jw.T @ j + damping * jnp.eye(5)
        g = jw.T @ r
        delta = -jnp.linalg.solve(h, g)
        delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta, jnp.zeros(5))
        return params + delta

    params = jax.lax.fori_loop(0, iters, step, jnp.zeros(5))
    phi, dt = params[:3], params[3:]
    t = t0 + basis @ dt
    return _rodrigues(phi) @ r0, t / jnp.sqrt(jnp.sum(t * t) + 1e-18)


def _a_t_b(r_ba: jnp.ndarray, t_ba: jnp.ndarray) -> jnp.ndarray:
    """4x4 pose of view B in view A's frame from the B<-A map."""
    return (
        jnp.eye(4)
        .at[:3, :3].set(r_ba.T)
        .at[:3, 3].set(-r_ba.T @ t_ba)
    )


@partial(jax.jit, static_argnames=("num_hypotheses", "sample_size"))
def ransac_essential(
    key: jax.Array,
    x0: jnp.ndarray,
    x1: jnp.ndarray,
    valid: jnp.ndarray,
    num_hypotheses: int = 64,
    sample_size: int = 8,
    inlier_threshold: float = 0.006,
    min_parallax: float = 0.015,
) -> EssentialResult:
    """Robust two-view relative pose from normalized correspondences.

    Args:
        key: PRNG key for hypothesis sampling.
        x0: (N, 2) normalized coords in view A (the anchor keyframe).
        x1: (N, 2) normalized coords in view B (the current frame).
        valid: (N,) bool correspondence mask.
        num_hypotheses: Parallel 8-point hypotheses (static). 64 default:
            at 25% outliers an 8-sample is outlier-free with p ~ 0.1 and
            noise makes many clean samples land in shallow local optima —
            24 hypotheses measurably locked onto a contaminated consensus
            (t-direction 46 deg off with MORE apparent inliers); 64 finds
            the true basin. The batch is one vmap of tiny dense algebra —
            doubling it is noise on the MXU.
        sample_size: Correspondences per hypothesis (static; >= 8).
        inlier_threshold: Sampson distance gate (normalized coords;
            0.006 ~ 3 px at fx = 500).
        min_parallax: Per-point angular parallax floor (radians) below
            which a triangulation is too ill-conditioned to keep.

    Returns:
        An :class:`EssentialResult` (unit-|t| gauge).
    """
    n = x0.shape[0]

    # Gumbel top-k subset sampling proportional to validity (the
    # ransac_pnp pattern — S rounds of argmax+mask beat lax.top_k's full
    # row sort on TPU for tiny S).
    gumbel = -jnp.log(
        -jnp.log(jax.random.uniform(key, (num_hypotheses, n)) + 1e-12) + 1e-12
    )
    scores = jnp.where(valid[None, :], gumbel, -jnp.inf)
    iota_n = jnp.arange(n, dtype=jnp.int32)[None, :]
    cols = []
    for _ in range(sample_size):
        i = jnp.argmax(scores, axis=1).astype(jnp.int32)
        cols.append(i)
        scores = jnp.where(iota_n == i[:, None], -jnp.inf, scores)
    subset_idx = jnp.stack(cols, axis=1)  # (H, S)

    sub_w = valid[subset_idx].astype(jnp.float32)
    es = jax.vmap(_eight_point)(x0[subset_idx], x1[subset_idx], sub_w)  # (H, 3, 3)

    d2 = jax.vmap(lambda e: _sampson_sq(e, x0, x1))(es)  # (H, N)
    inl = (d2 <= inlier_threshold**2) & valid[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)

    # Iterated re-fit on the winning inlier set (E -> inliers -> E ...):
    # one round inherits the minimal sample's noise bias; a few IRLS-like
    # rounds converge to the full-consensus least-squares E (measured:
    # ~4 deg -> ~1 deg rotation error at 0.75 px noise + 25% outliers).
    def refit(carry, _):
        _, inl_c = carry
        e_i = _eight_point(x0, x1, inl_c.astype(jnp.float32))
        d2_i = _sampson_sq(e_i, x0, x1)
        return (e_i, (d2_i <= inlier_threshold**2) & valid), None

    (e_best, inliers), _ = jax.lax.scan(
        refit, (es[best], inl[best]), None, length=3
    )
    # Guard: if the re-fit regressed (degenerate set), keep the vote winner.
    keep_refit = jnp.sum(inliers) >= counts[best]
    e_final = jnp.where(keep_refit, e_best, es[best])
    inliers = jnp.where(keep_refit, inliers, inl[best])

    # Cheirality vote over the 4 decompositions: the candidate that
    # triangulates the most inliers with positive depth in BOTH views.
    rs, ts = _decompose(e_final)
    h0 = jnp.concatenate([x0, jnp.ones_like(x0[:, :1])], axis=-1)
    h1 = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1)

    def tri(r, t):
        pts, ok = two_view_midpoint(h0, h1, _a_t_b(r, t))
        return pts, ok & inliers

    _, ok4 = jax.vmap(tri)(rs, ts)  # (4, N)
    votes = jnp.sum(ok4, axis=1)
    cand = jnp.argmax(votes)

    # 5-DoF Gauss-Newton polish on the Sampson error (see _refine_pose),
    # then re-triangulate with the refined pose.
    r_ba, t_ba = _refine_pose(
        rs[cand], ts[cand], x0, x1, inliers.astype(jnp.float32)
    )
    points_a, tri_ok = two_view_midpoint(h0, h1, _a_t_b(r_ba, t_ba))
    tri_ok = tri_ok & inliers

    # Parallax conditioning floor: angle between the two rays.
    r0 = h0 / jnp.linalg.norm(h0, axis=-1, keepdims=True)
    r1 = h1 @ r_ba / jnp.linalg.norm(h1, axis=-1, keepdims=True)  # into A
    cosang = jnp.clip(jnp.sum(r0 * r1, axis=-1), -1.0, 1.0)
    parallax_ok = jnp.arccos(cosang) >= min_parallax

    tri_valid = tri_ok & parallax_ok
    return EssentialResult(
        r_ba=r_ba,
        t_ba=t_ba,
        inliers=inliers,
        num_inliers=jnp.sum(inliers),
        points_a=points_a,
        tri_valid=tri_valid,
    )
