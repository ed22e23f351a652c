"""Pyramidal Lucas-Kanade (KLT) patch tracking — batched, jit-safe.

The temporal-association workhorse of the tracker (the role of cuVSLAM's
patch tracker). Descriptor matching associates globally but is ambiguous in
repetitive scenes; LK refines a *predicted* position to subpixel accuracy by
local photometric alignment and reports a residual that doubles as a
verification score.

TPU shaping: all N tracks are advanced together — each LK iteration is one
batched gather (N x P^2 bilinear samples) plus dense 2x2 normal-equation
solves on the VPU. Iterations and pyramid levels are static; invalid tracks
are masked, never branched on.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class TrackResult(NamedTuple):
    """Result of tracking N points into the current frame.

    Attributes:
        xy: (N, 2) refined positions in the current image.
        residual: (N,) mean absolute photometric error of the final patch.
        valid: (N,) bool — converged, in-bounds, residual below threshold.
    """

    xy: jnp.ndarray
    residual: jnp.ndarray
    valid: jnp.ndarray


def _bilinear(image: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """Bilinear samples at (xs, ys); coordinates clipped to the frame."""
    h, w = image.shape
    x = jnp.clip(xs, 0.0, w - 1.001)
    y = jnp.clip(ys, 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    flat = image.reshape(-1)

    def take(yy, xx):
        return flat[(yy * w + xx).reshape(-1)].reshape(xs.shape)

    v00 = take(y0, x0)
    v01 = take(y0, x0 + 1)
    v10 = take(y0 + 1, x0)
    v11 = take(y0 + 1, x0 + 1)
    return (v00 * (1 - fx) + v01 * fx) * (1 - fy) + (v10 * (1 - fx) + v11 * fx) * fy


def _lk_level(
    prev: jnp.ndarray,
    cur: jnp.ndarray,
    pts_prev: jnp.ndarray,
    pts_cur: jnp.ndarray,
    radius: int,
    iters: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse-compositional LK at one pyramid level.

    Returns (refined current positions (N,2), final residual (N,)).
    """
    n = pts_prev.shape[0]
    d = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(d, d, indexing="ij")  # (P, P)
    dx = dx.reshape(-1)  # (P^2,)
    dy = dy.reshape(-1)

    # Template patch + gradients from the previous frame (fixed per track).
    px = pts_prev[:, 0:1] + dx[None, :]  # (N, P^2)
    py = pts_prev[:, 1:2] + dy[None, :]
    t = _bilinear(prev, px, py)
    gx = 0.5 * (_bilinear(prev, px + 1.0, py) - _bilinear(prev, px - 1.0, py))
    gy = 0.5 * (_bilinear(prev, px, py + 1.0) - _bilinear(prev, px, py - 1.0))

    # 2x2 spatial-gradient normal matrix per track (inverse compositional:
    # computed once on the template).
    gxx = jnp.sum(gx * gx, axis=1)
    gxy = jnp.sum(gx * gy, axis=1)
    gyy = jnp.sum(gy * gy, axis=1)
    det = gxx * gyy - gxy * gxy
    inv_ok = det > 1e-8
    det_safe = jnp.where(inv_ok, det, 1.0)

    def body(_, xy):
        cx = xy[:, 0:1] + dx[None, :]
        cy = xy[:, 1:2] + dy[None, :]
        c = _bilinear(cur, cx, cy)
        e = c - t  # (N, P^2)
        bx = jnp.sum(e * gx, axis=1)
        by = jnp.sum(e * gy, axis=1)
        ux = (gyy * bx - gxy * by) / det_safe
        uy = (gxx * by - gxy * bx) / det_safe
        step = jnp.stack([ux, uy], axis=-1)
        step = jnp.clip(step, -radius * 1.0, radius * 1.0)
        return xy - step * inv_ok[:, None]

    xy = jax.lax.fori_loop(0, iters, body, pts_cur)
    cxf = xy[:, 0:1] + dx[None, :]
    cyf = xy[:, 1:2] + dy[None, :]
    resid = jnp.mean(jnp.abs(_bilinear(cur, cxf, cyf) - t), axis=1)
    return xy, resid


@partial(jax.jit, static_argnames=("num_levels", "radius", "iters"))
def track_points(
    prev_pyramid: tuple[jnp.ndarray, ...],
    cur_pyramid: tuple[jnp.ndarray, ...],
    pts_prev: jnp.ndarray,
    pts_init: jnp.ndarray,
    valid: jnp.ndarray,
    num_levels: int = 3,
    radius: int = 4,
    iters: int = 8,
    max_residual: float = 0.08,
    border: int = 4,
) -> TrackResult:
    """Track points from the previous frame into the current one.

    Args:
        prev_pyramid: Tuple of (H/2^l, W/2^l) images, level 0 first.
        cur_pyramid: Same structure for the current frame.
        pts_prev: (N, 2) template positions in the previous frame.
        pts_init: (N, 2) initial guesses in the current frame (e.g. the
            pose-predicted reprojections) — this is what makes pyramid
            depth 3 sufficient and repetition harmless.
        valid: (N,) bool input mask.
        num_levels: Pyramid levels to use (static).
        radius: Patch half-size (static).
        iters: LK iterations per level (static).
        max_residual: Mean-absolute-error acceptance gate (intensity units).
        border: Reject tracks closer than this to the image border.

    Returns:
        A :class:`TrackResult`.
    """
    assert len(prev_pyramid) >= num_levels and len(cur_pyramid) >= num_levels

    # Coarse-to-fine: offsets estimated at level l are upsampled to l-1.
    scale_top = 2.0 ** (num_levels - 1)
    xy = pts_init / scale_top
    resid = jnp.zeros(pts_prev.shape[0])
    for lvl in range(num_levels - 1, -1, -1):
        s = 2.0**lvl
        xy, resid = _lk_level(
            prev_pyramid[lvl], cur_pyramid[lvl], pts_prev / s, xy, radius, iters
        )
        if lvl > 0:
            xy = xy * 2.0

    h, w = cur_pyramid[0].shape
    in_bounds = (
        (xy[:, 0] >= border)
        & (xy[:, 0] < w - border)
        & (xy[:, 1] >= border)
        & (xy[:, 1] < h - border)
    )
    ok = valid & in_bounds & (resid <= max_residual)
    return TrackResult(xy=xy, residual=resid, valid=ok)
