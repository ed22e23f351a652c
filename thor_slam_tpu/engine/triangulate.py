"""Triangulation: stereo (rectified) and general two-view midpoint.

All functions are dense over fixed-capacity keypoint sets with validity
masks, jit/vmap-safe.
"""

from __future__ import annotations

import jax.numpy as jnp


def stereo_triangulate(
    xy_left: jnp.ndarray,
    disparity: jnp.ndarray,
    fx: float,
    cx: float,
    cy: float,
    baseline_m: float,
    min_disparity: float = 0.25,
    max_depth_m: float = 40.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rectified stereo back-projection: pixel + disparity -> 3D point.

    Args:
        xy_left: (N, 2) rectified left-image pixel coordinates.
        disparity: (N,) disparities in pixels (x_left - x_right).
        fx: Rectified focal length (fx == fy after rectification).
        cx: Rectified principal point x.
        cy: Rectified principal point y.
        baseline_m: Rectified baseline.
        min_disparity: Reject points with disparity below this.
        max_depth_m: Reject points farther than this.

    Returns:
        (points, valid): (N, 3) points in the left camera frame (RDF) and
        the (N,) validity mask.
    """
    d = jnp.maximum(disparity, 1e-6)
    z = fx * baseline_m / d
    x = (xy_left[:, 0] - cx) * z / fx
    y = (xy_left[:, 1] - cy) * z / fx
    pts = jnp.stack([x, y, z], axis=-1)
    valid = (disparity >= min_disparity) & (z <= max_depth_m) & (z > 0)
    return pts, valid


def match_disparities(
    xy_left: jnp.ndarray,
    xy_right: jnp.ndarray,
    match_idx: jnp.ndarray,
    match_valid: jnp.ndarray,
    max_dy: float = 1.5,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Disparities from left->right feature matches on a rectified pair.

    Args:
        xy_left: (N, 2) left keypoints.
        xy_right: (M, 2) right keypoints.
        match_idx: (N,) index into right keypoints per left keypoint.
        match_valid: (N,) match validity.
        max_dy: Epipolar gate — reject matches with |y_l - y_r| above this.

    Returns:
        (disparity, valid): (N,) disparities and the combined mask
        (match valid, epipolar-consistent, positive disparity).
    """
    matched = xy_right[match_idx]
    disparity = xy_left[:, 0] - matched[:, 0]
    dy = jnp.abs(xy_left[:, 1] - matched[:, 1])
    valid = match_valid & (dy <= max_dy) & (disparity > 0)
    return jnp.where(valid, disparity, 0.0), valid


def two_view_midpoint(
    rays0: jnp.ndarray,
    rays1: jnp.ndarray,
    cam0_t_cam1: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Midpoint triangulation of ray pairs from two posed cameras.

    Args:
        rays0: (N, 3) unit-normalized (or z=1) rays in camera-0 coords.
        rays1: (N, 3) rays in camera-1 coords.
        cam0_t_cam1: 4x4 pose of camera 1 in camera 0's frame.

    Returns:
        (points, valid): (N, 3) points in camera-0 coords; valid is False
        for near-parallel rays or points behind either camera.
    """
    r = cam0_t_cam1[:3, :3]
    t = cam0_t_cam1[:3, 3]
    d0 = rays0
    d1 = rays1 @ r.T  # rotate cam1 rays into cam0 frame

    # Solve [d0 -d1] [s; u] = t in least squares per pair (2x2 normal eqs).
    a00 = jnp.sum(d0 * d0, axis=-1)
    a01 = -jnp.sum(d0 * d1, axis=-1)
    a11 = jnp.sum(d1 * d1, axis=-1)
    b0 = jnp.sum(d0 * t, axis=-1)
    b1 = -jnp.sum(d1 * t, axis=-1)
    det = a00 * a11 - a01 * a01
    safe_det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
    s = (a11 * b0 - a01 * b1) / safe_det
    u = (a00 * b1 - a01 * b0) / safe_det

    p0 = d0 * s[:, None]
    p1 = t + d1 * u[:, None]
    pts = 0.5 * (p0 + p1)
    valid = (jnp.abs(det) > 1e-9) & (s > 0) & (u > 0)
    return pts, valid
