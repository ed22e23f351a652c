"""Undistortion + stereo rectification.

Replaces the rectification the reference outsources: cuVSLAM's
``rectified_images`` path and the OAK ASIC's on-camera rectify/resize
(reference launch/thor_visual_slam.launch.py:70, luxonis.py:513-536).

Split by execution site:

* **Map computation** (`stereo_rectify`, `init_undistort_rectify_map`) runs
  once on host at engine init — plain NumPy, mirrors OpenCV's
  ``stereoRectify`` / ``initUndistortRectifyMap`` semantics (Bouguet).
* **Map application** is the per-frame hot path: `rectify_image` is a thin
  jit-able wrapper over :func:`thor_slam_tpu.ops.image.remap_bilinear`.

Distortion model: OpenCV plumb-bob (k1, k2, p1, p2, k3); coeff vectors of
length < 5 are zero-padded, matching the reference's distortion-model
selection by coefficient count (reference isaac_ros.py:372-383).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from thor_slam_tpu.camera.types import Extrinsics, Intrinsics
from thor_slam_tpu.ops.image import remap_bilinear


def _pad_coeffs(coeffs: np.ndarray) -> np.ndarray:
    c = np.zeros(5)
    coeffs = np.asarray(coeffs, dtype=np.float64).reshape(-1)
    c[: min(5, coeffs.size)] = coeffs[:5]
    return c


def distort_normalized(pts: np.ndarray, coeffs: np.ndarray) -> np.ndarray:
    """Apply plumb-bob distortion to normalized image points (..., 2)."""
    k1, k2, p1, p2, k3 = _pad_coeffs(coeffs)
    x, y = pts[..., 0], pts[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return np.stack([xd, yd], axis=-1)


def undistort_normalized(pts: np.ndarray, coeffs: np.ndarray, iters: int = 8) -> np.ndarray:
    """Invert plumb-bob distortion by fixed-point iteration (OpenCV-style)."""
    k1, k2, p1, p2, k3 = _pad_coeffs(coeffs)
    xd, yd = pts[..., 0], pts[..., 1]
    x, y = xd.copy(), yd.copy()
    for _ in range(iters):
        r2 = x * x + y * y
        radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (xd - dx) / radial
        y = (yd - dy) / radial
    return np.stack([x, y], axis=-1)


def init_undistort_rectify_map(
    intrinsics: Intrinsics,
    rect_rotation: np.ndarray,
    new_matrix: np.ndarray,
    out_width: int,
    out_height: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Build (map_x, map_y) taking rectified pixels to source-image coords.

    For each output pixel p: ray = new_K^-1 p in the rectified frame, rotated
    back into the original camera frame by rect_rotation^T, perspective-
    divided, distorted, then projected through the original K — the exact
    semantics of ``cv2.initUndistortRectifyMap``.

    Args:
        intrinsics: Original camera intrinsics + distortion.
        rect_rotation: 3x3 rotation old-cam -> rectified-cam coords.
        new_matrix: 3x3 rectified camera matrix.
        out_width: Rectified image width.
        out_height: Rectified image height.

    Returns:
        (map_x, map_y) float32 arrays of shape (out_height, out_width).
    """
    u, v = np.meshgrid(
        np.arange(out_width, dtype=np.float64), np.arange(out_height, dtype=np.float64)
    )
    kn_inv = np.linalg.inv(new_matrix)
    rays = np.stack([u, v, np.ones_like(u)], axis=-1) @ kn_inv.T  # (H, W, 3)
    rays = rays @ rect_rotation  # == (R^T @ ray) for each ray
    # Behind-camera rays (extreme rectification) are marked invalid via -1.
    z = rays[..., 2]
    safe_z = np.where(np.abs(z) < 1e-9, 1e-9, z)
    xn = rays[..., 0] / safe_z
    yn = rays[..., 1] / safe_z
    dist = distort_normalized(np.stack([xn, yn], axis=-1), intrinsics.coeffs)
    k = intrinsics.matrix
    map_x = k[0, 0] * dist[..., 0] + k[0, 2]
    map_y = k[1, 1] * dist[..., 1] + k[1, 2]
    invalid = z <= 1e-9
    map_x = np.where(invalid, -1e6, map_x)
    map_y = np.where(invalid, -1e6, map_y)
    return map_x.astype(np.float32), map_y.astype(np.float32)


@dataclass
class StereoRectification:
    """Everything needed to rectify and triangulate one stereo pair.

    Attributes:
        rect_rotation_left/right: 3x3 old-cam -> rectified-cam rotations.
        new_matrix: Shared rectified camera matrix K'.
        baseline_m: Rectified baseline (meters); disparity = fx' * b / z.
        map_left/map_right: (map_x, map_y) sampling maps per camera.
        width, height: Rectified image size.
    """

    rect_rotation_left: np.ndarray
    rect_rotation_right: np.ndarray
    new_matrix: np.ndarray
    baseline_m: float
    map_left: tuple[np.ndarray, np.ndarray]
    map_right: tuple[np.ndarray, np.ndarray]
    width: int
    height: int

    @property
    def fx(self) -> float:
        return float(self.new_matrix[0, 0])

    def disparity_to_depth(self, disparity):
        """Depth (m) from disparity (px): z = fx' * b / d. Works on np or jnp."""
        return self.fx * self.baseline_m / np.maximum(disparity, 1e-6) if isinstance(
            disparity, np.ndarray
        ) else self.fx * self.baseline_m / disparity.clip(1e-6)


def stereo_rectify(
    left: Intrinsics,
    right: Intrinsics,
    left_t_right: np.ndarray,
    out_width: int | None = None,
    out_height: int | None = None,
    compute_maps: bool = True,
) -> StereoRectification:
    """Bouguet stereo rectification from calibrated extrinsics.

    Args:
        left: Left camera intrinsics (+ distortion).
        right: Right camera intrinsics (+ distortion).
        left_t_right: 4x4 transform, p_left = left_T_right @ p_right —
            i.e. the right camera's pose in the left camera frame (for a
            standard rig: identity rotation, translation [+baseline, 0, 0]).
        out_width: Rectified width (defaults to left.width).
        out_height: Rectified height (defaults to left.height).

    Returns:
        A :class:`StereoRectification` with maps and the rectified geometry.
    """
    from thor_slam_tpu import geometry

    out_width = out_width or left.width
    out_height = out_height or left.height

    r_lr = left_t_right[:3, :3]
    t_lr = left_t_right[:3, 3]  # right camera center in left cam frame

    # Split the relative rotation evenly between the two cameras.
    q = geometry.matrix_to_quat(r_lr)
    angle = 2.0 * np.arctan2(np.linalg.norm(q[:3]), q[3])
    axis = q[:3] / max(np.linalg.norm(q[:3]), 1e-12)
    half_l = geometry.quat_to_matrix(geometry.axis_angle_to_quat(axis, -angle / 2.0))
    # p_l' = half_l p_l; p_r' = half_r p_r with half_r = half_l @ r_lr.
    half_r = half_l @ r_lr
    t_new = half_l @ t_lr

    # Rotate so the new +x axis runs along the baseline.
    e1 = t_new / np.linalg.norm(t_new)
    if e1[0] < 0:
        e1 = -e1  # keep left->right along +x so disparity is positive
    e2 = np.array([-e1[1], e1[0], 0.0])
    n2 = np.linalg.norm(e2)
    if n2 < 1e-9:  # baseline along z (degenerate) — pick any perpendicular
        e2 = np.array([0.0, 1.0, 0.0])
    else:
        e2 = e2 / n2
    e3 = np.cross(e1, e2)
    r_align = np.stack([e1, e2, e3])

    rect_l = r_align @ half_l
    rect_r = r_align @ half_r

    # Shared rectified intrinsics: average focal, centered principal point.
    f = 0.25 * (left.fx + left.fy + right.fx + right.fy)
    k_new = np.array(
        [[f, 0.0, out_width / 2.0], [0.0, f, out_height / 2.0], [0.0, 0.0, 1.0]]
    )

    empty = (np.zeros((0, 0), np.float32), np.zeros((0, 0), np.float32))
    return StereoRectification(
        rect_rotation_left=rect_l,
        rect_rotation_right=rect_r,
        new_matrix=k_new,
        baseline_m=float(np.linalg.norm(t_new)),
        map_left=init_undistort_rectify_map(left, rect_l, k_new, out_width, out_height)
        if compute_maps
        else empty,
        map_right=init_undistort_rectify_map(right, rect_r, k_new, out_width, out_height)
        if compute_maps
        else empty,
        width=out_width,
        height=out_height,
    )


def rectification_from_extrinsics(
    left: Intrinsics,
    right: Intrinsics,
    left_ext: Extrinsics,
    right_ext: Extrinsics,
    out_width: int | None = None,
    out_height: int | None = None,
    compute_maps: bool = True,
) -> StereoRectification:
    """Rectification from per-imager source-frame extrinsics.

    Extrinsics follow the rig convention source_T_cam (reference
    rig.py:35-70), so left_T_right = inv(source_T_left) @ source_T_right.
    """
    from thor_slam_tpu import geometry

    left_t_right = geometry.se3_inverse(left_ext.to_4x4_matrix()) @ right_ext.to_4x4_matrix()
    return stereo_rectify(left, right, left_t_right, out_width, out_height, compute_maps)


def rectify_image(image, rect_map):
    """Apply a (map_x, map_y) pair on device. jit/vmap-friendly."""
    import jax.numpy as jnp

    map_x, map_y = rect_map
    return remap_bilinear(image, jnp.asarray(map_x), jnp.asarray(map_y))
