"""The RGB-D product stream: dense SGM depth aligned with an RGB image.

This is the nvblox feed contract the reference implements with the OAK
ASIC's StereoDepth + host Sync + RGBDPublisher (reference
luxonis.py:513-549, run_pipeline.py:166-292): per configured camera, an
aligned (rgb, depth) pair at resolutions independent of the SLAM stream,
depth encoded 16UC1 millimeters (reference run_pipeline.py:247-252).

Compute is one jitted pipeline per camera: full-frame rectification (the
one place the framework still remaps images — this path runs at the
consumer's rate, not the tracker's), SGM, invalid masking, u16 encode,
and resize to the configured output resolution.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from thor_slam_tpu.camera.types import Intrinsics, SynchronizedFrameSet
from thor_slam_tpu.ops import stereo
from thor_slam_tpu.ops.image import remap_bilinear, resize_bilinear
from thor_slam_tpu.ops.rectify import StereoRectification, rectification_from_extrinsics


@dataclass
class RGBDFrame:
    """One aligned RGB-D product frame.

    Attributes:
        rgb: (H, W) or (H, W, 3) uint8 image at the RGB output resolution.
        depth_mm: (H, W) uint16 depth in millimeters (0 = invalid).
        intrinsics: Intrinsics of the aligned pair (rectified model scaled
            to the output resolution).
        timestamp: Source frame timestamp.
        camera_name: Source name.
    """

    rgb: np.ndarray
    depth_mm: np.ndarray
    intrinsics: Intrinsics
    timestamp: float
    camera_name: str


class RGBDProcessor:
    """Produces RGB-D frames for one stereo camera source."""

    def __init__(
        self,
        camera_name: str,
        intrinsics: list[Intrinsics],
        extrinsics: list,
        output_resolution: tuple[int, int] | None = None,
        num_disparities: int = 64,
    ) -> None:
        """Build rectification maps and the jitted depth pipeline.

        Args:
            camera_name: Source name (topic naming).
            intrinsics: [left, right] raw intrinsics.
            extrinsics: [left, right] source-frame extrinsics.
            output_resolution: (width, height) of the product; defaults to
                the stereo resolution.
            num_disparities: SGM search range.
        """
        self.camera_name = camera_name
        self._sr: StereoRectification = rectification_from_extrinsics(
            intrinsics[0], intrinsics[1], extrinsics[0], extrinsics[1]
        )
        self._out_w, self._out_h = output_resolution or (self._sr.width, self._sr.height)
        self._num_disp = num_disparities

        sr = self._sr
        maps = (
            jnp.asarray(sr.map_left[0]),
            jnp.asarray(sr.map_left[1]),
            jnp.asarray(sr.map_right[0]),
            jnp.asarray(sr.map_right[1]),
        )
        out_w, out_h = self._out_w, self._out_h

        @partial(jax.jit, static_argnames=())
        def compute(left_raw, right_raw):
            left = remap_bilinear(left_raw, maps[0], maps[1])
            right = remap_bilinear(right_raw, maps[2], maps[3])
            disp, valid = stereo.sgm_disparity(left, right, num_disparities=num_disparities)
            depth = stereo.disparity_to_depth(disp, valid, sr.fx, sr.baseline_m)
            if (out_h, out_w) != left.shape:
                depth = resize_bilinear(depth, out_h, out_w)
                left = resize_bilinear(left, out_h, out_w)
            depth_mm = stereo.depth_to_millimeters_u16(depth)
            rgb_u8 = jnp.clip(jnp.round(left * 255.0), 0, 255).astype(jnp.uint8)
            return rgb_u8, depth_mm

        self._compute = compute

        # Intrinsics of the product: rectified model scaled to output size.
        k = sr.new_matrix.copy()
        k[0, :] *= self._out_w / sr.width
        k[1, :] *= self._out_h / sr.height
        self._out_intrinsics = Intrinsics(
            width=self._out_w, height=self._out_h, matrix=k, coeffs=np.zeros(5)
        )

    @property
    def output_intrinsics(self) -> Intrinsics:
        return self._out_intrinsics

    def process(self, frame_set: SynchronizedFrameSet) -> RGBDFrame | None:
        """Produce the RGB-D frame for this camera from a synchronized tick."""
        frames = frame_set.get_frames_for_source(self.camera_name)
        if frames is None or len(frames) < 2:
            return None
        left = jnp.asarray(frames[0].image.astype(np.float32) / 255.0)
        right = jnp.asarray(frames[1].image.astype(np.float32) / 255.0)
        rgb, depth_mm = self._compute(left, right)
        return RGBDFrame(
            rgb=np.asarray(rgb),
            depth_mm=np.asarray(depth_mm),
            intrinsics=self._out_intrinsics,
            timestamp=frames[0].timestamp,
            camera_name=self.camera_name,
        )
