"""Build the tracker's per-camera constants from a RigCalibration.

Shared by the single-chip engine, the camera-sharded SPMD path, and the
benchmark/driver entry points.
"""

from __future__ import annotations

import numpy as np

from thor_slam_tpu import geometry
from thor_slam_tpu.camera.rig import RigCalibration
from thor_slam_tpu.engine import tracker as trk
from thor_slam_tpu.ops import rectify


def build_camera_setup(calibration: RigCalibration) -> tuple[trk.CameraSetup, list[str], int, int]:
    """Rectification maps + rectified geometry for every stereo source.

    Args:
        calibration: Complete rig calibration (intrinsics, per-imager
            extrinsics, rig extrinsics).

    Returns:
        (setup, source_order, height, width). Sources are ordered by name
        (the reference's convention, isaac_ros.py:138-157) and share one
        resolution. Mono sources (one imager — the reference's
        ``stereo: false`` path, reference luxonis.py:551-568) are
        accepted: their right-imager fields duplicate the left geometry
        with a placeholder baseline and ``stereo_mask`` is False, so the
        tracker masks every stereo product for them. In MIXED rigs their
        landmarks seed from overlapping stereo cameras
        (``tracker.mint_bank``); an ALL-mono rig instead bootstraps from
        motion — two-view essential-matrix init + per-keyframe motion
        triangulation, up-to-scale (``tracker.make_mono_init``,
        ``TrackerParams.mono_bootstrap`` — the cuVSLAM mono capability).

    Raises:
        RuntimeError: On mixed resolutions.
    """
    source_order = sorted(calibration.source_names)
    cols: dict[str, list] = {f: [] for f in trk.CameraSetup._fields}
    height = width = None

    def k4(intr):
        return np.asarray([intr.fx, intr.fy, intr.cx, intr.cy], np.float32)

    def dist5(intr):
        d = np.zeros(5, np.float32)
        c = np.asarray(intr.coeffs, np.float32).reshape(-1)
        d[: min(5, c.size)] = c[:5]
        return d

    for name in source_order:
        intrs = calibration.intrinsics[name]
        exts = calibration.extrinsics[name]
        stereo = len(intrs) >= 2
        world_exts = calibration.get_world_extrinsics(name)
        body_t_caml = world_exts[0].to_4x4_matrix()
        cam_t_body = geometry.se3_inverse(body_t_caml)

        if stereo:
            sr = rectify.rectification_from_extrinsics(
                intrs[0], intrs[1], exts[0], exts[1], compute_maps=False
            )
            shape = (sr.height, sr.width)
            intr_r = intrs[1]
            rect_l, rect_r = sr.rect_rotation_left, sr.rect_rotation_right
            k_rect = np.asarray(
                [sr.fx, sr.new_matrix[0, 2], sr.new_matrix[1, 2]], np.float32
            )
            baseline = sr.baseline_m
            camr_t_body = geometry.se3_inverse(world_exts[1].to_4x4_matrix())
        else:
            # Mono: duplicated left geometry + placeholder baseline (1.0,
            # NOT 0 — masked lanes must stay finite so no NaN can leak
            # through the where-masks downstream); stereo_mask gates every
            # consumer of these fields.
            shape = (intrs[0].height, intrs[0].width)
            intr_r = intrs[0]
            rect_l = rect_r = np.eye(3, dtype=np.float32)
            k_rect = np.asarray(
                [intrs[0].fx, intrs[0].cx, intrs[0].cy], np.float32
            )
            baseline = 1.0
            camr_t_body = cam_t_body
        if height is None:
            height, width = shape
        elif shape != (height, width):
            raise RuntimeError("All sources must share one resolution for dense stacking")

        cols["k_left"].append(k4(intrs[0]))
        cols["k_right"].append(k4(intr_r))
        cols["dist_left"].append(dist5(intrs[0]))
        cols["dist_right"].append(dist5(intr_r))
        cols["rect_left"].append(rect_l)
        cols["rect_right"].append(rect_r)
        cols["k_rect"].append(k_rect)
        cols["baseline"].append(baseline)
        cols["cam_r_body"].append(cam_t_body[:3, :3])
        cols["cam_t_body"].append(cam_t_body[:3, 3])
        cols["body_t_cam"].append(body_t_caml)
        cols["cam_r_body_right"].append(camr_t_body[:3, :3])
        cols["cam_t_body_right"].append(camr_t_body[:3, 3])
        cols["stereo_mask"].append(stereo)

    setup = trk.CameraSetup(
        k_left=np.stack(cols["k_left"]),
        k_right=np.stack(cols["k_right"]),
        dist_left=np.stack(cols["dist_left"]),
        dist_right=np.stack(cols["dist_right"]),
        rect_left=np.stack(cols["rect_left"]).astype(np.float32),
        rect_right=np.stack(cols["rect_right"]).astype(np.float32),
        k_rect=np.stack(cols["k_rect"]),
        baseline=np.asarray(cols["baseline"], np.float32),
        cam_r_body=np.stack(cols["cam_r_body"]).astype(np.float32),
        cam_t_body=np.stack(cols["cam_t_body"]).astype(np.float32),
        body_t_cam=np.stack(cols["body_t_cam"]).astype(np.float32),
        cam_r_body_right=np.stack(cols["cam_r_body_right"]).astype(np.float32),
        cam_t_body_right=np.stack(cols["cam_t_body_right"]).astype(np.float32),
        stereo_mask=np.asarray(cols["stereo_mask"], bool),
    )
    return setup, source_order, height, width
