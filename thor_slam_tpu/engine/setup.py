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
        (the reference's convention, isaac_ros.py:138-157); all must be
        stereo and share one resolution.

    Raises:
        RuntimeError: On mono sources or mixed resolutions.
    """
    source_order = sorted(calibration.source_names)
    cols: dict[str, list] = {f: [] for f in trk.CameraSetup._fields}
    height = width = None

    for name in source_order:
        intrs = calibration.intrinsics[name]
        exts = calibration.extrinsics[name]
        if len(intrs) < 2:
            raise RuntimeError(
                f"TpuSlamEngine requires stereo sources; '{name}' has {len(intrs)} imagers"
            )
        sr = rectify.rectification_from_extrinsics(intrs[0], intrs[1], exts[0], exts[1])
        if height is None:
            height, width = sr.height, sr.width
        elif (sr.height, sr.width) != (height, width):
            raise RuntimeError("All sources must share one resolution for dense stacking")

        world_exts = calibration.get_world_extrinsics(name)
        body_t_caml = world_exts[0].to_4x4_matrix()
        rect_fix = np.eye(4)
        rect_fix[:3, :3] = sr.rect_rotation_left.T
        btr = body_t_caml @ rect_fix
        rtb = geometry.se3_inverse(btr)

        cols["map_lx"].append(sr.map_left[0])
        cols["map_ly"].append(sr.map_left[1])
        cols["map_rx"].append(sr.map_right[0])
        cols["map_ry"].append(sr.map_right[1])
        cols["fx"].append(sr.fx)
        cols["cx"].append(sr.new_matrix[0, 2])
        cols["cy"].append(sr.new_matrix[1, 2])
        cols["baseline"].append(sr.baseline_m)
        cols["rect_r_body"].append(rtb[:3, :3])
        cols["rect_t_body"].append(rtb[:3, 3])
        cols["body_t_rect"].append(btr)

    setup = trk.CameraSetup(
        map_lx=np.stack(cols["map_lx"]),
        map_ly=np.stack(cols["map_ly"]),
        map_rx=np.stack(cols["map_rx"]),
        map_ry=np.stack(cols["map_ry"]),
        fx=np.asarray(cols["fx"], np.float32),
        cx=np.asarray(cols["cx"], np.float32),
        cy=np.asarray(cols["cy"], np.float32),
        baseline=np.asarray(cols["baseline"], np.float32),
        rect_r_body=np.stack(cols["rect_r_body"]).astype(np.float32),
        rect_t_body=np.stack(cols["rect_t_body"]).astype(np.float32),
        body_t_rect=np.stack(cols["body_t_rect"]).astype(np.float32),
    )
    return setup, source_order, height, width
