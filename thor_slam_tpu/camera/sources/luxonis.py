"""Luxonis OAK PoE camera driver (optional ``depthai`` dependency).

Clean-room counterpart of the reference's only hardware source (reference
thor_slam/camera/drivers/luxonis.py): builds the on-device DepthAI pipeline
(stereo CAM_B/CAM_C captures, optional IMU node), drains XLink output
queues, reads EEPROM calibration, and exposes everything through the
:class:`~thor_slam_tpu.camera.types.CameraSource` contract.

Differences from the reference, by design:

* No on-camera StereoDepth/Sync nodes: dense depth is produced on the TPU
  (:mod:`thor_slam_tpu.pipeline.rgbd`), so the camera ships raw stereo
  frames only — less PoE bandwidth, no ASIC dependence.
* Calibration conventions preserved exactly: DepthAI extrinsic translations
  are centimeters -> converted to meters at every read (reference
  luxonis.py:694-703), intrinsics rescaled from sensor to output resolution
  (reference luxonis.py:596-673), OAK-D Pro IMU frame is DRB (handled by
  the apps, reference run_slam.py:254-276).

Pure helpers (resolution scaling, cm->m) are module-level and unit-tested
without hardware; everything touching ``depthai`` is gated.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass
from typing import TypedDict

import numpy as np

from thor_slam_tpu.camera.types import (
    CameraFrame,
    CameraSensorType,
    CameraSource,
    Extrinsics,
    Intrinsics,
    IPv4,
)

logger = logging.getLogger(__name__)

try:  # pragma: no cover - hardware SDK
    import depthai as dai

    HAVE_DEPTHAI = True
except ImportError:
    dai = None
    HAVE_DEPTHAI = False


#: Output resolutions the OAK sensors support, by short name
#: (reference luxonis.py:38-46).
SUPPORTED_RESOLUTIONS: dict[str, tuple[int, int]] = {
    "400": (640, 400),
    "480": (640, 480),
    "720": (1280, 720),
    "800": (1280, 800),
    "1200": (1920, 1200),
}


class IMUData(TypedDict):
    """One IMU packet: body-frame accel (m/s^2) + gyro (rad/s)."""

    accelerometer: np.ndarray
    gyroscope: np.ndarray
    timestamp: float
    sequence_num: int


@dataclass
class LuxonisResolution:
    """A validated (width, height) pair from the supported table."""

    width: int
    height: int

    @classmethod
    def from_tuple(cls, wh: tuple[int, int]) -> "LuxonisResolution":
        if tuple(wh) not in SUPPORTED_RESOLUTIONS.values():
            raise ValueError(
                f"Unsupported resolution {wh}; supported: {sorted(SUPPORTED_RESOLUTIONS.values())}"
            )
        return cls(width=wh[0], height=wh[1])


@dataclass
class LuxonisRGBDCameraConfig:
    """RGB capture options when a camera also feeds the RGB-D product.

    The TPU build computes depth off-camera, so only the RGB leg of the
    reference's RGB-D config survives (reference luxonis.py:92-115).
    """

    rgb_sensor_resolution: tuple[int, int] = (1280, 800)
    rgb_output_resolution: tuple[int, int] = (1280, 800)
    align_depth_to_rgb: bool = True


@dataclass
class LuxonisCameraConfig:
    """Bring-up options for one OAK PoE camera (reference luxonis.py:118-141)."""

    ip: IPv4
    fps: float = 30.0
    stereo: bool = True
    sensor_type: CameraSensorType = "MONO"
    resolution: tuple[int, int] = (640, 400)
    output_resolution: tuple[int, int] | None = None
    queue_size: int = 8
    queue_blocking: bool = False
    read_imu: bool = False
    imu_report_rate: int = 400
    imu_batch_report_threshold: int = 5
    rgbd: LuxonisRGBDCameraConfig | None = None


def scale_intrinsics_to_output(
    matrix: np.ndarray,
    sensor_wh: tuple[int, int],
    output_wh: tuple[int, int],
) -> np.ndarray:
    """Rescale a camera matrix from sensor to output resolution.

    Mirrors the reference's sensor->output scaling (luxonis.py:596-673):
    plain axis scaling (DepthAI outputs are scaled, not letterboxed, when
    aspect ratios match — mixed aspect ratios use the full-width scale).
    """
    sx = output_wh[0] / sensor_wh[0]
    sy = output_wh[1] / sensor_wh[1]
    k = np.asarray(matrix, np.float64).copy()
    k[0, :] *= sx
    k[1, :] *= sy
    return k


def extrinsics_cm_to_m(matrix_cm: np.ndarray) -> np.ndarray:
    """DepthAI EEPROM extrinsics carry centimeter translations; convert
    the translation column to meters (reference luxonis.py:694-703)."""
    m = np.asarray(matrix_cm, np.float64).copy()
    m[:3, 3] *= 0.01
    return m


class LuxonisCameraSource(CameraSource):  # pragma: no cover - hardware
    """A stereo/mono OAK PoE camera as a :class:`CameraSource`."""

    def __init__(self, config: LuxonisCameraConfig) -> None:
        if not HAVE_DEPTHAI:
            raise ImportError(
                "depthai is not installed; install 'thor-slam-tpu[hardware]' "
                "or use the synthetic/dataset sources"
            )
        self._config = config
        LuxonisResolution.from_tuple(config.resolution)
        self._device = None
        self._pipeline = None
        self._queues: dict[str, object] = {}
        self._running = False
        self._imu_packets: list[IMUData] = []
        self._seq = 0

        from thor_slam_tpu.camera.utils import get_luxonis_device

        self._device = get_luxonis_device(config.ip)
        if self._device is None:
            raise RuntimeError(f"No DepthAI device at {config.ip}")
        self._calib = self._device.readCalibration()

    # -- pipeline -----------------------------------------------------------

    def _build_and_start_pipeline(self) -> None:
        cfg = self._config
        pipeline = dai.Pipeline()
        w, h = cfg.resolution

        if cfg.stereo:
            for name, socket in (("left", dai.CameraBoardSocket.CAM_B),
                                 ("right", dai.CameraBoardSocket.CAM_C)):
                cam = pipeline.create(dai.node.MonoCamera)
                cam.setBoardSocket(socket)
                cam.setFps(cfg.fps)
                xout = pipeline.create(dai.node.XLinkOut)
                xout.setStreamName(name)
                cam.out.link(xout.input)
        else:
            cam = pipeline.create(dai.node.ColorCamera)
            cam.setBoardSocket(dai.CameraBoardSocket.CAM_A)
            cam.setFps(cfg.fps)
            cam.setPreviewSize(w, h)
            xout = pipeline.create(dai.node.XLinkOut)
            xout.setStreamName("rgb")
            cam.preview.link(xout.input)

        if cfg.read_imu:
            imu = pipeline.create(dai.node.IMU)
            imu.enableIMUSensor(
                [dai.IMUSensor.ACCELEROMETER_RAW, dai.IMUSensor.GYROSCOPE_RAW],
                cfg.imu_report_rate,
            )
            imu.setBatchReportThreshold(cfg.imu_batch_report_threshold)
            imu.setMaxBatchReports(20)
            xout_imu = pipeline.create(dai.node.XLinkOut)
            xout_imu.setStreamName("imu")
            imu.out.link(xout_imu.input)

        self._device.startPipeline(pipeline)
        names = ["left", "right"] if cfg.stereo else ["rgb"]
        if cfg.read_imu:
            names.append("imu")
        for n in names:
            self._queues[n] = self._device.getOutputQueue(
                n, maxSize=cfg.queue_size, blocking=cfg.queue_blocking
            )
        self._pipeline = pipeline

    # -- CameraSource contract ----------------------------------------------

    @property
    def name(self) -> str:
        return str(self._config.ip)

    def start(self) -> None:
        if self._running:
            return
        self._build_and_start_pipeline()
        self._running = True

    def stop(self) -> None:
        if not self._running:
            return
        self._running = False
        if self._device is not None:
            self._device.close()

    def _to_frame(self, msg, cam_name: str) -> CameraFrame:
        # Host-clock timestamps, matching the reference (luxonis.py:790-791).
        return CameraFrame(
            image=msg.getCvFrame(),
            timestamp=time.time(),
            sequence_num=msg.getSequenceNum(),
            camera_name=cam_name,
        )

    def get_latest_frames(self) -> list[CameraFrame]:
        if not self._running:
            raise RuntimeError("start() first")
        if self._config.stereo:
            left = self._queues["left"].get()
            right = self._queues["right"].get()
            return [
                self._to_frame(left, f"{self.name}_left"),
                self._to_frame(right, f"{self.name}_right"),
            ]
        msg = self._queues["rgb"].get()
        return [self._to_frame(msg, f"{self.name}_rgb")]

    def try_get_latest_frames(self) -> list[CameraFrame] | None:
        if not self._running:
            return None
        if self._config.stereo:
            left = self._queues["left"].tryGet()
            right = self._queues["right"].tryGet()
            if left is None or right is None:
                return None
            return [
                self._to_frame(left, f"{self.name}_left"),
                self._to_frame(right, f"{self.name}_right"),
            ]
        msg = self._queues["rgb"].tryGet()
        return [self._to_frame(msg, f"{self.name}_rgb")] if msg is not None else None

    def get_intrinsics(self) -> list[Intrinsics]:
        cfg = self._config
        out_w, out_h = cfg.output_resolution or cfg.resolution
        sockets = (
            [dai.CameraBoardSocket.CAM_B, dai.CameraBoardSocket.CAM_C]
            if cfg.stereo
            else [dai.CameraBoardSocket.CAM_A]
        )
        result = []
        for socket in sockets:
            k = np.asarray(self._calib.getCameraIntrinsics(socket, cfg.resolution[0], cfg.resolution[1]))
            k = scale_intrinsics_to_output(k, cfg.resolution, (out_w, out_h))
            coeffs = np.asarray(self._calib.getDistortionCoefficients(socket), np.float64)
            result.append(Intrinsics(width=out_w, height=out_h, matrix=k, coeffs=coeffs))
        return result

    def get_extrinsics(self) -> list[Extrinsics]:
        cfg = self._config
        if not cfg.stereo:
            return [Extrinsics.identity()]
        # Left is the source reference; right = left_T_right from EEPROM.
        l_to_r = np.asarray(
            self._calib.getCameraExtrinsics(dai.CameraBoardSocket.CAM_B, dai.CameraBoardSocket.CAM_C)
        )
        left_t_right = np.linalg.inv(extrinsics_cm_to_m(l_to_r))
        return [Extrinsics.identity(), Extrinsics.from_4x4_matrix(left_t_right)]

    def get_sensor_extrinsics(self) -> Extrinsics | None:
        if not self._config.read_imu:
            return None
        try:
            m = np.asarray(self._calib.getImuToCameraExtrinsics(dai.CameraBoardSocket.CAM_A))
            return Extrinsics.from_4x4_matrix(extrinsics_cm_to_m(m))
        except Exception:
            logger.warning("IMU extrinsics unavailable; using identity")
            return Extrinsics.identity()

    def get_timestamped_sensor_data(self) -> tuple[dict | None, float | None]:
        if not self._config.read_imu or "imu" not in self._queues:
            return None, None
        msg = self._queues["imu"].tryGet()
        if msg is None:
            return None, None
        accels, gyros, times = [], [], []
        for pkt in msg.packets:
            a = pkt.acceleroMeter
            g = pkt.gyroscope
            accels.append([a.x, a.y, a.z])
            gyros.append([g.x, g.y, g.z])
            times.append(time.time())
        if not accels:
            return None, None
        self._seq += 1
        data: IMUData = {
            "accelerometer": np.asarray(accels),
            "gyroscope": np.asarray(gyros),
            "timestamp": times[-1],
            "sequence_num": self._seq,
        }
        data["timestamps"] = np.asarray(times)  # type: ignore[typeddict-unknown-key]
        return dict(data), times[-1]

    @property
    def has_sensor_data(self) -> bool:
        return self._config.read_imu
