"""DenseMapper host orchestration + config plumbing + cloud packing."""

from __future__ import annotations

import numpy as np
import pytest

from thor_slam_tpu.pipeline.mapper import DenseMapper, MapperConfig
from thor_slam_tpu.pipeline.rgbd import RGBDFrame
from thor_slam_tpu.camera.types import Intrinsics
from thor_slam_tpu.slam.adapters.ros_bridge import pack_xyzrgb_cloud
from thor_slam_tpu.utils.config import ConfigError, RunConfig


def _plane_frame(depth_m: float, ts: float = 0.0, h: int = 48, w: int = 64) -> RGBDFrame:
    k = np.array([[50.0, 0, w / 2], [0, 50.0, h / 2], [0, 0, 1.0]])
    rgb = np.full((h, w, 3), (10, 200, 30), np.uint8)
    depth = np.full((h, w), int(depth_m * 1000), np.uint16)
    return RGBDFrame(
        rgb=rgb,
        depth_mm=depth,
        intrinsics=Intrinsics(width=w, height=h, matrix=k, coeffs=np.zeros(5)),
        timestamp=ts,
        camera_name="cam0",
    )


SMALL_CFG = MapperConfig(
    voxel_size_m=0.05,
    dims=(32, 32, 32),
    recenter_margin_m=0.3,
    slice_axis=2,
    slice_band_m=(0.3, 0.7),
    esdf_max_distance_m=1.0,
)


class TestDenseMapper:
    def test_integrate_and_outputs(self):
        mapper = DenseMapper(SMALL_CFG)
        # Camera at origin looking +z at a wall 0.52 m ahead (the grid is
        # centered on the first camera pose: z spans [-0.8, 0.8]).
        mapper.integrate(_plane_frame(0.52), np.eye(4))
        assert mapper.stats.integrated_frames == 1
        pts, cols = mapper.surface_cloud()
        assert len(pts) > 0
        np.testing.assert_allclose(pts[:, 2], 0.52, atol=0.05)
        np.testing.assert_allclose(cols.mean(axis=0), [10, 200, 30], atol=1.5)
        mesh = mapper.mesh()
        assert len(mesh.triangles) > 0
        np.testing.assert_allclose(mesh.vertices[:, 2], 0.52, atol=0.03)

    def test_esdf_slice_band_and_origin(self):
        mapper = DenseMapper(SMALL_CFG)
        mapper.integrate(_plane_frame(0.52), np.eye(4))
        dist, occ, obs, plane_origin = mapper.esdf_slice()
        assert occ.shape == (32, 32)
        assert occ.any() and obs.any()
        # Plane origin = grid origin on the (x, y) axes, voxel-snapped
        # around the first camera position (the origin).
        np.testing.assert_allclose(plane_origin, [-0.8, -0.8], atol=1e-6)
        # The wall column nearest the optical axis is an obstacle; distance
        # grows away from it along x.
        ci = int((0.0 - plane_origin[0]) / 0.05)
        cj = int((0.0 - plane_origin[1]) / 0.05)
        assert dist[ci, cj] == 0.0 or occ[ci, cj]

    def test_recenter_triggers_and_preserves_world(self):
        mapper = DenseMapper(SMALL_CFG)  # 1.6 m grid, 0.3 m margin
        mapper.integrate(_plane_frame(0.52), np.eye(4))
        pose = np.eye(4)
        pose[0, 3] = 0.9  # grid spans [-0.8, 0.8] in x; margin 0.3 -> roll
        mapper.integrate(_plane_frame(0.52, ts=0.1), pose)
        assert mapper.stats.recenters == 1
        # Grid recentered around x=0.9 (snapped); origin moved in x only.
        origin = np.asarray(mapper.grid.origin)
        np.testing.assert_allclose(origin[0], 0.9 - 0.8, atol=1e-6)
        np.testing.assert_allclose(origin[1:], [-0.8, 0.0 - 0.8], atol=1e-6)

    def test_slice_axis_permutation(self):
        cfg = MapperConfig(
            voxel_size_m=0.05, dims=(32, 24, 16), recenter_margin_m=0.0,
            slice_axis=1, slice_band_m=(-0.2, 0.2), esdf_max_distance_m=1.0,
        )
        mapper = DenseMapper(cfg)
        mapper.integrate(_plane_frame(0.52), np.eye(4))
        dist, occ, obs, plane_origin = mapper.esdf_slice()
        # Plane spans the two non-slice axes (x, z) in ascending order.
        assert dist.shape == (32, 16)
        assert obs.any()

    def test_lazy_grid_and_empty_outputs(self):
        mapper = DenseMapper(SMALL_CFG)
        assert mapper.grid is None
        pts, cols = mapper.surface_cloud()
        assert len(pts) == 0
        mesh = mapper.mesh()
        assert len(mesh.vertices) == 0 and len(mesh.triangles) == 0
        dist, occ, obs, _ = mapper.esdf_slice()
        assert not occ.any() and not obs.any()
        assert (dist == SMALL_CFG.esdf_max_distance_m).all()

    def test_one_integrator_per_shape(self):
        mapper = DenseMapper(SMALL_CFG)
        mapper.integrate(_plane_frame(0.52), np.eye(4))
        mapper.integrate(_plane_frame(0.52, ts=0.1), np.eye(4))
        mapper.integrate(_plane_frame(0.52, ts=0.2, h=24, w=32), np.eye(4))
        assert mapper.stats.shapes_compiled == {(48, 64), (24, 32)}


class TestDeviceResidentMapping:
    """The nvblox integrate-at-sensor-rate contract: depth->TSDF with
    ZERO device->host round trips (VERDICT r3 #1)."""

    def _device_frame(self, host: RGBDFrame) -> RGBDFrame:
        import jax.numpy as jnp

        return RGBDFrame(
            rgb=jnp.asarray(host.rgb),
            depth_mm=jnp.asarray(host.depth_mm),
            intrinsics=host.intrinsics,
            timestamp=host.timestamp,
            camera_name=host.camera_name,
        )

    def test_integrate_device_frame_no_host_sync(self):
        import jax

        host = _plane_frame(0.52)
        dev = self._device_frame(host)
        assert dev.device_resident and not host.device_resident

        ref = DenseMapper(SMALL_CFG)
        ref.integrate(host, np.eye(4))

        mapper = DenseMapper(SMALL_CFG)
        # The guard turns ANY device->host transfer between the depth
        # product and the TSDF update into a hard error — the structural
        # guarantee that integration runs at sensor rate, not link rate.
        with jax.transfer_guard_device_to_host("disallow"):
            mapper.integrate(dev, np.eye(4))
        assert mapper.stats.integrated_frames == 1

        # Same bits as the host-numpy path.
        np.testing.assert_array_equal(
            np.asarray(mapper.grid.tsdf), np.asarray(ref.grid.tsdf)
        )
        np.testing.assert_array_equal(
            np.asarray(mapper.grid.weight), np.asarray(ref.grid.weight)
        )
        np.testing.assert_array_equal(
            np.asarray(mapper.grid.color), np.asarray(ref.grid.color)
        )

    def test_grayscale_device_frame_replicates_on_device(self):
        import jax

        host = _plane_frame(0.52)
        gray = RGBDFrame(
            rgb=host.rgb[..., 0].copy(),
            depth_mm=host.depth_mm,
            intrinsics=host.intrinsics,
            timestamp=0.0,
            camera_name="cam0",
        )
        dev = self._device_frame(gray)
        mapper = DenseMapper(SMALL_CFG)
        with jax.transfer_guard_device_to_host("disallow"):
            mapper.integrate(dev, np.eye(4))
        pts, cols = mapper.surface_cloud()
        assert len(pts) > 0
        # Replicated channels: the surface is gray.
        np.testing.assert_allclose(cols[:, 0], cols[:, 1], atol=1.0)

    def test_recenter_and_decay_stay_sync_free(self):
        import jax

        mapper = DenseMapper(SMALL_CFG)
        dev0 = self._device_frame(_plane_frame(0.52))
        pose = np.eye(4)
        pose[0, 3] = 0.9  # past the 0.3 m margin of the 1.6 m grid
        dev1 = self._device_frame(_plane_frame(0.52, ts=0.1))
        with jax.transfer_guard_device_to_host("disallow"):
            mapper.integrate(dev0, np.eye(4))
            mapper.integrate(dev1, pose)  # triggers a recenter
            mapper.decay(0.9)
        assert mapper.stats.recenters == 1
        # The host origin shadow tracked the device's f32 update.
        np.testing.assert_allclose(
            np.asarray(mapper.grid.origin), mapper._origin_host, atol=0.0
        )

    def test_fetched_round_trip(self):
        host = _plane_frame(0.52)
        dev = self._device_frame(host)
        back = dev.fetched()
        assert not back.device_resident
        np.testing.assert_array_equal(back.depth_mm, host.depth_mm)
        np.testing.assert_array_equal(back.rgb, host.rgb)
        assert host.fetched() is host


class TestMappingConfig:
    def test_yaml_round_trip(self):
        cfg = RunConfig.from_dict(
            {
                "mapping": {
                    "enabled": True,
                    "voxel_size_m": 0.1,
                    "dims": [64, 64, 32],
                    "slice_axis": 1,
                    "slice_band_m": [-0.5, 0.5],
                    "integrate_every": 3,
                }
            }
        )
        m = cfg.mapping
        assert m.enabled and m.voxel_size_m == 0.1 and m.dims == (64, 64, 32)
        assert m.slice_axis == 1 and m.slice_band_m == (-0.5, 0.5)
        assert m.integrate_every == 3
        # Reference nvblox defaults preserved.
        assert m.truncation_vox == 4.0 and m.max_integration_distance_m == 10.0

    def test_defaults_off(self):
        assert not RunConfig.from_dict({}).mapping.enabled

    def test_invalid_dims(self):
        with pytest.raises(ConfigError, match="mapping.dims"):
            RunConfig.from_dict({"mapping": {"dims": [64, 64]}})
        with pytest.raises(ConfigError, match="mapping.dims"):
            RunConfig.from_dict({"mapping": {"dims": [64, 64, 4]}})

    def test_invalid_band_and_axis(self):
        with pytest.raises(ConfigError, match="slice_band_m"):
            RunConfig.from_dict({"mapping": {"slice_band_m": [1.0, 0.0]}})
        with pytest.raises(ConfigError, match="slice_axis"):
            RunConfig.from_dict({"mapping": {"slice_axis": 3}})


class TestCloudPacking:
    def test_xyzrgb_layout(self):
        pts = np.array([[1.0, 2.0, 3.0], [0.0, -1.0, 0.5]])
        cols = np.array([[255, 0, 128], [0, 255, 1]], np.uint8)
        data, step, count = pack_xyzrgb_cloud(pts, cols)
        assert step == 16 and count == 2
        rec = np.frombuffer(data, np.float32).reshape(2, 4)
        # RDF -> FLU: (x, y, z) -> (z, -x, -y).
        np.testing.assert_allclose(rec[0, :3], [3.0, -1.0, -2.0])
        np.testing.assert_allclose(rec[1, :3], [0.5, 0.0, 1.0])
        packed = rec[:, 3].view(np.uint32)
        assert packed[0] == (255 << 16) | (0 << 8) | 128
        assert packed[1] == (0 << 16) | (255 << 8) | 1


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-v"])
