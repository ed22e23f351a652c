"""Dense mapping (TSDF / ESDF / mesh) numerics.

Golden-geometry tests: analytic depth renders of planes and spheres (no
renderer under test — the depth images are closed-form), exact
brute-force cross-checks for the distance transforms.
"""

from __future__ import annotations

import numpy as np
import pytest

from thor_slam_tpu.mapping import (
    GridSpec,
    esdf_from_tsdf,
    esdf_slice_2d,
    extract_mesh,
    extract_surface_points,
    make_grid,
    make_integrator,
    make_recenter,
    make_scan_integrator,
)

import jax.numpy as jnp


def _intr4(fx, fy, cx, cy):
    return jnp.asarray([fx, fy, cx, cy], jnp.float32)


def _plane_depth_mm(h, w, depth_m):
    return jnp.full((h, w), int(depth_m * 1000), jnp.uint16)


def _sphere_depth_mm(h, w, intr, cam_t_world, center_w, radius):
    """Analytic ray-sphere projective depth in the camera frame."""
    fx, fy, cx, cy = intr
    c = (cam_t_world @ np.array([*center_w, 1.0]))[:3]
    u, v = np.meshgrid(np.arange(w), np.arange(h))
    dx = (u - cx) / fx
    dy = (v - cy) / fy
    # Ray p(s) = s * (dx, dy, 1); solve |p - c|^2 = r^2 for smallest s > 0.
    a = dx**2 + dy**2 + 1.0
    b = -2.0 * (dx * c[0] + dy * c[1] + c[2])
    cc = float(c @ c) - radius**2
    disc = b**2 - 4 * a * cc
    hit = disc > 0
    s = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0.0))) / (2 * a), 0.0)
    s = np.where(s > 0, s, 0.0)
    return jnp.asarray(np.round(s * 1000).astype(np.uint16))


def _look_at_world_t_cam(position, target, up=(0.0, 1.0, 0.0)):
    """RDF camera at ``position`` with +z toward ``target``."""
    z = np.asarray(target, float) - np.asarray(position, float)
    z /= np.linalg.norm(z)
    x = np.cross(np.asarray(up, float), z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    m = np.eye(4)
    m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = x, y, z, position
    return m


SMALL = GridSpec(
    dims=(32, 32, 32),
    voxel_size_m=0.05,
    truncation_vox=4.0,
    max_integration_distance_m=5.0,
    integrate_color=True,
)


class TestTsdfIntegration:
    def test_plane_zero_crossing(self):
        grid = make_grid(SMALL, origin_m=(-0.8, -0.8, 0.0))
        integ = make_integrator(SMALL)
        depth = _plane_depth_mm(48, 64, 1.0)
        color = jnp.zeros((48, 64, 3), jnp.uint8)
        grid = integ(grid, depth, color, jnp.eye(4), _intr4(50.0, 50.0, 32.0, 24.0))
        tsdf = np.asarray(grid.tsdf)
        weight = np.asarray(grid.weight)
        # Central column: voxel centers at z = (k + 0.5) * 0.05.
        zc = (np.arange(32) + 0.5) * 0.05
        col = tsdf[16, 16, :]
        wcol = weight[16, 16, :]
        expected = np.clip(1.0 - zc, -SMALL.truncation_m, SMALL.truncation_m)
        seen = wcol > 0
        # Everything in front of the surface plus the truncation band behind
        # it is observed (beyond the min integration distance); farther
        # behind, untouched.
        near = (zc > SMALL.min_integration_distance_m + 0.026) & (
            zc < 1.0 + SMALL.truncation_m - 0.026
        )
        assert seen[near].all()
        assert not seen[zc > 1.0 + SMALL.truncation_m + 0.026].any()
        np.testing.assert_allclose(col[seen], expected[seen], atol=1e-3)
        # Voxels behind the camera / out of frustum untouched.
        assert weight[0, 0, 0] == 0.0
        assert tsdf[0, 0, 0] == np.float32(SMALL.truncation_m)

    def test_scan_integrator_matches_sequential(self):
        """N frames in ONE dispatch == N per-frame integrations, bit-level.

        The scan form is the offline/batch integrator (and the bench's
        RTT-immune TSDF measurement); it must be semantically identical
        to the streaming per-frame path.
        """
        rng = np.random.default_rng(3)
        n, h, w = 5, 24, 32
        depths = jnp.asarray((rng.uniform(0.4, 4.0, (n, h, w)) * 1000).astype(np.uint16))
        colors = jnp.asarray(rng.integers(0, 255, (n, h, w, 3), dtype=np.uint8))
        poses = []
        for i in range(n):
            m = _look_at_world_t_cam((0.1 * i, 0.05 * i, -0.2 * i), (0.0, 0.0, 1.0))
            poses.append(np.linalg.inv(m))
        poses = jnp.asarray(np.stack(poses).astype(np.float32))
        intr = _intr4(30.0, 30.0, 16.0, 12.0)

        g_seq = make_grid(SMALL, origin_m=(-0.8, -0.8, 0.0))
        integ = make_integrator(SMALL)
        for i in range(n):
            g_seq = integ(g_seq, depths[i], colors[i], poses[i], intr)

        g_scan = make_scan_integrator(SMALL)(
            make_grid(SMALL, origin_m=(-0.8, -0.8, 0.0)), depths, colors, poses, intr
        )
        np.testing.assert_allclose(np.asarray(g_seq.tsdf), np.asarray(g_scan.tsdf), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(g_seq.weight), np.asarray(g_scan.weight))
        np.testing.assert_allclose(np.asarray(g_seq.color), np.asarray(g_scan.color), atol=1e-4)

    def test_running_average_and_weight_cap(self):
        spec = GridSpec(dims=(16, 16, 16), voxel_size_m=0.05, max_weight=3.0)
        grid = make_grid(spec, origin_m=(-0.4, -0.4, 0.0))
        integ = make_integrator(spec)
        intr = _intr4(40.0, 40.0, 16.0, 12.0)
        color = jnp.zeros((24, 32, 3), jnp.uint8)
        for d in (0.55, 0.55, 0.55, 0.65):
            grid = integ(grid, _plane_depth_mm(24, 32, d), color, jnp.eye(4), intr)
        w = np.asarray(grid.weight)
        assert w.max() <= 3.0 + 1e-6
        # Weighted running average: three 0.55 observations saturate the
        # window, the 0.65 frame pulls the crossing by 1/4 of the delta.
        tsdf = np.asarray(grid.tsdf)[8, 8, :]
        zc = (np.arange(16) + 0.5) * 0.05
        k = np.argmin(np.abs(zc - 0.575))
        expected = (3 * (0.55 - zc[k]) + (0.65 - zc[k])) / 4
        np.testing.assert_allclose(tsdf[k], expected, atol=2e-3)

    def test_color_running_mean(self):
        grid = make_grid(SMALL, origin_m=(-0.8, -0.8, 0.0))
        integ = make_integrator(SMALL)
        color = jnp.full((48, 64, 3), jnp.asarray([200, 50, 100], jnp.uint8))
        grid = integ(
            grid, _plane_depth_mm(48, 64, 1.0), color, jnp.eye(4),
            _intr4(50.0, 50.0, 32.0, 24.0),
        )
        pts, cols = extract_surface_points(grid, SMALL, max_points=4096)
        assert len(pts) > 0
        np.testing.assert_allclose(
            cols.mean(axis=0), [200, 50, 100], atol=1.0
        )

    def test_one_compilation_across_poses_and_origins(self):
        grid = make_grid(SMALL, origin_m=(-0.8, -0.8, 0.0))
        integ = make_integrator(SMALL)
        color = jnp.zeros((48, 64, 3), jnp.uint8)
        intr = _intr4(50.0, 50.0, 32.0, 24.0)
        for i in range(3):
            pose = np.eye(4)
            pose[0, 3] = 0.01 * i
            grid = grid._replace(origin=grid.origin + 0.05)
            grid = integ(grid, _plane_depth_mm(48, 64, 1.0), color, jnp.asarray(pose), intr)
        assert integ._cache_size() == 1


class TestSphere:
    SPEC = GridSpec(
        dims=(48, 48, 48), voxel_size_m=0.04, truncation_vox=4.0,
        max_integration_distance_m=5.0,
    )
    RADIUS = 0.5

    def _integrated_grid(self):
        spec = self.SPEC
        grid = make_grid(spec, origin_m=(-0.96, -0.96, -0.96))
        integ = make_integrator(spec)
        intr_np = (60.0, 60.0, 32.0, 32.0)
        intr = _intr4(*intr_np)
        color = jnp.zeros((64, 64, 3), jnp.uint8)
        for theta in np.linspace(0, 2 * np.pi, 8, endpoint=False):
            d = np.array([np.sin(theta), 0.0, np.cos(theta)])
            world_t_cam = _look_at_world_t_cam(-1.5 * d, (0, 0, 0))
            cam_t_world = np.linalg.inv(world_t_cam)
            depth = _sphere_depth_mm(64, 64, intr_np, cam_t_world, (0, 0, 0), self.RADIUS)
            grid = integ(grid, depth, color, jnp.asarray(cam_t_world, jnp.float32), intr)
        return grid

    def test_surface_points_on_sphere(self):
        grid = self._integrated_grid()
        pts, _ = extract_surface_points(grid, self.SPEC, max_points=65536)
        assert len(pts) > 200
        radii = np.linalg.norm(pts, axis=1)
        err = radii - self.RADIUS
        # Surface-band voxel centers sit within ~one voxel of the sphere.
        assert np.abs(err).max() < 1.5 * self.SPEC.voxel_size_m
        assert np.sqrt((err**2).mean()) < 0.75 * self.SPEC.voxel_size_m

    def test_mesh_vertices_on_sphere(self):
        grid = self._integrated_grid()
        mesh = extract_mesh(grid, self.SPEC, max_vertices=65536, max_quads=65536)
        assert not mesh.vertex_budget_hit
        assert len(mesh.vertices) > 200
        assert len(mesh.triangles) > 200
        # Interpolated vertices: sub-voxel accuracy.
        radii = np.linalg.norm(mesh.vertices, axis=1)
        assert np.sqrt(((radii - self.RADIUS) ** 2).mean()) < 0.4 * self.SPEC.voxel_size_m
        # Every triangle references real, distinct vertices.
        assert mesh.triangles.min() >= 0
        assert mesh.triangles.max() < len(mesh.vertices)
        assert (mesh.triangles[:, 0] != mesh.triangles[:, 1]).all()


class TestEsdf:
    def test_exact_vs_bruteforce_3d(self):
        rng = np.random.default_rng(7)
        dims, h = (12, 10, 8), 0.05
        tsdf = np.full(dims, 0.2, np.float32)
        weight = np.zeros(dims, np.float32)
        occ = rng.random(dims) < 0.05
        occ[3, 4, 5] = True  # at least one obstacle
        tsdf[occ] = -0.01
        weight[occ] = 1.0
        max_d = 10.0  # effectively unclamped
        out = np.asarray(
            esdf_from_tsdf(jnp.asarray(tsdf), jnp.asarray(weight),
                           voxel_size_m=h, max_distance_m=max_d, chunk=4)
        )
        idx = np.argwhere(occ)
        grids = np.stack(np.meshgrid(*[np.arange(n) for n in dims], indexing="ij"), -1)
        d_all = np.linalg.norm(
            (grids[..., None, :] - idx[None, None, None, :, :]) * h, axis=-1
        )
        brute = np.minimum(d_all.min(axis=-1), max_d)
        np.testing.assert_allclose(out, brute, atol=1e-4)

    def test_clamp(self):
        dims, h = (16, 4, 4), 0.1
        tsdf = np.full(dims, 0.2, np.float32)
        weight = np.zeros(dims, np.float32)
        tsdf[0, 0, 0], weight[0, 0, 0] = -0.01, 1.0
        out = np.asarray(
            esdf_from_tsdf(jnp.asarray(tsdf), jnp.asarray(weight),
                           voxel_size_m=h, max_distance_m=0.35)
        )
        assert out.max() <= 0.35 + 1e-6
        assert out[0, 0, 0] == 0.0
        np.testing.assert_allclose(out[3, 0, 0], 0.3, atol=1e-5)

    def test_slice_2d_vs_bruteforce(self):
        rng = np.random.default_rng(3)
        dims, h = (20, 18, 12), 0.05
        tsdf = np.full(dims, 0.2, np.float32)
        weight = np.ones(dims, np.float32)
        occ = rng.random(dims) < 0.04
        occ[5, 5, 4] = True
        tsdf[occ] = -0.01
        dist, occupied, observed = (
            np.asarray(a)
            for a in esdf_slice_2d(
                jnp.asarray(tsdf), jnp.asarray(weight), voxel_size_m=h,
                z_lo_vox=2, z_hi_vox=8, max_distance_m=10.0,
            )
        )
        occ2d = occ[:, :, 2:8].any(axis=2)
        np.testing.assert_array_equal(occupied, occ2d)
        assert observed.all()
        idx = np.argwhere(occ2d)
        gx, gy = np.meshgrid(np.arange(dims[0]), np.arange(dims[1]), indexing="ij")
        brute = np.min(
            np.sqrt((gx[..., None] - idx[:, 0]) ** 2 + (gy[..., None] - idx[:, 1]) ** 2) * h,
            axis=-1,
        )
        np.testing.assert_allclose(dist, brute, atol=1e-4)


class TestRecenter:
    def test_content_keeps_world_position(self):
        grid = make_grid(SMALL, origin_m=(-0.8, -0.8, 0.0))
        integ = make_integrator(SMALL)
        color = jnp.zeros((48, 64, 3), jnp.uint8)
        grid = integ(
            grid, _plane_depth_mm(48, 64, 1.0), color, jnp.eye(4),
            _intr4(50.0, 50.0, 32.0, 24.0),
        )
        pts_before, _ = extract_surface_points(grid, SMALL, max_points=65536)
        recenter = make_recenter(SMALL)
        shift = jnp.asarray([3, -2, 4], jnp.int32)
        grid2 = recenter(grid, shift)
        np.testing.assert_allclose(
            np.asarray(grid2.origin),
            np.asarray(grid.origin) + np.array([3, -2, 4]) * 0.05,
            atol=1e-6,
        )
        pts_after, _ = extract_surface_points(grid2, SMALL, max_points=65536)
        # Surviving surface voxels are the same world points (those that
        # rolled out of the +x/-y/+z faces are gone).
        kept = set(map(tuple, np.round(pts_after / 0.025).astype(int).tolist()))
        allpts = set(map(tuple, np.round(pts_before / 0.025).astype(int).tolist()))
        assert kept <= allpts
        assert len(kept) > 0.3 * len(allpts)
        # Revealed region is unobserved.
        w2 = np.asarray(grid2.weight)
        assert (w2[-3:, :, :] == 0).all()
        assert (w2[:, :2, :] == 0).all()
        assert (w2[:, :, -4:] == 0).all()


class TestNoColorMode:
    def test_integrate_without_color(self):
        spec = GridSpec(dims=(16, 16, 16), voxel_size_m=0.05, integrate_color=False)
        grid = make_grid(spec, origin_m=(-0.4, -0.4, 0.0))
        integ = make_integrator(spec)
        # 0.49 m keeps the surface off the exact voxel-center midpoint
        # (where |tsdf| == half a voxel, the open band boundary).
        grid = integ(
            grid, _plane_depth_mm(24, 32, 0.49), jnp.zeros((0,), jnp.uint8),
            jnp.eye(4), _intr4(40.0, 40.0, 16.0, 12.0),
        )
        assert np.asarray(grid.weight).max() > 0
        pts, cols = extract_surface_points(grid, spec, max_points=1024)
        assert len(pts) > 0
        assert (cols == 0).all()
        mesh = extract_mesh(grid, spec, max_vertices=4096, max_quads=4096)
        assert len(mesh.vertices) > 0


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-v"])


class TestDecay:
    def test_weights_shrink_and_voxels_expire(self):
        from thor_slam_tpu.mapping import make_decay

        spec = GridSpec(dims=(16, 16, 16), voxel_size_m=0.05, max_weight=4.0)
        grid = make_grid(spec, origin_m=(-0.4, -0.4, 0.0))
        integ = make_integrator(spec)
        intr = _intr4(40.0, 40.0, 16.0, 12.0)
        color = jnp.zeros((24, 32, 3), jnp.uint8)
        grid = integ(grid, _plane_depth_mm(24, 32, 0.49), color, jnp.eye(4), intr)
        w0 = np.asarray(grid.weight)
        decay = make_decay(spec, min_weight=0.5)
        grid = decay(grid, jnp.float32(0.9))
        np.testing.assert_allclose(np.asarray(grid.weight)[w0 > 0], 0.9 * w0[w0 > 0])
        # Decay to below min_weight: everything reverts to unobserved.
        for _ in range(10):
            grid = decay(grid, jnp.float32(0.5))
        assert (np.asarray(grid.weight) == 0).all()
        np.testing.assert_allclose(np.asarray(grid.tsdf), spec.truncation_m)


class TestSaveLoad:
    def test_grid_round_trip(self, tmp_path):
        from thor_slam_tpu.mapping import load_grid, save_grid

        spec = GridSpec(dims=(16, 16, 16), voxel_size_m=0.07, truncation_vox=3.0)
        grid = make_grid(spec, origin_m=(-0.5, -0.5, 0.0))
        integ = make_integrator(spec)
        grid = integ(
            grid, _plane_depth_mm(24, 32, 0.49),
            jnp.full((24, 32, 3), 77, jnp.uint8), jnp.eye(4),
            _intr4(40.0, 40.0, 16.0, 12.0),
        )
        save_grid(tmp_path / "map.npz", grid, spec)
        grid2, spec2 = load_grid(tmp_path / "map.npz")
        assert spec2 == spec
        np.testing.assert_array_equal(np.asarray(grid2.tsdf), np.asarray(grid.tsdf))
        np.testing.assert_array_equal(np.asarray(grid2.weight), np.asarray(grid.weight))
        np.testing.assert_array_equal(np.asarray(grid2.color), np.asarray(grid.color))
        np.testing.assert_array_equal(np.asarray(grid2.origin), np.asarray(grid.origin))

    def test_mapper_save_load_and_ply(self, tmp_path):
        from thor_slam_tpu.pipeline.mapper import DenseMapper, MapperConfig
        from thor_slam_tpu.pipeline.rgbd import RGBDFrame
        from thor_slam_tpu.camera.types import Intrinsics

        cfg = MapperConfig(voxel_size_m=0.05, dims=(32, 32, 32), recenter_margin_m=0.0)
        mapper = DenseMapper(cfg)
        k = np.array([[50.0, 0, 32.0], [0, 50.0, 24.0], [0, 0, 1.0]])
        frame = RGBDFrame(
            rgb=np.full((48, 64, 3), (200, 40, 90), np.uint8),
            depth_mm=np.full((48, 64), 520, np.uint16),
            intrinsics=Intrinsics(width=64, height=48, matrix=k, coeffs=np.zeros(5)),
            timestamp=0.0,
            camera_name="cam0",
        )
        mapper.integrate(frame, np.eye(4))
        mapper.save(tmp_path / "dense.npz")

        fresh = DenseMapper(MapperConfig(dims=(8, 8, 8)))  # different geometry
        fresh.load(tmp_path / "dense.npz")
        assert fresh.spec.dims == (32, 32, 32)  # spec rides the file
        pts, _ = fresh.surface_cloud()
        assert len(pts) > 0
        # Loaded maps accept further integration (integrators rebuilt).
        fresh.integrate(frame, np.eye(4))

        mesh = fresh.mesh(max_vertices=4096, max_quads=4096)
        mesh.save_ply(tmp_path / "mesh.ply")
        raw = (tmp_path / "mesh.ply").read_bytes()
        header, blob = raw.split(b"end_header\n", 1)
        assert f"element vertex {len(mesh.vertices)}".encode() in header
        assert f"element face {len(mesh.triangles)}".encode() in header
        assert len(blob) == len(mesh.vertices) * 15 + len(mesh.triangles) * 13
        # First vertex record round-trips.
        v0 = np.frombuffer(blob[:12], np.float32)
        np.testing.assert_allclose(v0, mesh.vertices[0], rtol=1e-6)

    def test_save_before_integrate_raises(self, tmp_path):
        from thor_slam_tpu.pipeline.mapper import DenseMapper, MapperConfig

        with pytest.raises(RuntimeError, match="nothing integrated"):
            DenseMapper(MapperConfig(dims=(8, 8, 8))).save(tmp_path / "x.npz")
