"""Front-end kernels on REAL photographic texture (not our renderer).

Every other accuracy test renders its inputs with
``camera/sources/synthetic.py`` — the package's own code. These tests run
the kernel stack on checked-in assets derived from a real photograph and
a real-world terrain model (``tests/assets/real/``, see ``generate.py``
there for provenance): real texture statistics, real sensor noise, and a
view synthesis performed by scipy — independent of every op under test.

Real EuRoC remains the reference accuracy target (BASELINE.md); it is not
fetchable in this sandbox (zero egress), so this is the closest available
break of the renderer circularity.
"""

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from thor_slam_tpu.ops import brief, fast, klt, match
from thor_slam_tpu.ops import stereo as stereo_ops
from thor_slam_tpu.ops.image import downsample2, gaussian_blur

ASSETS = Path(__file__).parent / "assets" / "real"


@pytest.fixture(scope="module")
def real():
    from PIL import Image

    def load(name):
        return np.asarray(Image.open(ASSETS / f"{name}.png"), np.float32) / 255.0

    meta = json.loads((ASSETS / "meta.json").read_text())
    return {
        "left": load("left"),
        "right": load("right"),
        "frame1_left": load("frame1_left"),
        "frame1_right": load("frame1_right"),
        "disp_gt": np.load(ASSETS / "disparity_gt.npy"),
        "meta": meta,
    }


def detect(img, max_keypoints=256):
    return fast.detect_keypoints(
        jnp.asarray(img), threshold=0.05, max_keypoints=max_keypoints,
        cell_size=32, per_cell=8, border_margin=20,
    )


def shift_of(real, view):
    """Per-pixel GT x-shift field left -> view (lateral warp geometry)."""
    m = real["meta"]
    off = {"right": m["baseline_m"], "frame1_left": -m["motion_x_m"],
           "frame1_right": m["baseline_m"] - m["motion_x_m"]}[view]
    return real["disp_gt"] * (off / m["baseline_m"])


def gt_position(real, xy, view):
    """Map left-image keypoints into ``view`` via the known warp.

    The warp is defined on the DESTINATION grid (dest(x) = left(x + s(x))),
    so the forward map solves x_dst + s(x_dst) = x_src — one fixed-point
    iteration suffices for the smooth shift fields used here.
    """
    s = shift_of(real, view)
    h, w = s.shape
    x_dst = xy[:, 0].copy()
    for _ in range(8):
        xi = np.clip(x_dst, 0, w - 1.001)
        yi = np.clip(xy[:, 1], 0, h - 1.001)
        sv = _bilinear(s, xi, yi)
        x_dst = xy[:, 0] - sv
    return np.stack([x_dst, xy[:, 1]], -1)


def _bilinear(field, x, y):
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    x1 = np.minimum(x0 + 1, field.shape[1] - 1)
    y1 = np.minimum(y0 + 1, field.shape[0] - 1)
    fx, fy = x - x0, y - y0
    return (
        field[y0, x0] * (1 - fx) * (1 - fy)
        + field[y0, x1] * fx * (1 - fy)
        + field[y1, x0] * (1 - fx) * fy
        + field[y1, x1] * fx * fy
    )


class TestFASTOnRealTexture:
    def test_detects_a_full_budget(self, real):
        kp = detect(real["left"])
        assert int(kp.valid.sum()) > 180  # photographic texture is feature-rich

    def test_repeatability_across_views(self, real):
        """Corners detected in the left view should re-detect near their
        warped position in the frame-1 view (real-texture repeatability)."""
        kp0 = detect(real["left"])
        kp1 = detect(real["frame1_left"])
        xy0 = np.asarray(kp0.xy)[np.asarray(kp0.valid)]
        xy1 = np.asarray(kp1.xy)[np.asarray(kp1.valid)]
        expected = gt_position(real, xy0, "frame1_left")
        d = np.linalg.norm(expected[:, None, :] - xy1[None, :, :], axis=-1).min(axis=1)
        repeat = np.mean(d <= 1.5)
        assert repeat > 0.55, f"FAST repeatability {repeat:.2f} on real texture"


class TestBRIEFOnRealTexture:
    def test_match_precision_across_views(self, real):
        """Ratio-test survivors across the two frames must overwhelmingly
        agree with the known warp (descriptor precision on real texture)."""
        im0 = jnp.asarray(real["left"])
        im1 = jnp.asarray(real["frame1_left"])
        kp0, kp1 = detect(im0), detect(im1)
        d0 = brief.compute_descriptors(gaussian_blur(im0, 2.0, radius=4), kp0.xy, kp0.valid)
        d1 = brief.compute_descriptors(gaussian_blur(im1, 2.0, radius=4), kp1.xy, kp1.valid)
        m = match.match_descriptors(d0.bits, d0.valid, d1.bits, d1.valid,
                                    max_distance=64.0, ratio=0.9)
        sel = np.asarray(m.valid)
        assert sel.sum() > 60, "too few ratio-test matches on real texture"
        xy0 = np.asarray(kp0.xy)[sel]
        matched = np.asarray(kp1.xy)[np.asarray(m.idx)[sel]]
        expected = gt_position(real, xy0, "frame1_left")
        err = np.linalg.norm(matched - expected, axis=-1)
        precision = np.mean(err <= 2.0)
        assert precision > 0.85, f"BRIEF match precision {precision:.2f}"


class TestKLTOnRealTexture:
    def test_subpixel_convergence(self, real):
        """KLT must converge to sub-pixel accuracy across the real-texture
        frame pair when initialized a few pixels off."""
        prev = jnp.asarray(real["left"])
        cur = jnp.asarray(real["frame1_left"])
        prev_pyr = (prev, downsample2(prev), downsample2(downsample2(prev)))
        cur_pyr = (cur, downsample2(cur), downsample2(downsample2(cur)))
        kp = detect(real["left"], max_keypoints=128)
        xy0 = np.asarray(kp.xy)
        valid0 = np.asarray(kp.valid)
        expected = gt_position(real, xy0, "frame1_left")
        rng = np.random.default_rng(0)
        init = expected + rng.uniform(-2.5, 2.5, expected.shape)
        res = klt.track_points(
            prev_pyr, cur_pyr, jnp.asarray(xy0), jnp.asarray(init, jnp.float32),
            jnp.asarray(valid0), num_levels=2, radius=4, iters=4,
        )
        ok = np.asarray(res.valid)
        assert ok.sum() > 50
        err = np.linalg.norm(np.asarray(res.xy)[ok] - expected[ok], axis=-1)
        assert np.median(err) < 0.35, f"KLT median error {np.median(err):.3f} px"
        assert np.mean(err < 1.0) > 0.85


class TestSGMOnRealTexture:
    def test_dense_disparity_matches_dem(self, real):
        """Dense SGM on the real-texture pair must recover the DEM-derived
        disparity field (depth plausibility on photographic texture)."""
        disp, valid = stereo_ops.sgm_disparity(
            jnp.asarray(real["left"]), jnp.asarray(real["right"]),
            num_disparities=48,
        )
        disp = np.asarray(disp)
        valid = np.asarray(valid)
        # The stored GT field is defined on the RIGHT grid (the warp's
        # destination); SGM reports on the LEFT grid. Map it across:
        # d_left(x) solves d = gt(x - d) (fixed point; smooth field).
        gt_r = real["disp_gt"]
        h, w = gt_r.shape
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        gt = gt_r.astype(np.float64)
        for _ in range(8):
            gt = _bilinear(gt_r, np.clip(xx - gt, 0, w - 1.001), yy)
        # Interior crop: SGM borders and warp boundary are undefined.
        sl = (slice(24, -24), slice(40, -24))
        v = valid[sl]
        err = np.abs(disp[sl] - gt[sl])[v]
        assert v.mean() > 0.5, f"SGM validity {v.mean():.2f} too low"
        assert np.median(err) < 1.0, f"SGM median |err| {np.median(err):.2f} px"
        assert np.mean(err < 2.0) > 0.8


@pytest.mark.slow
class TestVOSanityOnRealTexture:
    def test_two_frame_translation_direction_and_scale(self, real):
        """A 2-tick VO run on the real-texture rig must recover the known
        lateral camera motion to within 20% magnitude and ~15 degrees."""
        from thor_slam_tpu.engine import tracker as trk
        from thor_slam_tpu.engine.setup import build_camera_setup
        from thor_slam_tpu.camera.rig import RigCalibration
        from thor_slam_tpu.camera.types import Extrinsics, Intrinsics

        m = real["meta"]
        w, h = m["width"], m["height"]
        fx = m["fx"]
        k = np.array([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1.0]])
        intr = [Intrinsics(width=w, height=h, matrix=k, coeffs=np.zeros(5))
                for _ in range(2)]
        left_ext = Extrinsics.identity()
        right_ext = Extrinsics.identity()
        right_ext.translation = np.array([m["baseline_m"], 0.0, 0.0])
        calibration = RigCalibration(
            intrinsics={"real": intr},
            extrinsics={"real": [left_ext, right_ext]},
            rig_extrinsics={"real": Extrinsics.identity()},
            source_names=["real"],
        )
        setup, _, hh, ww = build_camera_setup(calibration)
        params = trk.TrackerParams(num_cams=1, height=hh, width=ww, max_keypoints=256)
        step = trk.make_track_step(params, setup)
        state = trk.init_state(params)
        f0 = jnp.asarray(np.stack([real["left"], real["right"]])[None])
        f1 = jnp.asarray(np.stack([real["frame1_left"], real["frame1_right"]])[None])
        state, _ = step(state, f0)
        state, out = step(state, f1)
        assert int(out.num_inliers) >= params.min_track_inliers
        t_est = np.asarray(out.world_t_body)[:3, 3]
        # frame1 renders the camera displaced by -motion_x along +x (see
        # generate.py): the body's world position after the tick.
        t_true = np.array([-m["motion_x_m"], 0.0, 0.0])
        assert np.linalg.norm(t_est - t_true) < 0.2 * np.linalg.norm(t_true) + 0.004, (
            f"VO motion {t_est} vs true {t_true}"
        )


class TestDenseMappingOnRealTexture:
    def test_tsdf_surface_matches_dem_depth(self, real):
        """SGM depth from the real pair, fused into the TSDF grid, must
        reproduce the DEM-derived depth surface: every extracted surface
        point reprojects onto the GT depth map within a voxel or two.

        This is the full dense-mapping chain (the nvblox role) on
        photographic texture — no synthetic renderer anywhere.
        """
        from thor_slam_tpu.mapping import (
            GridSpec, extract_surface_points, make_grid, make_integrator,
        )
        from thor_slam_tpu.ops import stereo as stereo_ops

        m = real["meta"]
        fx, b = m["fx"], m["baseline_m"]
        h, w = real["left"].shape
        disp, valid = stereo_ops.sgm_disparity(
            jnp.asarray(real["left"]), jnp.asarray(real["right"]),
            num_disparities=48,
        )
        depth = np.where(
            np.asarray(valid) & (np.asarray(disp) > 1.0),
            fx * b / np.maximum(np.asarray(disp), 1.0),
            0.0,
        )
        depth_mm = jnp.asarray(np.round(depth * 1000).astype(np.uint16))
        gray = np.clip(real["left"] * 255, 0, 255).astype(np.uint8)
        color = jnp.asarray(np.repeat(gray[..., None], 3, axis=-1))

        # Depth spans ~1.3-4.4 m (disparity 8-28 at fx*b = 35.2).
        spec = GridSpec(dims=(96, 64, 96), voxel_size_m=0.06,
                        max_integration_distance_m=5.0)
        grid = make_grid(spec, origin_m=(-2.88, -1.92, 0.0))
        integ = make_integrator(spec)
        intr4 = jnp.asarray([fx, fx, w / 2, h / 2], jnp.float32)
        grid = integ(grid, depth_mm, color, jnp.eye(4), intr4)

        pts, cols = extract_surface_points(grid, spec, max_points=131072)
        assert len(pts) > 500
        # Reproject each surface point; compare to GT depth (left grid:
        # the same fixed-point mapping as TestSGMOnRealTexture).
        gt_r = real["disp_gt"].astype(np.float64)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        gt = gt_r
        for _ in range(8):
            gt = _bilinear(gt_r, np.clip(xx - gt, 0, w - 1.001), yy)
        z_gt_map = fx * b / np.maximum(gt, 1e-6)
        u = np.clip(np.round(fx * pts[:, 0] / pts[:, 2] + w / 2).astype(int), 0, w - 1)
        v = np.clip(np.round(fx * pts[:, 1] / pts[:, 2] + h / 2).astype(int), 0, h - 1)
        interior = (u > 40) & (u < w - 24) & (v > 24) & (v < h - 24)
        dz = pts[interior, 2] - z_gt_map[v[interior], u[interior]]
        assert np.median(np.abs(dz)) < 1.5 * spec.voxel_size_m, (
            f"median surface depth error {np.median(np.abs(dz)):.3f} m"
        )
        assert np.mean(np.abs(dz) < 3 * spec.voxel_size_m) > 0.8
        # Colors carry the photograph's luminance, not renderer texture.
        assert cols[:, 0].std() > 10
