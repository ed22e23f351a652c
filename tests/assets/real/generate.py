"""Generate the real-texture stereo test assets (provenance + method).

Why these exist: every other accuracy artifact in this repo is rendered by
``camera/sources/synthetic.py`` — the same package under test. These
assets break that circularity for the kernel stack (FAST/BRIEF/KLT/SGM):
the *texture and noise statistics are a real photograph* and the *depth
structure is a real-world terrain model*; only the view synthesis is a
warp, and that warp is scipy's ``map_coordinates`` — fully independent of
the package's renderer and ops.

Sources (both shipped with matplotlib, redistributable sample data):
* ``grace_hopper.jpg`` — a real photograph (official US Navy portrait of
  RADM Grace Hopper; US government work, public domain).
* ``jacksboro_fault_dem.npz`` — a real digital elevation model of the
  Jacksboro fault area (USGS-derived sample DEM).

Method: the photo (grayscale, cropped to 384x288) is treated as the LEFT
view of a fronto-textured 2.5D surface whose inverse depth comes from the
DEM (smoothed, scaled to ~4-16 m at fx=320 px, baseline 0.11 m). Any
laterally displaced camera at offset ``o`` from the left camera sees
``view(x, y) = left(x + d(x, y) * o / b, y)`` where ``d`` is the stereo
disparity field — so stereo pairs AND small lateral ego-motion sequences
render from one parametric warp with exact ground truth. Disparity is
defined on the destination grid (valid for the smooth DEM used here;
occlusion-free by construction).

Run from the repo root: ``python tests/assets/real/generate.py``.
Outputs (committed): left.png, right.png, frame1_left.png,
frame1_right.png, disparity_gt.npy, meta.json.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

HERE = Path(__file__).parent

# Geometry of the synthesized rig (pixels / meters).
FX = 320.0
BASELINE_M = 0.11
MOTION_X_M = 0.022  # frame-1 lateral camera offset (1/5 baseline)
W, H = 384, 288
DISP_MIN, DISP_MAX = 8.0, 28.0  # disparity range at fx*b/z for z in ~[4.4, 15.8] m


def load_photo() -> np.ndarray:
    import matplotlib

    path = Path(matplotlib.get_data_path()) / "sample_data" / "grace_hopper.jpg"
    from PIL import Image

    img = np.asarray(Image.open(path).convert("L"), np.float64)
    # Center crop to W x H (photo is 512x600).
    y0 = (img.shape[0] - H) // 2
    x0 = (img.shape[1] - W) // 2
    return img[y0 : y0 + H, x0 : x0 + W]


def load_dem_disparity() -> np.ndarray:
    import matplotlib
    from scipy.ndimage import gaussian_filter, zoom

    path = Path(matplotlib.get_data_path()) / "sample_data" / "jacksboro_fault_dem.npz"
    dem = np.load(path)["elevation"].astype(np.float64)
    dem = zoom(dem, (H / dem.shape[0], W / dem.shape[1]), order=1)
    dem = gaussian_filter(dem, 6.0)  # smooth: keeps the warp occlusion-free
    lo, hi = dem.min(), dem.max()
    # Higher terrain = closer = larger disparity.
    return DISP_MIN + (dem - lo) / (hi - lo) * (DISP_MAX - DISP_MIN)


def warp_lateral(left: np.ndarray, disparity: np.ndarray, offset_m: float) -> np.ndarray:
    """View from a camera displaced ``offset_m`` along +x (left-cam frame)."""
    from scipy.ndimage import map_coordinates

    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    shift = disparity * (offset_m / BASELINE_M)
    return map_coordinates(left, [yy, xx + shift], order=3, mode="nearest")


def main() -> None:
    left = load_photo()
    disp = load_dem_disparity()
    views = {
        "left": left,
        "right": warp_lateral(left, disp, BASELINE_M),
        "frame1_left": warp_lateral(left, disp, -MOTION_X_M),
        "frame1_right": warp_lateral(left, disp, BASELINE_M - MOTION_X_M),
    }
    from PIL import Image

    for name, img in views.items():
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(HERE / f"{name}.png")
    np.save(HERE / "disparity_gt.npy", disp.astype(np.float32))
    (HERE / "meta.json").write_text(
        json.dumps(
            {
                "fx": FX,
                "baseline_m": BASELINE_M,
                "motion_x_m": MOTION_X_M,
                "width": W,
                "height": H,
                "disparity_range": [DISP_MIN, DISP_MAX],
                "texture": "matplotlib grace_hopper.jpg (US Navy photo, public domain)",
                "depth": "matplotlib jacksboro_fault_dem.npz (USGS-derived DEM)",
                "warp": "scipy.ndimage.map_coordinates (independent of thor_slam_tpu)",
            },
            indent=2,
        )
    )
    print("wrote", sorted(p.name for p in HERE.glob("*.png")))


if __name__ == "__main__":
    main()
