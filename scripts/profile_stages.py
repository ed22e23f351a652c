"""Stage-by-stage TPU timing of the tracker pipeline.

Usage: python -m scripts.profile_stages [WIDTHxHEIGHT] [num_cams]
Times each stage jitted in isolation (10 reps after warm-up) to locate
bottlenecks. Not part of the test suite.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_fn(name, fn, *args, reps=10):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn_j(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1000.0
    print(f"{name:28s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    res = sys.argv[1] if len(sys.argv) > 1 else "640x400"
    w, h = (int(v) for v in res.split("x"))
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n = 512

    from thor_slam_tpu.engine import tracker as trk
    from thor_slam_tpu.ops import brief, calib, fast, klt, match
    from thor_slam_tpu.ops import stereo as stereo_ops
    from thor_slam_tpu.ops.image import downsample2, gaussian_blur
    from thor_slam_tpu.utils.flagship import flagship_rig

    params, setup, *_ = flagship_rig(num_cams=c, width=w, height=h, max_keypoints=n)
    setup = trk.CameraSetup(*(jnp.asarray(v) for v in setup))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (c, 2, h, w)).astype(np.float32))
    img1 = images[:, 0]
    print(f"profile {c} cams @ {w}x{h}, N={n}  device={jax.devices()[0]}", flush=True)

    total = 0.0
    total += bench_fn(
        "gaussian blur (2C)",
        lambda a: (jax.vmap(lambda x: gaussian_blur(x, 2.0, radius=4))(a),
                   jax.vmap(lambda x: gaussian_blur(x, 2.0, radius=4))(a)),
        img1,
    )
    total += bench_fn(
        "FAST detect (2C)",
        lambda a: (
            jax.vmap(lambda x: fast.detect_keypoints(x, max_keypoints=n))(a),
            jax.vmap(lambda x: fast.detect_keypoints(x, max_keypoints=n))(a),
        ),
        img1,
    )
    kp = jax.vmap(lambda x: fast.detect_keypoints(x, max_keypoints=n))(img1)
    total += bench_fn(
        "BRIEF describe (2C, MXU)",
        lambda a, xy, v: (
            jax.vmap(lambda i, x, m: brief.compute_descriptors(i, x, m, oriented=False))(a, xy, v),
            jax.vmap(lambda i, x, m: brief.compute_descriptors(i, x, m, oriented=False))(a, xy, v),
        ),
        img1, kp.xy, kp.valid,
    )
    desc = jax.vmap(lambda i, x, m: brief.compute_descriptors(i, x, m, oriented=False))(
        img1, kp.xy, kp.valid
    )
    total += bench_fn(
        "coord rectify (2C)",
        lambda xy: (
            jax.vmap(calib.raw_pixels_to_rect)(xy, setup.k_left, setup.dist_left, setup.rect_left, setup.k_rect),
            jax.vmap(calib.raw_pixels_to_rect)(xy, setup.k_right, setup.dist_right, setup.rect_right, setup.k_rect),
        ),
        kp.xy,
    )
    total += bench_fn(
        "match (stereo, gated)",
        lambda d, v: jax.vmap(
            lambda da, va, db, vb: match.match_descriptors(da, va, db, vb)
        )(d, v, d, v),
        desc.bits, desc.valid,
    )
    total += bench_fn(
        "disparity refine",
        lambda l, r, xy: jax.vmap(stereo_ops.refine_disparity_photometric)(
            l, r, xy, jnp.ones((c, n)) * 5.0, jnp.ones((c, n), bool)
        ),
        img1, img1, kp.xy,
    )
    pyr1 = jax.vmap(downsample2)(img1)
    pyr2 = jax.vmap(downsample2)(pyr1)
    total += bench_fn(
        "KLT track (MXU windows)",
        lambda p0, p1, p2, pts: jax.vmap(
            lambda a, b, cc, xy: klt.track_points((a, b, cc), (a, b, cc), xy, xy, jnp.ones(n, bool))
        )(p0, p1, p2, pts),
        img1, pyr1, pyr2, kp.xy,
    )
    from thor_slam_tpu.engine import pnp

    pts3 = jnp.asarray(rng.uniform(-3, 3, (c * n, 3)).astype(np.float32))
    obs = jnp.asarray(rng.uniform(-0.4, 0.4, (c * n, 2)).astype(np.float32))
    rot = jnp.tile(jnp.eye(3)[None], (c * n, 1, 1))
    tr = jnp.zeros((c * n, 3))
    total += bench_fn(
        "RANSAC PnP (24 hyp)",
        lambda a, b: pnp.ransac_pnp(
            jax.random.PRNGKey(0), a, b, jnp.ones(c * n, bool), rot, tr, jnp.eye(4)
        ),
        pts3, obs,
    )
    print(f"{'SUM of stages':28s} {total:8.2f} ms", flush=True)

    step = trk.make_track_step(params, setup)
    state = trk.init_state(params)
    state, out = step(state, images)
    jax.block_until_ready(out.world_t_body)
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        state, out = step(state, images)
    jax.block_until_ready(out.world_t_body)
    ms = (time.perf_counter() - t0) / reps * 1000.0
    print(f"{'FULL track_step':28s} {ms:8.2f} ms  ({1000.0 / ms:.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
