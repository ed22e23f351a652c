"""Headline benchmark: tracked FPS of the 4x stereo rig on one TPU chip.

Target (BASELINE.md / BASELINE.json): >= 60 FPS tracking of a 4x720p stereo
rig per chip — ``vs_baseline`` is measured FPS / 60. Prints exactly one
JSON line.

The timed region is the fused VO tick only (images pre-staged on device),
matching how the reference measures its loop FPS (run_slam.py:324-328 times
processing, not camera acquisition). Synthetic 720p frames are ray-cast on
the accelerator before timing starts.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    width = int(os.environ.get("BENCH_WIDTH", "1280"))
    height = int(os.environ.get("BENCH_HEIGHT", "720"))
    num_cams = int(os.environ.get("BENCH_CAMS", "4"))
    warmup = int(os.environ.get("BENCH_WARMUP", "5"))
    frames = int(os.environ.get("BENCH_FRAMES", "60"))
    seq_len = int(os.environ.get("BENCH_SEQ", "12"))

    import jax
    from thor_slam_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from thor_slam_tpu.engine import tracker as trk
    from thor_slam_tpu.utils.flagship import flagship_rig, render_sequence

    params, setup, _, sources, _, _ = flagship_rig(
        num_cams=num_cams, width=width, height=height, max_keypoints=256
    )
    step = trk.make_track_step(params, setup)
    state = trk.init_state(params)

    # Pre-render a short synthetic sequence on-device (not timed).
    seq = render_sequence(sources, seq_len, xp=jnp)  # (T, C, 2, H, W)
    seq = jax.block_until_ready(seq.astype(jnp.float32))

    # Warm-up: compile + a few steps.
    for i in range(warmup):
        state, out = step(state, seq[i % seq_len])
    jax.block_until_ready(out.world_t_body)

    t0 = time.perf_counter()
    for i in range(frames):
        state, out = step(state, seq[i % seq_len])
    jax.block_until_ready(out.world_t_body)
    elapsed = time.perf_counter() - t0

    fps = frames / elapsed
    result = {
        "metric": f"{num_cams}x{width}x{height}-stereo tracked FPS/chip",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 3),
        "num_inliers_last": int(out.num_inliers),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
