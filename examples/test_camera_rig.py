"""Rig synchronization smoke test (reference examples/test_camera_rig.py role).

Runs hardware-free on the synthetic rig by default; pass --euroc <dir> to
replay a dataset. Reports per-camera FPS and sync-delta statistics.

Usage: python -m examples.test_camera_rig [--cameras 4] [--frames 60]
       python -m examples.test_camera_rig --interactive   # pick a resolution
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--cameras", type=int, default=4)
    parser.add_argument("--frames", type=int, default=60)
    parser.add_argument("--jitter-ms", type=float, default=3.0)
    parser.add_argument("--euroc", default=None, help="EuRoC sequence dir")
    parser.add_argument(
        "--interactive", action="store_true",
        help="Prompt for a stream resolution (the reference's negotiation UX)",
    )
    args = parser.parse_args()

    from thor_slam_tpu.camera.rig import CameraRig

    # Resolution negotiation: the reference probes each camera's supported
    # configs and prompts for a common choice (reference
    # examples/test_camera_rig.py:182-245). The synthetic rig supports any
    # size; offer the OAK-typical menu.
    width, height = 320, 200
    if args.interactive:
        from thor_slam_tpu.camera.utils import prompt_for_resolution

        choice = prompt_for_resolution(
            [(640, 400), (1280, 720), (1280, 800), (320, 200)],
            prompt="Common resolutions supported by every source",
        )
        if choice is None:
            print("aborted")
            return 1
        width, height = choice

    if args.euroc:
        from thor_slam_tpu.camera.sources.dataset import EurocCameraSource

        sources = [EurocCameraSource(args.euroc)]
        rig_ext = None
    else:
        from thor_slam_tpu.camera.sources.synthetic import SyntheticRigSpec, make_synthetic_rig

        spec = SyntheticRigSpec(num_sources=args.cameras, width=width, height=height)
        sources, rig_ext, _, _ = make_synthetic_rig(
            spec,
            clock_offsets=tuple(0.002 * i for i in range(args.cameras)),
            jitter_std=args.jitter_ms / 1000.0,
        )

    deltas, t0 = [], time.monotonic()
    with CameraRig(sources, rig_extrinsics=rig_ext) as rig:
        for i in range(args.frames):
            sync = rig.get_synchronized_frames()
            if sync is None:
                continue
            deltas.append(sync.max_time_delta * 1000.0)
            if i % 20 == 0:
                depths = rig.get_queue_depths()
                print(f"frame {i:3d}: max_dt={deltas[-1]:6.2f} ms  queues={depths}")
    elapsed = time.monotonic() - t0
    d = np.asarray(deltas)
    print(
        f"\n{len(d)} synchronized sets in {elapsed:.2f}s "
        f"({len(d) / elapsed:.1f} sets/s)\n"
        f"sync delta: mean={d.mean():.2f} ms  p50={np.percentile(d, 50):.2f}  "
        f"p95={np.percentile(d, 95):.2f}  max={d.max():.2f}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
