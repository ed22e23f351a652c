"""Host->device transfer pipelining.

The reference's equivalent is the camera ASIC dataflow + XLink queues
(SURVEY.md §2.4): the host only drains output queues. Here the host stages
each rig tick as ONE dense array and ships it while the previous tick is
still being tracked — `jax.device_put` is asynchronous, and a one-slot
pipeline keeps staging (numpy stacking, uint8->float conversion) off the
critical path.
"""

from __future__ import annotations

from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, Callable

import jax
import numpy as np


class DoubleBufferedUploader:
    """Overlap host staging + upload of tick T+1 with compute of tick T.

    Usage::

        up = DoubleBufferedUploader(stage_fn=lambda fs: stack(fs))
        up.submit(frame_set_0)
        while running:
            up.submit(frame_set_k)        # starts staging/upload of tick k
            images = up.get()              # device array of tick k-1
            state, out = step(state, images)
    """

    def __init__(self, stage_fn: Callable[[Any], np.ndarray], device=None) -> None:
        self._stage_fn = stage_fn
        self._device = device or jax.devices()[0]
        self._pool = ThreadPoolExecutor(max_workers=1, thread_name_prefix="uploader")
        self._pending: Future | None = None

    def _stage_and_put(self, item: Any):
        # uint8 ships as-is: the consumer normalizes on device (4x smaller
        # transfer and no multi-MB host float conversion).
        return jax.device_put(self._stage_fn(item), self._device)

    def submit(self, item: Any) -> None:
        """Queue the next tick for staging + upload (non-blocking)."""
        if self._pending is not None and not self._pending.done():
            # The consumer is behind; finish the in-flight upload first.
            self._pending.result()
        self._pending = self._pool.submit(self._stage_and_put, item)

    def get(self):
        """The device array for the most recently submitted tick."""
        if self._pending is None:
            raise RuntimeError("submit() must be called before get()")
        return self._pending.result()

    def close(self) -> None:
        self._pool.shutdown(wait=False, cancel_futures=True)
