"""Test configuration: virtual 8-device CPU mesh, deterministic seeding.

Must set platform env vars before anything imports jax (tests exercise
multi-chip sharding on a virtual CPU mesh; real-TPU benchmarks live in
bench.py, not the test suite).
"""

import os
import random

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pytest


@pytest.fixture(autouse=True)
def _seed_everything():
    random.seed(1337)
    import numpy as np

    np.random.seed(1337)
    yield


def pytest_collection_modifyitems(items):
    """Run slow-marked tests last."""
    items.sort(key=lambda item: 1 if item.get_closest_marker("slow") else 0)
