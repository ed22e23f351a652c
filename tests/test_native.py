"""Native host-runtime extension: build + parity with the Python fallback."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent


@pytest.fixture(scope="module", autouse=True)
def built_extension():
    """Build the .so if missing (g++ is in the image; a few seconds)."""
    so = REPO / "thor_slam_tpu" / "native" / "libframesync.so"
    if not so.exists():
        rc = subprocess.call([sys.executable, str(REPO / "setup_native.py"), "build_ext"])
        if rc != 0:
            pytest.skip("native build failed")
    import thor_slam_tpu.native as nat

    if not nat.AVAILABLE:
        # Library appeared after import; reset the module cache.
        nat._LIB = None
        nat.AVAILABLE = nat._find_library() is not None
    if not nat.AVAILABLE:
        pytest.skip("native library not loadable")
    return nat


class TestStaging:
    def test_matches_numpy(self, built_extension):
        nat = built_extension
        rng = np.random.default_rng(0)
        imgs = [rng.integers(0, 255, (60, 80), np.uint8) for _ in range(8)]
        out = nat.stage_frames(imgs)
        np.testing.assert_allclose(out, np.stack(imgs).astype(np.float32) / 255.0)
        assert out.dtype == np.float32

    def test_non_contiguous_input(self, built_extension):
        nat = built_extension
        big = np.random.default_rng(1).integers(0, 255, (60, 160), np.uint8)
        view = big[:, ::2]  # non-contiguous
        out = nat.stage_frames([view])
        np.testing.assert_allclose(out[0], view.astype(np.float32) / 255.0)


def test_stage_frames_shape_mismatch_raises():
    """A renegotiated (smaller) frame must raise, not read out of bounds."""
    import pytest

    from thor_slam_tpu import native as nat

    imgs = [np.zeros((8, 8), np.uint8), np.zeros((4, 8), np.uint8)]
    with pytest.raises(ValueError, match="same-shape"):
        nat.stage_frames(imgs)
