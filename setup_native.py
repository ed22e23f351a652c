"""Build the native host-runtime extension (plain g++, ctypes ABI).

Usage: python setup_native.py build_ext --inplace
(Direct compile; no setuptools machinery needed for a C-ABI shared object.)
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

SRC = Path(__file__).parent / "thor_slam_tpu" / "native" / "framesync.cpp"
OUT = SRC.parent / "libframesync.so"


def build() -> int:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", str(SRC), "-o", str(OUT),
    ]
    print(" ".join(cmd))
    return subprocess.call(cmd)


if __name__ == "__main__":
    sys.exit(build())
