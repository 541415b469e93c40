"""Build the native library: g++ -O3 -shared -fPIC srt_native.cpp."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
SOURCE = os.path.join(_DIR, "srt_native.cpp")
LIBRARY = os.path.join(_DIR, "libsrt_native.so")


def build(force: bool = False) -> bool:
    """Compile the library if needed; returns True when it exists."""
    if not force and os.path.exists(LIBRARY) \
            and os.path.getmtime(LIBRARY) >= os.path.getmtime(SOURCE):
        return True
    gxx = shutil.which("g++") or shutil.which("clang++")
    if gxx is None:
        return False
    cmd = [gxx, "-O3", "-std=c++17", "-shared", "-fPIC",
           "-o", LIBRARY + ".tmp", SOURCE]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(LIBRARY + ".tmp", LIBRARY)
        return True
    except (subprocess.SubprocessError, OSError):
        return False


if __name__ == "__main__":
    ok = build(force="--force" in sys.argv)
    print(LIBRARY if ok else "build failed")
    sys.exit(0 if ok else 1)
