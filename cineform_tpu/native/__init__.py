"""Native (C++) host-side kernels, built on first use with g++.

The compiled .so is cached next to the source keyed by a hash of the
source, so rebuilds happen only when the source changes.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_DIR = os.path.dirname(__file__)


def _machine_key() -> bytes:
    """CPU feature fingerprint: the .so is built with -march=native, so
    a binary cached by one machine can SIGILL on another — key the
    cache on the host's instruction-set flags."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(
                        " ".join(sorted(line.split())).encode()).digest()
    except OSError:
        pass
    import platform

    return platform.machine().encode()


def _build(name: str) -> str:
    src = os.path.join(_DIR, f"{name}.cpp")
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read() + _machine_key()).hexdigest()[:16]
    so_path = os.path.join(_DIR, f"_{name}_{digest}.so")
    if not os.path.exists(so_path):
        with tempfile.TemporaryDirectory() as tmp:
            tmp_so = os.path.join(tmp, f"{name}.so")
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", tmp_so, src],
                check=True, capture_output=True)
            os.replace(tmp_so, so_path)
        # clean up stale builds
        for f in os.listdir(_DIR):
            if (f.startswith(f"_{name}_") and f.endswith(".so")
                    and f != os.path.basename(so_path)):
                try:
                    os.unlink(os.path.join(_DIR, f))
                except OSError:
                    pass
    return so_path


def load(name: str) -> ctypes.CDLL:
    return ctypes.CDLL(_build(name))
