"""Minimal PGM/PPM I/O (the reference's demo fixtures are 8-bit PGM)."""

from __future__ import annotations

import numpy as np


def read_pgm(path: str) -> np.ndarray:
    """Read an 8-bit binary (P5) PGM into a (h, w) uint8 array."""
    with open(path, "rb") as f:
        data = f.read()

    pos = 0

    def token() -> bytes:
        nonlocal pos
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            return token()
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        return data[start:pos]

    magic = token()
    if magic != b"P5":
        raise ValueError(f"not a binary PGM: {magic!r}")
    w = int(token())
    h = int(token())
    maxval = int(token())
    if maxval > 255:
        raise ValueError("16-bit PGM not supported here")
    pos += 1  # single whitespace after maxval
    pix = np.frombuffer(data[pos : pos + w * h], dtype=np.uint8)
    return pix.reshape(h, w).copy()


def write_pgm(path: str, img: np.ndarray) -> None:
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    with open(path, "wb") as f:
        f.write(b"P5\n%d %d\n255\n" % (w, h))
        f.write(img.tobytes())
