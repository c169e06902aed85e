"""Deterministic test frame generation, mirrored in tools/probe_sample.c.

The frames must match the C probe exactly (integer plasma gradient +
xorshift32 noise) so golden samples are reproducible from Python.
"""

from __future__ import annotations

import numpy as np


def _xorshift32_stream(seed: int, count: int) -> np.ndarray:
    out = np.empty(count, dtype=np.uint32)
    x = seed & 0xFFFFFFFF
    for i in range(count):
        x ^= (x << 13) & 0xFFFFFFFF
        x ^= x >> 17
        x ^= (x << 5) & 0xFFFFFFFF
        out[i] = x
    return out


def yuy2_frame(width: int, height: int, pattern: int = 0) -> bytes:
    """Deterministic YUY2 frame (matches tools/probe_sample.c fill_yuy2)."""
    xs = np.arange(0, width, 2)
    ys = np.arange(height)
    xg, yg = np.meshgrid(xs, ys)
    l0 = ((xg * 3 + yg * 7) >> 2) & 0xFF
    l1 = (((xg + 1) * 3 + yg * 7) >> 2) & 0xFF
    cb = ((xg + yg) >> 3) & 0xFF
    cr = ((xg * 2 - yg) >> 3) & 0xFF
    if pattern > 0:
        r = _xorshift32_stream(0x12345 + pattern, height * (width // 2)).reshape(
            height, width // 2).astype(np.int64)
        l0 = (l0 + (r & 7)) & 0xFF
        l1 = (l1 + ((r >> 3) & 7)) & 0xFF
        cb = (cb + ((r >> 6) & 7)) & 0xFF
        cr = (cr + ((r >> 9) & 7)) & 0xFF
    quad = np.stack([l0, cb, l1, cr], axis=-1).astype(np.uint8)
    return quad.tobytes()
