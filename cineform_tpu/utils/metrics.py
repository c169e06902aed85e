"""Quality metrics matching the reference harnesses."""

from __future__ import annotations

import math

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, depth: int) -> float:
    """PSNR as computed by the reference (`Example/WaveletDemo/utils.c:494`,
    `Example/utils.cpp:471`): peak = 2^depth, MSE over all samples."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0.0:
        return float("inf")
    peak = float(1 << depth)
    return 10.0 * math.log10(peak * peak / mse)
