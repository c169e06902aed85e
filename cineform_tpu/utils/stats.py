"""Coefficient statistics collection: the `Codec/stats.c` analog.

The reference gathers per-band coefficient distributions under `_STATS`
(stats.c:40-70) to tune codebooks.  This module collects value/run
histograms from quantized band planes and reports codebook efficiency
(average code length vs the entropy bound).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class BandStats:
    """Accumulated over any number of quantized band planes."""

    value_hist: np.ndarray = field(
        default_factory=lambda: np.zeros(2048, np.int64))  # |v| histogram
    run_hist: dict = field(default_factory=dict)           # zero-run lengths
    count: int = 0

    def add(self, band: np.ndarray) -> None:
        flat = np.asarray(band).ravel()
        mag = np.minimum(np.abs(flat), 2047)
        self.value_hist += np.bincount(mag, minlength=2048)
        self.count += flat.size
        nz = np.flatnonzero(flat)
        if nz.size:
            gaps = np.diff(np.concatenate([[-1], nz])) - 1
            tail = flat.size - 1 - nz[-1]
            runs = gaps[gaps > 0]
            for r in np.concatenate([runs, [tail]]) if tail else runs:
                self.run_hist[int(r)] = self.run_hist.get(int(r), 0) + 1
        elif flat.size:
            self.run_hist[flat.size] = self.run_hist.get(flat.size, 0) + 1

    def zero_fraction(self) -> float:
        return float(self.value_hist[0]) / max(self.count, 1)

    def entropy_bits(self) -> float:
        """Empirical entropy of the magnitude distribution (bits/coeff)."""
        p = self.value_hist / max(self.count, 1)
        p = p[p > 0]
        return float(-(p * np.log2(p)).sum())

    def report(self) -> str:
        lines = [f"coefficients: {self.count}",
                 f"zero fraction: {self.zero_fraction():.4f}",
                 f"magnitude entropy: {self.entropy_bits():.3f} bits/coeff"]
        top = np.argsort(self.value_hist[1:])[::-1][:8] + 1
        lines.append("top magnitudes: " + ", ".join(
            f"{m}:{self.value_hist[m]}" for m in top if self.value_hist[m]))
        return "\n".join(lines)
