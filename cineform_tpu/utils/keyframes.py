"""Keyframed Active Metadata: per-frame interpolation of develop
parameters — the analog of the reference's keyframed color-correction
metadata (`Codec/metadata.c` TAG_*_KEYFRAME handling feeding the
DemoasicFrames Active Metadata engine).

A `Track` holds (frame, value) keyframes with linear or Catmull-Rom
spline interpolation (the reference's "spline CC").  A `Timeline` maps
parameter names to tracks and materializes the develop-parameter dict for
any frame, ready for `ops/develop.develop`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class Track:
    """Keyframes: sorted (frame, value) pairs; value is a scalar or a
    fixed-shape array (e.g. a 3x3 color matrix)."""

    frames: list
    values: list
    interpolation: str = "linear"       # "hold" | "linear" | "spline"

    def __post_init__(self) -> None:
        order = np.argsort(self.frames)
        self.frames = [self.frames[i] for i in order]
        self.values = [np.asarray(self.values[i], dtype=np.float64)
                       for i in order]

    def sample(self, frame: float):
        f = self.frames
        v = self.values
        if frame <= f[0]:
            return v[0]
        if frame >= f[-1]:
            return v[-1]
        i = int(np.searchsorted(f, frame, side="right") - 1)
        if self.interpolation == "hold":
            return v[i]
        t = (frame - f[i]) / (f[i + 1] - f[i])
        if self.interpolation == "linear" or len(f) < 3:
            return v[i] * (1 - t) + v[i + 1] * t
        # Catmull-Rom through the neighboring keys (clamped ends)
        p0 = v[max(i - 1, 0)]
        p1, p2 = v[i], v[i + 1]
        p3 = v[min(i + 2, len(v) - 1)]
        t2, t3 = t * t, t * t * t
        return 0.5 * ((2 * p1) + (-p0 + p2) * t
                      + (2 * p0 - 5 * p1 + 4 * p2 - p3) * t2
                      + (-p0 + 3 * p1 - 3 * p2 + p3) * t3)


@dataclass
class Timeline:
    """Named parameter tracks -> per-frame develop settings."""

    tracks: dict = field(default_factory=dict)

    def set_keyframes(self, name: str, frames, values,
                      interpolation: str = "linear") -> None:
        self.tracks[name] = Track(list(frames), list(values), interpolation)

    def at(self, frame: float) -> dict:
        out = {}
        for name, track in self.tracks.items():
            val = track.sample(frame)
            out[name] = float(val) if val.ndim == 0 else val
        return out
