"""Burn-in overlay rendering: text, timecode and scope overlays composited
onto frames — the `Codec/draw.c` analog (the reference rasterizes metadata
burn-ins and histogram/waveform/vectorscope displays into decoded frames).

Device-friendly: glyphs are precomputed numpy masks blitted into an
overlay plane; compositing is a single vectorized blend, so batches of
frames can be overlaid inside jit.
"""

from __future__ import annotations

import numpy as np

# 5x7 bitmap font for the burn-in character set (digits, A-Z, punctuation);
# rows are 5-bit patterns, MSB = leftmost pixel.
_FONT = {
    "0": "0E 11 13 15 19 11 0E", "1": "04 0C 04 04 04 04 0E",
    "2": "0E 11 01 02 04 08 1F", "3": "1F 02 04 02 01 11 0E",
    "4": "02 06 0A 12 1F 02 02", "5": "1F 10 1E 01 01 11 0E",
    "6": "06 08 10 1E 11 11 0E", "7": "1F 01 02 04 08 08 08",
    "8": "0E 11 11 0E 11 11 0E", "9": "0E 11 11 0F 01 02 0C",
    ":": "00 04 00 00 04 00 00", ".": "00 00 00 00 00 0C 0C",
    "-": "00 00 00 1F 00 00 00", "/": "01 01 02 04 08 10 10",
    " ": "00 00 00 00 00 00 00",
    "A": "0E 11 11 1F 11 11 11", "B": "1E 11 11 1E 11 11 1E",
    "C": "0E 11 10 10 10 11 0E", "D": "1E 11 11 11 11 11 1E",
    "E": "1F 10 10 1E 10 10 1F", "F": "1F 10 10 1E 10 10 10",
    "G": "0E 11 10 17 11 11 0F", "H": "11 11 11 1F 11 11 11",
    "I": "0E 04 04 04 04 04 0E", "J": "07 02 02 02 02 12 0C",
    "K": "11 12 14 18 14 12 11", "L": "10 10 10 10 10 10 1F",
    "M": "11 1B 15 15 11 11 11", "N": "11 19 15 13 11 11 11",
    "O": "0E 11 11 11 11 11 0E", "P": "1E 11 11 1E 10 10 10",
    "Q": "0E 11 11 11 15 12 0D", "R": "1E 11 11 1E 14 12 11",
    "S": "0F 10 10 0E 01 01 1E", "T": "1F 04 04 04 04 04 04",
    "U": "11 11 11 11 11 11 0E", "V": "11 11 11 11 11 0A 04",
    "W": "11 11 11 15 15 1B 11", "X": "11 11 0A 04 0A 11 11",
    "Y": "11 11 0A 04 04 04 04", "Z": "1F 01 02 04 08 10 1F",
}


def _glyph(ch: str) -> np.ndarray:
    rows = _FONT.get(ch.upper(), _FONT[" "]).split()
    return np.array([[(int(r, 16) >> (4 - x)) & 1 for x in range(5)]
                     for r in rows], dtype=np.uint8)


def text_mask(text: str, scale: int = 2) -> np.ndarray:
    """Rasterize text to a (7*scale, len*6*scale) 0/1 mask."""
    glyphs = [np.pad(_glyph(c), ((0, 0), (0, 1))) for c in text]
    mask = np.concatenate(glyphs, axis=1) if glyphs else np.zeros((7, 0), np.uint8)
    return np.kron(mask, np.ones((scale, scale), dtype=np.uint8))


def burn_text(frame: np.ndarray, text: str, x: int, y: int,
              scale: int = 2, value: int = 235, shadow: int = 16) -> np.ndarray:
    """Composite text onto a (H, W[, C]) frame (luma or RGB); 1px-scaled
    drop shadow like the reference's metadata burn-ins."""
    out = np.array(frame, copy=True)
    m = text_mask(text, scale)
    h, w = m.shape
    H, W = out.shape[:2]
    h = min(h, H - y); w = min(w, W - x)
    if h <= 0 or w <= 0:
        return out
    m = m[:h, :w].astype(bool)
    region = out[y:y + h, x:x + w]
    sh = np.zeros_like(m)
    sh[scale // 2:, scale // 2:] = m[:h - scale // 2 or None, :w - scale // 2 or None]
    region[sh & ~m] = shadow
    region[m] = value
    out[y:y + h, x:x + w] = region
    return out


def burn_timecode(frame: np.ndarray, timecode: str,
                  scale: int = 2) -> np.ndarray:
    """Bottom-center timecode burn-in."""
    H, W = frame.shape[:2]
    m = text_mask(timecode, scale)
    x = max(0, (W - m.shape[1]) // 2)
    y = max(0, H - m.shape[0] - 4 * scale)
    return burn_text(frame, timecode, x, y, scale)


def render_histogram_overlay(frame_y: np.ndarray, corner: str = "tl",
                             width: int = 128, height: int = 64,
                             value: int = 235) -> np.ndarray:
    """Composite a luma histogram box (draw.c histogram burn-in analog)."""
    out = np.array(frame_y, copy=True)
    hist, _ = np.histogram(frame_y, bins=width, range=(0, 256))
    hist = (hist / max(hist.max(), 1) * (height - 2)).astype(int)
    H, W = out.shape[:2]
    x0 = 8 if "l" in corner else W - width - 8
    y0 = 8 if "t" in corner else H - height - 8
    box = out[y0:y0 + height, x0:x0 + width]
    box[:] = (box * 3) // 8            # darken the backdrop
    for i, hv in enumerate(hist):
        if hv:
            box[height - 1 - hv:height - 1, i] = value
    out[y0:y0 + height, x0:x0 + width] = box
    return out


def render_waveform_overlay(frame_y: np.ndarray, height: int = 96,
                            value: int = 235) -> np.ndarray:
    """Composite a luma waveform monitor strip along the bottom."""
    out = np.array(frame_y, copy=True)
    H, W = out.shape[:2]
    y0 = H - height - 8
    cols = np.linspace(0, W - 1, W).astype(int)
    wf = np.zeros((height, W), np.uint16)
    rows = (frame_y[:, cols].astype(int) * (height - 1)) // 255
    for r in range(0, H, max(1, H // 128)):
        wf[height - 1 - rows[r], cols] = np.minimum(
            wf[height - 1 - rows[r], cols] + 64, 255)
    strip = out[y0:y0 + height, :W]
    strip[:] = (strip * 3) // 8
    lit = wf > 0
    strip[lit] = np.minimum(wf[lit], value).astype(strip.dtype)
    out[y0:y0 + height, :W] = strip
    return out


def render_grid_overlay(frame_y: np.ndarray, xsteps: int = 3,
                        ysteps: int = 3, value: int = 235,
                        thickness: int = 1) -> np.ndarray:
    """Rule-of-thirds / safe-area style grid burn-in (`draw.c:3988-4360`
    draws borders and grids from GRID tool metadata; steps match its
    xsteps/ysteps semantics).  Draws `xsteps-1` vertical and `ysteps-1`
    horizontal lines over the luma plane."""
    out = frame_y.copy()
    h, w = out.shape
    for i in range(1, xsteps):
        x = round(i * w / xsteps)
        out[:, max(x - thickness, 0):x + thickness] = value
    for i in range(1, ysteps):
        y = round(i * h / ysteps)
        out[max(y - thickness, 0):y + thickness, :] = value
    return out


def burn_subtitle(frame: np.ndarray, text: str, scale: int = 2,
                  margin: int = 16, boxed: bool = True) -> np.ndarray:
    """Bottom-centered subtitle burn-in (the reference's subtitle tool is
    a positioned text object with a background box, `draw.c:109-494`)."""
    out = frame.copy()
    mask = text_mask(text, scale)
    mh, mw = mask.shape
    h = out.shape[0]
    w2 = out.shape[1]
    x = max((w2 // 2 - mw) // 2 * 2, 0) if out.ndim == 2 else 0
    # frame is YUY2-interleaved (h, 2*w): luma columns are even indices
    wpix = out.shape[1] // 2
    x = max((wpix - mw) // 2, 0)
    y = max(h - mh - margin, 0)
    region = out[y:y + mh, :]
    if boxed:
        pad = 6
        y0 = max(y - pad, 0)
        out[y0:min(y + mh + pad, h), max(2 * (x - pad), 0):
            2 * min(x + mw + pad, wpix):2] >>= 2
    luma = out[y:y + mh, 2 * x:2 * (x + mw):2]
    luma[mask[:luma.shape[0], :luma.shape[1]] > 0] = 235
    return out


def composite_image(frame_rgb: np.ndarray, overlay_rgba: np.ndarray,
                    x: int = 0, y: int = 0,
                    opacity: float = 1.0) -> np.ndarray:
    """Alpha-composite an RGBA overlay (logo / watermark) onto an RGB
    frame (`draw.c` PNG logo objects; the reference loads the image via
    its tools path and alpha-blends per pixel)."""
    out = frame_rgb.astype(np.float32).copy()
    oh, ow = overlay_rgba.shape[:2]
    h, w = out.shape[:2]
    x0, y0 = max(x, 0), max(y, 0)
    x1, y1 = min(x + ow, w), min(y + oh, h)
    if x1 <= x0 or y1 <= y0:
        return frame_rgb.copy()
    ov = overlay_rgba[y0 - y:y1 - y, x0 - x:x1 - x].astype(np.float32)
    alpha = (ov[..., 3:4] / 255.0) * float(opacity)
    out[y0:y1, x0:x1, :3] = (out[y0:y1, x0:x1, :3] * (1 - alpha)
                             + ov[..., :3] * alpha)
    return np.clip(out, 0, 255).astype(frame_rgb.dtype)
