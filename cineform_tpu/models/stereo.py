"""Stereo 3D dual-channel samples: two eyes in ONE CFHD sample.

The reference encodes 3D by looping EncodeSample over the video channels,
appending each eye's complete bitstream 16-byte-aligned into one sample
(`Codec/encoder.c:3407-3438`), with ENCODED_CHANNELS / ENCODED_CHANNEL_NUMBER
tags in each eye's header (`Codec/encoder.c:7548-7556`) and a VCHN metadata
tuple.  The decoder picks eyes via the TAG_CHANNELS_ACTIVE mask
(`Codec/decoder.c:10086-10104`).

Byte-exact vs the reference encoder (tests/test_stereo.py, probe encode_3d).
"""

from __future__ import annotations

from dataclasses import replace

import numpy as np

from cineform_tpu.bitstream import parse_sample
from cineform_tpu.models import intra_host
from cineform_tpu.ref import intra as xf
from cineform_tpu.spec.production import IntraParams


def encode_sample_3d(left_yuy2: bytes, right_yuy2: bytes, width: int,
                     height: int, quality: int, frame_number: int = 1,
                     metadata: intra_host.EncoderMetadata | None = None
                     ) -> bytes:
    """Encode a left/right YUY2 pair into one dual-channel 3D sample."""
    meta = replace(metadata or intra_host.EncoderMetadata(), video_channels=2)
    params = IntraParams(width=width, height=height, quality=quality)
    out = bytearray()
    for idx, frame in enumerate((left_yuy2, right_yuy2)):
        planes = xf.unpack_yuy2(frame, width, height, params.precision)
        channels = [intra_host.transform_channel(p, params, ch)
                    for ch, p in enumerate(planes)]
        sample = intra_host.write_sample(
            channels, params, frame_number, meta,
            video_channels=2, channel_number=idx)
        out += sample
        out += b"\0" * (-len(out) % 16)    # FlushBitstreamAlign(output, 16)
    return bytes(out)


def split_3d(sample: bytes) -> list[bytes]:
    """Split a dual-channel sample into its per-eye bitstreams."""
    s = parse_sample(sample)
    if s.encoded_channels < 2 or not s.sample_end:
        return [sample]
    end = (s.sample_end + 15) & ~15
    return [sample[:end], sample[end:]]


def decode_sample_3d(sample: bytes, eye: int = 0,
                     dither: bool = True) -> bytes:
    """Decode one eye (0 = left, 1 = right) of a 3D sample to YUY2."""
    eyes = split_3d(sample)
    if eye >= len(eyes):
        raise ValueError(f"sample has {len(eyes)} video channels")
    out, _info = intra_host.decode_sample(eyes[eye], dither=dither)
    return out


def decode_batch_device_3d(samples: list[bytes], eye: int = 0,
                           codec=None) -> np.ndarray:
    """Decode one eye of a batch of 3D samples wholly on device: split
    each sample into its per-eye bitstreams (host pointer arithmetic)
    and run the eye's complete sub-sample through the device decoder —
    the reference decodes the selected eye through the same hot path
    (`Codec/decoder.c:10086-10104` channel selection).  Either eye uses
    the decoder's first rand() dither window, like a fresh decoder
    instance decoding that eye (decode_sample_3d semantics, pinned vs
    the binary's decode_3d).  Byte-identical to decode_sample_3d."""
    from cineform_tpu.models.intra import IntraCodec

    eye_samples = []
    for sample in samples:
        eyes = split_3d(sample)
        if eye >= len(eyes):
            raise ValueError(f"sample has {len(eyes)} video channels")
        eye_samples.append(eyes[eye])
    if codec is None:
        s = parse_sample(eye_samples[0])
        codec = IntraCodec(width=s.width, height=s.height,
                           quality=max(1, s.quality & 0xF) or 4)
    return codec.decode_batch_device(eye_samples)


# ---------------------------------------------------------------------------
# 3D blend modes (`Do3DWork` / `ProcessLine3D`, `Codec/bayer.c:10761`;
# mode enum `Codec/codec.h:1261-1278`)
# ---------------------------------------------------------------------------

BLEND_NONE = 0
BLEND_STACKED_ANAMORPHIC = 1     # half height, left on top
BLEND_SIDEBYSIDE_ANAMORPHIC = 2  # half width, left on the left
BLEND_LINE_INTERLEAVED = 3
BLEND_ONION = 4                  # 50/50 mix
BLEND_DIFFERENCE = 5             # |L-R| around mid grey
BLEND_FREEVIEW = 7               # side-by-side for cross-eyed viewing
BLEND_ANAGLYPH_RC = 16           # red/cyan
BLEND_ANAGLYPH_RC_BW = 17
BLEND_ANAGLYPH_AB = 18           # amber/blue
BLEND_ANAGLYPH_AB_BW = 19
BLEND_ANAGLYPH_GM = 20           # green/magenta
BLEND_ANAGLYPH_GM_BW = 21


def _yuy2_planes(raw: bytes, width: int, height: int):
    a = np.frombuffer(raw, np.uint8).reshape(height, width // 2, 4).astype(
        np.int32)
    y = np.empty((height, width), np.int32)
    y[:, 0::2] = a[:, :, 0]
    y[:, 1::2] = a[:, :, 2]
    return y, a[:, :, 1], a[:, :, 3]     # Y, U, V


def _pack_yuy2(y, u, v) -> bytes:
    h, w = y.shape
    out = np.empty((h, w // 2, 4), np.uint8)
    out[:, :, 0] = np.clip(y[:, 0::2], 0, 255)
    out[:, :, 2] = np.clip(y[:, 1::2], 0, 255)
    out[:, :, 1] = np.clip(u, 0, 255)
    out[:, :, 3] = np.clip(v, 0, 255)
    return out.tobytes()


def _yuy2_to_rgb(raw: bytes, width: int, height: int):
    """8-bit CG709 conversion (the blend paths run at display precision)."""
    y, u, v = _yuy2_planes(raw, width, height)
    yy = np.maximum(y - 16, 0)
    uu = np.repeat(u - 128, 2, axis=1)
    vv = np.repeat(v - 128, 2, axis=1)
    r = np.clip((149 * yy + 230 * vv + 64) >> 7, 0, 255)
    g = np.clip((298 * yy - 137 * vv - 55 * uu + 128) >> 8, 0, 255)
    b = np.clip((149 * yy + 270 * uu + 64) >> 7, 0, 255)
    return r, g, b


def blend_eyes(left_yuy2: bytes, right_yuy2: bytes, width: int, height: int,
               mode: int) -> tuple[bytes, str]:
    """Composite the two decoded eyes per the CFHD 3D blend mode.

    Returns (bytes, fourcc): YUY2 for the geometric modes, BGRA for the
    anaglyph family (which composites in RGB, `ProcessLine3D`).
    Functional parity: geometry / channel selection match `Do3DWork`'s layout;
    per-pixel filtering matches the documented mode semantics."""
    if mode in (BLEND_NONE, 0):
        return left_yuy2, "YUY2"
    ly, lu, lv = _yuy2_planes(left_yuy2, width, height)
    ry, ru, rv = _yuy2_planes(right_yuy2, width, height)
    if mode == BLEND_STACKED_ANAMORPHIC:
        # each eye vertically averaged to half height; left on top
        def squash(p):
            return (p[0::2] + p[1::2] + 1) >> 1
        y = np.vstack([squash(ly), squash(ry)])
        u = np.vstack([squash(lu), squash(ru)])
        v = np.vstack([squash(lv), squash(rv)])
        return _pack_yuy2(y, u, v), "YUY2"
    if mode in (BLEND_SIDEBYSIDE_ANAMORPHIC, BLEND_FREEVIEW):
        def thin(p):
            return (p[:, 0::2] + p[:, 1::2] + 1) >> 1
        y = np.hstack([thin(ly), thin(ry)])
        u = np.hstack([thin(lu), thin(ru)])
        v = np.hstack([thin(lv), thin(rv)])
        return _pack_yuy2(y, u, v), "YUY2"
    if mode == BLEND_LINE_INTERLEAVED:
        y, u, v = ly.copy(), lu.copy(), lv.copy()
        y[1::2] = ry[1::2]
        u[1::2] = ru[1::2]
        v[1::2] = rv[1::2]
        return _pack_yuy2(y, u, v), "YUY2"
    if mode == BLEND_ONION:
        return _pack_yuy2((ly + ry + 1) >> 1, (lu + ru + 1) >> 1,
                          (lv + rv + 1) >> 1), "YUY2"
    if mode == BLEND_DIFFERENCE:
        y = np.clip(128 + (ly - ry), 0, 255)
        u = np.full_like(lu, 128)
        v = np.full_like(lv, 128)
        return _pack_yuy2(y, u, v), "YUY2"
    if BLEND_ANAGLYPH_RC <= mode <= BLEND_ANAGLYPH_GM_BW:
        lr, lg, lb = _yuy2_to_rgb(left_yuy2, width, height)
        rr, rg, rb = _yuy2_to_rgb(right_yuy2, width, height)
        if mode in (BLEND_ANAGLYPH_RC_BW, BLEND_ANAGLYPH_AB_BW,
                    BLEND_ANAGLYPH_GM_BW):
            # luminance-only anaglyph
            def lum(r, g, b):
                return (54 * r + 183 * g + 19 * b) >> 8
            lr = lg = lb = lum(lr, lg, lb)
            rr = rg = rb = lum(rr, rg, rb)
        if mode in (BLEND_ANAGLYPH_RC, BLEND_ANAGLYPH_RC_BW):
            r, g, b = lr, rg, rb          # red from left, cyan from right
        elif mode in (BLEND_ANAGLYPH_AB, BLEND_ANAGLYPH_AB_BW):
            r, g, b = lr, lg, rb          # amber (R+G) left, blue right
        else:
            r, g, b = rr, lg, rb          # green left, magenta right
        bgra = np.empty((height, width, 4), np.uint8)
        bgra[..., 0] = b
        bgra[..., 1] = g
        bgra[..., 2] = r
        bgra[..., 3] = 255
        return bgra.tobytes(), "BGRA"
    raise ValueError(f"unsupported blend mode {mode}")
