"""Fixed-point Lanczos scaler: byte-exact pins vs the compiled reference.

Goldens in tests/golden/scaler/ were produced by calling the reference
library's scaler classes directly (CImageScalerConverterYU64ToRGB::
ScaleToBGRA64, CImageScalerConverterB64A::ScaleToB64A / ScaleToBGRA —
ConvertLib/ImageScaler.cpp) on the byte-exact decoded YU64 / ARGB16
buffers of the sample goldens.  The public CFHD_DecodeSample cannot reach
these scalers in the open-source release (`#define _SCALING 0`,
DecoderSDK/SampleDecoder.cpp:77), so the direct-call oracle is the
authoritative behavior source.
"""

import os

import numpy as np
import pytest

from cineform_tpu.ref import scaler

HERE = os.path.dirname(__file__)


def _golden(name, sub="scaler"):
    with open(os.path.join(HERE, "golden", sub, name), "rb") as f:
        return f.read()


def _yu64_320():
    return _golden("s_320x240_q4_p1.yu64out", "samples")


def _argb16le_128():
    raw = np.frombuffer(_golden("s_128x96_q4_p1.b64aout", "samples"),
                        dtype='>u2')
    return raw.astype('<u2').tobytes()


@pytest.mark.parametrize("ow,oh", [(200, 150), (480, 360), (211, 157),
                                   (200, 240)])
def test_scale_yu64_to_bgra64_byte_exact(ow, oh):
    """ScaleToBGRA64 (downscale, upscale, odd sizes, same-height fast
    path) is byte-exact vs the compiled reference scaler."""
    got = scaler.scale_yu64_to_bgra64(_yu64_320(), 320, 240, ow, oh)
    assert got == _golden(f"scale_yu64_{ow}x{oh}.bgra64")


@pytest.mark.parametrize("ow,oh", [(80, 60), (200, 150), (81, 63)])
def test_scale_b64a_to_b64a_byte_exact(ow, oh):
    got = scaler.scale_b64a_to_b64a(_argb16le_128(), 128, 96, ow, oh)
    assert got == _golden(f"scale_b64a_{ow}x{oh}.b64a")


@pytest.mark.parametrize("ow,oh", [(80, 60), (81, 63)])
def test_scale_b64a_to_bgra_byte_exact(ow, oh):
    """Includes the reference's output_width*3 column-stride quirk
    (ImageScaler.cpp:3597)."""
    got = scaler.scale_b64a_to_bgra(_argb16le_128(), 128, 96, ow, oh)
    assert got == _golden(f"scale_bgra_{ow}x{oh}.bgra")


def test_lanczos_coeff_properties():
    """Tap sets sum to exactly 256 (8.8 fixed point) and stay in range."""
    for isize, osize in [(320, 200), (240, 150), (320, 480), (100, 301),
                         (2000, 333), (7, 5)]:
        for line in range(0, osize, max(1, osize // 7)):
            taps = scaler.lanczos_coeff(isize, osize, line)
            assert sum(m for _, m in taps) == 256, (isize, osize, line)
            assert all(0 <= s < isize for s, _ in taps)


def test_decoded_scale_steps():
    """DecodedScale picks the smallest half-step decode >= output."""
    assert scaler.decoded_scale(1920, 1080, 960, 540) == (960, 540)
    assert scaler.decoded_scale(1920, 1080, 961, 540) == (1920, 1080)
    assert scaler.decoded_scale(1920, 1080, 100, 100) == (480, 270)
    assert scaler.decoded_scale(320, 240, 480, 360) == (320, 240)


def test_scale_yu64_other_formats_consistent():
    """The extension formats pack the same scaled triples: YUY2 luma is
    the top byte of the YU64 luma, RG48 matches the b64a RGB words."""
    yu64 = _yu64_320()
    out_yu64 = scaler.scale_yu64_to(yu64, 320, 240, 200, 150, "YU64")
    out_yuy2 = scaler.scale_yu64_to(yu64, 320, 240, 200, 150, "YUY2")
    a = np.frombuffer(out_yu64, '<u2').reshape(150, 400)
    q = np.frombuffer(out_yuy2, np.uint8).reshape(150, 400)
    assert (q[:, 0::2] == (a[:, 0::2] >> 8)).all()

    out_b64a = scaler.scale_yu64_to(yu64, 320, 240, 200, 150, "b64a")
    out_rg48 = scaler.scale_yu64_to(yu64, 320, 240, 200, 150, "RG48")
    argb = np.frombuffer(out_b64a, '>u2').reshape(150, 200, 4)
    rgb = np.frombuffer(out_rg48, '<u2').reshape(150, 200, 3)
    assert (argb[..., 1:] == rgb).all()


def test_api_scaled_decode_all_formats():
    """Decoder with explicit non-native dimensions routes every output
    format through the fixed-point Lanczos engine; b64a output equals the
    pinned reference scaler on the byte-exact YU64 reconstruction."""
    from cineform_tpu import api

    sample = _golden("s_320x240_q4_p1.cfhd", "samples")
    for fmt, elem in [(api.PixelFormat.B64A, 8), (api.PixelFormat.YUY2, 2),
                      (api.PixelFormat.RG48, 6), (api.PixelFormat.BGRA, 4)]:
        dec = api.Decoder()
        dec.prepare_to_decode(200, 150, fmt)
        out = dec.decode_sample(sample).tobytes()
        assert len(out) == 200 * 150 * elem, fmt

    dec = api.Decoder()
    dec.prepare_to_decode(200, 150, api.PixelFormat.B64A)
    got = dec.decode_sample(sample).tobytes()
    want = scaler.scale_yu64_to_bgra64(_yu64_320(), 320, 240, 200, 150)
    assert got == want


def test_api_scaled_gop_decode():
    """Scaled GOP decode: frames 1 and 2 alternate like the unscaled
    path, each Lanczos-scaled from its byte-exact YU64 reconstruction."""
    from cineform_tpu import api
    from cineform_tpu.models import gop_host

    sample = _golden("gop_320x240_q4_p1.cfhd.f1", "samples")
    dec = api.Decoder()
    dec.prepare_to_decode(160, 120, api.PixelFormat.YUY2)
    f0 = dec.decode_sample(sample).tobytes()
    f1 = dec.decode_sample(sample).tobytes()
    assert f0 != f1
    want0 = scaler.scale_yu64_to(
        gop_host.decode_group_to(sample, "YU64", frame=0),
        320, 240, 160, 120, "YUY2")
    assert f0 == want0
