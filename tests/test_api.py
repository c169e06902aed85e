"""Public CFHD-shaped API surface + decoder back-end features.

Golden data: *.thumb (CFHD_GetThumbnail output) and *.half/quarter.yuy2
(CFHD_PrepareToDecode at reduced resolution) from the reference SDK.

The reference's quarter-res YUY2 intra path emits output inconsistent with
its own half-res decode (linear fit ~0.75x+38 vs the actual content;
TestCFHD's matrix only exercises full and half, `Example/TestCFHD.cpp:137`),
so quarter/thumbnail YUY2 are gated on self-consistency instead.
"""

import os

import numpy as np
import pytest

from cineform_tpu import api
from cineform_tpu.models import thumbnail
from cineform_tpu.utils.testframes import yuy2_frame

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden", "samples")


def _golden(name: str) -> bytes:
    with open(os.path.join(GOLDEN_DIR, name), "rb") as f:
        return f.read()


def test_encoder_decoder_roundtrip():
    w, h = 320, 240
    enc = api.CFHD_OpenEncoder()
    assert api.PixelFormat.YUY2 in enc.get_input_formats()
    enc.prepare_to_encode(w, h, api.PixelFormat.YUY2,
                          quality=api.EncodingQuality.FILMSCAN1)
    frame = yuy2_frame(w, h, 1)
    enc.encode_sample(frame)
    sample = enc.get_sample_data()

    dec = api.CFHD_OpenDecoder()
    info = dec.get_sample_info(sample)
    assert (info.width, info.height) == (w, h)
    assert info.key_frame
    aw, ah, fmt = dec.prepare_to_decode(0, 0, api.PixelFormat.YUY2,
                                        sample=sample)
    assert (aw, ah) == (w, h)
    out = dec.decode_sample(sample)
    a = np.frombuffer(frame, np.uint8).astype(float)
    psnr = 10 * np.log10(255 ** 2 / np.mean((a - out.ravel().astype(float)) ** 2))
    assert psnr > 40

    enc.close()
    dec.close()


def test_encoder_argument_errors():
    enc = api.Encoder()
    with pytest.raises(api.CFHDError) as e:
        enc.encode_sample(b"")
    assert e.value.code == api.ErrorCode.ENCODING_NOT_STARTED
    with pytest.raises(api.CFHDError):
        enc.prepare_to_encode(33, 17, api.PixelFormat.YUY2)
    with pytest.raises(api.CFHDError):
        enc.prepare_to_encode(320, 240, api.PixelFormat.BGRA,
                              encoded_format=api.EncodedFormat.RGBA_4444)


def test_decoder_bad_sample():
    dec = api.Decoder()
    dec.prepare_to_decode(320, 240)
    with pytest.raises(api.CFHDError):
        dec.decode_sample(b"\x00" * 64)


def test_thumbnail_byte_exact_vs_reference():
    for name in ("s_320x240_q4_p1", "s_640x360_q5_p1"):
        sample = _golden(f"{name}.cfhd")
        w, h, packed = thumbnail.extract(sample)
        assert packed == _golden(f"{name}.thumb")


def test_half_resolution_decode_matches_reference():
    for name, w, h in (("s_320x240_q4_p1", 320, 240),
                       ("s_640x360_q5_p1", 640, 360)):
        sample = _golden(f"{name}.cfhd")
        dec = api.Decoder()
        aw, ah, _ = dec.prepare_to_decode(
            0, 0, resolution=api.DecodedResolution.HALF, sample=sample)
        assert (aw, ah) == (w // 2, h // 2)
        mine = dec.decode_sample(sample).ravel()
        gold = np.frombuffer(_golden(f"{name}.half.yuy2"), np.uint8)
        # byte-exact: below full resolution the reference adds no dither
        assert np.array_equal(mine, gold)


def test_quarter_resolution_self_consistent():
    """Quarter decode must match the box-downsampled full decode."""
    name, w, h = "s_320x240_q4_p1", 320, 240
    sample = _golden(f"{name}.cfhd")
    dec = api.Decoder()
    dec.prepare_to_decode(0, 0, resolution=api.DecodedResolution.QUARTER,
                          sample=sample)
    quarter = dec.decode_sample(sample).astype(float)

    full = api.Decoder()
    full.prepare_to_decode(0, 0, sample=sample)
    fy = full.decode_sample(sample).astype(float)[:, 0::2]
    qy = quarter[:, 0::2]
    fy4 = fy.reshape(h // 4, 4, w // 4, 4).mean(axis=(1, 3))
    psnr = 10 * np.log10(255 ** 2 / np.mean((qy - fy4) ** 2))
    assert psnr > 30, psnr


def test_encoder_gop_flag():
    """With YUV_2FRAME_GOP the encoder emits a sequence header for the
    first frame of a pair and the GROUP sample for the second, matching
    the reference goldens byte for byte."""
    from cineform_tpu.utils.testframes import yuy2_frame
    from tests.test_gop import _metadata_from

    gold_seq = _golden("gop_320x240_q4_p1.cfhd.f0")
    gold_grp = _golden("gop_320x240_q4_p1.cfhd.f1")
    enc = api.Encoder()
    enc.prepare_to_encode(320, 240, api.PixelFormat.YUY2,
                          encoding_flags=api.EncodingFlags.YUV_2FRAME_GOP)
    enc.attach_metadata(_metadata_from(gold_grp))
    enc.encode_sample(yuy2_frame(320, 240, 1))
    assert enc.get_sample_data() == gold_seq
    enc.encode_sample(yuy2_frame(320, 240, 2))
    assert enc.get_sample_data() == gold_grp


def test_decoder_gop_sample():
    """DecodeSample on a GROUP returns frame 1 then frame 2, matching the
    reference decode goldens above the bottom strip."""
    gold_grp = _golden("gop_320x240_q4_p1.cfhd.f1")
    dec = api.Decoder()
    dec.prepare_to_decode(0, 0, sample=gold_grp)
    for i in range(2):
        out = dec.decode_sample(gold_grp)
        gold = np.frombuffer(_golden(f"gop_320x240_q4_p1.f{i}.yuy2"),
                             np.uint8).reshape(240, 640)
        assert np.array_equal(out[:226], gold[:226])


def test_decoder_gop_output_format_and_resolution_contract():
    """GOP decode honors the prepared output format (UYVY repack) and raises
    CFHDError for unsupported scaled/format combos (ADVICE round 1)."""
    import pytest

    gold_grp = open("tests/golden/samples/gop_320x240_q4_p1.cfhd.f1",
                    "rb").read()

    dec = api.CFHD_OpenDecoder()
    dec.prepare_to_decode(320, 240, api.PixelFormat.UYVY, sample=gold_grp)
    uyvy = dec.decode_sample(gold_grp)

    dec2 = api.CFHD_OpenDecoder()
    dec2.prepare_to_decode(320, 240, api.PixelFormat.YUY2, sample=gold_grp)
    yuy2 = dec2.decode_sample(gold_grp)
    assert uyvy.tobytes() != yuy2.tobytes()
    quad = np.frombuffer(yuy2.tobytes(), np.uint8).reshape(-1, 4)
    assert uyvy.tobytes() == np.ascontiguousarray(
        quad[:, [1, 0, 3, 2]]).tobytes()

    dec3 = api.CFHD_OpenDecoder()
    dec3.prepare_to_decode(320, 240, api.PixelFormat.YUY2,
                           resolution=api.DecodedResolution.HALF,
                           sample=gold_grp)
    with pytest.raises(api.CFHDError) as ei:
        dec3.decode_sample(gold_grp)
    assert ei.value.code == api.ErrorCode.BADFORMAT

    # deep outputs are now supported for GROUP samples (byte-exact, see
    # test_gop.test_gop_deep_outputs_byte_exact); unsupported formats
    # still raise
    dec4 = api.CFHD_OpenDecoder()
    dec4.prepare_to_decode(320, 240, api.PixelFormat.RG48, sample=gold_grp)
    rg48 = dec4.decode_sample(gold_grp)
    assert len(rg48.tobytes() if hasattr(rg48, "tobytes") else rg48) == \
        320 * 240 * 6

    dec5 = api.CFHD_OpenDecoder()
    dec5.prepare_to_decode(320, 240, api.PixelFormat.NV12, sample=gold_grp)
    with pytest.raises(api.CFHDError) as ei:
        dec5.decode_sample(gold_grp)
    assert ei.value.code == api.ErrorCode.BADFORMAT


def test_decoder_gop_cache_keyed_on_full_sample():
    """Two distinct GROUP samples sharing a 64-byte header prefix must not
    alias in the decode cache (ADVICE round 1)."""
    from cineform_tpu.models import gop_host
    from cineform_tpu.utils.testframes import yuy2_frame

    w, h = 64, 48
    f0a, f1a = yuy2_frame(w, h, 1), yuy2_frame(w, h, 2)
    f0b, f1b = yuy2_frame(w, h, 3), yuy2_frame(w, h, 4)
    sa = gop_host.encode_group(f0a, f1a, w, h, 4, 1)
    sb = gop_host.encode_group(f0b, f1b, w, h, 4, 1)
    assert sa != sb

    dec = api.CFHD_OpenDecoder()
    dec.prepare_to_decode(w, h, api.PixelFormat.YUY2, sample=sa)
    outa = dec.decode_sample(sa).tobytes()
    dec.decode_sample(sa)  # frame 1 again, next dither window
    outb = dec.decode_sample(sb).tobytes()
    assert outa != outb
    # the decoder's rand() dither stream persists across samples: the
    # third emitted frame takes window 2
    ref_b0, _ = gop_host.decode_group(sb, dither_base=2)
    assert outb == ref_b0


def test_decoder_arbitrary_size_scaling():
    """Explicit output dimensions route through the reference's
    fixed-point Lanczos scaler (`ScaleToOutputBuffer`,
    `DecoderSDK/Conversion.cpp:455` -> `ConvertLib/ImageScaler.cpp`),
    applied to the byte-exact YU64 reconstruction — exact, not
    approximate (the scaler itself is pinned byte-exact against the
    compiled reference in tests/test_scaler.py)."""
    from cineform_tpu.models import intra_host
    from cineform_tpu.ref import scaler as rscaler
    from cineform_tpu.utils.testframes import yuy2_frame

    w, h = 320, 240
    enc = api.Encoder()
    enc.prepare_to_encode(w, h, api.PixelFormat.YUY2)
    enc.encode_sample(yuy2_frame(w, h, 5))
    sample = enc.get_sample_data()
    yu64 = intra_host.decode_sample_to(sample, "YU64")

    for ow, oh in ((160, 120), (200, 150), (480, 360)):
        dec = api.Decoder()
        dec.prepare_to_decode(ow, oh, api.PixelFormat.YUY2)
        out = dec.decode_sample(sample)
        assert out.shape == (oh, 2 * ow)
        want = rscaler.scale_yu64_to(yu64, w, h, ow, oh, "YUY2")
        assert out.tobytes() == want, (ow, oh)


def test_decode_half_resolution_byte_exact():
    """DECODED_RESOLUTION_HALF output matches the reference decoder byte
    for byte (probe decoderes, res=2): stopping the wavelet inverse after
    two levels with the >>4 output descale is exactly the reference's
    half-res path."""
    from cineform_tpu.models.intra_host import decode_sample_scaled
    sample = _golden("s_320x240_q4_p1.cfhd")
    gold = _golden("s_320x240_q4_p1.half.yuy2")
    assert decode_sample_scaled(sample, 2) == gold


def test_custom_quantization_override():
    """set_custom_quantization: the low-level codec API's custom_quant
    struct (`Codec/encoder.c:1143`): custom tables replace the quality
    presets with the reference's precision scaling applied on top
    (oracle-validated in spec.production.custom_quant_tables); coarser
    tables must shrink the sample and still roundtrip."""
    import numpy as np
    from cineform_tpu.utils.testframes import yuy2_frame

    frame = yuy2_frame(320, 240, 3)
    enc = api.Encoder()
    enc.prepare_to_encode(320, 240, api.PixelFormat.YUY2)
    enc.encode_sample(frame)
    base = enc.get_sample_data()

    enc2 = api.Encoder()
    enc2.prepare_to_encode(320, 240, api.PixelFormat.YUY2)
    coarse = [4] + [12] * 16
    enc2.set_custom_quantization(coarse)
    enc2.encode_sample(frame)
    small = enc2.get_sample_data()
    assert len(small) < len(base) * 0.8

    dec = api.Decoder()
    dec.prepare_to_decode(0, 0, api.PixelFormat.YUY2, sample=small)
    out = dec.decode_sample(small)
    a = np.frombuffer(frame, np.uint8).astype(float)
    b = np.frombuffer(out.tobytes() if hasattr(out, "tobytes") else out,
                      np.uint8).astype(float)
    psnr = 10 * np.log10(255 ** 2 / np.mean((a - b) ** 2))
    assert psnr > 30, psnr


def test_decoder_api_tail_output_formats():
    """The round-4 output tail is reachable through api.Decoder for all
    three source families (byte sizes checked; byte-exactness pinned in
    test_formats.py)."""
    import os
    G = os.path.join(os.path.dirname(__file__), "golden", "samples")

    def load(n):
        with open(os.path.join(G, n), "rb") as f:
            return f.read()

    yuv = load("s_320x240_q4_p1.cfhd")
    for pf, bpp in ((api.PixelFormat.YUYV, 2), (api.PixelFormat.BGRa, 4),
                    (api.PixelFormat.RG24, 3), (api.PixelFormat.R408, 4),
                    (api.PixelFormat.V408, 4), (api.PixelFormat.WP13, 6),
                    (api.PixelFormat.W13A, 8)):
        dec = api.Decoder()
        dec.prepare_to_decode(0, 0, pf, sample=yuv)
        out = dec.decode_sample(yuv)
        assert out.size == 320 * 240 * bpp, pf

    bayer = load("byr4_320x240_q4_p1.cfhd")
    for pf, bpp in ((api.PixelFormat.BYR2, 2), (api.PixelFormat.WP13, 6),
                    (api.PixelFormat.W13A, 8)):
        dec = api.Decoder()
        dec.prepare_to_decode(0, 0, pf, sample=bayer)
        out = dec.decode_sample(bayer)
        assert out.size == 320 * 240 * bpp, pf

    rgb = load("rg48_320x240_q4_p1.cfhd")
    for pf, bpp in ((api.PixelFormat.WP13, 6), (api.PixelFormat.W13A, 8),
                    (api.PixelFormat.BGRa, 4), (api.PixelFormat.RG24, 3)):
        dec = api.Decoder()
        dec.prepare_to_decode(0, 0, pf, sample=rgb)
        out = dec.decode_sample(rgb)
        assert out.size == 320 * 240 * bpp, pf
