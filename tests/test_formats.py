"""Input pixel-format fan-out: v210 and YU64 10-bit 4:2:2 front ends.

Golden samples produced by the reference encoder via
tools/probe_sample.c encode_v210 / encode_yu64.
"""

import os

import pytest

import numpy as np
import pytest

from cineform_tpu import api
from cineform_tpu.utils.testframes import v210_frame, yu64_frame
from cineform_tpu.utils import testframes as tfgen

from tests.test_intra_host import _metadata_from

REFBIN = "/root/repo/.refbuild/probe_sample"

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden", "samples")


def _golden(name: str) -> bytes:
    with open(os.path.join(GOLDEN_DIR, name), "rb") as f:
        return f.read()


def _encode(pixel_format, frame, w, h, meta):
    enc = api.Encoder()
    enc.prepare_to_encode(w, h, pixel_format,
                          quality=api.EncodingQuality.FILMSCAN1)
    enc.attach_metadata(meta)
    enc.encode_sample(frame)
    return enc.get_sample_data()


def test_v210_encode_byte_exact():
    gold = _golden("v210_320x240_q4_p1.cfhd")
    meta = _metadata_from(gold)
    mine = _encode(api.PixelFormat.V210, v210_frame(320, 240, 1), 320, 240, meta)
    assert mine == gold


def test_yu64_encode_byte_exact():
    gold = _golden("yu64_320x240_q4_p1.cfhd")
    meta = _metadata_from(gold)
    mine = _encode(api.PixelFormat.YU64, yu64_frame(320, 240, 1), 320, 240, meta)
    assert mine == gold


def test_deep_formats_decode_matches_reference():
    """Reference decodes of the v210/YU64 samples vs our decoder (dither)."""
    from cineform_tpu.models import intra_host

    for name in ("v210_320x240_q4_p1", "yu64_320x240_q4_p1"):
        out, _ = intra_host.decode_sample(_golden(f"{name}.cfhd"))
        gold = np.frombuffer(_golden(f"{name}.yuy2"), np.uint8).astype(int)
        mine = np.frombuffer(out, np.uint8).astype(int)
        assert np.abs(mine - gold).max() <= 1


def test_rg48_encode_byte_exact():
    from cineform_tpu.utils.testframes import rg48_frame

    gold = _golden("rg48_320x240_q4_p1.cfhd")
    meta = _metadata_from(gold)
    enc = api.Encoder()
    enc.prepare_to_encode(320, 240, api.PixelFormat.RG48,
                          encoded_format=api.EncodedFormat.RGB_444,
                          quality=api.EncodingQuality.FILMSCAN1)
    enc.attach_metadata(meta)
    enc.encode_sample(rg48_frame(320, 240, 1))
    assert enc.get_sample_data() == gold


def test_b64a_encode_byte_exact():
    from cineform_tpu.utils.testframes import b64a_frame

    gold = _golden("b64a_320x240_q4_p1.cfhd")
    meta = _metadata_from(gold)
    enc = api.Encoder()
    enc.prepare_to_encode(320, 240, api.PixelFormat.B64A,
                          encoded_format=api.EncodedFormat.RGBA_4444,
                          quality=api.EncodingQuality.FILMSCAN1)
    enc.attach_metadata(meta)
    enc.encode_sample(b64a_frame(320, 240, 1))
    assert enc.get_sample_data() == gold


def test_rgb_roundtrip():
    from cineform_tpu.models import intra_host
    from cineform_tpu.utils.testframes import rg48_frame

    w, h = 320, 240
    raw = rg48_frame(w, h, 1)
    sample = intra_host.encode_sample_rgb(raw, w, h, 4)
    out, s = intra_host.decode_sample_rgb(sample)
    assert s.encoded_format == 3
    a = np.frombuffer(raw, "<u2").astype(float)
    b = np.frombuffer(out, "<u2").astype(float)
    psnr = 10 * np.log10(65535.0 ** 2 / np.mean((a - b) ** 2))
    assert psnr > 40, psnr


def test_rgba_roundtrip_alpha_extremes():
    from cineform_tpu.models import intra_host
    from cineform_tpu.utils.testframes import b64a_frame

    w, h = 320, 240
    raw = b64a_frame(w, h, 0)
    sample = intra_host.encode_sample_rgb(raw, w, h, 4, alpha=True)
    out, s = intra_host.decode_sample_rgb(sample)
    assert s.encoded_format == 4 and s.num_channels == 4
    # the reference reads b64a without byte-swapping; compare in its view
    a = np.frombuffer(raw, "<u2").reshape(h, w, 4).astype(float)
    b = np.frombuffer(out, "<u2").reshape(h, w, 4).astype(float)
    psnr = 10 * np.log10(65535.0 ** 2 / np.mean((a - b) ** 2))
    assert psnr > 35, psnr


def test_byr4_encode_byte_exact():
    from cineform_tpu.models import intra_host
    from cineform_tpu.utils.testframes import byr4_frame

    gold = _golden("byr4_320x240_q4_p1.cfhd")
    meta = _metadata_from(gold)
    mine = intra_host.encode_sample_bayer(byr4_frame(320, 240, 1), 320, 240, 4,
                                          frame_number=1, metadata=meta)
    assert mine == gold


def test_byr4_decode_linear_rgb():
    from cineform_tpu.models import intra_host

    rgb, s = intra_host.decode_sample_bayer(_golden("byr4_320x240_q4_p1.cfhd"))
    assert s.encoded_format == 2
    assert rgb.shape == (120, 160, 3)
    assert rgb.max() > 1024  # linear values restored from the log curve


def test_uyvy_encode_byte_exact():
    import numpy as np
    from cineform_tpu.utils.testframes import yuy2_frame

    gold = _golden("uyvy_320x240_q4_p1.cfhd")
    meta = _metadata_from(gold)
    # convert the deterministic YUY2 frame to UYVY byte order
    raw = np.frombuffer(yuy2_frame(320, 240, 1), np.uint8).reshape(-1, 4)
    uyvy = raw[:, [1, 0, 3, 2]].tobytes()
    enc = api.Encoder()
    enc.prepare_to_encode(320, 240, api.PixelFormat.UYVY,
                          quality=api.EncodingQuality.FILMSCAN1)
    enc.attach_metadata(meta)
    enc.encode_sample(uyvy)
    assert enc.get_sample_data() == gold


def _raw_fill(nbytes: int, pattern: int) -> bytes:
    """Mirror of tools/probe_sample.c do_encode_raw's xorshift32 fill."""
    s = 0x77777 + pattern
    out = np.empty(nbytes // 4, dtype="<u4")
    x = s
    for i in range(len(out)):
        x ^= (x << 13) & 0xFFFFFFFF
        x ^= x >> 17
        x ^= (x << 5) & 0xFFFFFFFF
        out[i] = x
    return out.tobytes()


RAW_FORMATS = [
    # (golden name, PixelFormat, bytes per frame at 320x240)
    ("raw_r210", api.PixelFormat.R210, 320 * 240 * 4),
    ("raw_DPX0", api.PixelFormat.DPX0, 320 * 240 * 4),
    ("raw_RG30", api.PixelFormat.RG30, 320 * 240 * 4),
    ("raw_AB10", api.PixelFormat.AB10, 320 * 240 * 4),
    ("raw_AR10", api.PixelFormat.AR10, 320 * 240 * 4),
    ("raw_BGRA", api.PixelFormat.BGRA, 320 * 240 * 4),
    ("raw_RG64", api.PixelFormat.RG64, 320 * 240 * 8),
    ("raw_BYR5", api.PixelFormat.BYR5, 320 * 240 * 3 // 2),
]


def test_raw_input_formats_encode_byte_exact():
    """r210/DPX0/RG30/AB10/AR10 (packed 10-bit RGB), BGRA (8-bit, bottom-up),
    RG64 (16-bit RGBA) and BYR5 (packed 12-bit Bayer) all reproduce the
    reference encoder byte for byte on the shared deterministic raw fill."""
    for name, pf, nbytes in RAW_FORMATS:
        gold = _golden(name + ".cfhd")
        meta = _metadata_from(gold)
        assert _encode(pf, _raw_fill(nbytes, 1), 320, 240, meta) == gold, name


def test_rg24_encode_near_exact():
    """RG24 (8-bit BGR, bottom-up): byte-exact except the tail of one
    highpass band.  Root cause (found round 2): the reference detects
    "8-bit import at 10-bit precision" per band (`Codec/encoder.c:6860`,
    quantized low-bits scan) and routes that band through
    EncodeQuantLongRuns2Pass (`encoder.c:5112`, two-pass byte-plane
    coding), whose stream ends without a band-end code; data-dependent,
    affects one band of this noise fixture."""
    gold = _golden("raw_RG24.cfhd")
    meta = _metadata_from(gold)
    mine = _encode(api.PixelFormat.RG24, _raw_fill(320 * 240 * 3, 1),
                   320, 240, meta)
    n = sum(1 for a, b in zip(mine, gold) if a == b)
    assert n / min(len(mine), len(gold)) > 0.999


def test_decode_output_2vuy_byte_exact():
    sample = _golden("s_320x240_q4_p1.cfhd")
    from cineform_tpu.models.intra_host import decode_sample_to
    assert decode_sample_to(sample, "2vuy") == _golden("s_320x240_q4_p1.2vuy")


def test_decode_output_yu64_byte_exact():
    """YU64 deep output: BYTE-EXACT vs the reference decoder (the pinned
    deterministic 16-bit planar path: lowpass channel offset + floor
    Row16u reconstruction + ConvertPlanarYUVToYU64 precision-16 repack)."""
    from cineform_tpu.models.intra_host import decode_sample_to
    sample = _golden("s_320x240_q4_p1.cfhd")
    assert decode_sample_to(sample, "YU64") == _golden("s_320x240_q4_p1.yu64out")


def test_decode_output_v210_byte_exact():
    """v210 deep output byte-exact, incl. the partial tail group's
    stale-register reuse (`ConvertPlanarYUVToV210`, convert.c:13891)."""
    from cineform_tpu.models.intra_host import decode_sample_to
    sample = _golden("s_320x240_q4_p1.cfhd")
    assert decode_sample_to(sample, "v210") == _golden("s_320x240_q4_p1.v210out")


def test_decoder_api_output_formats():
    sample = _golden("s_320x240_q4_p1.cfhd")
    for pf, nbytes in ((api.PixelFormat.UYVY, 320 * 240 * 2),
                       (api.PixelFormat.YU64, 320 * 240 * 4),
                       (api.PixelFormat.V210, ((320 + 47) // 48) * 128 * 240)):
        dec = api.Decoder()
        dec.prepare_to_decode(0, 0, pf, sample=sample)
        out = dec.decode_sample(sample)
        assert out.size == nbytes, (pf, out.size)


def test_decode_output_rg48_byte_exact():
    """RGB 4:4:4 output of a YUV sample: BYTE-EXACT — the pinned
    deterministic chain (default +24 lowpass offset, replicated chroma,
    `PlanarYUV16toPlanarRGB16` fixed-point CG709 matrix with TWEAK
    adjustments and int16 wrap quirks, `ConvertLinesToOutput` packing)."""
    from cineform_tpu.models.intra_host import decode_sample_to
    sample = _golden("yu64_320x240_q4_p1.cfhd")
    assert decode_sample_to(sample, "RG48") == _golden(
        "yu64_320x240_q4_p1.rg48out")


def test_decode_output_rgb_family_byte_exact():
    """RG48/b64a/r210/DPX0/RG30 outputs byte-exact vs the reference
    (bayer.c:478 ConvertLinesToOutput packing rules)."""
    from cineform_tpu.models.intra_host import decode_sample_to
    sample = _golden("s_128x96_q4_p1.cfhd")
    for fmt, gname in (("RG48", "rg48out"), ("b64a", "b64aout"),
                       ("r210", "r210out"), ("DPX0", "dpx0out"),
                       ("RG30", "rg30out")):
        assert decode_sample_to(sample, fmt) == _golden(
            f"s_128x96_q4_p1.{gname}"), fmt


def test_decode_output_bgra_shape():
    from cineform_tpu.models.intra_host import decode_sample_to
    sample = _golden("s_320x240_q4_p1.cfhd")
    out = decode_sample_to(sample, "BGRA")
    assert len(out) == 320 * 240 * 4
    out64 = decode_sample_to(sample, "b64a")
    assert len(out64) == 320 * 240 * 8


@pytest.mark.skipif(not os.path.exists(REFBIN), reason="reference not built")
@pytest.mark.parametrize("sub,pf,frame_fn,w,h", [
    ("encode_rg48", api.PixelFormat.RG48, tfgen.rg48_frame, 64, 48),
    ("encode_yu64", api.PixelFormat.YU64, tfgen.yu64_frame, 64, 48),
    ("encode_byr4", api.PixelFormat.BYR4, tfgen.byr4_frame, 128, 96),
    ("encode_v210", api.PixelFormat.V210, tfgen.v210_frame, 96, 48),
])
def test_narrow_width_formats_byte_exact(sub, pf, frame_fn, w, h):
    """The width<=16 SSE2 row-filter quirk (ref/intra._h26_forward)
    generalizes through every encoded-format path: RGB-444, Bayer and
    deep-YUV samples at narrow widths are byte-exact vs the reference."""
    import subprocess
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "nw.cfhd")
        r = subprocess.run([REFBIN, sub, str(w), str(h), "4", "1", path],
                           capture_output=True)
        assert r.returncode == 0, r.stderr
        gold = open(path, "rb").read()
    mine = _encode(pf, frame_fn(w, h, 1), w, h, _metadata_from(gold))
    assert mine == gold


def test_decode_output_deep_narrow_width_byte_exact():
    """Deep outputs at w%32==16 (odd chroma lowpass width): the generic
    lowpass parse path applies channeloffset +5 instead of the fast
    path's format-dependent value (decoder.c:12479), pinned byte-exact."""
    from cineform_tpu.models.intra_host import decode_sample_to
    sample = _golden("s_144x96_q4_p1.cfhd")
    assert decode_sample_to(sample, "YU64") == _golden("s_144x96_q4_p1.yu64out")
    assert decode_sample_to(sample, "v210") == _golden("s_144x96_q4_p1.v210out")


def test_decode_narrow_width_yuy2_byte_exact():
    """The odd-lowpass-width channel offset also closes the last
    narrow-width 8-bit gap: 144x96 decode is now fully byte-exact
    (chroma included)."""
    from cineform_tpu.models import intra_host
    out, _ = intra_host.decode_sample(_golden("s_144x96_q4_p1.cfhd"))
    assert out == _golden("s_144x96_q4_p1.yuy2")


def test_decode_output_bgra_byte_exact():
    """BGRA: BYTE-EXACT — the fused final-level horizontal inverse +
    YUV->RGB kernel (`InvertHorizontalStripYUV16sToPackedRGB32`,
    spatial.c:29577) modeled exactly: saturating SSE filter lanes with
    the +2048/subs_epu16 zero clamp and logical descale, the staged
    (<<7 mulhi 19072 <<1) conversion with mullo/srai coefficient
    pre-shifts in the fast region, plain integer filters + direct
    conversion in the scalar mid region, and the border bracket with the
    right-edge chroma pairing."""
    from cineform_tpu.models.intra_host import decode_sample_to
    sample = _golden("s_320x240_q4_p1.cfhd")
    assert decode_sample_to(sample, "BGRA") == \
        _golden("s_320x240_q4_p1.bgraout")


def test_rgb444_decode_byte_exact():
    """RGB 4:4:4 source decode is BYTE-EXACT vs the reference: the
    Row16u reconstruction at precision 12 (no lowpass channel offset,
    `decoder.c:12296`), with per-writer saturation semantics — RG48
    keeps the scalar-tail SATURATE_16U (65535) while the 3-channel b64a
    writer stays 12-bit-capped (65520) except the right-border pair."""
    from cineform_tpu.models.intra_host import decode_sample_rgb

    sample = _golden("rgb444_320x240_q4.cfhd")
    assert decode_sample_rgb(sample, "RG48")[0] == \
        _golden("rgb444_320x240_q4.rg48out")
    assert decode_sample_rgb(sample, "b64a")[0] == \
        _golden("rgb444_320x240_q4.b64aout")


def test_rgba4444_decode_byte_exact():
    """RGBA 4:4:4:4 source decode is BYTE-EXACT incl. the full-16-bit
    alpha decompand (floor at 4096, * 9400 >> 13, clamp), for both b64a
    and RG48 (alpha dropped) outputs."""
    from cineform_tpu.models.intra_host import decode_sample_rgb

    sample = _golden("rgba4444_320x240_q4.cfhd")
    assert decode_sample_rgb(sample, "b64a")[0] == \
        _golden("rgba4444_320x240_q4.b64aout")
    assert decode_sample_rgb(sample, "RG48")[0] == \
        _golden("rgba4444_320x240_q4.rg48out")


def test_rgb_source_decode_through_api():
    sample = _golden("rgb444_320x240_q4.cfhd")
    dec = api.Decoder()
    dec.prepare_to_decode(0, 0, api.PixelFormat.RG48, sample=sample)
    assert dec.decode_sample(sample).tobytes() == \
        _golden("rgb444_320x240_q4.rg48out")
    dec = api.Decoder()
    dec.prepare_to_decode(0, 0, api.PixelFormat.B64A, sample=sample)
    assert dec.decode_sample(sample).tobytes() == \
        _golden("rgb444_320x240_q4.b64aout")


def test_decode_output_tail_yuv_byte_exact():
    """Round-4 output-format tail of a 4:2:2 YUV sample: yuyv (same bytes
    as YUY2), BGRa (top-down BGRA), RG24 (rand-dithered 8-bit BGR,
    bottom-up), R408/V408 (8-bit AYUV/UYVA with the fixed dither lanes),
    WP13/W13A (the signed 13-bit Active-Metadata working format) — all
    byte-exact vs decode_fmt goldens from the reference binary."""
    from cineform_tpu.models.intra_host import decode_sample_to

    sample = _golden("s_320x240_q4_p1.cfhd")
    for fmt, gname in (("yuyv", "yuyvout"), ("BGRa", "bgra_sdout"),
                       ("RG24", "rg24out"), ("R408", "r408out"),
                       ("V408", "v408out"), ("WP13", "wp13out"),
                       ("W13A", "w13aout")):
        assert decode_sample_to(sample, fmt) == _golden(
            f"s_320x240_q4_p1.{gname}"), fmt


def test_decode_output_tail_bayer_byte_exact():
    """BYR2 (GenerateBYR2 without the linear-restore curve) and
    WP13/W13A outputs of a Bayer sample, byte-exact vs the binary."""
    from cineform_tpu.models.intra_host import decode_sample_bayer_to

    sample = _golden("byr4_320x240_q4_p1.cfhd")
    for fmt, gname in (("BYR2", "byr2out"), ("WP13", "wp13out"),
                       ("W13A", "w13aout")):
        assert decode_sample_bayer_to(sample, fmt) == _golden(
            f"byr4_320x240_q4_p1.{gname}"), fmt


def test_decode_output_tail_rgb_byte_exact():
    """WP13/W13A outputs of an RGB 4:4:4 sample (RG48 >> 3 + alpha),
    byte-exact vs the binary."""
    from cineform_tpu.models.intra_host import decode_sample_rgb

    sample = _golden("rg48_320x240_q4_p1.cfhd")
    for fmt, gname in (("WP13", "wp13out"), ("W13A", "w13aout")):
        out, _ = decode_sample_rgb(sample, fmt)
        assert out == _golden(f"rg48_320x240_q4_p1.{gname}"), fmt


def test_decode_output_rgb8_of_rgb_sample_near_exact():
    """BGRa/RG24 8-bit outputs of an RGB 4:4:4 sample: the reference
    rounds with rand()&127 vectors (ConvertPlanarRGB16uToPackedRGB32);
    our round-to-nearest stays within +/-1 everywhere."""
    from cineform_tpu.models.intra_host import decode_sample_rgb

    sample = _golden("rg48_320x240_q4_p1.cfhd")
    for fmt, gname, ch in (("BGRa", "bgra_sdout", 4), ("RG24", "rg24out", 3)):
        out, _ = decode_sample_rgb(sample, fmt)
        mine = np.frombuffer(out, np.uint8).astype(int)
        gold = np.frombuffer(_golden(f"rg48_320x240_q4_p1.{gname}"),
                             np.uint8).astype(int)
        d = np.abs(mine - gold)
        assert d.max() <= 1, (fmt, d.max())
        assert (d > 0).mean() < 0.2, (fmt, (d > 0).mean())


def test_encode_tail_inputs_pinned_rejection():
    """b48r/WP13/W13A/R408/V408/BYR2/YV12/NV12 encode: the reference SDK
    itself REJECTS these (CFHD_EncodeSample returns BADFORMAT — they are
    absent from CSampleEncoder's input list, `SampleEncoder.cpp:60-88`;
    verified against the binary via probe_sample encode_raw).  Our
    encoder rejects them the same way."""
    for fourcc in ("b48r", "WP13", "W13A", "R408", "V408", "BYR2",
                   "YV12", "NV12"):
        code = sum(ord(c) << (8 * (3 - i)) for i, c in enumerate(fourcc))
        enc = api.Encoder()
        with pytest.raises(api.CFHDError):
            enc.prepare_to_encode(320, 240, code)
            enc.encode_sample(b"\0" * (320 * 240 * 8))


AVID_RAW_FORMATS = [
    ("raw_avu8", api.PixelFormat.CT_UCHAR, 320 * 240 * 2),
    ("raw_av28", api.PixelFormat.CT_10BIT_2_8, 320 * 240 * 5 // 2),
    ("raw_a214", api.PixelFormat.CT_SHORT_2_14, 320 * 240 * 4),
    ("raw_a106", api.PixelFormat.CT_USHORT_10_6, 320 * 240 * 4),
    ("raw_av16", api.PixelFormat.CT_SHORT, 320 * 240 * 4),
]


def test_avid_ct_inputs_encode_byte_exact():
    """The Avid CT family as ENCODE inputs, byte-exact vs the binary:
    avu8 (8-bit CbYCrY << 2), av28 (two-plane 2+8 bit), a214 (signed
    2.14 with the video-range rescale), a106/av16 (16-bit >> 6)
    (`Codec/frame.c:13144-13520`, `EncoderSDK/SampleEncoder.cpp:675`)."""
    for name, pf, nbytes in AVID_RAW_FORMATS:
        gold = _golden(name + ".cfhd")
        meta = _metadata_from(gold)
        assert _encode(pf, _raw_fill(nbytes, 1), 320, 240, meta) == gold, name


def test_bgra_inverted_input_encode_byte_exact():
    """BGRa = COLOR_FORMAT_RGB32_INVERTED: BGRA pixels with rows stored
    top-down (`EncoderSDK/SampleEncoder.cpp:1228`, `Codec/color.h:71`).
    Note: the reference crashes (double free) when BGRa is paired with
    ENCODED_FORMAT_RGBA_4444; RGB_444 is the supported combination."""
    gold = _golden("raw_BGRa.cfhd")
    meta = _metadata_from(gold)
    assert _encode(api.PixelFormat.BGRa, _raw_fill(320 * 240 * 4, 1),
                   320, 240, meta) == gold


def test_avid_ct_outputs_decode_byte_exact():
    """The Avid CT family as DECODE outputs, byte-exact vs the binary's
    decode_fmt goldens (`ConvertYUV16ToCbYCrY_*`,
    `Codec/convert.c:19023-19929`; av28's converter wires the chroma
    channels the other way around from av16/a106/a214)."""
    from cineform_tpu.models.intra_host import decode_sample_to

    sample = _golden("s_320x240_q4_p1.cfhd")
    for f in ("av16", "a106", "a214", "av28"):
        assert decode_sample_to(sample, f) == \
            _golden(f"s_320x240_q4_p1.{f}out"), f


def test_avu8_output_rejected_like_reference():
    """CT_UCHAR as a decode output: the reference accepts it in
    PrepareToDecode but CFHD_DecodeSample always fails
    (CSampleDecoder::GetFramePitch has no avu8 case and throws;
    surfaced as CFHD_ERROR_DECODE_BUFFER_SIZE).  We mirror the
    accept-then-reject behavior."""
    sample = _golden("s_320x240_q4_p1.cfhd")
    dec = api.Decoder()
    dec.prepare_to_decode(0, 0, output_format=api.PixelFormat.CT_UCHAR,
                          sample=sample)
    with pytest.raises(api.CFHDError):
        dec.decode_sample(sample)


def test_avid_ct_outputs_via_api():
    sample = _golden("s_320x240_q4_p1.cfhd")
    for pf, name in ((api.PixelFormat.CT_SHORT, "av16"),
                     (api.PixelFormat.CT_10BIT_2_8, "av28")):
        dec = api.Decoder()
        dec.prepare_to_decode(0, 0, output_format=pf, sample=sample)
        out = dec.decode_sample(sample)
        assert out.tobytes() == _golden(f"s_320x240_q4_p1.{name}out")
