"""2-frame GOP (FIELDPLUS) codec tests.

Golden data from the reference SDK (tools/probe_sample.c encode_gop /
decode_gop).  Gates:
- group ENCODE is byte-exact vs the reference encoder (progressive
  level-1 spatial wavelets; the temporal-high LL stored as an
  uncompressed 16-bit band, see models/gop_host.py);
- group DECODE replicates the reference decoder byte-exactly for all
  output rows except the bottom 14 (its bottom-strip kernel
  reconstructs intermediate-level borders differently; round-2 TODO);
- roundtrip self-consistency and reference-SDK interop for our samples.
"""

import os

import numpy as np
import pytest

from cineform_tpu.bitstream import parse_sample
from cineform_tpu.models import gop_host, intra_host
from cineform_tpu.utils.testframes import yuy2_frame

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden", "samples")

GOLDENS = [
    ("gop_320x240_q4_p1", 1, 2),
    ("gop2_320x240_q4_p100", 100, 100),
]


def _golden(name: str) -> bytes:
    with open(os.path.join(GOLDEN_DIR, name), "rb") as f:
        return f.read()


def _metadata_from(gold: bytes) -> intra_host.EncoderMetadata:
    blob = parse_sample(gold).metadata[0]
    vals = {}
    pos = 0
    while pos + 8 <= len(blob):
        four = blob[pos:pos + 4]
        size = int.from_bytes(blob[pos + 4:pos + 7], "little")
        vals[four.decode()] = blob[pos + 8:pos + 8 + size]
        pos += 8 + size + ((-size) % 4)
    return intra_host.EncoderMetadata(
        guid=vals["GUID"],
        date=vals["DATE"].rstrip(b"\0").decode(),
        time=vals["TIME"].rstrip(b"\0").decode(),
        timecode=vals["TIMC"].rstrip(b"\0").decode(),
        unique_frame=int.from_bytes(vals["UFRM"], "little"),
    )


@pytest.mark.parametrize("name,p0,p1", GOLDENS)
def test_gop_encode_byte_exact(name, p0, p1):
    gold = _golden(name + ".cfhd.f1")
    mine = gop_host.encode_group(yuy2_frame(320, 240, p0),
                                 yuy2_frame(320, 240, p1),
                                 320, 240, 4, 1, _metadata_from(gold))
    assert mine == gold


@pytest.mark.parametrize("name,p0,p1", GOLDENS)
def test_gop_decode_byte_exact(name, p0, p1):
    """Fully byte-exact GROUP decode, bottom strip included: the pyramid
    bottom borders are pinned per function (stale low-pair taps in
    InvertSpatialQuantOverflowProtected16s for w5/w3, standard in
    InvertSpatialQuantDescale16s for w4) and the temporal combine
    saturates before its >>1."""
    data = _golden(name + ".cfhd.f1")
    f0, f1 = gop_host.decode_group(data)
    assert f0 == _golden(f"{name}.f0.yuy2")
    assert f1 == _golden(f"{name}.f1.yuy2")


def test_gop_sequence_header_byte_exact():
    gold = _golden("gop_320x240_q4_p1.cfhd.f0")
    assert gop_host.sequence_header(320, 240) == gold


def test_gop_true_decode_uses_w1():
    """Our reference_compatible=False extension reconstructs frame 1 from
    its own wavelet; for distinct frames the two outputs must differ more
    than by dither, and fidelity to the true frame 1 must improve."""
    w, h = 320, 240
    raw0, raw1 = yuy2_frame(w, h, 1), yuy2_frame(w, h, 2)
    group = gop_host.encode_group(raw0, raw1, w, h, 4)
    c0, c1 = gop_host.decode_group(group, reference_compatible=True)
    t0, t1 = gop_host.decode_group(group, reference_compatible=False)
    assert t0 == c0  # frame 0 identical in both modes
    a1 = np.frombuffer(raw1, np.uint8).astype(float)

    def psnr(buf):
        b = np.frombuffer(buf, np.uint8).astype(float)
        return 10 * np.log10(255 ** 2 / np.mean((a1 - b) ** 2))

    assert psnr(t1) > psnr(c1) + 3  # true decode is materially closer


def test_gop_roundtrip_self_consistent():
    w, h = 320, 240
    raw0, raw1 = yuy2_frame(w, h, 100), yuy2_frame(w, h, 100)
    group = gop_host.encode_group(raw0, raw1, w, h, 4)
    s = parse_sample(group)
    assert s.num_subbands == 17
    d0, d1 = gop_host.decode_group(group)
    for raw, dec in ((raw0, d0), (raw1, d1)):
        a = np.frombuffer(raw, np.uint8).reshape(h, 2 * w).astype(float)
        b = np.frombuffer(dec, np.uint8).reshape(h, 2 * w).astype(float)
        # the reference-compatible decode reproduces the reference's own
        # stale bottom-border taps (the deepest LL's last row is ignored),
        # so the bottom strip is slightly softer but still well within gate
        psnr = 10 * np.log10(255 ** 2 / np.mean((a[:226] - b[:226]) ** 2))
        assert psnr > 34, psnr


REFBIN = "/root/repo/.refbuild/probe_sample"


@pytest.mark.skipif(not os.path.exists(REFBIN), reason="reference not built")
def test_reference_decodes_our_group():
    import subprocess
    import tempfile

    w, h = 320, 240
    raw0, raw1 = yuy2_frame(w, h, 100), yuy2_frame(w, h, 101)
    group = gop_host.encode_group(raw0, raw1, w, h, 4)
    seq = gop_host.sequence_header(w, h)
    with tempfile.TemporaryDirectory() as tmp:
        gp = os.path.join(tmp, "g.cfhd")
        sp = os.path.join(tmp, "s.cfhd")
        open(gp, "wb").write(group)
        open(sp, "wb").write(seq)
        out = os.path.join(tmp, "out")
        r = subprocess.run([REFBIN, "decode_gop", sp, gp, out],
                           capture_output=True)
        assert r.returncode == 0, r.stderr
        # The reference's full-res group decode returns frame 0's
        # reconstruction for BOTH frames (see models/gop_host.py): frame 0
        # gates against its source, frame 1 against frame 0's output.
        d0 = np.frombuffer(open(f"{out}.f0.yuy2", "rb").read(),
                           np.uint8).astype(float)
        d1 = np.frombuffer(open(f"{out}.f1.yuy2", "rb").read(),
                           np.uint8).astype(float)
        a = np.frombuffer(raw0, np.uint8).astype(float)
        psnr = 10 * np.log10(255 ** 2 / np.mean((a - d0) ** 2))
        assert psnr > 25, psnr
        assert np.abs(d0 - d1).max() <= 1  # differ only by output dither


def test_gop_jax_encode_byte_exact():
    """The device (JAX) GOP pipeline must produce the same bytes as the
    host oracle / reference encoder."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from cineform_tpu.models.gop import GopCodec

    gold = _golden("gop_320x240_q4_p1.cfhd.f1")
    codec = GopCodec(width=320, height=240, quality=4)
    f0 = np.frombuffer(yuy2_frame(320, 240, 1), np.uint8).reshape(1, 240, 640)
    f1 = np.frombuffer(yuy2_frame(320, 240, 2), np.uint8).reshape(1, 240, 640)
    samples = codec.encode_batch(f0, f1, 1, _metadata_from(gold))
    assert samples[0] == gold


# ---------------------------------------------------------------------------
# Narrow widths (the reference's width<=16 SSE2 row-filter quirk; the
# GOP's temporal-high spatial is a band-1 input whose row-0 overread
# lands on the temporal lowpass' last pixels — ref/gop.py w3)
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not os.path.exists(REFBIN), reason="reference not built")
@pytest.mark.parametrize("w,h", [(64, 48), (96, 48)])
def test_narrow_gop_encode_byte_exact(w, h):
    import subprocess
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "g.cfhd")
        r = subprocess.run([REFBIN, "encode_gop", str(w), str(h), "4", "1",
                            path], capture_output=True)
        assert r.returncode == 0, r.stderr
        golden = open(path + ".f1", "rb").read()
    mine = gop_host.encode_group(yuy2_frame(w, h, 1), yuy2_frame(w, h, 2),
                                 w, h, 4, 1, _metadata_from(golden))
    assert mine == golden


# ---------------------------------------------------------------------------
# Interlaced (HORZTEMP frame wavelet) GOP
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not os.path.exists(REFBIN), reason="reference not built")
@pytest.mark.parametrize("w,h,q,pat", [(320, 240, 4, 7), (320, 240, 1, 3),
                                       (192, 120, 6, 11), (64, 48, 4, 1)])
def test_interlaced_gop_encode_byte_exact(w, h, q, pat):
    """Interlaced encode is byte-exact vs the reference binary: HORZTEMP
    frame wavelets with the difference-coded HL band (codeset 18 + peaks
    table), interlaced quantizers, and the header layout without
    SAMPLE_FLAGS (`Codec/wavelet.c:6076`, `Codec/spatial.c:5327`,
    `Codec/encoder.c:6145-6156`)."""
    import subprocess
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "il.cfhd")
        r = subprocess.run([REFBIN, "encode_gop_ilace", str(w), str(h),
                            str(q), str(pat), path], capture_output=True)
        assert r.returncode == 0, r.stderr
        golden = open(path + ".f1", "rb").read()
    mine = gop_host.encode_group(
        yuy2_frame(w, h, pat), yuy2_frame(w, h, pat + 1), w, h, q, 1,
        _metadata_from(golden), progressive=False)
    assert mine == golden


@pytest.mark.skipif(not os.path.exists(REFBIN), reason="reference not built")
def test_interlaced_gop_decode_matches_reference():
    """Our interlaced group decode matches the reference decoder to within
    its +/-1 random output dither (`InvertInterlacedRow16s10bitToYUV`,
    `Codec/temporal.c:5961` builds rounding vectors from rand())."""
    import subprocess
    import tempfile

    w, h, q = 320, 240, 4
    grp = gop_host.encode_group(yuy2_frame(w, h, 7), yuy2_frame(w, h, 8),
                                w, h, q, 1, progressive=False)
    seq = gop_host.sequence_header(w, h)
    with tempfile.TemporaryDirectory() as tmp:
        sp, gp = os.path.join(tmp, "s.cfhd"), os.path.join(tmp, "g.cfhd")
        open(sp, "wb").write(seq)
        open(gp, "wb").write(grp)
        out = os.path.join(tmp, "out")
        r = subprocess.run([REFBIN, "decode_gop", sp, gp, out],
                           capture_output=True)
        assert r.returncode == 0, r.stderr
        ref0 = np.frombuffer(open(out + ".f0.yuy2", "rb").read(), np.uint8)
    f0, _ = gop_host.decode_group(grp)
    a = np.frombuffer(f0, np.uint8).reshape(h, 2 * w).astype(np.int32)
    b = ref0.reshape(h, 2 * w).astype(np.int32)
    # the reference's threaded group decode mishandles the bottom strip
    # (same known quirk as the progressive GROUP decode); gate above it
    assert np.abs(a[:h - 8] - b[:h - 8]).max() <= 2   # +/- output dither
    psnr = 10 * np.log10(255 ** 2 / max(np.mean((a - b) ** 2.0), 1e-9))
    assert psnr > 45, psnr


def test_interlaced_gop_roundtrip():
    """Interlaced encode -> decode reconstructs the fields faithfully."""
    w, h, q = 192, 120, 4
    f0 = yuy2_frame(w, h, 5)
    grp = gop_host.encode_group(f0, yuy2_frame(w, h, 6), w, h, q, 1,
                                progressive=False)
    d0, d1 = gop_host.decode_group(grp)
    a = np.frombuffer(f0, np.uint8).astype(float)
    b = np.frombuffer(d0, np.uint8).astype(float)
    psnr = 10 * np.log10(255 ** 2 / max(np.mean((a - b) ** 2), 1e-9))
    assert psnr > 25, psnr


def test_gop_deep_outputs_byte_exact():
    """GROUP samples decode to the deep output formats byte-exact: the
    same Row16u reconstruction with the num_frames=2 lowpass channel
    offsets (+14 deep YUV / +48 RGB, decoder.c:12276-12281)."""
    grp = _golden("gop_320x240_q4_p1.cfhd.f1")
    assert gop_host.decode_group_to(grp, "YU64") == \
        _golden("gop_320x240_q4_p1.yu64out")
    assert gop_host.decode_group_to(grp, "RG48") == \
        _golden("gop_320x240_q4_p1.rg48out")


def test_interlaced_gop_decode_byte_exact():
    """Interlaced GROUP decode is BYTE-EXACT vs the reference decoder:
    output dither replicated (InvertInterlacedRow16s10bitToYUV,
    temporal.c:5994: 16 rand()&1 per row pair, luma groups alternating
    rounding1/rounding2 with the odd row swapped, chroma lanes fixed per
    channel; absolute +48 lowpass offset) AND peaks substitution
    (DecodeBandFSM16sNoGapWithPeaks, decoder.c:19808: decoded values
    beyond PEAK_LEVEL take (peak/quant)*quant from the band's PEAK_TABLE
    chunk — the old +/-1 'dither edge case' was this table being
    dropped by the parser)."""
    grp = _golden("ilace_320x240_q4_p1.cfhd.f1")
    f0, f1 = gop_host.decode_group(grp)
    for i, mine in enumerate((f0, f1)):
        gold = _golden(f"ilace_320x240_q4_p1.f{i}.yuy2")
        assert mine == gold, f"frame {i} differs"


def test_gop_stream_protocol_encode_byte_exact():
    """6-frame GOP stream: the reference encoder emits the sequence
    header ONCE (first submission), a 24-byte SAMPLE_TYPE_FRAME header
    for the first submission of every later pair, and GROUP samples for
    the second submissions (`EncodeFirstSample` gate, encoder.c:3226;
    goldens from CFHD_EncodeSample over patterns 1..6)."""
    from cineform_tpu import api
    from cineform_tpu.utils.testframes import yuy2_frame

    enc = api.Encoder()
    enc.prepare_to_encode(320, 240, api.PixelFormat.YUY2,
                          api.EncodedFormat.YUV_422,
                          api.EncodingFlags.YUV_2FRAME_GOP,
                          api.EncodingQuality(4))
    for i in range(6):
        if i % 2:
            # GUID/DATE/TIME metadata is per-run random in the reference;
            # inject each group golden's values like the direct encode test
            enc._metadata = _metadata_from(
                _golden(f"gopstream_320x240_q4.s{i}"))
        enc.encode_sample(yuy2_frame(320, 240, 1 + i))
        got = enc.get_sample_data()
        want = _golden(f"gopstream_320x240_q4.s{i}")
        assert got == want, f"sample {i}: {len(got)} vs {len(want)} bytes"


def test_gop_stream_protocol_decode_byte_exact():
    """Decoding the stream: the sequence header yields no frame; a GROUP
    sample yields its first frame; the 24-byte SAMPLE_TYPE_FRAME sample
    yields the TRUE second frame of the held group — w1's highpass bands
    over (tlow + thigh) >> 1 with the second dither window
    (`DecodeSampleFrame` -> ReconstructSampleFrameToBuffer(1),
    decoder.c:11482/11546).  Byte-exact vs the reference decoding the
    same stream."""
    from cineform_tpu import api

    samples = [_golden(f"gopstream_320x240_q4.s{i}") for i in range(6)]
    dec = api.Decoder()
    dec.prepare_to_decode(320, 240, api.PixelFormat.YUY2, sample=samples[1])
    assert dec.decode_sample(samples[0]) is None
    # the reference decoder's glibc rand() dither stream persists across
    # DecodeSample calls: emitted frame k takes dither window k
    for i, name in [(1, "f0"), (2, "f1true"), (3, "f2"), (4, "f3true"),
                    (5, "f4")]:
        got = dec.decode_sample(samples[i]).tobytes()
        assert got == _golden(f"gopstream_320x240_q4.{name}.yuy2"), i


def test_gop_true_second_frame_deep_byte_exact():
    """The SAMPLE_TYPE_FRAME deep decode (YU64/RG48) is byte-exact vs the
    reference decoding group-then-tiny to the same formats."""
    grp = _golden("gopstream_320x240_q4.s1")
    assert gop_host.decode_group_to(grp, "YU64", frame=1) == \
        _golden("gopstream_320x240_q4.f1true.yu64out")
    assert gop_host.decode_group_to(grp, "RG48", frame=1) == \
        _golden("gopstream_320x240_q4.f1true.rg48out")


def test_gop_frame_header_sample_without_group_raises():
    from cineform_tpu import api

    tiny = _golden("gopstream_320x240_q4.s2")
    grp = _golden("gopstream_320x240_q4.s1")
    dec = api.Decoder()
    dec.prepare_to_decode(320, 240, api.PixelFormat.YUY2, sample=grp)
    with pytest.raises(api.CFHDError):
        dec.decode_sample(tiny)


def test_gop_bgra_decode_byte_exact():
    """GOP BGRA output: the GOP pyramid strips (+48 absolute offset)
    through the exact fused PackedRGB32 kernel (ref.intra.strip_to_bgra)
    — byte-exact vs the reference decoding the GROUP sample."""
    grp = _golden("gop_320x240_q4_p1.cfhd.f1")
    assert gop_host.decode_group_to(grp, "BGRA") == \
        _golden("gop_320x240_q4_p1.bgraout")


def test_gop_device_decode_byte_exact():
    """GopCodec.decode_batch_device — band entropy decode + the full
    FIELDPLUS pyramid + temporal combine + fused 8-bit output, all on
    device — is byte-identical to gop_host.decode_group for both frames,
    in both reference_compatible modes, and batches mixed groups
    (round-4 extension of the intra band-row class machinery to the
    17-subband map, `Codec/decoder.c:11180-11192`)."""
    from cineform_tpu.models.gop import GopCodec

    w, h = 320, 240
    g1 = gop_host.encode_group(yuy2_frame(w, h, 1), yuy2_frame(w, h, 2),
                               w, h, 4)
    g2 = gop_host.encode_group(yuy2_frame(w, h, 3), yuy2_frame(w, h, 0),
                               w, h, 4)
    codec = GopCodec(width=w, height=h, quality=4)
    for ref_compat in (True, False):
        f0, f1 = codec.decode_batch_device(
            [g1, g2], reference_compatible=ref_compat)
        for i, g in enumerate((g1, g2)):
            h0, h1 = gop_host.decode_group(
                g, reference_compatible=ref_compat)
            assert f0[i].tobytes() == h0, (ref_compat, i, "frame0")
            assert f1[i].tobytes() == h1, (ref_compat, i, "frame1")


def test_gop_device_decode_golden_sample():
    """Device GOP decode reproduces the reference binary's decoded frames
    (the committed goldens) byte for byte."""
    from cineform_tpu.models.gop import GopCodec

    data = _golden("gop_320x240_q4_p1.cfhd.f1")
    codec = GopCodec(width=320, height=240, quality=4)
    f0, f1 = codec.decode_batch_device([data])
    assert f0[0].tobytes() == _golden("gop_320x240_q4_p1.f0.yuy2")
    assert f1[0].tobytes() == _golden("gop_320x240_q4_p1.f1.yuy2")
