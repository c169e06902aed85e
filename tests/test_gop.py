"""2-frame GOP (FIELDPLUS) codec tests.

Golden data from the reference SDK (tools/probe_sample.c encode_gop /
decode_gop).  Gates:
- the lowpass chain and subbands 1-6, 8-10 of our forward transform are
  bit-exact vs the reference encoder's bitstream;
- our group decode matches the reference decoder closely (the reference's
  fused GOP kernels round the frame-wavelet highpass slightly differently;
  byte-exact GOP encode is a known TODO, see models/gop_host.py);
- roundtrip self-consistency and reference-SDK interop for our samples.
"""

import os

import numpy as np
import pytest

from cineform_tpu.bitstream import parse_sample
from cineform_tpu.entropy import native as entropy_native
from cineform_tpu.models import gop_host
from cineform_tpu.models.gop_host import SUBBAND_MAP
from cineform_tpu.models.intra_host import align16_pixels
from cineform_tpu.ref import gop as gxf
from cineform_tpu.ref import intra as xf
from cineform_tpu.spec import codebooks as cb
from cineform_tpu.utils.testframes import yuy2_frame

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden", "samples")


def _golden(name: str) -> bytes:
    with open(os.path.join(GOLDEN_DIR, name), "rb") as f:
        return f.read()


def _codes_of(vals: np.ndarray) -> np.ndarray:
    ct = cb.cubic_compand_table()
    expand = np.array([cb.expand_code(c, 4) for c in range(1100)])
    mc = np.clip(vals, -1023, 1023)
    return np.sign(mc) * expand[ct[np.minimum(np.abs(mc), 1024)]]


def test_gop_forward_exact_subbands():
    """Lowpass + subbands 1-6 and 8-10 must match the reference bitstream."""
    w, h = 320, 240
    f0 = xf.unpack_yuy2(yuy2_frame(w, h, 1), w, h)
    f1 = xf.unpack_yuy2(yuy2_frame(w, h, 2), w, h)
    s = parse_sample(_golden("gop_320x240_q4_p1.cfhd.f1"))
    assert s.num_subbands == 17 and s.num_wavelets == 6
    exact_sbs = {1, 2, 3, 4, 5, 6, 8, 9, 10}
    for ch in range(3):
        bq = gxf.fieldplus_band_quant(4, 10, ch)
        ll, bands = gxf.forward_channel_gop(f0[ch], f1[ch], bq)
        assert np.array_equal(ll, s.channels[ch].lowpass)
        for b in s.channels[ch].bands:
            if b.subband not in exact_sbs:
                continue
            widx, slot = SUBBAND_MAP[b.subband]
            pitchw = align16_pixels(b.width)
            ref, _ = entropy_native.decode_band(
                b.data, pitchw * b.height, codeset=17, quant=1)
            ref = ref.reshape(b.height, pitchw)[:, :b.width]
            assert np.array_equal(_codes_of(bands[widx][slot]), ref), b.subband


def test_gop_decode_close_to_reference():
    data = _golden("gop2_320x240_q4_p100.cfhd.f1")
    f0, f1 = gop_host.decode_group(data)
    for i, mine in enumerate([f0, f1]):
        gold = np.frombuffer(_golden(f"gop2_320x240_q4_p100.f{i}.yuy2"),
                             np.uint8).astype(float)
        a = np.frombuffer(mine, np.uint8).astype(float)
        diff = np.abs(a - gold)
        # The reference's fused GOP inverse kernels round borders and the
        # near-saturation luma range differently (known TODO); the bulk of
        # the image matches within the 1-bit dither.
        assert (diff <= 1).mean() > 0.80
        psnr = 10 * np.log10(255 ** 2 / np.mean(diff ** 2))
        assert psnr > 30, psnr


def test_gop_roundtrip_self_consistent():
    w, h = 320, 240
    raw0, raw1 = yuy2_frame(w, h, 100), yuy2_frame(w, h, 100)
    group = gop_host.encode_group(raw0, raw1, w, h, 4)
    s = parse_sample(group)
    assert s.num_subbands == 17
    d0, d1 = gop_host.decode_group(group)
    for raw, dec in ((raw0, d0), (raw1, d1)):
        a = np.frombuffer(raw, np.uint8).astype(float)
        b = np.frombuffer(dec, np.uint8).astype(float)
        psnr = 10 * np.log10(255 ** 2 / np.mean((a - b) ** 2))
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
        # Frame 1's gate is lower: the reference decoder reconstructs the
        # second GOP frame from the coarsely quantized temporal highpass and
        # measures ~19 dB against the source even for its own encodes of
        # noisy content (same measurement on the gop_320x240_q4_p1 golden).
        gates = (30, 18)
        for i, raw in enumerate((raw0, raw1)):
            dec = open(f"{out}.f{i}.yuy2", "rb").read()
            a = np.frombuffer(raw, np.uint8).astype(float)
            b = np.frombuffer(dec, np.uint8).astype(float)
            psnr = 10 * np.log10(255 ** 2 / np.mean((a - b) ** 2))
            assert psnr > gates[i], (i, psnr)
