"""Bayer RAW decode: byte-exact vs the reference binary.

Goldens produced by CFHD_DecodeSample on byr4_320x240_q4_p1.cfhd with
BYR4 and RG48 output formats (full mosaic resolution).
"""

import os

import numpy as np
import pytest

from cineform_tpu import api
from cineform_tpu.models import intra_host

HERE = os.path.dirname(__file__)


def _golden(name):
    with open(os.path.join(HERE, "golden", "samples", name), "rb") as f:
        return f.read()


def test_bayer_decode_byr4_byte_exact():
    """BYR4 output: GenerateBYR2's scalar un-difference through the
    BYR4LinearRestore log-to-linear LUT (`Codec/bayer.c:13237`,
    `decoder.c:10714-10790`)."""
    sample = _golden("byr4_320x240_q4_p1.cfhd")
    assert intra_host.decode_sample_bayer_to(sample, "BYR4") == \
        _golden("byr4_320x240_q4_p1.byr4out")


def test_bayer_decode_rg48_byte_exact():
    """RG48 output: the full DemosaicRAW chain — ColorDifference2Bayer's
    SSE 14-bit un-difference, the CF-enhanced 5x5 debayer with Advanced
    Detail 1 horizontal+vertical sharpening, and the direct 16-bit store
    (`Codec/bayer.c:9339`, `DemoasicFrames.cpp:154-345`)."""
    sample = _golden("byr4_320x240_q4_p1.cfhd")
    assert intra_host.decode_sample_bayer_to(sample, "RG48") == \
        _golden("byr4_320x240_q4_p1.rg48out")


def test_bayer_decode_through_api():
    """api.Decoder routes Bayer samples (mosaic-doubled dimensions like
    ParseSampleHeader, decoder.c:2619) to the byte-exact RAW chain."""
    sample = _golden("byr4_320x240_q4_p1.cfhd")
    dec = api.Decoder()
    w, h, _ = dec.prepare_to_decode(0, 0, api.PixelFormat.RG48,
                                    sample=sample)
    assert (w, h) == (320, 240)
    out = dec.decode_sample(sample)
    assert out.tobytes() == _golden("byr4_320x240_q4_p1.rg48out")

    dec = api.Decoder()
    dec.prepare_to_decode(0, 0, api.PixelFormat.BYR4, sample=sample)
    assert dec.decode_sample(sample).tobytes() == \
        _golden("byr4_320x240_q4_p1.byr4out")

    dec = api.Decoder()
    dec.prepare_to_decode(0, 0, api.PixelFormat.NV12, sample=sample)
    with pytest.raises(api.CFHDError):
        dec.decode_sample(sample)


def test_bayer_roundtrip_linear():
    """Encode -> BYR4 decode (linear-restored via BYR4LinearRestore)
    closely tracks the linear bayer source."""
    from cineform_tpu.utils.testframes import byr4_frame

    sample = _golden("byr4_320x240_q4_p1.cfhd")
    out = np.frombuffer(intra_host.decode_sample_bayer_to(sample, "BYR4"),
                        '<u2').reshape(240, 320).astype(np.int64)
    src = np.frombuffer(byr4_frame(320, 240, 1), '<u2').reshape(
        240, 320).astype(np.int64)
    err = np.abs(out - src).mean()
    assert err < 1024, err


def test_bayer_decode_b64a_byte_exact():
    """Bayer-source b64a output is LITTLE-endian ARGB16 with opaque
    alpha over the same demosaic chain (unlike the byte-swapped
    YUV-source b64a writer) — pinned against the binary."""
    sample = _golden("byr4_320x240_q4_p1.cfhd")
    assert intra_host.decode_sample_bayer_to(sample, "b64a") == \
        _golden("byr4_320x240_q4_p1.b64aout")


@pytest.mark.parametrize("name", ["byr4_wbal_320x240_q4",
                                  "byr4_wbal2_320x240_q4"])
def test_bayer_wbal_develop_byte_exact(name):
    """WBAL metadata drives the ApplyActiveMetaData 1D-LUT develop stage
    byte-exactly: Curve2Linear -> integer diagonal matrix
    ((gain*8192)*v >> 13, clamp [-16384, 49151]) -> Linear2Curve -> <<3
    store (CURVES_PROCESSING_MACRO, bayer.c:7164; LUT builders
    bayer.c:5196/5289).  The WBAL payload's second green is skipped
    (DemoasicFrames.cpp:5766) and gains are only capped to [0.4, 10]
    (the renormalize block is #if 0)."""
    sample = _golden(name + ".cfhd")
    assert intra_host.decode_sample_bayer_to(sample, "RG48") == \
        _golden(name + ".rg48out")


def test_bayer_colm_matrix_byte_exact():
    """COLM color matrix metadata drives the full linear 3x4 matrix
    through the same integer 1D-LUT develop stage (lcm = (int)(m*8192),
    row dot >> 13 + offset, clamps) — byte-exact vs the binary."""
    sample = _golden("byr4_colm_320x240_q4.cfhd")
    assert intra_host.decode_sample_bayer_to(sample, "RG48") == \
        _golden("byr4_colm_320x240_q4.rg48out")


def test_bayer_saturation_exposure_byte_exact():
    """SATU + EXPS compose into the linear develop matrix exactly like
    NeedCube (float32 fullsat blend for sat > 1, exposure scaling every
    column) before the integer 1D-LUT stage — byte-exact vs the binary
    (COLM + SATU 1.4 + EXPS 1.2 sample)."""
    sample = _golden("byr4_satexp_320x240_q4.cfhd")
    assert intra_host.decode_sample_bayer_to(sample, "RG48") == \
        _golden("byr4_satexp_320x240_q4.rg48out")


def test_bayer_gamma_tweaks_byte_exact():
    """GAMT per-channel gamma tweaks run the GammaContrast 1D LUTs
    (Build1DLinear2Curves, bayer.c:5322: pow with the exponent
    1/(double)(float)gamma, *8192 float truncation) — byte-exact vs the
    binary (gammas 1.2/1.0/0.9)."""
    sample = _golden("byr4_gamt_320x240_q4.cfhd")
    assert intra_host.decode_sample_bayer_to(sample, "RG48") == \
        _golden("byr4_gamt_320x240_q4.rg48out")


def test_bayer_decode_yuy2_byte_exact():
    """Bayer -> YUY2: the 8-bit output path (bilinear non-hq debayer, no
    sharpening) with the deterministic YUYV conversion — 1.15 mulhi
    RGB2YUV (CG 709), fixed ordered dither lanes with the row-parity
    luma/chroma swaps, per-SSE-block 4:2:2 down-filter, and the mosaic-
    row dither parity (ConvertLinesToOutput height=2 per mosaic row).
    NEWDITHER is compiled out, so the path is fully deterministic."""
    sample = _golden("byr4_320x240_q4_p1.cfhd")
    assert intra_host.decode_sample_bayer_to(sample, "YUY2") == \
        _golden("byr4_320x240_q4_p1.yuy2out")


def test_bayer_decode_yuy2_with_develop_byte_exact():
    """Bayer -> YUY2 with WBAL develop: the whitepoint-13 branch runs
    ConvertCGRGBtoVSRGB (mulhi 28141, <<1, +512) and the VIDEO-SAFE 709
    matrix with yoffset 0 — byte-exact vs the binary."""
    sample = _golden("byr4_wbal_320x240_q4.cfhd")
    assert intra_host.decode_sample_bayer_to(sample, "YUY2") == \
        _golden("byr4_wbal_320x240_q4.yuy2out")


def test_bayer_decode_2vuy_byte_exact():
    sample = _golden("byr4_320x240_q4_p1.cfhd")
    assert intra_host.decode_sample_bayer_to(sample, "2vuy") == \
        _golden("byr4_320x240_q4_p1.2vuyout")


def test_bayer_prcs_only_byte_exact():
    """PRCS=ACTIVE alone (no develop tags) leaves the direct DemosaicRAW
    path byte-exact (the develop LUT chain does not engage)."""
    sample = _golden("byr4_prcs1_96x64_q4.cfhd")
    assert intra_host.decode_sample_bayer_to(sample, "RG48") == \
        _golden("byr4_prcs1_96x64_q4.rg48out")


def test_bayer_vignette_develop_byte_exact():
    """VGNS/VGNE/VGNG vignette (FastVignetteInplaceWP13,
    `Codec/DemoasicFrames.cpp:421`; mono call `decoder.c:7874`):
    unity-minus-one tag mapping (`DemoasicFrames.cpp:5983`), float32
    xpos/ypos march, softstep Af, sign*trunc(sqrtf(v*v*Af)) — BYTE-EXACT
    on the identity-matrix WP13 local-buffer chain, whose basis is the
    RAW demosaic WP13 (rgb16 >> 3): with an identity matrix the binary
    does NOT run the 1D-LUT develop roundtrip (this closes the round-4
    'documented deviation', which came from modeling the buffer as the
    identity-LUT roundtrip + 1)."""
    sample = _golden("byr4_vgn_96x64_q4.cfhd")
    assert intra_host.decode_sample_bayer_to(sample, "RG48") == \
        _golden("byr4_vgn_96x64_q4.rg48out")


def test_bayer_blur_sharpen_develop_byte_exact():
    """BLSH blur/sharpen is TWO separable passes over the WP13
    local-buffer chain, both byte-exact:

    - horizontal: FastSharpeningBlurHinplaceWP13 in the geometric pass
      (`decoder.c:7880`, `Codec/DemoasicFrames.cpp:555`): integer 5-tap
      (positive and blur cases -1/-2) or 7/9-tap (cases -3/-4/-5) FIR
      >>12, with the in-place trailing-write layout (left margin pixels
      become the first filtered pixel, the right 2*margin stay raw), the
      1-2-1 edge blur, and the progressive >=0 clamp of pixels 4..W-1
    - vertical: FastSharpeningBlurVWP13 at output-conversion time
      (`decoder.c:8838`, `DemoasicFrames.cpp:1361`): float32 5-tap
      (or 7/9-tap blur with the edgenear equal-weight fallback), values
      lifted <<16, strict per-op float32 accumulation in the SSE order,
      cvtps_epi32 round-to-nearest-even, >>16, saturate

    Pinned standalone (positive + all negative cases), combined with a
    COLM matrix (buffer = the 1D-LUT develop output) and combined with
    vignette (vignette first, then H, then V)."""
    for g in ("byr4_blsh05", "byr4_blshm05", "byr4_blshm10",
              "byr4_colm_blsh", "byr4_vgn_blsh"):
        sample = _golden(f"{g}_96x64_q4.cfhd")
        assert intra_host.decode_sample_bayer_to(sample, "RG48") == \
            _golden(f"{g}_96x64_q4.rg48out"), g


def test_bayer_look_lut_protune_byte_exact():
    """LOOK 3D-LUT develop (LCRC tag): the built-in Protune preview
    look (CRC 0x3f6f5788, `Codec/DemoasicFrames.cpp:5017`) expands to a
    separable 32^3 LUT; BuildCube samples it on a 65^3 lattice
    (change==0 branch, `Codec/bayer.c:4978`: float32 trilinear with
    LUTscale = size-1-1e-5, trunc(rf*8192) to int16), TestCubeFor1Dness
    detects separability, and the RAW decode applies the cube as three
    1D lerps on the full 16-bit demosaic output with a single >>10
    (`bayer.c:8350`).  Byte-exact vs the binary."""
    sample = _golden("byr4_look_protune_96x64_q4.cfhd")
    assert intra_host.decode_sample_bayer_to(sample, "RG48") == \
        _golden("byr4_look_protune_96x64_q4.rg48out")


def test_bayer_look_lut_cflook_file_byte_exact(monkeypatch, tmp_path):
    """File-based .cflook look via the LUTs database: a NON-separable
    16^3 LUT resolved as <LUTsPath>/<CRC8X>.cflook
    (`DemoasicFrames.cpp:5101`), applied through the full integer
    trilinear RawCube path (`bayer.c:8440`).  Byte-exact vs the binary
    (which read the same .cflook through its dbsettings LUTPath)."""
    import shutil

    from cineform_tpu.utils import lutpath

    lut_dir = tmp_path / "LUTs"
    lut_dir.mkdir()
    shutil.copy(
        os.path.join(HERE, "golden", "samples", "DEADBEEF.cflook"),
        lut_dir / "DEADBEEF.cflook")
    monkeypatch.setattr(lutpath, "default_lut_dir", lambda: str(lut_dir))
    sample = _golden("byr4_look_cflook_96x64_q4.cfhd")
    assert intra_host.decode_sample_bayer_to(sample, "RG48") == \
        _golden("byr4_look_cflook_96x64_q4.rg48out")


def test_bayer_composed_develop_cube_byte_exact():
    """With a LOOK active the WHOLE develop folds into one RawCube
    (BuildCube's change==1 branch, `Codec/bayer.c:4768-4977`): the
    encode-curve float table (curve2lin, log2lin over k/63), the
    (1 - 2/64)-scaled linear matrix with its negative-cross-term blend
    guards, per-channel gamma-tweak 512-entry lerps (unity channels
    skipped), the lin2curve restore lerp, then the float trilinear LOOK
    sample — truncated to int16 at *8192.  Byte-exact vs the binary:

    - COLM + Protune look (non-separable cube -> integer trilinear)
    - GAMT + Protune look
    - the FULL combination: COLM + GAMT + look + vignette + BLSH
      (cube apply, then vignette, then both sharpen passes)"""
    for g in ("byr4_colm_look", "byr4_gamt_look", "byr4_full_develop"):
        sample = _golden(f"{g}_96x64_q4.cfhd")
        assert intra_host.decode_sample_bayer_to(sample, "RG48") == \
            _golden(f"{g}_96x64_q4.rg48out"), g


def test_bayer_contrast_develop_byte_exact():
    """CTRS contrast (TAG_CONTRAST, `DemoasicFrames.cpp:6035`: stored
    unity-at-0 as tag-1 clamped [-1,10], effective = stored+1,
    `bayer.c:4562`; gated by the GAMMA_TWEAKS PRCS bit) — byte-exact via
    both engines: the 1D GammaContrast tables (lin2gam then
    calc_contrast then *8192 trunc, `bayer.c:5322-5345`) standalone and
    with GAMT, and the composed RawCube when a LOOK is active."""
    for g in ("byr4_ctrs", "byr4_ctrs_gamt", "byr4_ctrs_look"):
        sample = _golden(f"{g}_96x64_q4.cfhd")
        assert intra_host.decode_sample_bayer_to(sample, "RG48") == \
            _golden(f"{g}_96x64_q4.rg48out"), g
