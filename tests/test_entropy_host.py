"""Entropy host codec vs golden band bitstreams from the reference encoder.

tests/golden/band_streams.txt holds the exact bytes the reference's
EncodeQuantLongRuns + FinishEncodeBand emit for deterministic synthetic
bands (tools/probe_band.c).  Our encoder must be byte-identical, and our
decoder must invert them to the companding-rounded coefficients.
"""

import os

import numpy as np
import pytest

from cineform_tpu.entropy import host
from cineform_tpu.spec import codebooks as cb

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "band_streams.txt")


def xorshift32_band(seed: int, w: int, h: int, density: int, cap: int) -> np.ndarray:
    """Reproduce the probe's deterministic band (tools/probe_band.c)."""
    out = np.zeros(w * h, dtype=np.int32)
    x = seed & 0xFFFFFFFF
    for i in range(w * h):
        x ^= (x << 13) & 0xFFFFFFFF
        x ^= x >> 17
        x ^= (x << 5) & 0xFFFFFFFF
        nonzero = (x % 100) < density
        mag = ((x >> 8) % cap) + 1
        sign = (x >> 30) & 1
        if nonzero:
            out[i] = -mag if sign else mag
    return out.reshape(h, w)


def _load_cases():
    cases = []
    with open(GOLDEN) as f:
        lines = f.read().splitlines()
    for i in range(0, len(lines), 2):
        hdr = dict(kv.split("=") for kv in lines[i].split()[1:])
        data = bytes.fromhex(lines[i + 1].split()[1]) if len(lines[i + 1].split()) > 1 else b""
        cases.append((hdr, data))
    return cases


CASES = _load_cases()
CB_BY_INDEX = {0: 9, 1: 17, 2: 18}


@pytest.mark.parametrize("case_idx", range(len(CASES)))
def test_encode_band_byte_identical(case_idx):
    hdr, golden = CASES[case_idx]
    band = xorshift32_band(
        int(hdr["seed"]), int(hdr["w"]), int(hdr["h"]),
        int(hdr["density"]), int(hdr["cap"]),
    )
    codeset = CB_BY_INDEX[int(hdr["cb"])]
    bits, sizes = host.encode_band(band, codeset)
    mine = host.pack_msb_first(bits, sizes, align=32)
    assert mine == golden, (
        f"case {hdr}: {len(mine)} vs {len(golden)} bytes; "
        f"first diff at {next((i for i in range(min(len(mine), len(golden))) if mine[i] != golden[i]), -1)}"
    )


@pytest.mark.parametrize("case_idx", range(len(CASES)))
def test_decode_reference_band(case_idx):
    hdr, golden = CASES[case_idx]
    w, h = int(hdr["w"]), int(hdr["h"])
    band = xorshift32_band(
        int(hdr["seed"]), w, h, int(hdr["density"]), int(hdr["cap"])
    )
    codeset = CB_BY_INDEX[int(hdr["cb"])]
    cs = cb.get_codeset(codeset)
    decoded, _ = host.decode_band(golden, w * h, codeset, quant=1)
    # expected: companding round-trip of the clamped input values
    maxmag = len(cs.mag_size) - 1
    cubic = cb.cubic_compand_table()
    expect = np.zeros(w * h, dtype=np.int32)
    flat = band.ravel()
    for i, v in enumerate(flat.tolist()):
        if v == 0:
            continue
        mag = min(abs(v), 1023)
        if cs.flags & cb.COMPANDING_CUBIC:
            code = int(cubic[mag])
        elif cs.flags & cb.COMPANDING_NONE:
            code = mag
        else:
            code = cb.old_compand(mag)
        code = min(code, maxmag)
        rec = cb.expand_code(code, cs.flags)
        expect[i] = -rec if v < 0 else rec
    np.testing.assert_array_equal(decoded, expect)


def test_roundtrip_own_encoder_random():
    rng = np.random.default_rng(42)
    band = rng.integers(-2000, 2000, size=(32, 48), dtype=np.int32)
    band[rng.random((32, 48)) < 0.7] = 0
    bits, sizes = host.encode_band(band, 17)
    data = host.pack_msb_first(bits, sizes)
    decoded, endpos = host.decode_band(data, band.size, 17, quant=1)
    # decode must recover exact positions and companding-rounded values
    nz_in = band.ravel() != 0
    nz_out = decoded != 0
    np.testing.assert_array_equal(nz_in, nz_out)
    assert np.all(np.sign(decoded) == np.sign(band.ravel()))
