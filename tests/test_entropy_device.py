"""Device (XLA) band entropy encoder vs the byte-exact host oracle.

The device encoder re-expresses EncodeQuantLongRuns (`Codec/encoder.c:5386`)
as data-parallel stages; these tests pin it byte-for-byte against
entropy/host.py (itself validated against the reference encoder's golden
band streams) across codesets, densities, run shapes and edge cases.
"""

import numpy as np
import pytest

from cineform_tpu.entropy import device as edev
from cineform_tpu.entropy import host as ehost
from tests.test_entropy_host import CASES, CB_BY_INDEX, xorshift32_band


def host_band_bytes(band: np.ndarray, codeset: int) -> bytes:
    bits, sizes = ehost.encode_band(band, codeset)
    return ehost.pack_msb_first(bits, sizes, align=32)


@pytest.mark.slow
@pytest.mark.parametrize("case_idx", range(len(CASES)))
def test_device_matches_reference_golden_streams(case_idx):
    hdr, golden = CASES[case_idx]
    band = xorshift32_band(int(hdr["seed"]), int(hdr["w"]), int(hdr["h"]),
                           int(hdr["density"]), int(hdr["cap"]))
    codeset = CB_BY_INDEX[int(hdr["cb"])]
    assert edev.encode_band_bytes_device(band, codeset) == golden


@pytest.mark.parametrize("codeset", [9, 17, 18])
@pytest.mark.parametrize("case", [
    "sparse", "dense", "allzero", "allnz", "giant_runs", "clamped",
    "tail_run", "single", "runs_324", "alternating",
])
@pytest.mark.slow
def test_device_matches_host(codeset, case):
    rng = np.random.default_rng(hash((codeset, case)) & 0xFFFF)
    n = 3000
    if case == "sparse":
        band = rng.integers(-300, 300, n, dtype=np.int32)
        band[rng.random(n) < 0.9] = 0
    elif case == "dense":
        band = rng.integers(-1023, 1024, n, dtype=np.int32)
    elif case == "allzero":
        band = np.zeros(n, np.int32)
    elif case == "allnz":
        band = rng.integers(1, 1024, n, dtype=np.int32)
    elif case == "giant_runs":
        band = np.zeros(n, np.int32)
        band[0] = 5
        band[n - 1] = -7
    elif case == "clamped":
        band = rng.integers(-30000, 30000, n, dtype=np.int32)
        band[rng.random(n) < 0.5] = 0
    elif case == "tail_run":
        band = np.zeros(n, np.int32)
        band[10] = 3
    elif case == "single":
        band = np.zeros(n, np.int32)
        band[n // 2] = -1023
    elif case == "runs_324":
        # runs straddling every sparse-code boundary incl. 320/321
        band = np.zeros(n, np.int32)
        pos = 0
        for run in (0, 1, 11, 12, 13, 19, 20, 21, 31, 32, 33, 59, 60, 61,
                    99, 100, 101, 179, 180, 181, 319, 320, 321, 324, 645):
            pos += run
            if pos >= n:
                break
            band[pos] = int(rng.integers(1, 100))
            pos += 1
    else:  # alternating
        band = np.tile(np.array([0, 7], np.int32), n // 2)
    mine = edev.encode_band_bytes_device(band, codeset)
    assert mine == host_band_bytes(band, codeset), case


@pytest.mark.slow
def test_device_batched_consistency():
    """Batched (S, N) encode gives the same words/lengths as row-by-row."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    bands = rng.integers(-50, 50, size=(5, 2048), dtype=np.int32)
    bands[rng.random(bands.shape) < 0.8] = 0
    words, nbits, ovf = edev.encode_band_arrays(jnp.asarray(bands), 17)
    assert not np.asarray(ovf).any()
    for i in range(5):
        w1, n1, _ = edev.encode_band_arrays(jnp.asarray(bands[i]), 17)
        np.testing.assert_array_equal(np.asarray(words[i]), np.asarray(w1))
        assert int(nbits[i]) == int(n1)


def test_overflow_flag_fires_and_fallback_matches():
    """A band denser than the capacity flags overflow instead of emitting a
    corrupt stream."""
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    band = rng.integers(-1023, 1024, size=4096, dtype=np.int32)
    band[band == 0] = 1
    _, _, ovf = edev.encode_band_arrays(jnp.asarray(band), 17,
                                        cap_bits_per_elem=2)
    assert bool(np.asarray(ovf))
    # generous capacity encodes it fine
    assert edev.encode_band_bytes_device(band, 17) == host_band_bytes(band, 17)


def test_run_geometry():
    import jax.numpy as jnp

    v = np.zeros(512, np.int32)
    v[[5, 6, 100, 300]] = 1
    r, d = edev._run_geometry(jnp.asarray(v == 0), chunk=64)
    r, d = np.asarray(r), np.asarray(d)
    assert r[0] == 5 and d[0] == 0 and d[4] == 4
    assert r[7] == 93 and d[7] == 0 and r[99] == 93 and d[99] == 92
    assert r[301] == 211 and d[511] == 210
