"""Validate entropy/device_decode.py against the host coder (CPU backend).

Builds multi-band concatenated payloads with per-chunk metadata exactly as
models/intra.py's device decode path will, and compares the dense device
output against entropy/host.decode_band with int16-wrap dequantization.

Run: JAX_PLATFORMS=cpu PYTHONPATH=. python tools/check_device_decode.py
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from cineform_tpu.entropy import device_decode as dd
from cineform_tpu.entropy import host as ehost


def build_case(rng, nbands):
    bands = []
    for _ in range(nbands):
        n = int(rng.integers(64, 3000))
        density = float(rng.choice([0.0, 0.02, 0.1, 0.5, 0.95]))
        vals = np.zeros(n, dtype=np.int64)
        nz = rng.random(n) < density
        vals[nz] = rng.integers(-1023, 1024, nz.sum())
        quant = int(rng.choice([1, 4, 12, 24]))
        codeset = int(rng.choice([17, 18]))
        bits, sizes = ehost.encode_band(vals, codeset)
        payload = ehost.pack_msb_first(bits, sizes, align=32)
        bands.append((payload, n, quant, codeset))
    return bands


def decode_device(bands, chunk_cap=4096, nout_cap=20000):
    payload = b"".join(p for p, _, _, _ in bands)
    used = len(payload) // 4
    assert used <= chunk_cap
    nchunks = chunk_cap
    payload = payload + b"\0" * (4 * (chunk_cap - used))
    reset = np.zeros(nchunks, bool)
    region_base = np.zeros(nchunks, np.int32)
    region_end = np.zeros(nchunks, np.int32)
    quant = np.ones(nchunks, np.int32)
    linear = np.zeros(nchunks, np.int32)
    inband = np.zeros(nchunks, np.int32)
    pos = 0
    out_base = 0
    spans = []
    for p, n, q, cs in bands:
        t0, t1 = pos // 4, (pos + len(p)) // 4
        reset[t0] = True
        region_base[t0:t1] = out_base
        region_end[t0:t1] = out_base + n
        quant[t0:t1] = q
        linear[t0:t1] = 1 if cs == 18 else 0
        inband[t0:t1] = 1
        spans.append((out_base, out_base + n))
        out_base += n
        pos += len(p)
    reset[used:] = True
    assert out_base <= nout_cap
    nout = nout_cap
    coeffs, ovf = dd.decode_payload_jit(
        jnp.asarray(np.frombuffer(payload, np.uint8)),
        jnp.asarray(reset), jnp.asarray(region_base),
        jnp.asarray(region_end), jnp.asarray(quant),
        jnp.asarray(linear), jnp.asarray(inband), nout=nout)
    return np.asarray(coeffs), np.asarray(ovf), spans


def main():
    rng = np.random.default_rng(11)
    fails = 0
    for trial in range(8):
        nbands = int(rng.integers(1, 7))
        bands = build_case(rng, nbands)
        coeffs, ovf, spans = decode_device(bands)
        assert not ovf.any(), "unexpected overflow flag"
        for (p, n, q, cs), (lo, hi) in zip(bands, spans):
            want, _ = ehost.decode_band(p, n, cs, q)
            want = ((want.astype(np.int32) << 16) >> 16)  # int16 wrap
            got = coeffs[lo:hi]
            if not (want == got).all():
                fails += 1
                d = np.flatnonzero(want != got)
                print(f"FAIL trial={trial} cs{cs} n={n} q={q} "
                      f"ndiff={len(d)} first={d[:5]}")
                print("  want", want[d[:3]], "got", got[d[:3]])
            else:
                print(f"ok trial={trial} cs{cs} n={n} q={q} "
                      f"payload={len(p)}B")
    print("FAILURES:", fails)


if __name__ == "__main__":
    main()
