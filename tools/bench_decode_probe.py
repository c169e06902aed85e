"""Probe: timing of the device sample decode.

All device arrays are passed as EXPLICIT jit arguments: capturing them
in closures bakes them into the program as constants, which measured
~100x slower per call on the axon tunnel (the artifact behind an
earlier bogus 28 ms/call reading; real cost was <0.1 ms).

Usage: python tools/bench_decode_probe.py [W H B quality]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cineform_tpu.entropy import device_decode as dd
    from cineform_tpu.models.intra import IntraCodec
    from cineform_tpu.utils.testframes import yuy2_frame

    w, h, b, q = (int(x) for x in (sys.argv[1:5] or (512, 256, 2, 4)))
    codec = IntraCodec(width=w, height=h, quality=q)
    frames = np.stack(
        [np.frombuffer(yuy2_frame(w, h, i), np.uint8).reshape(h, 2 * w)
         for i in range(b)])
    samples = codec.encode_batch(frames)
    print("sample bytes:", [len(s) for s in samples], flush=True)

    t0 = time.perf_counter()
    out = codec.decode_batch_device(samples)
    print("decode_batch_device compile+run:",
          round(time.perf_counter() - t0, 1), "s", flush=True)
    host = codec.decode_batch(samples)
    print("byte-identical:", bool((host == out).all()), flush=True)

    # repeat-call timing of the public path (includes host parse/slice)
    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        out = codec.decode_batch_device(samples)
    dt = (time.perf_counter() - t0) / iters
    print(f"decode_batch_device e2e: {dt*1e3:.2f} ms/call  "
          f"{dt*1e3/b:.2f} ms/frame  {b/dt:.0f} fps", flush=True)

    # device-program-only timing, chained inside one jit (bench.py
    # methodology): after any D2H pull the axon tunnel degrades per-call
    # dispatch to ~1-20 ms (measured), so independent dispatches measure
    # the tunnel, not the chip — K data-dependent iterations in one
    # program with a single scalar fetch sidestep that
    import jax
    import jax.numpy as jnp

    args = {}
    orig = type(codec)._decode_device_program

    def capture(self, *a):
        args["a"] = a
        return orig(self, *a)

    object.__setattr__(codec, "_decode_device_program",
                       capture.__get__(codec))
    codec.decode_batch_device(samples)
    a = args["a"]
    jax.block_until_ready(a[:5])
    K = 8

    @jax.jit
    def chained(pay, nch, qn, lin, lp):
        def body(_, carry):
            pay, acc = carry
            out, ovf = orig(codec, pay, nch, qn, lin, lp, a[5], a[6])
            s = out[:, 0, 0].astype(jnp.int32).sum()
            pay = tuple(p ^ (s & 1).astype(jnp.uint8) for p in pay)
            return pay, acc + s
        return jax.lax.fori_loop(0, K, body, (pay, jnp.int32(0)))[1]

    t0 = time.perf_counter()
    float(chained(*a[:5]))
    print(f"chained compile+warm: {time.perf_counter() - t0:.1f} s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(2):
        float(chained(*a[:5]))
    ms = (time.perf_counter() - t0) / (2 * K) * 1000
    print(f"device program (chained): {ms:.2f} ms/call  "
          f"{ms / b:.2f} ms/frame  {1000 / (ms / b):.0f} fps", flush=True)

if __name__ == "__main__":
    main()
