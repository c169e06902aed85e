"""Probe: chained-in-program timing of the device entropy decode (bench.py
methodology: K iterations with a data dependence inside one jit, fetch one
scalar so the tunnel RTT cannot pollute the measurement).

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

    captured = {}
    orig = codec._decode_device_program
    object.__setattr__(
        codec, "_decode_device_program",
        lambda *a: (captured.update(a=a), orig(*a))[1])
    t0 = time.perf_counter()
    out = codec.decode_batch_device(samples)
    print("decode_batch_device compile+run:",
          round(time.perf_counter() - t0, 1), "s", flush=True)
    host = codec.decode_batch(samples)
    print("byte-identical:", bool((host == out).all()), flush=True)

    a = captured["a"]
    payload, reset, rb, re_, qn, lin, ib = (jax.device_put(x)
                                            for x in a[:7])
    lp = a[7]
    nout, batch, fidx = a[8:]
    T = payload.shape[0] // 4
    print(f"T={T} chunks  nout={nout}", flush=True)

    K = 8

    @jax.jit
    def chained_entropy(payload):
        def body(_, carry):
            acc, cur = carry
            coeffs, ovf = dd.decode_payload(cur, reset, rb, re_, qn, lin,
                                            ib, nout=nout)
            s = coeffs[::4097].astype(jnp.int32).sum()
            cur = cur.at[0].set(cur[0] ^ (s & 1).astype(jnp.uint8))
            return acc + s, cur
        acc, _ = jax.lax.fori_loop(0, K, body, (jnp.int32(0), payload))
        return acc

    @jax.jit
    def chained_full(payload):
        def body(_, carry):
            acc, cur = carry
            out, ovf = orig(cur, reset, rb, re_, qn, lin, ib, lp,
                            nout, batch, fidx)
            s = out[:, 0, 0].astype(jnp.int32).sum()
            cur = cur.at[0].set(cur[0] ^ (s & 1).astype(jnp.uint8))
            return acc + s, cur
        acc, _ = jax.lax.fori_loop(0, K, body, (jnp.int32(0), payload))
        return acc

    for name, fn in (("entropy", chained_entropy), ("full", chained_full)):
        t0 = time.perf_counter()
        float(fn(payload))
        print(f"{name} compile+warm: {time.perf_counter() - t0:.1f} s",
              flush=True)
        iters = 2
        t0 = time.perf_counter()
        for _ in range(iters):
            float(fn(payload))
        ms = (time.perf_counter() - t0) / (iters * K) * 1000
        print(f"{name} decode: {ms:.2f} ms/call  {ms / b:.2f} ms/frame  "
              f"{1000 / (ms / b):.0f} fps", flush=True)


if __name__ == "__main__":
    main()
