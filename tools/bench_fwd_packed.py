#!/usr/bin/env python3
"""Measure full on-device encode throughput: unpack -> DWT+quant ->
device entropy pack, all in one traced program, chained K times with a
data dependence so the tunnel latency is amortized."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from cineform_tpu.models.intra import IntraCodec
from cineform_tpu.utils.testframes import yuy2_frame


def main():
    w, h, quality = 1920, 1080, 4
    batch = 8
    base = np.frombuffer(yuy2_frame(w, h, 1), dtype=np.uint8).reshape(h, 2 * w)
    frames = np.stack([np.roll(base, i, axis=0) for i in range(batch)])
    codec = IntraCodec(width=w, height=h, quality=quality)

    K = 8

    @jax.jit
    def chained(frames):
        def body(_, carry):
            acc, cur = carry
            out = codec.forward_packed(cur)
            s = jnp.int32(0)
            for lowpass, packed in out:
                s = s + lowpass[:, 0, 0].astype(jnp.int32).sum()
                for words, nbits, ovf in packed:
                    s = s + nbits[:, 0].astype(jnp.int32).sum()
            return acc + s, jnp.bitwise_xor(cur, (s & 1).astype(jnp.uint8))
        acc, _ = jax.lax.fori_loop(0, K, body, (jnp.int32(0), frames))
        return acc

    dev = jax.device_put(jnp.asarray(frames))
    t0 = time.perf_counter()
    float(chained(dev))
    print(f"compile+warm: {time.perf_counter()-t0:.1f}s")
    iters = 2
    t0 = time.perf_counter()
    for _ in range(iters):
        float(chained(dev))
    dt = time.perf_counter() - t0
    n = batch * K * iters
    print(f"fwd_packed: {1000*dt/n:.3f} ms/frame = {n/dt:.1f} fps "
          f"({jax.devices()[0]})")


if __name__ == "__main__":
    main()
