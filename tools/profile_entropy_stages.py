#!/usr/bin/env python3
"""Per-stage timing of the device entropy encoder at 1080p batch-8 scale.

Each stage is chained K times inside one jitted program with a data
dependence between iterations, and exactly one scalar is fetched — the
tunnel to the chip has ~30ms+ round-trip latency, so per-call syncs
measure the tunnel, not the chip.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from cineform_tpu.entropy import device as edev

K = 8


def timeit(name, fn, *args, iters=2):
    float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    dt = (time.perf_counter() - t0) / (iters * K)
    print(f"{name:14s} {dt*1e3:9.3f} ms/call = {dt*1e3/8:7.3f} ms/frame-slice")
    return dt


def main():
    rng = np.random.default_rng(0)
    n = 540 * 960
    npad = -(-n // 256) * 256
    vals = rng.integers(-40, 40, size=(8, 3, npad), dtype=np.int32)
    vals[rng.random(vals.shape) < 0.75] = 0
    v = jnp.asarray(vals)
    t = edev.encode_tables(17)
    nt = npad // 256
    out_words = edev._word_cap(8 * n)

    @jax.jit
    def geometry(carry):
        def step(_, c):
            v, acc = c
            r, d = edev._run_geometry(v == 0, 256)
            s = (r.sum() + d.sum()).astype(jnp.int32)
            return v ^ (s & 1), acc + s
        return jax.lax.fori_loop(0, K, step, (carry, jnp.int32(0)))[1]

    @jax.jit
    def codes(carry):
        def step(_, c):
            v, acc = c
            bits, sizes = edev.band_codes(v, t, 256)
            s = bits.astype(jnp.int32).sum() + sizes.sum()
            return v ^ (s & 1), acc + s
        return jax.lax.fori_loop(0, K, step, (carry, jnp.int32(0)))[1]

    @jax.jit
    def chunktree(carry):
        def step(_, c):
            bits, sizes, acc = c
            bufs, lens, _ = edev.tree_pack(
                bits.reshape(8, 3, nt, 256), sizes.reshape(8, 3, nt, 256),
                cap_bits_per_elem=12)
            s = bufs.astype(jnp.int32).sum() + lens.sum()
            return bits ^ (s & 1).astype(jnp.uint32), sizes, acc + s
        return jax.lax.fori_loop(0, K, step, carry)[2]

    @jax.jit
    def concat(carry):
        def step(_, c):
            bufs, lens, acc = c
            w, tot = edev._concat_chunks(bufs, lens, out_words)
            s = w.astype(jnp.int32).sum() + tot.sum()
            return bufs ^ (s & 1).astype(jnp.uint32), lens, acc + s
        return jax.lax.fori_loop(0, K, step, carry)[2]

    @jax.jit
    def full(carry):
        def step(_, c):
            v, acc = c
            w, tot, _ = edev.encode_band_arrays(v, 17, 8)
            s = w.astype(jnp.int32).sum() + tot.sum()
            return v ^ (s & 1), acc + s
        return jax.lax.fori_loop(0, K, step, (carry, jnp.int32(0)))[1]

    bits, sizes = jax.jit(lambda v: edev.band_codes(v, t, 256))(v)
    bufs, lens, _ = jax.jit(lambda b, s: edev.tree_pack(
        b.reshape(8, 3, nt, 256), s.reshape(8, 3, nt, 256),
        cap_bits_per_elem=12))(bits, sizes)

    timeit("geometry", geometry, v)
    timeit("codes", codes, v)
    timeit("chunktree", chunktree, (bits, sizes, jnp.int32(0)))
    timeit("concat", concat, (bufs, lens, jnp.int32(0)))
    timeit("full", full, v)
    print("device:", jax.devices()[0])


if __name__ == "__main__":
    main()
