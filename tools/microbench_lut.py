#!/usr/bin/env python3
"""Microbench LUT strategies for the magnitude codebook on TPU.

Shape: (8, 3, 518400) int32 mags in [0, 255] — the level-1 luma group.
Chained K times, one scalar fetched.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

K = 8


def timeit(name, fn, *args, iters=2):
    float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    dt = (time.perf_counter() - t0) / (iters * K)
    print(f"{name:16s} {dt*1e3:9.3f} ms/call")
    return dt


def chain(body):
    @jax.jit
    def run(x):
        def step(_, c):
            v, acc = c
            s = body(v)
            return v ^ (s & 1), acc + s
        return jax.lax.fori_loop(0, K, step, (x, jnp.int32(0)))[1]
    return run


def main():
    rng = np.random.default_rng(0)
    mag = jnp.asarray(rng.integers(0, 256, size=(8, 3, 518400),
                                   dtype=np.int32))
    tbl = rng.integers(0, 1 << 26, size=256, dtype=np.int64)
    tbl_np = tbl.astype(np.int32)

    # a) fused select chain over 32 entries (covers mag<32, rare tail apart)
    def select32(v):
        out = jnp.zeros_like(v)
        for i in range(32):
            out = jnp.where(v == i, np.int32(tbl_np[i]), out)
        return out.sum()

    # b) full 256-way select chain
    def select256(v):
        out = jnp.zeros_like(v)
        for i in range(256):
            out = jnp.where(v == i, np.int32(tbl_np[i]), out)
        return out.sum()

    # c) 16x16 bilinear one-hot bf16 matmul: T[mag] = oh_hi @ T2 @ oh_lo
    t2 = (tbl_np.reshape(16, 16) & 0x1FFF).astype(np.float32)

    def bilin(v):
        hi = v >> 4
        lo = v & 15
        ar = jnp.arange(16, dtype=jnp.int32)
        oh_hi = (hi[..., None] == ar).astype(jnp.bfloat16)
        oh_lo = (lo[..., None] == ar).astype(jnp.bfloat16)
        mid = jax.lax.dot_general(
            oh_hi, jnp.asarray(t2, jnp.bfloat16), ((((oh_hi.ndim - 1),),
                                                    ((0,)),), ((), ())),
            preferred_element_type=jnp.float32)
        # mid: (..., 16) selected row; then dot with oh_lo elementwise
        r = jnp.sum(mid * oh_lo.astype(jnp.float32), axis=-1)
        return r.astype(jnp.int32).sum()

    # d) one-hot 256 matmul, 7-bit chunks (2 cols) — checks XLA fusion/traffic
    t256 = np.stack([tbl_np & 0x7F, (tbl_np >> 7) & 0x7F], 1).astype(np.float32)

    def onehot256(v):
        ar = jnp.arange(256, dtype=jnp.int32)
        oh = (v[..., None] == ar).astype(jnp.bfloat16)
        r = jax.lax.dot_general(
            oh, jnp.asarray(t256, jnp.bfloat16),
            ((((oh.ndim - 1),), ((0,)),), ((), ())),
            preferred_element_type=jnp.float32)
        return r.astype(jnp.int32).sum()

    # e) int32 multiply chain (companding-cost probe)
    def mulchain(v):
        c = v
        for _ in range(8):
            c = (c * c * 3) >> 16
            c = c | 1
        return c.sum()

    # f) exact floor-div by 60 via f32 reciprocal + fixup
    def fdiv(v):
        x = jnp.abs(v)
        q = (x.astype(jnp.float32) * np.float32(1.0 / 60.0)).astype(jnp.int32)
        r = x - q * 60
        q = q + (r >= 60) - (r < 0)
        return q.sum()

    # g) plain gather for scale
    def gather(v):
        return jnp.asarray(tbl_np)[v].sum()

    timeit("select32", chain(select32), mag)
    timeit("bilin16x16", chain(bilin), mag)
    timeit("onehot256x2", chain(onehot256), mag)
    timeit("mulchain8", chain(mulchain), mag)
    timeit("fdiv60", chain(fdiv), mag)
    timeit("select256", chain(select256), mag)
    timeit("gather256", chain(gather), mag)
    print("device:", jax.devices()[0])


if __name__ == "__main__":
    main()
