#!/usr/bin/env python3
"""Microbenchmark TPU primitives that drive the device entropy-pack design.

Candidates measured at realistic shapes (1080p luma level-1 band group:
batch 8 x 3 bands = 24 rows of 518400 coefficients):
  gather    - 2048-entry value-code table lookup over all elements
  cumsum    - int32 prefix sum along rows (bit-offset computation)
  scat_set  - unique-index scatter .at[].set with drop (pack boundaries)
  scat_add  - scatter-add (pack contributions)
  ssorted   - vmapped searchsorted (pack via sampled cumsum)
  onehot    - one-hot f32 matmul lookup (gather alternative)
  elemwise  - ~10 fused elementwise passes (run-code computation estimate)

Each timed as a jitted program chained K times, fetching one scalar.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=3):
    fn(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:10s} {dt*1e3:8.3f} ms")
    return dt


def main():
    S, N = 24, 518400
    W = N // 4
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.integers(-50, 50, size=(S, N), dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, 2048, size=(S, N), dtype=np.int32))
    table = jnp.asarray(rng.integers(0, 1 << 26, size=2048, dtype=np.uint32))
    keys = jnp.asarray(
        np.sort(rng.integers(0, W, size=(S, N)), axis=1).astype(np.int32))
    c32 = jnp.asarray(rng.integers(0, 1 << 32, size=(S, N), dtype=np.uint32))
    bkey = jnp.asarray(rng.integers(0, W, size=(S, W), dtype=np.int32))
    bval = jnp.asarray(rng.integers(0, 1 << 32, size=(S, W), dtype=np.uint32))

    @jax.jit
    def gather(idx):
        return jnp.sum(table[idx] & 1)

    @jax.jit
    def cumsum(vals):
        return jnp.cumsum(vals, axis=1)[:, -1].sum()

    @jax.jit
    def scat_set(bkey, bval):
        out = jnp.zeros((S, W), jnp.uint32)
        out = jax.vmap(lambda o, k, v: o.at[k].set(
            v, mode="drop", unique_indices=True))(out, bkey, bval)
        return jnp.sum(out & 1)

    @jax.jit
    def scat_add(bkey, bval):
        out = jnp.zeros((S, W), jnp.uint32)
        out = jax.vmap(lambda o, k, v: o.at[k].add(v, mode="drop"))(
            out, bkey, bval)
        return jnp.sum(out & 1)

    @jax.jit
    def ssorted(keys):
        q = jnp.arange(W, dtype=jnp.int32)
        r = jax.vmap(lambda k: jnp.searchsorted(k, q, side="right"))(keys)
        return jnp.sum(r & 1)

    @jax.jit
    def onehot(idx):
        # tiled one-hot matmul lookup: (rows of 128) x 2048 @ 2048 x 1
        t = table.astype(jnp.float32)[:, None]
        x = idx.reshape(-1, 128)

        def tile(chunk):
            oh = (chunk[:, :, None] == jnp.arange(2048)[None, None, :])
            return jnp.einsum("abc,cd->abd", oh.astype(jnp.float32), t)
        out = jax.lax.map(tile, x.reshape(64, -1, 128))
        return jnp.sum(out.astype(jnp.int32) & 1)

    @jax.jit
    def elemwise(vals):
        r = vals
        acc = jnp.zeros_like(vals)
        for c in (320, 180, 100, 60, 32, 20, 12, 1):
            n = r // c
            acc = jnp.where((r - n) % c == 0, acc + n, acc)
            r = r - n * c
        return acc.sum()

    timeit("gather", gather, idx)
    timeit("cumsum", cumsum, vals)
    timeit("scat_set", scat_set, bkey, bval)
    timeit("scat_add", scat_add, bkey, bval)
    timeit("ssorted", ssorted, keys)
    timeit("elemwise", elemwise, vals)
    try:
        timeit("onehot", onehot, idx)
    except Exception as e:
        print("onehot failed:", e)
    print("device:", jax.devices()[0])


if __name__ == "__main__":
    main()
