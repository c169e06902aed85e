"""Per-stage timing + compile-time breakdown of the device entropy
decoder (bench.py methodology: chained iterations inside one jit, one
scalar fetched).

Usage: python -m tools.profile_decode_stages [T] [NOUT] [K]
T = payload chunks, NOUT = dense output size.
"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from cineform_tpu.entropy import device_decode as dd

T = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
NOUT = int(sys.argv[2]) if len(sys.argv) > 2 else 516096
K = int(sys.argv[3]) if len(sys.argv) > 3 else 4


def timeit(name, fn, *args, iters=3):
    t0 = time.perf_counter()
    r = fn(*args)
    jax.block_until_ready(r)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / (iters * K)
    print(f"{name:16s} {dt*1e3:9.3f} ms/iter   (compile {compile_s:6.1f} s)",
          flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    payload = jnp.asarray(rng.integers(0, 256, T * 4, dtype=np.uint8))
    packed2d = dd.classify(payload).reshape(-1, 32)
    reset = jnp.asarray(np.arange(T) % 64 == 0)
    entry = jnp.asarray(rng.integers(0, 27, T, dtype=np.int32))
    base = jnp.asarray(rng.integers(0, 1 << 20, T, dtype=np.int32))
    region_base = jnp.zeros(T, jnp.int32)
    region_end = jnp.full(T, NOUT, jnp.int32)
    quant = jnp.ones(T, jnp.int32)
    linear = jnp.zeros(T, jnp.int32)

    @jax.jit
    def f_classify(p):
        def step(_, c):
            p, acc = c
            out = dd.classify(p)
            s = out.sum()
            return p ^ (s & 1).astype(jnp.uint8), acc + s
        return jax.lax.fori_loop(0, K, step, (p, jnp.int32(0)))[1]

    @jax.jit
    def f_transfers(pk):
        def step(_, c):
            pk, acc = c
            e, m, cn = dd.chunk_transfers(pk)
            s = (e.sum() + m.sum()).astype(jnp.int32) + cn.sum()
            return pk ^ (s & 1).astype(jnp.int32), acc + s
        return jax.lax.fori_loop(0, K, step, (pk, jnp.int32(0)))[1]

    @jax.jit
    def f_scan(pk, rs):
        e, m, cn = dd.chunk_transfers(pk)

        def step(_, c):
            e2, acc = c
            en, b = dd.scan_entries(e2, m, cn, rs)
            s = en.sum() + b.sum()
            return e2 ^ (s & 1).astype(jnp.uint32), acc + s
        return jax.lax.fori_loop(0, K, step, (e, jnp.int32(0)))[1]

    @jax.jit
    def f_walk(pk, en):
        def step(_, c):
            pk, acc = c
            a = dd.final_walk(pk, en)
            s = a.sum().astype(jnp.int32)
            return pk ^ (s & 1).astype(jnp.int32), acc + s
        return jax.lax.fori_loop(0, K, step, (pk, jnp.int32(0)))[1]

    @jax.jit
    def f_emit(pk, en):
        act = dd.final_walk(pk, en)

        def step(_, c):
            a, acc = c
            ct, cv, nv, ov = dd.emit_slots(pk, a, base, region_base,
                                           region_end, quant, linear)
            s = ct.sum() + cv.sum().astype(jnp.int32) + nv.sum()
            return a ^ (s & 1).astype(jnp.uint32), acc + s
        return jax.lax.fori_loop(0, K, step, (act, jnp.int32(0)))[1]

    @jax.jit
    def f_compact(pk, en):
        act = dd.final_walk(pk, en)
        ct, cv, nv, ov = dd.emit_slots(pk, act, base, region_base,
                                       region_end, quant, linear)

        def step(_, c):
            cv2, acc = c
            tg, vl = dd.compact_slots(ct, cv2, nv)
            s = tg.sum() + vl.sum().astype(jnp.int32)
            return cv2 ^ (s & 1).astype(jnp.uint32), acc + s
        return jax.lax.fori_loop(0, K, step, (cv, jnp.int32(0)))[1]

    @jax.jit
    def f_spread(pk, en):
        act = dd.final_walk(pk, en)
        ct, cv, nv, ov = dd.emit_slots(pk, act, base, region_base,
                                       region_end, quant, linear)
        tg, vl = dd.compact_slots(ct, cv, nv)

        def step(_, c):
            vl2, acc = c
            out = dd.spread_slots(tg, vl2, NOUT)
            s = out.sum()
            return vl2 ^ (s & 1).astype(jnp.uint32), acc + s
        return jax.lax.fori_loop(0, K, step, (vl, jnp.int32(0)))[1]

    @jax.jit
    def f_full(p):
        def step(_, c):
            p, acc = c
            out, ovf = dd.decode_payload(p, reset, region_base, region_end,
                                         quant, linear,
                                         jnp.ones(T, jnp.int32), NOUT)
            s = out.sum()
            return p ^ (s & 1).astype(jnp.uint8), acc + s
        return jax.lax.fori_loop(0, K, step, (p, jnp.int32(0)))[1]

    print(f"T={T} chunks  NOUT={NOUT}  K={K}", flush=True)
    timeit("classify", f_classify, payload)
    timeit("transfers", f_transfers, packed2d)
    timeit("scan", f_scan, packed2d, reset)
    timeit("final_walk", f_walk, packed2d, entry)
    timeit("emit", f_emit, packed2d, entry)
    timeit("compact", f_compact, packed2d, entry)
    timeit("spread", f_spread, packed2d, entry)
    timeit("FULL", f_full, payload)
    print("device:", jax.devices()[0].device_kind, flush=True)


if __name__ == "__main__":
    main()
