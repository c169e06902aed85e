#!/usr/bin/env python3
"""Profile XLA compile time of each device-decode stage at 1080p class
shapes (CPU backend) to find the superlinear-compile culprit.

Usage: python tools/profile_decode_compile.py [--class N] [--stage name]
"""
import os
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=1").strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cineform_tpu.entropy import device_decode as dd  # noqa: E402


def timed_compile(name, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.perf_counter()
    mlir_mb = len(lowered.as_text()) / 1e6
    compiled = lowered.compile()
    t2 = time.perf_counter()
    del compiled
    print(f"{name:28s} lower {t1 - t0:7.2f}s  mlir {mlir_mb:8.2f} MB  "
          f"compile {t2 - t1:7.2f}s", flush=True)


def main():
    # 1080p luma k=0 class: bh=540, bw=960, pitch=960, nout=518400
    # rows R = batch*1*3 = 24; payload cap ~ 16384 chunks (noise content)
    R = 24
    S = int(os.environ.get("S", "16384"))
    nout = 540 * 960
    which = sys.argv[sys.argv.index("--stage") + 1] if "--stage" in sys.argv \
        else "all"

    rng = np.random.default_rng(0)
    payload = jnp.asarray(rng.integers(0, 256, (R, S * 4), np.uint8))
    packed = jnp.asarray(rng.integers(0, 1 << 24, (R, S, 32), np.int32))
    exits = jnp.asarray(
        rng.integers(0, 1 << 27, (R, S, dd.NPHASE), np.int64).astype(np.uint32))
    endm = jnp.asarray(
        rng.integers(0, 1 << 27, (R, S), np.int64).astype(np.uint32))
    cnt = jnp.asarray(rng.integers(0, 100, (R, S, dd.NPHASE), np.int32))
    entry = jnp.asarray(rng.integers(0, 27, (R, S), np.int32))
    act = jnp.asarray(rng.integers(0, 2, (R, S, 32), np.int64).astype(np.uint32))
    base = jnp.asarray(rng.integers(0, nout, (R, S), np.int32))
    zeros = jnp.zeros((R, S), jnp.int32)
    full = jnp.full((R, S), nout, jnp.int32)
    ctgt = jnp.asarray(rng.integers(0, nout, (R, S, dd.NSLOT), np.int32))
    cval = jnp.asarray(
        rng.integers(0, 1 << 16, (R, S, dd.NSLOT), np.int64).astype(np.uint32))
    nval = jnp.asarray(rng.integers(0, dd.NSLOT, (R, S), np.int32))
    tgt2 = jnp.asarray(np.sort(rng.integers(0, nout, (R, S * dd.NSLOT),
                                            np.int32), axis=-1))
    val2 = jnp.asarray(
        rng.integers(0, 1 << 16, (R, S * dd.NSLOT), np.int64).astype(np.uint32))

    stages = {
        "classify": lambda: timed_compile("classify", dd.classify, payload),
        "chunk_transfers": lambda: timed_compile(
            "chunk_transfers", dd.chunk_transfers, packed),
        "scan_entries_rows": lambda: timed_compile(
            "scan_entries_rows", dd.scan_entries_rows, exits, endm, cnt),
        "final_walk": lambda: timed_compile(
            "final_walk", dd.final_walk, packed, entry),
        "emit_slots": lambda: timed_compile(
            "emit_slots", dd.emit_slots, packed, act, base, zeros, full,
            zeros + 1, zeros),
        "compact_rows": lambda: timed_compile(
            "compact_rows", dd.compact_rows, ctgt, cval, nval),
        "spread_rows": lambda: timed_compile(
            "spread_rows",
            lambda t, v: dd.spread_rows(t, v, nout), tgt2, val2),
    }
    for name, fn in stages.items():
        if which in ("all", name):
            fn()


if __name__ == "__main__":
    main()
