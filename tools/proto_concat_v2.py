"""Prototype + calibration for the slot-granular chunk concatenation.

Idea: chunk payload word-offset Woff decomposes into bit phase (&31),
word roll (mod 32 within a 32-word slot) and a slot displacement whose
steps are {0,1} after spare-slot grading, so the merge-safe low-bit-first
doubling network runs over 32-word slots (128B moves) instead of single
words: ~13 levels x contiguous rolls instead of 18 levels of word-slot
shuffling.

Validates bit-exactness against entropy/device._concat_chunks on random
chunk buffers, and (chained) measures both on the TPU.

Run: python -m tools.proto_concat_v2 [bench]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from cineform_tpu.entropy import device as edev

SLOT = 32           # words per moved slot


def _shift_last(x, offset):
    n = x.shape[-1]
    if offset == 0 or abs(offset) >= n:
        return jnp.zeros_like(x) if abs(offset) >= n else x
    pad = [(0, 0)] * (x.ndim - 1)
    if offset > 0:
        return jnp.pad(x[..., offset:], pad + [(0, offset)])
    return jnp.pad(x[..., :offset], pad + [(-offset, 0)])


def concat_chunks_v2(bufs: jnp.ndarray, lens: jnp.ndarray, out_words: int):
    """Drop-in replacement for entropy/device._concat_chunks.

    bufs: (..., T, W) uint32 left-aligned chunk payloads; lens: (..., T)
    payload bit lengths.  Returns (words (..., out_words) u32, total (...)).
    """
    *lead, t, w = bufs.shape
    lens = lens.astype(jnp.int32)
    csum = jnp.cumsum(lens, axis=-1)
    total = csum[..., -1]
    off = csum - lens
    phase = (off & 31).astype(jnp.uint32)[..., None]
    woff = off >> 5                                     # word offset

    # 1. funnel-shift chunks to their bit phase (into W+1 words)
    zpad = [(0, 0)] * (bufs.ndim - 1)
    cur = jnp.pad(bufs, zpad + [(0, 1)])
    ext = jnp.pad(bufs, zpad + [(1, 0)])
    shifted = jnp.where(phase == 0, cur,
                        (cur >> phase) | (ext << ((jnp.uint32(32) - phase)
                                                  & jnp.uint32(31))))

    # 2. roll each chunk to its word offset mod SLOT (static-select tree)
    m_words = -(-(w + 1 + SLOT - 1) // SLOT) * SLOT     # chunk row, padded
    shifted = jnp.pad(shifted, zpad + [(0, m_words - (w + 1))])
    r = (woff % SLOT)[..., None]
    for k in (16, 8, 4, 2, 1):
        if k < SLOT:
            shifted = jnp.where((r & k) != 0,
                                _shift_last(shifted, -k), shifted)

    # 3. move SLOT-word rows by their slot displacement (merge-safe
    # {0,1}-step doubling; spare rows graded toward the next chunk)
    m_slots = m_words // SLOT + 1                       # +1 spare row
    nrows = t * m_slots
    used_rows = jnp.where(lens > 0, ((off % SLOT_BITS) + lens
                                     + SLOT_BITS - 1) // SLOT_BITS, 0)
    cidx = jnp.arange(t, dtype=jnp.int32)
    d_c = cidx * m_slots - (woff // SLOT)
    r_tot = (total + SLOT_BITS - 1) // SLOT_BITS       # rows used overall
    d_next = jnp.concatenate(
        [d_c[..., 1:], (jnp.int32(t * m_slots) - r_tot)[..., None]], axis=-1)
    ridx = jnp.arange(m_slots, dtype=jnp.int32)[None, :]
    rem = jnp.where(ridx < used_rows[..., None], d_c[..., None],
                    jnp.minimum(d_c[..., None] + ridx
                                - used_rows[..., None] + 1,
                                d_next[..., None]))
    rows = jnp.pad(shifted.reshape(*lead, t, m_words // SLOT, SLOT),
                   zpad + [(0, 1), (0, 0)])             # spare row per chunk
    rows = rows.reshape(*lead, nrows, SLOT)
    rem = rem.reshape(*lead, nrows)

    def roll_rows(x, s):
        pad2 = [(0, 0)] * (x.ndim - 2)
        if s >= nrows:
            return jnp.zeros_like(x)
        return jnp.pad(x[..., s:, :], pad2 + [(0, s), (0, 0)])

    k = 0
    while (1 << k) < nrows:
        s = 1 << k
        bit = (rem >> k) & 1
        mv = roll_rows(rows, s)
        mr = _shift_last(rem, s)
        mbit = (mr >> k) & 1
        rows = jnp.where((bit == 0)[..., None], rows, 0) | \
            jnp.where((mbit == 1)[..., None], mv, 0)
        rem = jnp.maximum(jnp.where(bit == 0, rem, 0),
                          jnp.where(mbit == 1, mr - s, 0))
        k += 1

    flat = rows.reshape(*lead, nrows * SLOT)
    words = flat[..., :out_words]
    if out_words > nrows * SLOT:
        words = jnp.pad(words, [(0, 0)] * len(lead)
                        + [(0, out_words - nrows * SLOT)])
    return words, total


SLOT_BITS = SLOT * 32


def check():
    rng = np.random.default_rng(0)
    for trial in range(6):
        t = int(rng.integers(3, 40))
        w = int(rng.choice([8, 24, 96]))
        lens = rng.integers(0, w * 32 - 40, t).astype(np.int32)
        lens[rng.random(t) < 0.2] = 0
        bufs = np.zeros((t, w), np.uint32)
        for c in range(t):
            nw = -(-int(lens[c]) // 32)
            bufs[c, :nw] = rng.integers(0, 1 << 32, nw, dtype=np.uint64)
            rem = int(lens[c]) & 31
            if rem and nw:
                bufs[c, nw - 1] &= np.uint32(~((1 << (32 - rem)) - 1)
                                             & 0xFFFFFFFF)
        out_words = int(lens.sum() + 31) // 32 + 8
        ref_w, ref_t = edev._concat_chunks(jnp.asarray(bufs),
                                           jnp.asarray(lens), out_words)
        got_w, got_t = concat_chunks_v2(jnp.asarray(bufs),
                                        jnp.asarray(lens), out_words)
        ok = (np.asarray(ref_w) == np.asarray(got_w)).all() and \
            int(ref_t) == int(got_t)
        print(f"trial {trial}: t={t} w={w} total={int(lens.sum())} "
              f"{'ok' if ok else 'FAIL'}")
        if not ok:
            rw, gw = np.asarray(ref_w), np.asarray(got_w)
            d = np.flatnonzero(rw != gw)
            print("   ndiff", len(d), "first", d[:6],
                  [hex(x) for x in rw[d[:3]]], [hex(x) for x in gw[d[:3]]])
            return False
    return True


def bench():
    t, w = 4096, 96
    rng = np.random.default_rng(1)
    lead = (8, 3)
    lens = jnp.asarray(rng.integers(200, 700, lead + (t,)).astype(np.int32))
    bufs = jnp.asarray(rng.integers(0, 1 << 32, lead + (t, w),
                                    dtype=np.uint64).astype(np.uint32))
    out_words = 131072
    for name, fn in (("v1", edev._concat_chunks), ("v2", concat_chunks_v2)):
        @jax.jit
        def chained(b, l, fn=fn):
            def body(_, carry):
                acc, cur = carry
                words, tot = fn(cur, l, out_words)
                s = words[..., ::257].astype(jnp.int32).sum() + tot.sum()
                return acc + s, cur ^ (s.astype(jnp.uint32) & 1)
            a, _ = jax.lax.fori_loop(0, 8, body, (jnp.int32(0), b))
            return a
        t0 = time.perf_counter()
        float(chained(bufs, lens))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(2):
            float(chained(bufs, lens))
        ms = (time.perf_counter() - t0) / 16 * 1000
        print(f"concat {name}: {ms:.2f} ms/call at {lead}x{t}x{w} "
              f"(compile {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    if check():
        if "bench" in sys.argv:
            bench()
