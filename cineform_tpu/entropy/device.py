"""TPU (XLA) CFHD band entropy encoder: byte-exact bitstreams in HBM.

This is the device-side re-expression of `EncodeQuantLongRuns`
(`Codec/encoder.c:5386-5692`) + `PutZeroRun` (`Codec/vlc.c:366`) +
`PutBits` (`Codec/bitstream.c:996`).  The reference walks each quantized
band serially, emitting composite zero-run codewords and companded
value codes into a bit accumulator.  That serial loop is re-built here as
three data-parallel stages that XLA compiles into fused vector code —
no gathers, no scatters, no cumsum primitives (all pathologically slow
on TPU; measured in tools/microbench_tpu.py):

1. **Run geometry** (`_run_geometry`): for every coefficient, the length
   of its zero run and its distance from the run start, via chunked
   log-doubling scans (pure shifts + selects).

2. **Per-coefficient codes** (`band_codes`): every coefficient becomes at
   most one (codeword, size) pair.

   - Zero coefficients emit the zero-run codes.  Key identity (verified
     exhaustively against the composite runbook in the tests): the
     reference's chain of composite runbook entries for a run of r zeros
     is bit-identical to the plain greedy decomposition of r over the
     sparse run codes (descending count) plus the single-zero code.
     Greedy phase boundaries are pure arithmetic in (r, d), so each zero
     knows locally whether it starts a sparse codeword and which one —
     the 3072-entry runbook disappears entirely.
   - Nonzero coefficients emit the companded magnitude code plus a sign
     bit.  Cubic companding is an arithmetic branchless bisection (no
     table); the magnitude codebook (<=256 entries) is the one real
     lookup and is kept tiny.

3. **Bit packing** (`tree_pack`): codes concatenate MSB-first.  Packing
   is a log-tree reduction over (buffer, bitlen) pairs: combine(A, B) =
   A | (B >> lenA).  The per-pair variable shift is an elementwise
   vector shift (VPU-native), the word-level offset is a O(log W) select
   tree of static rolls.  The tree runs over the whole flattened band,
   producing the complete packed payload and its bit length in HBM.

Capacity: buffers are sized `cap_bits_per_coeff` (default 8; CFHD bands
typically pack to ~2 bits/coeff); an overflow flag per band triggers the
host C++ fallback.  The band-end codeword and 32-bit zero padding are
appended by the (cheap) host assembly, so samples remain byte-exact vs
the reference encoder.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from cineform_tpu.spec import codebooks as cb


@dataclass(frozen=True)
class EncodeTables:
    """Static per-codeset constants (hashable: folded into traced code)."""

    codeset: int
    flags: int
    # sparse zero-run codes, descending count, single-zero code last
    run_counts: tuple[int, ...]
    run_bits: tuple[int, ...]
    run_sizes: tuple[int, ...]
    # magnitude codebook (index = companded magnitude)
    mag_bits: tuple[int, ...]
    mag_sizes: tuple[int, ...]
    bandend_bits: int
    bandend_size: int

    @property
    def max_mag(self) -> int:
        return len(self.mag_bits) - 1


@lru_cache(maxsize=None)
def encode_tables(codeset: int = 17) -> EncodeTables:
    cs = cb.get_codeset(codeset)
    codes = [(int(cs.zero_count[i]), int(cs.zero_bits[i]), int(cs.zero_size[i]))
             for i in range(len(cs.zero_size))]
    if not any(c[0] == 1 for c in codes):
        codes.append((1, int(cs.mag_bits[0]), int(cs.mag_size[0])))
    codes.sort(key=lambda c: -c[0])
    return EncodeTables(
        codeset=codeset,
        flags=cs.flags,
        run_counts=tuple(c[0] for c in codes),
        run_bits=tuple(c[1] for c in codes),
        run_sizes=tuple(c[2] for c in codes),
        mag_bits=tuple(int(b) for b in cs.mag_bits),
        mag_sizes=tuple(int(s) for s in cs.mag_size),
        bandend_bits=int(cs.bandend_bits),
        bandend_size=int(cs.bandend_size),
    )


# ---------------------------------------------------------------------------
# Stage 1: run geometry via chunked log-doubling scans
# ---------------------------------------------------------------------------

def _shift_last(x: jnp.ndarray, offset: int) -> jnp.ndarray:
    """Shift along the last axis with zero fill (offset > 0 pulls from the
    right, i.e. x'[i] = x[i + offset])."""
    n = x.shape[-1]
    if offset == 0 or abs(offset) >= n:
        return jnp.zeros_like(x) if abs(offset) >= n else x
    pad = [(0, 0)] * (x.ndim - 1)
    if offset > 0:
        return jnp.pad(x[..., offset:], pad + [(0, offset)])
    return jnp.pad(x[..., :offset], pad + [(-offset, 0)])


def _suffix_zero_run(zero: jnp.ndarray) -> jnp.ndarray:
    """z[i] = number of consecutive zero flags starting at i (within the
    last axis).  Log-doubling: z saturated at 2^k extends by the run that
    starts 2^k later."""
    n = zero.shape[-1]
    z = zero.astype(jnp.int32)
    k = 1
    while k < n:
        z = jnp.where(z == k, k + _shift_last(z, k), z)
        k <<= 1
    return z


def _prefix_zero_run(zero: jnp.ndarray) -> jnp.ndarray:
    """p[i] = number of consecutive zero flags ending at i (inclusive)."""
    n = zero.shape[-1]
    p = zero.astype(jnp.int32)
    k = 1
    while k < n:
        p = jnp.where(p == k, k + _shift_last(p, -k), p)
        k <<= 1
    return p


def _run_geometry(zero: jnp.ndarray, chunk: int = 256):
    """(…, N) zero mask -> (run_length r, distance-from-run-start d) for
    every element, with runs measured across the whole last axis.

    Two-level scan: log-doubling inside chunks of `chunk`, then a chunk
    level carry scan (the chunk axis is tiny), then recombination."""
    *lead, n = zero.shape
    if n % chunk:
        raise ValueError(f"band length {n} not a multiple of {chunk}")
    t = n // chunk
    zc = zero.reshape(*lead, t, chunk)
    suf = _suffix_zero_run(zc)            # within-chunk suffix runs
    pre = _prefix_zero_run(zc)            # within-chunk prefix runs

    # chunk-level carries.  S[c] = global suffix-zero count at the start of
    # chunk c (in elements):
    #   S[c] = first_suf[c] if first_suf[c] < chunk else chunk + S[c+1]
    # a saturating suffix scan over the (tiny) chunk axis — same doubling,
    # saturation threshold k*chunk.  P[c] mirrors it for prefixes.
    first_suf = suf[..., 0]               # (…, t)
    last_pre = pre[..., -1]
    s_g = first_suf
    k = 1
    while k < t:
        s_g = jnp.where(s_g == k * chunk, k * chunk + _shift_last(s_g, k), s_g)
        k <<= 1
    # P[c] = global prefix-zero count at chunk end:
    p_g = last_pre
    k = 1
    while k < t:
        p_g = jnp.where(p_g == k * chunk, k * chunk + _shift_last(p_g, -k), p_g)
        k <<= 1

    # recombine to per-element global runs
    # prefix at element (c,i): pre + (extends to chunk start ? P[c-1] : 0)
    iota = jnp.arange(chunk, dtype=jnp.int32)
    p_carry = _shift_last(p_g, -1)[..., :, None]
    pre_g = pre + jnp.where(pre == iota + 1, p_carry, 0)
    # suffix at element (c,i): suf + (extends to chunk end ? S[c+1] : 0)
    s_carry = _shift_last(s_g, 1)[..., :, None]
    suf_g = suf + jnp.where(suf == chunk - iota, s_carry, 0)

    d = pre_g - 1                      # distance from run start (zeros only)
    r = d + suf_g                      # total run length (zeros only)
    return (r.reshape(*lead, n), d.reshape(*lead, n))


# ---------------------------------------------------------------------------
# Stage 2: per-coefficient codes
# ---------------------------------------------------------------------------

def _compand_magnitude(mag: jnp.ndarray, t: EncodeTables) -> jnp.ndarray:
    """|value| (<=1023) -> companded magnitude code index.

    cs17: branchless bisection of the cubic curve (max c with
    c + (c^3*3>>16) <= mag), identical to the reference's table
    (`Codec/codebooks.c:1048-1079`).  cs9: piecewise-linear arithmetic
    (`codebooks.c:1099-1118`).  cs18: linear."""
    if t.flags & cb.COMPANDING_CUBIC:
        c = jnp.zeros_like(mag)
        for bit in (128, 64, 32, 16, 8, 4, 2, 1):
            cand = c | bit
            mag_c = cand + ((cand * cand * cand * 3) >> 16)
            c = jnp.where(mag_c <= mag, cand, c)
        return jnp.minimum(c, t.max_mag)
    if t.flags & cb.COMPANDING_NONE:
        return jnp.minimum(mag, t.max_mag)
    m = jnp.where(mag >= 40, ((mag - 40 + 2) >> 2) + 40, mag)
    m = jnp.where(m >= cb.COMPANDING_MORE,
                  ((m - cb.COMPANDING_MORE + 2) >> 2) + cb.COMPANDING_MORE, m)
    return jnp.minimum(m, t.max_mag)


def band_codes(values: jnp.ndarray, t: EncodeTables, chunk: int = 256):
    """(…, N) quantized coefficients -> per-element (bits u32, sizes i32).

    Concatenating the nonzero-size codes MSB-first (plus the band-end
    code) reproduces EncodeQuantLongRuns byte-for-byte."""
    v = values.astype(jnp.int32)
    zero = v == 0
    r, d = _run_geometry(zero, chunk)

    # zero path: greedy sparse-run decomposition, phase membership by
    # arithmetic on (r, d)
    zbits = jnp.zeros(v.shape, jnp.uint32)
    zsize = jnp.zeros(v.shape, jnp.int32)
    rem = r
    a = jnp.zeros_like(r)
    for cnt, bits_s, size_s in zip(t.run_counts, t.run_bits, t.run_sizes):
        span = (rem // cnt) * cnt
        hit = (d >= a) & (d < a + span) & ((d - a) % cnt == 0)
        zbits = jnp.where(hit, jnp.uint32(bits_s), zbits)
        zsize = jnp.where(hit, jnp.int32(size_s), zsize)
        rem = rem - span
        a = a + span

    # nonzero path: clamp, compand, sign
    vc = jnp.clip(v, -(cb.VALUE_TABLE_LENGTH >> 1) + 1,
                  (cb.VALUE_TABLE_LENGTH >> 1) - 1)
    mag = _compand_magnitude(jnp.abs(vc), t)
    mag_bits = jnp.asarray(np.asarray(t.mag_bits, np.uint32))
    mag_sizes = jnp.asarray(np.asarray(t.mag_sizes, np.int32))
    code = mag_bits[mag]
    csize = mag_sizes[mag]
    nbits = (code << 1) | (vc < 0).astype(jnp.uint32)
    nsize = csize + 1

    bits = jnp.where(zero, zbits, nbits)
    sizes = jnp.where(zero, zsize, nsize)
    return bits, sizes


# ---------------------------------------------------------------------------
# Stage 3: log-tree bit packing
# ---------------------------------------------------------------------------

def _shift_words(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """Static word-offset shift along the last axis (prepend s zeros)."""
    return _shift_last(x, -s)


def _word_cap(nbits: int) -> int:
    return -(-nbits // 32)


def tree_pack(bits: jnp.ndarray, sizes: jnp.ndarray,
              max_code_bits: int = 27, cap_bits_per_elem: int = 8):
    """Pack per-element MSB-first codes into one contiguous buffer.

    bits/sizes: (…, N) with sizes in [0, max_code_bits].
    Returns (words (…, W) uint32 big-endian bit order, total_bits (…,),
    overflow (…,) bool).  W = ceil(max(cap_bits_per_elem*N, 64)/32); if a
    band exceeds the capacity at any tree level its overflow flag is set
    and the caller must re-encode on the host."""
    *lead, n = bits.shape
    assert n & (n - 1) == 0, "band length must be padded to a power of two"
    levels = n.bit_length() - 1

    sizes = sizes.astype(jnp.uint32)
    # left-aligned single-word buffers
    buf = jnp.where(sizes == 0, jnp.uint32(0),
                    bits.astype(jnp.uint32) << (jnp.uint32(32) - sizes))
    buf = buf[..., None]                      # (…, N, 1)
    lens = sizes.astype(jnp.int32)            # (…, N)
    overflow = jnp.zeros(tuple(lead), bool)

    w_cur = 1
    for k in range(1, levels + 1):
        # full worst-case capacity at small widths (cheap), budgeted above;
        # monotone so buffers never shrink between levels
        full = max_code_bits << k
        cap_bits = full if k <= 4 else min(
            full, max(cap_bits_per_elem << k, 32 * w_cur))
        w_new = _word_cap(cap_bits)
        a = buf[..., 0::2, :]
        b = buf[..., 1::2, :]
        la = lens[..., 0::2]
        lb = lens[..., 1::2]
        pad = [(0, 0)] * (a.ndim - 1) + [(0, w_new - w_cur)]
        a = jnp.pad(a, pad)
        b = jnp.pad(b, pad)
        # shift b right by la bits: bit part then word-offset select tree
        bshift = (la & 31).astype(jnp.uint32)[..., None]
        b_hi = _shift_words(b, 1)
        b = jnp.where(bshift == 0, b,
                      (b >> bshift) | (b_hi << ((jnp.uint32(32) - bshift)
                                                & jnp.uint32(31))))
        woff = (la >> 5)[..., None]
        step = 1
        while step < w_new:
            b = jnp.where((woff & step) != 0, _shift_words(b, step), b)
            step <<= 1
        buf = a | b
        lens = la + lb
        if cap_bits < (max_code_bits << k):
            overflow = overflow | (lens > cap_bits).any(axis=-1)
        w_cur = w_new

    return buf[..., 0, :], lens[..., 0], overflow


# ---------------------------------------------------------------------------
# Band-level convenience (correctness path; jit-able end to end)
# ---------------------------------------------------------------------------

def _pad_pow2(n: int, chunk: int) -> int:
    total = max(chunk, n)
    p = 1
    while p < total:
        p <<= 1
    return p


def encode_band_arrays(values: jnp.ndarray, codeset: int = 17,
                       cap_bits_per_elem: int = 8, chunk: int = 256):
    """(…, N) coefficients -> (words, total_bits, overflow) on device.

    N is padded internally to a power of two with nonzero sentinels (a
    virtual band-terminating value that emits nothing), preserving the
    tail zero run exactly as the real band end would."""
    t = encode_tables(codeset)
    *lead, n = values.shape
    npad = _pad_pow2(n, chunk)
    if npad != n:
        pad = [(0, 0)] * (len(lead)) + [(0, npad - n)]
        values = jnp.pad(values, pad, constant_values=1)  # nonzero sentinel
    bits, sizes = band_codes(values, t, chunk)
    if npad != n:
        idx = jnp.arange(npad) < n
        sizes = jnp.where(idx, sizes, 0)
        bits = jnp.where(idx, bits, jnp.uint32(0))
    return tree_pack(bits, sizes, cap_bits_per_elem=cap_bits_per_elem)


def finish_band_bytes(words: np.ndarray, total_bits: int,
                      codeset: int = 17) -> bytes:
    """Host assembly tail: append the band-end codeword and zero-pad to a
    32-bit boundary, mirroring FinishEncodeBand + getvalue(align=32)."""
    t = encode_tables(codeset)
    total = int(total_bits)
    nwords = (total + t.bandend_size + 31) // 32
    w = np.zeros(nwords, dtype=np.uint32)
    avail = words[:min(len(words), nwords)]
    w[:len(avail)] = avail
    # mask any partial-word garbage beyond total (tree guarantees zeros,
    # but the band-end insert below relies on it)
    word0 = total >> 5
    phase = total & 31
    be = np.uint64(t.bandend_bits) << np.uint64(64 - t.bandend_size - phase)
    w[word0] |= np.uint32(be >> np.uint64(32))
    if word0 + 1 < nwords:
        w[word0 + 1] |= np.uint32(be & np.uint64(0xFFFFFFFF))
    return w.astype(">u4").tobytes()


def encode_band_bytes_device(values: np.ndarray, codeset: int = 17) -> bytes:
    """One-shot helper (tests): full band -> packed payload bytes."""
    flat = jnp.asarray(np.ascontiguousarray(values).reshape(-1))
    words, nbits, overflow = encode_band_arrays(flat, codeset,
                                                cap_bits_per_elem=27)
    return finish_band_bytes(np.asarray(words), int(nbits), codeset)
