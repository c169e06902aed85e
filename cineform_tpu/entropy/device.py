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

3. **Bit packing**: codes concatenate MSB-first, in two stages.

   a. Within chunks of 256 elements (`tree_pack`): a log-tree reduction
      over (buffer, bitlen) pairs: combine(A, B) = A | (B >> lenA).  The
      per-pair variable shift is an elementwise vector shift
      (VPU-native), the word-level offset is a O(log W) select tree of
      static rolls.  Buffer widths stay small (<=96 words), where the
      tree is cheap; running it to full band width is O(N log^2 N) and
      was measured at 43 ms/frame on a v5e — hence stage (b).

   b. Across chunks (`_concat_chunks`): chunk payload bit-lengths are
      prefix-summed (the chunk axis is ~N/256, tiny), each chunk buffer
      is funnel-shifted by its offset phase, and the shifted words are
      compacted to their global word positions by a low-bit-first
      distance-doubling shift network.  Word w of chunk c sits at source
      slot u = c*M + w and must land at target W_c + w, a displacement
      D(u) = u - target that is constant inside a chunk and, with one
      spare slot per chunk, can be assigned to the empty tail slots so
      that it is monotone nondecreasing with steps in {0, 1} across the
      whole array.  That property makes merge-on-collision safe: if two
      slots ever collide at one position during low-bit-first doubling,
      monotonicity + unit steps force them to share the same final
      target word, and contributions to one output word occupy disjoint
      bits, so OR (or max for the remaining-displacement carry) merges
      them exactly.

Capacity: buffers are sized `cap_bits_per_coeff` (default 8; CFHD bands
typically pack to ~2 bits/coeff); an overflow flag per band triggers the
host C++ fallback.  The band-end codeword and 32-bit zero padding are
appended by the (cheap) host assembly, so samples remain byte-exact vs
the reference encoder.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax
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
    starts 2^k later.  int16 lanes (chunk <= 32767) halve VPU/HBM traffic."""
    n = zero.shape[-1]
    assert n <= 32767
    z = zero.astype(jnp.int16)
    k = 1
    while k < n:
        z = jnp.where(z == k, jnp.int16(k) + _shift_last(z, k), z)
        k <<= 1
    return z


def _prefix_zero_run(zero: jnp.ndarray) -> jnp.ndarray:
    """p[i] = number of consecutive zero flags ending at i (inclusive)."""
    n = zero.shape[-1]
    assert n <= 32767
    p = zero.astype(jnp.int16)
    k = 1
    while k < n:
        p = jnp.where(p == k, jnp.int16(k) + _shift_last(p, -k), p)
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
    first_suf = suf[..., 0].astype(jnp.int32)   # (…, t)
    last_pre = pre[..., -1].astype(jnp.int32)
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


def _floor_div(x: jnp.ndarray, c: int) -> jnp.ndarray:
    """Exact floor(x / c) for 0 <= x < 2^24 via f32 reciprocal + fixup.

    Integer division lowers to a long instruction sequence on the TPU
    VPU; the f32 multiply is off by at most one ulp, corrected exactly."""
    if c & (c - 1) == 0:
        return x >> (c.bit_length() - 1)
    q = (x.astype(jnp.float32) * np.float32(1.0 / c)).astype(jnp.int32)
    rr = x - q * c
    return q + (rr >= c).astype(jnp.int32) - (rr < 0).astype(jnp.int32)


def band_codes(values: jnp.ndarray, t: EncodeTables, chunk: int = 256):
    """(…, N) quantized coefficients -> per-element (bits u32, sizes i32).

    Concatenating the nonzero-size codes MSB-first (plus the band-end
    code) reproduces EncodeQuantLongRuns byte-for-byte.

    TPU notes: the magnitude codebook lookup is a fused 256-way select
    chain (measured 18x faster than lax.gather at this size on v5e,
    tools/microbench_lut.py), with (size, bits) packed into one int32 so
    the chain runs once; divisions use the f32-reciprocal trick."""
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
        span = _floor_div(rem, cnt) * cnt if cnt > 1 else rem
        da = d - a
        hit = (da >= 0) & (da < span)
        if cnt > 1:
            hit &= (da - _floor_div(da, cnt) * cnt) == 0
        zbits = jnp.where(hit, jnp.uint32(bits_s), zbits)
        zsize = jnp.where(hit, jnp.int32(size_s), zsize)
        rem = rem - span
        a = a + span

    # nonzero path: clamp, compand, sign.  The codebook lookup packs
    # size<<26 | bits (bits < 2^26 for all codesets) into one select chain.
    vc = jnp.clip(v, -(cb.VALUE_TABLE_LENGTH >> 1) + 1,
                  (cb.VALUE_TABLE_LENGTH >> 1) - 1)
    mag = _compand_magnitude(jnp.abs(vc), t)
    packed_tbl = [(int(s) << 26) | int(b)
                  for b, s in zip(t.mag_bits, t.mag_sizes)]

    def _tree(lo: int, hi: int):
        # balanced select tree: depth log2(entries) instead of a
        # 256-deep chain (same VPU work, far shallower dependency graph)
        if hi - lo == 1:
            return jnp.int32(packed_tbl[lo])
        mid = (lo + hi) // 2
        return jnp.where(mag < mid, _tree(lo, mid), _tree(mid, hi))

    packed = _tree(0, len(packed_tbl))
    code = (packed & jnp.int32((1 << 26) - 1)).astype(jnp.uint32)
    csize = packed >> 26
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
        while step <= w_cur:      # woff = la>>5 <= w_cur, not w_new
            b = jnp.where((woff & step) != 0, _shift_words(b, step), b)
            step <<= 1
        buf = a | b
        lens = la + lb
        if cap_bits < (max_code_bits << k):
            overflow = overflow | (lens > cap_bits).any(axis=-1)
        w_cur = w_new

    return buf[..., 0, :], lens[..., 0], overflow


# ---------------------------------------------------------------------------
# Stage 3b: across-chunk assembly by monotone-displacement compaction
# ---------------------------------------------------------------------------

# Within-chunk buffer capacity in bits per element.  12 is generous (CFHD
# bands pack to ~2); a denser chunk flags overflow -> host fallback.
_CHUNK_CAP_BITS = 12


def _settle_network(val: jnp.ndarray, rem: jnp.ndarray):
    """Settle the monotone-displacement compaction network (low-bit-first
    distance doubling with OR / max merge).

    A Pallas VMEM formulation exists (`ops/pallas_merge.merge_network`):
    all levels whose move distance fits in a block run in-register with a
    one-block halo, one HBM read + one write.  Measured on v5e at the
    1080p concat shape (24 x 198548) it is 4.3 ms vs 3.5 ms for the
    plain XLA network below — XLA's cross-level fusion of the
    shift+select chains already beats the kernel's explicit lane/sublane
    rolls, the same outcome as pallas_dwt and pallas_pack.  (A
    slot-granular 32-word variant measured 3.3x slower still —
    tools/proto_concat_v2.)  XLA therefore stays the production path;
    set CINEFORM_PALLAS_MERGE=1 to opt in to the kernel."""
    import os

    n = val.shape[-1]
    use_pallas = (jax.default_backend() not in ("cpu",)
                  and os.environ.get("CINEFORM_PALLAS_MERGE") == "1"
                  and n >= 4096)
    if use_pallas:
        from cineform_tpu.ops.pallas_merge import merge_network

        return merge_network(val, rem, lowfirst=True)

    k = 0
    while (1 << k) <= n:
        s = 1 << k
        bit = (rem >> k) & 1
        mov_val = _shift_last(val, s)
        mov_rem = _shift_last(rem, s)
        mov_bit = (mov_rem >> k) & 1
        val = jnp.where(bit == 0, val, 0) | jnp.where(mov_bit == 1, mov_val, 0)
        rem = jnp.maximum(jnp.where(bit == 0, rem, 0),
                          jnp.where(mov_bit == 1, mov_rem - s, 0))
        k += 1
    return val, rem


def _concat_chunks(bufs: jnp.ndarray, lens: jnp.ndarray, out_words: int):
    """Concatenate per-chunk packed buffers into one contiguous bitstream.

    bufs: (…, T, W) uint32 left-aligned chunk payloads; lens: (…, T) i32
    payload bit lengths.  Returns (words (…, out_words) uint32,
    total_bits (…,) i32).

    Word w of chunk c must land at global word (off_c >> 5) + w after the
    buffer is funnel-shifted right by the offset phase (off_c & 31).
    With M = W + 2 source slots per chunk, the displacement
    D(slot) = source_index - target_index is constant inside a chunk and
    can be extended over the empty tail slots so it is monotone
    nondecreasing with steps in {0, 1} across the whole flattened array.
    A low-bit-first distance-doubling shift network then compacts every
    slot to its target; the step property guarantees any two slots that
    collide mid-flight share the same final target word, and same-word
    contributions occupy disjoint bits, so OR (max for the
    remaining-displacement carry) merges them exactly."""
    *lead, t, w = bufs.shape
    m = w + 2
    lens = lens.astype(jnp.int32)
    csum = jnp.cumsum(lens, axis=-1)
    total = csum[..., -1]
    off = csum - lens                                  # exclusive prefix
    phase = (off & 31).astype(jnp.uint32)[..., None]   # (…, T, 1)
    wc = off >> 5                                      # (…, T)

    # funnel shift each chunk buffer right by its phase, into W + 1 words
    zpad = [(0, 0)] * (bufs.ndim - 1)
    cur = jnp.pad(bufs, zpad + [(0, 1)])               # cur[w] = buf[w]
    ext = jnp.pad(bufs, zpad + [(1, 0)])               # ext[w] = buf[w-1]
    shifted = jnp.where(phase == 0, cur,
                        (cur >> phase) | (ext << ((jnp.uint32(32) - phase)
                                                  & jnp.uint32(31))))
    val = jnp.pad(shifted, zpad + [(0, m - w - 1)])    # (…, T, M)

    # displacement assignment: used slots carry D_c = c*M - wc; empty tail
    # slots step +1 toward the next chunk's D (or +0 from the first slot
    # of a zero-length chunk, whose head shares the previous tail word)
    used = jnp.where(lens > 0, ((off & 31) + lens + 31) >> 5, 0)
    cidx = jnp.arange(t, dtype=jnp.int32)
    d_c = cidx * m - wc                                # (…, T)
    d_end = (jnp.int32(t * m) - (total >> 5))[..., None]
    d_next = jnp.concatenate([d_c[..., 1:], d_end], axis=-1)
    widx = jnp.arange(m, dtype=jnp.int32)
    base = jnp.where((used > 0)[..., None], widx - used[..., None] + 1, widx)
    rem = jnp.where(widx < used[..., None], d_c[..., None],
                    jnp.minimum(d_c[..., None] + base, d_next[..., None]))

    val = val.reshape(*lead, t * m)
    rem = rem.reshape(*lead, t * m).astype(jnp.int32)
    val, rem = _settle_network(val, rem)

    n = t * m
    words = val[..., :out_words]
    if out_words > n:
        words = jnp.pad(words, [(0, 0)] * len(lead) + [(0, out_words - n)])
    return words, total


# ---------------------------------------------------------------------------
# Band-level convenience (correctness path; jit-able end to end)
# ---------------------------------------------------------------------------

def encode_band_arrays(values: jnp.ndarray, codeset: int = 17,
                       cap_bits_per_elem: int = 8, chunk: int = 256):
    """(…, N) coefficients -> (words, total_bits, overflow) on device.

    N is padded internally to a multiple of `chunk` with nonzero
    sentinels (a virtual band-terminating value that emits nothing),
    preserving the tail zero run exactly as the real band end would.
    Packing is two-level: log-tree within chunks, then the
    monotone-displacement compaction assembles chunks (running the tree
    to full band width is O(N log^2 N) and measured 43 ms/frame)."""
    t = encode_tables(codeset)
    *lead, n = values.shape
    npad = -(-max(n, chunk) // chunk) * chunk
    if npad != n:
        pad = [(0, 0)] * (len(lead)) + [(0, npad - n)]
        values = jnp.pad(values, pad, constant_values=1)  # nonzero sentinel
    bits, sizes = band_codes(values, t, chunk)
    if npad != n:
        idx = jnp.arange(npad) < n
        sizes = jnp.where(idx, sizes, 0)
        bits = jnp.where(idx, bits, jnp.uint32(0))

    nt = npad // chunk
    chunk_cap = max(_CHUNK_CAP_BITS, cap_bits_per_elem)
    # The Pallas VMEM-tree kernel (ops/pallas_pack.py) beats the XLA tree
    # 2.2x STANDALONE (4.1 vs 9.1 ms at 1080p level-1 scale on v5e), but
    # in the full encode pipeline its bitrev+transpose input barrier
    # breaks XLA's fusion of the codes stage into the lower tree levels
    # and the net is SLOWER (3.32 vs 2.51 ms/frame full encode).  The XLA
    # tree therefore stays the production path; the kernel remains wired
    # (CINEFORM_PALLAS_PACK=1) and tested as the base for a future
    # geometry+codes+pack single-kernel fusion.
    import os
    use_pallas = (chunk == 256
                  and jax.default_backend() not in ("cpu",)
                  and os.environ.get("CINEFORM_PALLAS_PACK") == "1")
    if use_pallas:
        from cineform_tpu.ops.pallas_pack import chunk_pack as _pallas_pack

        bufs, lens, c_ovf = _pallas_pack(
            bits.reshape(*lead, nt, chunk), sizes.reshape(*lead, nt, chunk),
            cap_bits_per_elem=chunk_cap)
    else:
        bufs, lens, c_ovf = tree_pack(
            bits.reshape(*lead, nt, chunk), sizes.reshape(*lead, nt, chunk),
            cap_bits_per_elem=chunk_cap)
    out_words = _word_cap(max(cap_bits_per_elem * n, 64))
    words, total = _concat_chunks(bufs, lens, out_words)
    overflow = c_ovf.any(axis=-1) | (total > 32 * out_words)
    return words, total, overflow


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
