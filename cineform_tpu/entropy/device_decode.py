"""TPU (XLA) CFHD band entropy DECODER: sample payload bytes -> dense
quantized coefficient bands, wholly on device.

This is the device-side re-expression of the reference's FSM band decoder
(`Codec/decoder.c:19532` DecodeBandFSM16sNoGap) + its entropy worker pool
(`Codec/entropy_threading.c:139`), with companding expansion
(`Codec/codebooks.c:1345` ScaleFSM) and the int16-wrapping dequantizer
(`Codec/entropy_threading.c:191` DeQuantFSM) folded in.  The reference
walks each band's bitstream serially through a 4-bits-per-step FSM; that
serial walk is re-built here as six data-parallel stages, all shifts /
selects / tiny reductions that XLA fuses into vector code (no gathers, no
scatters — both pathologically slow on TPU):

1. **Per-bit classification** (`classify`): the cs17/cs18 RLV codebook is a
   COMPLETE prefix code, so the sorted left-aligned codewords tile the
   26-bit window space into 264 contiguous intervals.  For every bit
   position of the payload we extract a 27-bit window and resolve
   (code length, run count, magnitude, band-end, sign) by a telescoping
   sum of interval-threshold indicators — one fused elementwise reduction,
   no table lookups.

2. **Chunk transfer functions** (`chunk_transfers`): the payload is cut
   into 32-bit chunks.  Codewords are at most 26 bits + sign, so a chunk
   can be entered at one of 27 bit phases.  A bit-serial wavefront walks
   the 32 positions once, carrying a packed uint32 mask per position of
   WHICH entry phases visit it; pure bitwise ops give, per chunk, the full
   entry-phase -> exit-phase function (as 27 packed masks), the phases
   that hit band-end, and the coefficient count consumed per entry phase.

3. **Transfer-function scan** (`scan_entries`): chunk transfers compose
   associatively (masks are disjoint across exits, so boolean matrix
   product = integer sum), so a segmented `lax.associative_scan` yields
   every chunk's TRUE entry phase and starting coefficient position.
   Segment resets isolate concatenated bands.

4. **Final walk** (`final_walk`): one more wavefront pass from each
   chunk's true phase marks the actual codeword start positions.

5. **Emission + in-chunk compaction** (`emit_slots`): each marked
   position emits (target coefficient index, dequantized value); nonzero
   codewords are >= 3 bits so a chunk has at most ceil(32/3) = 11 of
   them, and a 32->12 lane one-hot reduction packs them.

6. **Global placement** (`compact_slots` + `spread_slots`): slots are
   compacted across chunks by the low-bit-first monotone-displacement
   network (displacement constant per chunk, tail slots graded so steps
   stay in {0,1}; colliding slots share a target and OR/max-merge exactly
   — the same machinery as the encoder's `_concat_chunks`), then spread
   to their final positions by the mirrored high-bit-first network, whose
   strictly increasing targets make it provably collision-free.

Legacy codeset cs9 is an INCOMPLETE prefix code (3 gap codewords) and is
decoded on the host (`entropy/host.py`, `native/entropy.cpp`); cs17 and
cs18 share one codebook and differ only in companding, selected here by a
per-chunk flag.  Malformed or over-capacity streams set per-chunk
overflow flags and fall back to the host coder.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from cineform_tpu.spec import codebooks as cb

NPHASE = 27      # max codeword incl. sign = 26 bits -> entry phase in [0,27)
DONE = 27        # absorbing "band ended" phase
NSLOT = 12       # nonzero codewords are >=3 bits -> <=11 per 32-bit chunk
M27 = (1 << 27) - 1


# ---------------------------------------------------------------------------
# Static tables
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def interval_tables(codeset: int = 17) -> tuple[tuple[int, ...],
                                                tuple[int, ...]]:
    """(bounds, packed-leaf deltas) over the sorted 26-bit interval tiling.

    packed leaf = len | count << 5 | mag << 14 | isend << 22.  The RLV
    codebook must be complete (cs17/cs18 are; cs9 is not and raises).
    """
    cs = cb.get_codeset(codeset)
    rows = [(int(b) << (26 - int(s)), int(s), int(c), int(v), 0)
            for s, b, c, v in cs.rlv.tolist()]
    rows.append((cs.bandend_bits << (26 - cs.bandend_size),
                 cs.bandend_size, 0, 0, 1))
    rows.sort()
    # completeness check: intervals tile [0, 2^26)
    prev = 0
    for lo, s, c, v, e in rows:
        if lo != prev:
            raise ValueError(f"cs{codeset} prefix code is incomplete")
        prev = lo + (1 << (26 - s))
    if prev != 1 << 26:
        raise ValueError(f"cs{codeset} prefix code is incomplete")
    packed = [s | (c << 5) | (v << 14) | (e << 22) for _, s, c, v, e in rows]
    bounds = tuple(r[0] for r in rows)
    dleaf = tuple(p - q for p, q in zip(packed, [0] + packed[:-1]))
    return bounds, dleaf


# ---------------------------------------------------------------------------
# Stage 1: per-bit-position classification
# ---------------------------------------------------------------------------

def classify(payload: jnp.ndarray, codeset: int = 17) -> jnp.ndarray:
    """(..., NB) uint8 payload -> (..., NB*8) int32 packed per-bit-position
    code: len | count << 5 | mag << 14 | isend << 22 | sign << 23.
    Lead dims are independent payload rows (windows never cross rows)."""
    bounds, dleaf = interval_tables(codeset)
    zpad = [(0, 0)] * (payload.ndim - 1)
    b = jnp.pad(payload, zpad + [(0, 8)]).astype(jnp.uint32)
    nb = payload.shape[-1]
    b0, b1, b2, b3, b4 = (b[..., i:nb + i] for i in range(5))
    hi = (b0 << 24) | (b1 << 16) | (b2 << 8) | b3
    lo = b4
    wins = []
    for r in range(8):
        s = 13 - r
        if s >= 8:
            wins.append((hi >> (s - 8)) & M27)
        else:
            wins.append(((hi << (8 - s)) | (lo >> s)) & M27)
    win27 = jnp.stack(wins, axis=-1).reshape(*payload.shape[:-1], nb * 8)
    win26 = (win27 >> 1).astype(jnp.int32)
    # telescoping interval classifier: packed = sum of threshold deltas
    packed = jnp.full(win26.shape, dleaf[0], jnp.int32)  # bounds[0] == 0
    for j in range(1, len(bounds)):
        packed = packed + jnp.where(win26 >= bounds[j],
                                    jnp.int32(dleaf[j]), 0)
    length = packed & 31
    sign = ((win27 >> (jnp.uint32(26) - length.astype(jnp.uint32))) & 1)
    return packed | (sign.astype(jnp.int32) << 23)


def _unpack(packed: jnp.ndarray):
    length = packed & 31
    count = (packed >> 5) & 511
    mag = (packed >> 14) & 255
    isend = (packed >> 22) & 1
    sign = (packed >> 23) & 1
    adv = length + (mag > 0)
    return length, count, mag, isend, sign, adv


# ---------------------------------------------------------------------------
# Stage 2: per-chunk transfer functions via the bit-serial wavefront
# ---------------------------------------------------------------------------

_IOTA32 = tuple(range(32))


def _wavefront(packed2d: jnp.ndarray, pend0: jnp.ndarray) -> jnp.ndarray:
    """Walk all 32 positions of every chunk once; pend0 (..., 32) uint32
    seeds the phase masks.  Returns WM (..., 32): the mask of phases
    visiting each position."""
    _, _, mag, isend, _, adv = _unpack(packed2d)
    pend = pend0
    iota = jnp.arange(32, dtype=jnp.int32)
    cols = []
    for i in range(32):
        w = pend[..., i]
        cols.append(w)
        wl = jnp.where(isend[..., i] == 1, jnp.uint32(0), w)
        if i < 31:
            j = i + adv[..., i]                     # (...,)
            pend = pend | jnp.where(iota == j[..., None],
                                    wl[..., None], jnp.uint32(0))
    return jnp.stack(cols, axis=-1)                 # (..., 32)


def chunk_transfers(packed2d: jnp.ndarray):
    """(..., 32) packed -> (EXITS (..., 27) u32, ENDM (...,) u32,
    CNT (..., 27) i32)."""
    _, count, mag, isend, _, adv = _unpack(packed2d)
    pend0 = jnp.broadcast_to(
        jnp.array([np.uint32(1 << i) if i < NPHASE else np.uint32(0)
                   for i in range(32)], jnp.uint32), packed2d.shape)
    wm = _wavefront(packed2d, pend0)
    wl = jnp.where(isend == 1, jnp.uint32(0), wm)
    jall = jnp.arange(32, dtype=jnp.int32) + adv                # (..., 32)
    # per-phase exits are unique -> masks disjoint -> OR == SUM
    exits = jnp.stack(
        [jnp.where(jall == 32 + d, wl, jnp.uint32(0)).sum(axis=-1)
         for d in range(NPHASE)], axis=-1)
    endm = jnp.where(isend == 1, wm, jnp.uint32(0)).sum(axis=-1)
    cnt = jnp.stack(
        [(((wl >> p) & 1).astype(jnp.int32) * count).sum(axis=-1)
         for p in range(NPHASE)], axis=-1)
    return exits, endm, cnt


# ---------------------------------------------------------------------------
# Stage 3: segmented associative scan over transfer functions
# ---------------------------------------------------------------------------

def _combine(a, b):
    """Compose transfers: a then b.  Exit masks of distinct entries are
    disjoint, so boolean OR-matrix products reduce to integer sums."""
    ea, ma, ca, ra = a
    eb, mb, cbb, rb = b
    q = jnp.arange(NPHASE, dtype=jnp.uint32)
    # ec[..., r] = sum_q bit_q(eb[..., r]) * ea[..., q]
    ebits = (eb[..., :, None] >> q) & 1                  # (..., r, q)
    ec = (ebits * ea[..., None, :]).sum(-1)
    mbits = (mb[..., None] >> q) & 1                     # (..., q)
    mc = ma + (mbits * ea).sum(-1)
    # cc[..., p] = ca[..., p] + sum_q bit_p(ea[..., q]) * cb[..., q]
    abits = ((ea[..., :, None] >> q) & 1).astype(jnp.int32)  # (..., q, p)
    cc = ca + (abits * cbb[..., :, None]).sum(-2)
    rst = rb[..., None]
    return (jnp.where(rst, eb, ec), jnp.where(rb, mb, mc),
            jnp.where(rst, cbb, cc), ra | rb)


def scan_entries(exits, endm, cnt, reset):
    """Prefix states -> (entry phase (T,) i32, coeff base (T,) i32)."""
    t = exits.shape[0]
    ident_e = jnp.array([np.uint32(1 << i) for i in range(NPHASE)],
                        jnp.uint32)
    # shift right by one chunk: prefix_k composes f_0..f_{k-1}; a reset
    # chunk's prefix is the identity
    h_e = jnp.concatenate([ident_e[None], exits[:-1]])
    h_m = jnp.concatenate([jnp.zeros(1, jnp.uint32), endm[:-1]])
    h_c = jnp.concatenate([jnp.zeros((1, NPHASE), jnp.int32), cnt[:-1]])
    h_e = jnp.where(reset[:, None], ident_e[None], h_e)
    h_m = jnp.where(reset, 0, h_m)
    h_c = jnp.where(reset[:, None], 0, h_c)
    pe, pm, pc, _ = jax.lax.associative_scan(
        _combine, (h_e, h_m, h_c, reset))
    done = (pm & 1) == 1
    r = jnp.arange(NPHASE, dtype=jnp.int32)
    entry = (r[None, :] * ((pe & 1) == 1)).sum(axis=1).astype(jnp.int32)
    entry = jnp.where(done, DONE, entry)
    return entry, pc[:, 0]


# ---------------------------------------------------------------------------
# Stage 4: final walk from the true entry phases
# ---------------------------------------------------------------------------

def scan_entries_rows(exits, endm, cnt):
    """Per-row transfer scan: each lead row is one whole band starting at
    phase 0, chunk 0 (no reset plumbing — rows are independent).
    exits (..., S, 27), endm (..., S), cnt (..., S, 27) ->
    (entry (..., S) i32, coeff base (..., S) i32)."""
    lead = exits.shape[:-2]
    s = exits.shape[-2]
    ident_e = jnp.array([np.uint32(1 << i) for i in range(NPHASE)],
                        jnp.uint32)
    pad2 = [(0, 0)] * (exits.ndim - 2)
    h_e = jnp.concatenate(
        [jnp.broadcast_to(ident_e, (*lead, 1, NPHASE)), exits[..., :-1, :]],
        axis=-2)
    h_m = jnp.concatenate(
        [jnp.zeros((*lead, 1), jnp.uint32), endm[..., :-1]], axis=-1)
    h_c = jnp.concatenate(
        [jnp.zeros((*lead, 1, NPHASE), jnp.int32), cnt[..., :-1, :]],
        axis=-2)
    reset = jnp.zeros((*lead, s), bool)
    axis = exits.ndim - 2
    pe, pm, pc, _ = jax.lax.associative_scan(
        _combine, (h_e, h_m, h_c, reset), axis=axis)
    done = (pm & 1) == 1
    r = jnp.arange(NPHASE, dtype=jnp.int32)
    entry = (r * ((pe & 1) == 1)).sum(axis=-1).astype(jnp.int32)
    entry = jnp.where(done, DONE, entry)
    return entry, pc[..., 0]


def final_walk(packed2d: jnp.ndarray, entry: jnp.ndarray) -> jnp.ndarray:
    """(..., 32) packed + (...,) entry phases -> ACT (..., 32) uint32 0/1
    marks of true codeword start positions (band-end positions excluded)."""
    iota = jnp.arange(32, dtype=jnp.int32)
    pend0 = jnp.where(iota == entry[..., None], jnp.uint32(1), jnp.uint32(0))
    wm = _wavefront(packed2d, pend0)
    isend = (packed2d >> 22) & 1
    return jnp.where(isend == 1, jnp.uint32(0), wm)


# ---------------------------------------------------------------------------
# Stage 5: emission + in-chunk compaction
# ---------------------------------------------------------------------------

def _excl_cumsum32(x: jnp.ndarray) -> jnp.ndarray:
    """Exclusive cumulative sum along a 32-wide last axis (log tree)."""
    y = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(1, 0)])[..., :-1]
    for sh in (1, 2, 4, 8, 16):
        y = y + jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(sh, 0)])[..., :-sh]
    return y


def emit_slots(packed2d, act, base, region_base, region_end, quant, linear):
    """Per-chunk emissions -> front-packed (..., NSLOT) slot arrays.

    packed2d/act: (..., 32); base/region_base/region_end/quant/linear:
    (...,) per-chunk band attributes (global output offsets, int16-wrap
    dequant factor, cs18 flag).  Returns (tgt (..., NSLOT) i32,
    val (..., NSLOT) u32 low-16 dq bits, nval (...,) i32, ovf (...,)
    bool)."""
    _, count, mag, isend, sign, _ = _unpack(packed2d)
    a = act.astype(jnp.int32)
    csel = count * a
    tgt = region_base[..., None] + base[..., None] + _excl_cumsum32(csel)
    expand = jnp.where(linear[..., None] == 1, mag,
                       mag + ((mag * mag * mag * 3) >> 16))
    v = jnp.where(sign == 1, -expand, expand)
    dq = ((v * quant[..., None]) << 16) >> 16          # DeQuantFSM int16 wrap
    emitting = (a == 1) & (mag > 0)
    ovf = (emitting & (tgt >= region_end[..., None])).any(axis=-1)
    valid = emitting & (tgt < region_end[..., None])
    rank = _excl_cumsum32(valid.astype(jnp.int32))
    ctgt = jnp.stack(
        [jnp.where(valid & (rank == r), tgt, 0).sum(axis=-1)
         for r in range(NSLOT)], axis=-1)
    cval = jnp.stack(
        [jnp.where(valid & (rank == r),
                   dq.astype(jnp.uint32) & 0xFFFF, 0).sum(axis=-1)
         for r in range(NSLOT)], axis=-1)
    nval = valid.astype(jnp.int32).sum(axis=-1)
    return ctgt, cval, nval, ovf


# ---------------------------------------------------------------------------
# Stage 6a: global slot compaction (low-bit-first, {0,1}-step, OR-merge)
# ---------------------------------------------------------------------------

def _shift_last(x, offset):
    n = x.shape[-1]
    if offset == 0 or abs(offset) >= n:
        return jnp.zeros_like(x) if abs(offset) >= n else x
    pad = [(0, 0)] * (x.ndim - 1)
    if offset > 0:
        return jnp.pad(x[..., offset:], pad + [(0, offset)])
    return jnp.pad(x[..., :offset], pad + [(-offset, 0)])


def compact_slots(ctgt, cval, nval):
    """Front-pack all valid slots across chunks.  Displacement is constant
    per chunk (12k - R_k) and tail lanes are graded +1 toward the next
    chunk's displacement, so steps stay in {0,1} and the low-bit-first
    doubling network merges collisions exactly (same argument as the
    encoder's `_concat_chunks`).  Returns (tgt (S,) i32, val (S,) u32)
    with the V valid slots leading."""
    t = ctgt.shape[0]
    csum = jnp.cumsum(nval)
    r_k = csum - nval                                   # exclusive prefix
    d_c = jnp.arange(t, dtype=jnp.int32) * NSLOT - r_k
    d_next = jnp.concatenate([d_c[1:], (t * NSLOT - csum[-1])[None]])
    lane = jnp.arange(NSLOT, dtype=jnp.int32)[None, :]
    rem = jnp.where(lane < nval[:, None], d_c[:, None],
                    jnp.minimum(d_c[:, None] + lane - nval[:, None] + 1,
                                d_next[:, None]))
    valid = lane < nval[:, None]
    val = jnp.where(valid, cval, 0).reshape(-1)
    tgt = jnp.where(valid, ctgt, 0).reshape(-1)
    rem = rem.reshape(-1)
    n = t * NSLOT
    # Unconditioned levels on purpose: wrapping each level in a
    # data-dependent `lax.cond` guard breaks XLA's fusion and measured
    # ~20x slower at production shapes (see ops/pallas_merge.py), and in
    # practice the large levels are always active (displacements grow
    # with the front-packing slack).
    k = 0
    while (1 << k) <= n:
        s = 1 << k
        rem, val, tgt = _compact_level((rem, val, tgt), s, k)
        k += 1
    return tgt, val


def _compact_level(args, s, k):
    rem, val, tgt = args
    bit = (rem >> k) & 1
    mv, mr, mt = (_shift_last(x, s) for x in (val, rem, tgt))
    mbit = (mr >> k) & 1
    val = jnp.where(bit == 0, val, 0) | jnp.where(mbit == 1, mv, 0)
    tgt = jnp.maximum(jnp.where(bit == 0, tgt, 0),
                      jnp.where(mbit == 1, mt, 0))
    rem = jnp.maximum(jnp.where(bit == 0, rem, 0),
                      jnp.where(mbit == 1, mr - s, 0))
    return rem, val, tgt


# ---------------------------------------------------------------------------
# Stage 6b: spread to final positions (high-bit-first, collision-free)
# ---------------------------------------------------------------------------

def spread_slots(tgt, val, nout: int):
    """Compacted slots -> dense (nout,) int32 coefficient buffer.

    Valid slots (val != 0) have strictly increasing targets with
    target >= slot index, so displacements are nonnegative and
    nondecreasing; invalid slots take backfilled displacements (suffix-min)
    that preserve both properties.  High-bit-first doubling then never
    collides (strictly ordered positions at every stage)."""
    s = tgt.shape[0]
    arr = s + nout + 8
    sidx = jnp.arange(s, dtype=jnp.int32)
    valid = val != 0
    big = jnp.int32(arr)
    d = jnp.where(valid, tgt - sidx, big)
    suffmin = jax.lax.associative_scan(jnp.minimum, d, reverse=True)
    rem = jnp.minimum(suffmin, jnp.int32(nout + 8))     # tail clamp
    varr = jnp.concatenate([val, jnp.zeros(arr - s, jnp.uint32)])
    darr = jnp.concatenate([rem, jnp.zeros(arr - s, jnp.int32)])
    # unconditioned levels: see compact_slots — cond guards measured ~20x
    # slower (fusion break), and rem is clamped to nout+8 so every level
    # below the static bound is live on real streams
    nbits = int(arr).bit_length()
    for k in range(nbits - 1, -1, -1):
        step = 1 << k
        darr, varr = _spread_level((darr, varr), step, k)
    out = varr[:nout].astype(jnp.int32)
    return (out << 16) >> 16                            # reinterpret int16


def _spread_level(args, step, k):
    darr, varr = args
    bit = (darr >> k) & 1
    mv = _shift_last(varr, -step)
    md = _shift_last(darr, -step)
    mbit = (md >> k) & 1
    varr = jnp.where(bit == 1, 0, varr) | jnp.where(mbit == 1, mv, 0)
    darr = jnp.maximum(jnp.where(bit == 1, 0, darr),
                       jnp.where(mbit == 1, md - step, 0))
    return darr, varr


def compact_rows(ctgt, cval, nval):
    """Per-row front-packing of valid slots: (..., S, NSLOT) slot arrays
    -> (..., S*NSLOT) compacted (tgt, val).  Same monotone-displacement
    argument as `compact_slots`, vectorized over lead rows; the network
    runs along the last axis only (log2(S*NSLOT) levels), which keeps
    XLA compile time flat in the number of rows."""
    *lead, s, _ = ctgt.shape
    csum = jnp.cumsum(nval, axis=-1)
    r_k = csum - nval                                   # exclusive prefix
    d_c = jnp.arange(s, dtype=jnp.int32) * NSLOT - r_k
    d_next = jnp.concatenate(
        [d_c[..., 1:], s * NSLOT - csum[..., -1:]], axis=-1)
    lane = jnp.arange(NSLOT, dtype=jnp.int32)
    rem = jnp.where(lane < nval[..., None], d_c[..., None],
                    jnp.minimum(d_c[..., None] + lane - nval[..., None] + 1,
                                d_next[..., None]))
    valid = lane < nval[..., None]
    val = jnp.where(valid, cval, 0).reshape(*lead, s * NSLOT)
    tgt = jnp.where(valid, ctgt, 0).reshape(*lead, s * NSLOT)
    rem = rem.reshape(*lead, s * NSLOT)
    n = s * NSLOT
    k = 0
    while (1 << k) <= n:
        rem, val, tgt = _compact_level((rem, val, tgt), 1 << k, k)
        k += 1
    return tgt, val


def spread_rows(tgt, val, nout: int):
    """Per-row spread: compacted (..., N) slots -> dense (..., nout) i32
    coefficient rows (high-bit-first collision-free network along the
    last axis; see `spread_slots` for the displacement argument)."""
    *lead, s = tgt.shape
    arr = s + nout + 8
    sidx = jnp.arange(s, dtype=jnp.int32)
    valid = val != 0
    d = jnp.where(valid, tgt - sidx, jnp.int32(arr))
    suffmin = jax.lax.associative_scan(jnp.minimum, d, reverse=True,
                                       axis=tgt.ndim - 1)
    rem = jnp.minimum(suffmin, jnp.int32(nout + 8))     # tail clamp
    zlead = [(0, 0)] * len(lead)
    varr = jnp.pad(val, zlead + [(0, arr - s)])
    darr = jnp.pad(rem, zlead + [(0, arr - s)])
    nbits = int(arr).bit_length()
    for k in range(nbits - 1, -1, -1):
        darr, varr = _spread_level((darr, varr), 1 << k, k)
    out = varr[..., :nout].astype(jnp.int32)
    return (out << 16) >> 16                            # reinterpret int16


def decode_band_rows(payload: jnp.ndarray,
                     nchunks: jnp.ndarray,
                     quant: jnp.ndarray,
                     linear: jnp.ndarray,
                     nout: int):
    """Decode R independent band bitstreams of one size class.

    payload: (R, S*4) uint8 — each row is ONE complete band payload
    (32-bit aligned, band-end terminated), zero-padded to S chunks.
    nchunks/quant/linear: (R,) actual chunk count and band attributes.
    nout: static dense region size (band h * pitch) shared by the class.
    Returns (coeffs (R, nout) i32, ovf (R,) bool).

    This is the production layout: band classes (wavelet level x plane
    type) have uniform shapes, so the placement networks run along a
    bounded last axis and never see the whole-sample payload — XLA
    compile time stays flat in batch and resolution (the single giant
    1-D formulation's networks compiled superlinearly in T and broke
    down around 1080p sizes), and every stage vectorizes over rows.
    """
    *lead, nb = payload.shape
    s = nb // 4
    packed = classify(payload).reshape(*lead, s, 32)
    exits, endm, cnt = chunk_transfers(packed)
    entry, base = scan_entries_rows(exits, endm, cnt)
    act = final_walk(packed, entry)
    cidx = jnp.arange(s, dtype=jnp.int32)
    act = act * (cidx < nchunks[..., None])[..., None].astype(jnp.uint32)
    shape = (*lead, s)
    rb = jnp.zeros(shape, jnp.int32)
    re_ = jnp.full(shape, nout, jnp.int32)
    qn = jnp.broadcast_to(quant[..., None], shape)
    lin = jnp.broadcast_to(linear[..., None], shape)
    ctgt, cval, nval, covf = emit_slots(packed, act, base, rb, re_, qn, lin)
    tgt, val = compact_rows(ctgt, cval, nval)
    coeffs = spread_rows(tgt, val, nout)
    return coeffs, covf.any(axis=-1)


# --- staged variant: one jitted program PER STAGE --------------------------
# The fused decode_band_rows program compiles superlinearly in the payload
# capacity S on the XLA TPU backend (the S=65536 1080p class program
# SIGKILLs the AOT compiler), while each stage alone compiles in seconds
# FLAT in S (tools/profile_decode_compile.py).  The staged chain keeps
# intermediates in HBM between seven small programs — the same split that
# fixed the encode side's compile blowup (models/intra.py
# _encode_group_program).  Results are identical to decode_band_rows.

_classify_j = jax.jit(classify, static_argnames=("codeset",))
_chunk_transfers_j = jax.jit(chunk_transfers)
_scan_entries_rows_j = jax.jit(scan_entries_rows)
_final_walk_j = jax.jit(final_walk)
_compact_rows_j = jax.jit(compact_rows)
_spread_rows_j = jax.jit(spread_rows, static_argnames=("nout",))


@partial(jax.jit, static_argnames=("nout",))
def _emit_rows(packed, act, base, nchunks, quant, linear, nout: int):
    """Mask activity to real chunks and emit slots (row layout)."""
    *lead, s, _ = packed.shape
    cidx = jnp.arange(s, dtype=jnp.int32)
    act = act * (cidx < nchunks[..., None])[..., None].astype(jnp.uint32)
    shape = (*lead, s)
    rb = jnp.zeros(shape, jnp.int32)
    re_ = jnp.full(shape, nout, jnp.int32)
    qn = jnp.broadcast_to(quant[..., None], shape)
    lin = jnp.broadcast_to(linear[..., None], shape)
    return emit_slots(packed, act, base, rb, re_, qn, lin)


def decode_band_rows_staged(payload: jnp.ndarray,
                            nchunks: jnp.ndarray,
                            quant: jnp.ndarray,
                            linear: jnp.ndarray,
                            nout: int):
    """decode_band_rows as a chain of per-stage jitted programs.

    Identical results; compiles where the fused program cannot (large S).
    Dispatch is async so the stages run back-to-back on the chip."""
    *lead, nb = payload.shape
    s = nb // 4
    packed = _classify_j(payload).reshape(*lead, s, 32)
    exits, endm, cnt = _chunk_transfers_j(packed)
    entry, base = _scan_entries_rows_j(exits, endm, cnt)
    act = _final_walk_j(packed, entry)
    ctgt, cval, nval, covf = _emit_rows(packed, act, base, nchunks,
                                        quant, linear, nout)
    tgt, val = _compact_rows_j(ctgt, cval, nval)
    # scatter placement: the doubling network at 1080p band sizes takes
    # the XLA TPU backend tens of minutes to compile (measured: >15 min
    # at nout=518400 vs 10.7s compile / <10 ms run for the scatter)
    coeffs = spread_rows_scatter(tgt, val, nout=nout)
    return coeffs, covf.any(axis=-1)


# ---------------------------------------------------------------------------
# Whole-payload decode
# ---------------------------------------------------------------------------

def decode_payload(payload: jnp.ndarray,
                   reset: jnp.ndarray,
                   region_base: jnp.ndarray,
                   region_end: jnp.ndarray,
                   quant: jnp.ndarray,
                   linear: jnp.ndarray,
                   inband: jnp.ndarray,
                   nout: int):
    """Decode a buffer of concatenated 32-bit-aligned band payloads.

    payload: (NB,) uint8, NB % 4 == 0.  Per-32-bit-chunk metadata arrays
    (T = NB*8/32,): reset (bool, band starts), region_base/region_end
    (i32 global output offsets), quant (i32), linear (i32 cs18 flag),
    inband (i32 0/1; 0 masks padding chunks).
    Returns (coeffs (nout,) i32 dense dequantized output, ovf (T,) bool
    per-chunk overflow flags — any set flag means host fallback for the
    band owning that chunk).
    """
    packed = classify(payload).reshape(-1, 32)
    exits, endm, cnt = chunk_transfers(packed)
    entry, base = scan_entries(exits, endm, cnt, reset)
    act = final_walk(packed, entry)
    act = act * inband[:, None].astype(jnp.uint32)
    ctgt, cval, nval, ovf = emit_slots(packed, act, base, region_base,
                                       region_end, quant, linear)
    tgt, val = compact_slots(ctgt, cval, nval)
    coeffs = spread_slots(tgt, val, nout)
    return coeffs, ovf


decode_payload_jit = jax.jit(decode_payload, static_argnames=("nout",))


@partial(jax.jit, static_argnames=("nout",))
def spread_rows_scatter(tgt, val, nout: int):
    """spread_rows as ONE batched scatter instead of the high-bit-first
    doubling network.  After compact_rows the valid slots form a prefix
    with strictly increasing targets (unique indices); invalid slots are
    redirected out of range and dropped.  The XLA TPU backend compiles
    the 20-level doubling network at 1080p band sizes in tens of minutes
    (the round-4 bench killer) while this scatter compiles in seconds;
    runtime is gather/scatter-bound but the band decode is not the
    dominant stage (measured on chip -- see bench detail)."""
    *lead, s = tgt.shape
    rows = int(np.prod(lead)) if lead else 1
    tgt2 = tgt.reshape(rows, s)
    val2 = val.reshape(rows, s)
    safe = jnp.where(val2 != 0, tgt2, nout)            # drop invalid
    flat = (jnp.arange(rows, dtype=jnp.int32)[:, None] * (nout + 1)
            + safe).reshape(-1)
    out = jnp.zeros(rows * (nout + 1), jnp.uint32)
    out = out.at[flat].set(val2.reshape(-1), mode="drop",
                           unique_indices=True)
    out = out.reshape(rows, nout + 1)[:, :nout].reshape(*lead, nout)
    out = out.astype(jnp.int32)
    return (out << 16) >> 16                            # reinterpret int16
