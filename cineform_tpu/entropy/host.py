"""Host (NumPy) CFHD band entropy codec — the bit-exact reference path.

Encode contract: `Codec/encoder.c:5386-5692` (EncodeQuantLongRuns, inlined
version): scan the quantized band row-major; runs of zeros emit composite
run codes (greedy over the 3072-entry runbook); nonzero values clamp to
[-1023, 1023] and emit the 2048-entry VLE code (companded magnitude + sign);
finish with the band-end codeword.

Bit order: MSB-first into 32-bit words written big-endian
(`Codec/bitstream.c:996` PutBits + SwapInt32NtoB), i.e. a pure MSB-first
bitstream over bytes.

Decode contract: the FSM decoder (`Codec/decoder.c:19532` DecodeBandFSM16sNoGap)
is equivalent to prefix-decoding the RLV codebook (`Common/table17.inc`
table17r) with a sign bit after nonzero magnitudes, cubic/piecewise
companding expansion (`Codec/codebooks.c:1345` ScaleFSM) folded in, and
per-band dequantization (`Codec/entropy_threading.c:191` DeQuantFSM).
"""

from __future__ import annotations

import numpy as np

from cineform_tpu.spec import codebooks as cb


class BitWriter:
    """MSB-first bit packer (vectorized batch form below for bands)."""

    def __init__(self) -> None:
        self.chunks: list[tuple[int, int]] = []  # (bits, size)
        self.nbits = 0

    def put(self, bits: int, size: int) -> None:
        if size:
            self.chunks.append((int(bits) & ((1 << size) - 1), size))
            self.nbits += size

    def put_array(self, bits: np.ndarray, sizes: np.ndarray) -> None:
        for b, s in zip(bits.tolist(), sizes.tolist()):
            if s:
                self.chunks.append((b & ((1 << s) - 1), s))
                self.nbits += s

    def getvalue(self, align: int = 32) -> bytes:
        """Pack all chunks; pad with zero bits to `align`-bit boundary."""
        sizes = np.array([s for _, s in self.chunks], dtype=np.int64)
        bits = np.array([b for b, _ in self.chunks], dtype=np.uint64)
        return pack_msb_first(bits, sizes, align=align)


def pack_msb_first(bits: np.ndarray, sizes: np.ndarray, align: int = 32) -> bytes:
    """Vectorized MSB-first packing of (bits, sizes) code sequences.

    Each code may be up to 32 bits; codes are concatenated MSB-first.
    """
    sizes = sizes.astype(np.int64)
    bits = bits.astype(np.uint64)
    offs = np.concatenate([[0], np.cumsum(sizes)])
    total = int(offs[-1])
    if total == 0:
        return b""
    pad = (-total) % align
    nbytes = (total + pad) // 8
    out = np.zeros(nbytes + 8, dtype=np.uint8)
    starts = offs[:-1]
    byte0 = starts >> 3
    bitpos = (starts & 7).astype(np.uint64)
    # 64-bit window with the code left-aligned at bit position `bitpos`
    chunk = bits << (np.uint64(64) - sizes.astype(np.uint64) - bitpos)
    for j in range(5):  # a ≤32-bit code at any phase spans ≤5 bytes
        np.add.at(out, byte0 + j, ((chunk >> np.uint64(56 - 8 * j)) & np.uint64(0xFF)).astype(np.uint8))
    return out[:nbytes].tobytes()


class BitReader:
    """MSB-first bit reader over bytes."""

    def __init__(self, data: bytes) -> None:
        self.data = np.frombuffer(data, dtype=np.uint8)
        self.pos = 0  # bit position

    def peek(self, n: int) -> int:
        # 48-bit window starting at byte0*8; extract n bits at self.pos
        byte0 = self.pos >> 3
        window = 0
        for j in range(6):
            b = int(self.data[byte0 + j]) if byte0 + j < len(self.data) else 0
            window = (window << 8) | b
        shift = 48 - (self.pos & 7) - n
        return (window >> shift) & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        self.pos += n

    def get(self, n: int) -> int:
        v = self.peek(n)
        self.pos += n
        return v


# ---------------------------------------------------------------------------
# Band encode
# ---------------------------------------------------------------------------

def encode_band(values: np.ndarray, codeset: int = 17) -> tuple[np.ndarray, np.ndarray]:
    """Encode a quantized band to (bits, sizes) code arrays (no padding).

    values: int array, scanned row-major (flattened internally).
    Returns code arrays suitable for pack_msb_first; the band-end code is
    included.  Contract: `Codec/encoder.c:5435-5692`.
    """
    cs = cb.get_codeset(codeset)
    vb_size, vb_bits = cb.build_valuebook(codeset)
    rb_size, rb_count, rb_bits = cb.build_runbook(codeset)

    flat = np.asarray(values).ravel().astype(np.int64)
    nz = np.flatnonzero(flat)
    # zero-run lengths before each nonzero value, plus the tail run
    prev = np.concatenate([[-1], nz])
    runs_before = (nz - prev[:-1] - 1) if len(nz) else np.zeros(0, dtype=np.int64)
    tail = len(flat) - (int(nz[-1]) + 1) if len(nz) else len(flat)

    vals = flat[nz]
    # clamp to the valuebook's signed 11-bit domain (`encoder.c:5556-5569`)
    vals = np.clip(vals, -(cb.VALUE_TABLE_LENGTH >> 1) + 1, (cb.VALUE_TABLE_LENGTH >> 1) - 1)
    vindex = vals & (cb.VALUE_TABLE_LENGTH - 1)

    # Vectorized interleave of run and value codes in scan order.  A run of
    # length r emits a greedy chain of composite codes; the full chains for
    # all r < RUNBOOK_LENGTH are precomputed (build_runchains), so encoding
    # is pure gathers.  Runs >= RUNBOOK_LENGTH peel maximal chunks first
    # (rare; python loop rewrites them as extra slots).
    runs = (np.concatenate([runs_before, [tail]]) if len(nz)
            else np.array([tail], dtype=np.int64))
    ch_bits, ch_sizes, ch_offs = cb.build_runchains(codeset)

    prefix_bits: dict[int, tuple[list, list]] = {}
    if (runs >= cb.RUNBOOK_LENGTH).any():
        runs = runs.copy()
        top = cb.RUNBOOK_LENGTH - 1
        for i in np.flatnonzero(runs >= cb.RUNBOOK_LENGTH):
            pb: list[int] = []
            ps: list[int] = []
            r = int(runs[i])
            while r >= cb.RUNBOOK_LENGTH:
                pb.append(int(rb_bits[top]))
                ps.append(int(rb_size[top]))
                r -= int(rb_count[top])
            prefix_bits[i] = (pb, ps)
            runs[i] = r

    n_slots = len(runs)
    ncodes = ch_offs[runs + 1] - ch_offs[runs]           # chain length per slot
    has_val = np.zeros(n_slots, dtype=np.int64)
    has_val[:len(nz)] = 1
    slot_total = ncodes + has_val
    pos = np.concatenate([[0], np.cumsum(slot_total)])
    total = int(pos[-1])

    out_bits = np.empty(total + 1, dtype=np.uint64)
    out_sizes = np.empty(total + 1, dtype=np.int64)

    # scatter run chains: ragged gather from the chain table
    nz_chain = np.flatnonzero(ncodes)
    if len(nz_chain):
        lens = ncodes[nz_chain]
        src0 = ch_offs[runs[nz_chain]]
        dst0 = pos[nz_chain]
        within = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(lens)[:-1]]), lens)
        src = np.repeat(src0, lens) + within
        dst = np.repeat(dst0, lens) + within
        out_bits[dst] = ch_bits[src]
        out_sizes[dst] = ch_sizes[src]

    # scatter value codes after each slot's run chain
    if len(nz):
        vdst = pos[:len(nz)] + ncodes[:len(nz)]
        out_bits[vdst] = vb_bits[vindex].astype(np.uint64)
        out_sizes[vdst] = vb_size[vindex].astype(np.int64)

    out_bits[total] = cs.bandend_bits
    out_sizes[total] = cs.bandend_size

    if prefix_bits:
        # splice the peeled oversized-run prefixes in front of their slots
        parts_b: list[np.ndarray] = []
        parts_s: list[np.ndarray] = []
        last = 0
        for i in sorted(prefix_bits):
            parts_b.append(out_bits[last:pos[i]])
            parts_s.append(out_sizes[last:pos[i]])
            pb, ps = prefix_bits[i]
            parts_b.append(np.array(pb, dtype=np.uint64))
            parts_s.append(np.array(ps, dtype=np.int64))
            last = pos[i]
        parts_b.append(out_bits[last:])
        parts_s.append(out_sizes[last:])
        return np.concatenate(parts_b), np.concatenate(parts_s)

    return out_bits, out_sizes


# ---------------------------------------------------------------------------
# Band decode
# ---------------------------------------------------------------------------

class _DecodeTables:
    """Prefix-decode LUTs built from the RLV codebook (12-bit first level)."""

    LUT_BITS = 12

    def __init__(self, codeset: int) -> None:
        cs = cb.get_codeset(codeset)
        self.cs = cs
        rlv = cs.rlv
        n = 1 << self.LUT_BITS
        # LUT entry: (consumed_bits, run_count, value_code, is_short)
        self.lut_shift = np.zeros(n, dtype=np.int32)
        self.lut_count = np.zeros(n, dtype=np.int32)
        self.lut_value = np.zeros(n, dtype=np.int32)
        # long codes resolved by linear scan
        self.long_codes = []
        for size, bits, count, value in rlv.tolist():
            if size <= self.LUT_BITS:
                lo = bits << (self.LUT_BITS - size)
                hi = (bits + 1) << (self.LUT_BITS - size)
                if self.lut_shift[lo] == 0:
                    self.lut_shift[lo:hi] = size
                    self.lut_count[lo:hi] = count
                    self.lut_value[lo:hi] = value
            else:
                self.long_codes.append((size, bits, count, value))
        self.long_codes.sort()
        self.bandend = (cs.bandend_size, cs.bandend_bits)


_DTABLES: dict[int, _DecodeTables] = {}


def _dtables(codeset: int) -> _DecodeTables:
    if codeset not in _DTABLES:
        _DTABLES[codeset] = _DecodeTables(codeset)
    return _DTABLES[codeset]


def decode_band(
    data: bytes,
    num_coeffs: int,
    codeset: int = 17,
    quant: int = 1,
    start_bit: int = 0,
) -> tuple[np.ndarray, int]:
    """Decode one band; returns (int32 coefficients pre-dequant-multiplied,
    bit position after the band-end code)."""
    dt = _dtables(codeset)
    cs = dt.cs
    flags = cs.flags
    reader = BitReader(data)
    reader.pos = start_bit
    out = np.zeros(num_coeffs, dtype=np.int32)
    pos = 0
    # Precompute expansion for all code magnitudes (≤ 1024)
    maxmag = 1025
    expand = np.array([cb.expand_code(c, flags) for c in range(maxmag)], dtype=np.int64)
    be_size, be_bits = dt.bandend
    max_iters = 4 * num_coeffs + 64
    for _ in range(max_iters):
        window = reader.peek(26)
        # The full code set (magnitudes, runs, band-end) is one prefix-free
        # Huffman code, so matching the exact band-end pattern is unambiguous.
        if (window >> (26 - be_size)) == be_bits:
            reader.skip(be_size)
            break
        idx = window >> (26 - dt.LUT_BITS)
        size = int(dt.lut_shift[idx])
        if size > 0:
            count = int(dt.lut_count[idx])
            value = int(dt.lut_value[idx])
            reader.skip(size)
        else:
            # long code: linear scan
            for lsize, lbits, lcount, lvalue in dt.long_codes:
                if (window >> (26 - lsize)) == lbits:
                    count, value = lcount, lvalue
                    reader.skip(lsize)
                    break
            else:
                raise ValueError(f"invalid codeword at bit {reader.pos}")
        if value == 0:
            pos += count
            if pos > num_coeffs:
                pos = num_coeffs  # trailing run covers the row gap
        else:
            sign = reader.get(1)
            mag = int(expand[value])
            v = -mag if sign else mag
            if pos < num_coeffs:
                out[pos] = v * quant
            pos += 1
    else:
        raise ValueError("band-end code not found")
    return out, reader.pos
