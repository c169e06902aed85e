"""NumPy prototype of the TPU parallel band entropy decoder.

Validates the algorithm stages of entropy/device_decode.py against the
bit-exact host decoder (entropy/host.decode_band) before the JAX port:

A. per-bit-position code classification (interval search over the
   prefix-complete RLV codebook)
B. per-32-bit-chunk transfer functions over the 27 possible entry
   phases, built by a bit-serial wavefront carrying packed phase masks
C. (segmented) scan composing transfer functions -> true entry phase +
   coefficient base per chunk
D. single-phase re-walk per chunk -> emissions (count, value) at true
   codeword positions
E. monotone-displacement spread network placing nonzero values densely

Run: python tools/proto_device_decode.py
"""

from __future__ import annotations

import numpy as np

from cineform_tpu.entropy import host as ehost
from cineform_tpu.spec import codebooks as cb

NPHASE = 27          # max codeword+sign length = 26 -> entry phase in [0,27)
DONE = 27


def build_interval_tables(codeset: int):
    """Sorted interval boundaries over the 26-bit window space.

    Returns (bounds[K], len_[K], count[K], value_signedless[K], isend[K]):
    interval i covers window values [bounds[i], bounds[i+1]).
    """
    cs = cb.get_codeset(codeset)
    rows = [(int(b) << (26 - int(s)), int(s), int(c), int(v), 0)
            for s, b, c, v in cs.rlv.tolist()]
    rows.append((cs.bandend_bits << (26 - cs.bandend_size),
                 cs.bandend_size, 0, 0, 1))
    rows.sort()
    bounds = np.array([r[0] for r in rows], dtype=np.int64)
    len_ = np.array([r[1] for r in rows], dtype=np.int32)
    count = np.array([r[2] for r in rows], dtype=np.int32)
    mag = np.array([r[3] for r in rows], dtype=np.int32)
    isend = np.array([r[4] for r in rows], dtype=np.int32)
    expand = np.array([cb.expand_code(c, cs.flags) for c in range(1025)],
                      dtype=np.int32)
    value = expand[mag]
    return bounds, len_, count, value, isend


def classify(payload: bytes, codeset: int):
    """Phase A: per-bit-position (adv, count, value_signed, isend)."""
    bounds, len_, count, value, isend = build_interval_tables(codeset)
    data = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    data = np.concatenate([data, np.zeros(8, np.int64)])
    nbits = len(payload) * 8
    # 27-bit window at every bit position (26 code bits + 1 sign bit)
    p = np.arange(nbits)
    q, r = p >> 3, p & 7
    w40 = ((data[q] << 32) | (data[q + 1] << 24) | (data[q + 2] << 16)
           | (data[q + 3] << 8) | data[q + 4])
    win27 = (w40 >> (13 - r)) & ((1 << 27) - 1)
    win26 = win27 >> 1
    idx = np.searchsorted(bounds, win26, side="right") - 1
    L = len_[idx]
    cnt = count[idx].copy()
    val = value[idx].copy()
    end = isend[idx]
    sign = (win27 >> (26 - L)) & 1
    val = np.where(sign == 1, -val, val)
    adv = L + (val != 0)
    return adv.astype(np.int32), cnt, val.astype(np.int32), end


def chunk_transfers(adv, cnt, end, nchunks):
    """Phase B: per-chunk (EXITS[27] phase masks, ENDMASK, CNT[27])."""
    a = adv.reshape(nchunks, 32)
    c = cnt.reshape(nchunks, 32)
    e = end.reshape(nchunks, 32)
    P = np.zeros((nchunks, 32), dtype=np.uint32)      # pending arrivals
    for p in range(NPHASE):
        P[:, p] |= np.uint32(1 << p)
    EXITS = np.zeros((nchunks, NPHASE), dtype=np.uint32)
    ENDM = np.zeros(nchunks, dtype=np.uint32)
    CNT = np.zeros((nchunks, NPHASE), dtype=np.int64)
    for i in range(32):
        W = P[:, i].copy()
        P[:, i] = 0
        ended = np.where(e[:, i] == 1, W, 0).astype(np.uint32)
        ENDM |= ended
        W = (W & ~ended).astype(np.uint32)
        # count accumulation for phases passing through position i
        for p in range(NPHASE):
            CNT[:, p] += np.where((W >> p) & 1, c[:, i], 0)
        j = i + a[:, i]                        # next position per chunk
        for d in range(32):                    # in-chunk arrivals
            tgt = i + 1 + d
            if tgt >= 32:
                break
            P[:, tgt] |= np.where(j == tgt, W, 0).astype(np.uint32)
        for d in range(NPHASE):                # exits into the next chunk
            EXITS[:, d] |= np.where(j == 32 + d, W, 0).astype(np.uint32)
    return EXITS, ENDM, CNT


def compose(a, b):
    """Transfer composition: a then b (each = (EXITS, ENDM, CNT))."""
    ea, ma, ca = a
    eb, mb, cbb = b
    ec = np.zeros_like(ea)
    for r in range(NPHASE):
        acc = np.zeros_like(ea[..., 0])
        for q in range(NPHASE):
            acc |= np.where((eb[..., r] >> q) & 1, ea[..., q], 0)
        ec[..., r] = acc
    mc = ma.copy()
    for q in range(NPHASE):
        mc |= np.where((mb >> q) & 1, ea[..., q], 0)
    cc = ca.copy()
    for p in range(NPHASE):
        for q in range(NPHASE):
            cc[..., p] += np.where((ea[..., q] >> p) & 1, cbb[..., q], 0)
    return ec, mc, cc


def identity_transfer(shape):
    e = np.zeros(shape + (NPHASE,), dtype=np.uint32)
    for q in range(NPHASE):
        e[..., q] = 1 << q
    return e, np.zeros(shape, np.uint32), np.zeros(shape + (NPHASE,), np.int64)


def scan_entries(EXITS, ENDM, CNT):
    """Phase C (sequential reference): entry phase + coeff base per chunk.

    Direct chain (the JAX version uses the associative compose(), which
    check_compose() validates against this chain on random windows)."""
    n = EXITS.shape[0]
    entry = np.zeros(n, dtype=np.int32)
    base = np.zeros(n, dtype=np.int64)
    cur = 0
    acc = 0
    for k in range(n):
        entry[k] = cur
        base[k] = acc
        if cur == DONE:
            continue
        acc += CNT[k][cur]
        if (ENDM[k] >> cur) & 1:
            cur = DONE
            continue
        for r in range(NPHASE):
            if (EXITS[k][r] >> cur) & 1:
                cur = r
                break
        else:
            raise AssertionError("no exit for live phase")
    return entry, base


def check_compose(EXITS, ENDM, CNT):
    """Validate compose() associatively against the direct chain."""
    n = EXITS.shape[0]
    if n < 3:
        return
    rng = np.random.default_rng(0)
    for _ in range(4):
        k0 = int(rng.integers(0, n - 2))
        k1 = int(rng.integers(k0 + 1, n))
        cure, curm, curc = identity_transfer(())
        for k in range(k0, k1):
            cure, curm, curc = compose((cure, curm, curc),
                                       (EXITS[k], ENDM[k], CNT[k]))
        # tree order must agree (associativity)
        mid = (k0 + k1) // 2
        la = identity_transfer(())
        for k in range(k0, mid):
            la = compose(la, (EXITS[k], ENDM[k], CNT[k]))
        lb = identity_transfer(())
        for k in range(mid, k1):
            lb = compose(lb, (EXITS[k], ENDM[k], CNT[k]))
        te, tm, tc = compose(la, lb)
        assert (te == cure).all() and (tm == curm).all() and \
            (tc == curc).all(), "compose not associative"


def final_walk(adv, cnt, val, end, entry, base, num_coeffs):
    """Phase D+E (semantics via scatter): dense int32 output, pre-dequant."""
    nchunks = len(entry)
    a = adv.reshape(nchunks, 32)
    c = cnt.reshape(nchunks, 32)
    v = val.reshape(nchunks, 32)
    e = end.reshape(nchunks, 32)
    active = np.zeros((nchunks, 32), dtype=bool)   # visited codeword starts
    P = np.zeros((nchunks, 32), dtype=bool)
    for p in range(NPHASE):
        P[:, p] = entry == p
    for i in range(32):
        W = P[:, i].copy()
        P[:, i] = False
        W &= e[:, i] == 0          # band-end emits nothing and stops
        active[:, i] = W
        j = i + a[:, i]
        for d in range(32):
            tgt = i + 1 + d
            if tgt >= 32:
                break
            P[:, tgt] |= W & (j == tgt)
        # exits discarded: the next chunk's entry is known from the scan
    counts = np.where(active, c, 0)
    flat_counts = counts.reshape(-1)
    t = base[:, None] + (np.cumsum(counts, axis=1) - counts)
    t = t.reshape(-1)
    vals = np.where(active, v, 0).reshape(-1)
    out = np.zeros(num_coeffs, dtype=np.int32)
    overflow = False
    nz = vals != 0
    tt = t[nz]
    vv = vals[nz]
    ok = tt < num_coeffs
    if not ok.all():
        overflow = True       # host-fallback flag in the real impl
    out[tt[ok]] = vv[ok]
    return out, overflow


def spread_network(targets, values, out_size):
    """Phase E: high-bit-first monotone-displacement doubling (validated
    against scatter).  targets strictly increasing; moves right only after
    the +S virtual offset."""
    S = len(targets)
    OFF = S
    arr_v = np.zeros(S + out_size, dtype=np.int64)
    arr_d = np.zeros(S + out_size, dtype=np.int64)
    arr_v[:S] = values
    arr_d[:S] = targets + OFF - np.arange(S)
    assert (np.diff(arr_d[:S] + np.arange(S)) > 0).all()
    assert (arr_d[:S] >= 0).all()
    maxd = int(arr_d[:S].max(initial=0))
    for k in range(maxd.bit_length() - 1, -1, -1):
        s = 1 << k
        move = arr_d >= s
        src_v = np.where(move, arr_v, 0)
        src_d = np.where(move, arr_d - s, 0)
        # shift right by s, keep non-movers
        new_v = np.where(move, 0, arr_v)
        new_d = np.where(move, 0, arr_d)
        new_v[s:] |= src_v[:-s] if s < len(arr_v) else 0
        new_d[s:] = np.maximum(new_d[s:], src_d[:-s])
        # collision check (the proof says none)
        assert not (np.where(move, 0, arr_v)[s:] * src_v[:-s]).any()
        arr_v, arr_d = new_v, new_d
    return arr_v[OFF:OFF + out_size]


def decode_band_proto(payload: bytes, num_coeffs: int, codeset: int,
                      quant: int):
    adv, cnt, val, end = classify(payload, codeset)
    nbits = len(adv)
    pad = (-nbits) % 32
    if pad:
        adv = np.concatenate([adv, np.zeros(pad, np.int32)])
        cnt = np.concatenate([cnt, np.zeros(pad, np.int32)])
        val = np.concatenate([val, np.zeros(pad, np.int32)])
        end = np.concatenate([end, np.ones(pad, np.int32)])
    nchunks = len(adv) // 32
    EXITS, ENDM, CNT = chunk_transfers(adv, cnt, end, nchunks)
    entry, base = scan_entries(EXITS, ENDM, CNT)
    if nchunks <= 64:
        check_compose(EXITS, ENDM, CNT)
    out, ovf = final_walk(adv, cnt, val, end, entry, base, num_coeffs)
    dq = ((out * quant) << 16 >> 16).astype(np.int32)   # int16 wrap
    return dq, ovf


def main():
    rng = np.random.default_rng(7)
    failures = 0
    for codeset in (17, 18):
        for trial in range(12):
            n = int(rng.integers(64, 4096))
            density = rng.choice([0.0, 0.02, 0.1, 0.5, 0.95])
            vals = np.zeros(n, dtype=np.int64)
            nz = rng.random(n) < density
            vals[nz] = rng.integers(-1023, 1024, nz.sum())
            quant = int(rng.choice([1, 4, 12, 24, 144]))
            bits, sizes = ehost.encode_band(vals, codeset)
            payload = ehost.pack_msb_first(bits, sizes, align=32)
            want, endpos = ehost.decode_band(payload, n, codeset, quant)
            got, ovf = decode_band_proto(payload, n, codeset, quant)
            ok = (want == got).all() and not ovf
            if not ok:
                failures += 1
                diff = np.flatnonzero(want != got)
                print(f"FAIL cs{codeset} n={n} density={density} "
                      f"quant={quant} ndiff={len(diff)} first={diff[:5]}")
                print("  want", want[diff[:5]], "got", got[diff[:5]])
            else:
                print(f"ok   cs{codeset} n={n} density={density} quant={quant}"
                      f" bits={len(payload)*8}")
    # spread network unit check
    for trial in range(6):
        S = int(rng.integers(10, 500))
        outn = int(rng.integers(S, S * 40))
        t = np.sort(rng.choice(outn, size=S, replace=False)).astype(np.int64)
        v = rng.integers(1, 1 << 16, S).astype(np.int64)
        got = spread_network(t, v, outn)
        want = np.zeros(outn, dtype=np.int64)
        want[t] = v
        assert (got == want).all(), "spread mismatch"
    print("spread network ok")
    print("FAILURES:", failures)


if __name__ == "__main__":
    main()
