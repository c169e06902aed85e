"""Pallas TPU kernel for the within-chunk entropy bit-pack tree.

The XLA formulation (entropy/device.tree_pack) materializes every tree
level in HBM — ~70 intermediate arrays per band group, measured ~52 GB/s
effective on a v5e.  This kernel runs the whole 8-level tree in VMEM:
one read of (bits, sizes), one write of (words, lens), everything else
on-chip.

Layout trick: chunk elements are pre-permuted into BIT-REVERSED order
(an XLA reshape/transpose, free at HBM speed).  In that order every tree
level combines two CONTIGUOUS HALVES of the element axis elementwise —
no strided pair deinterleave, which is exactly the Mosaic limitation
that bit round 1's fused-DWT kernel (see STATUS.md).

Arrays inside the kernel are (words, elems, 128 chunks): the last two
dims map onto (sublane, lane) vregs at full utilization; static word
rolls are slices along the outermost axis; the per-pair variable bit
shift is an elementwise u32 shift broadcast over words.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

CHUNK = 256
LANES = 128


def _word_cap(nbits: int) -> int:
    return -(-nbits // 32)


def _schedule(max_code_bits: int, cap_bits_per_elem: int):
    """Per-level (w_new, cap_bits, check_overflow), mirroring
    entropy/device.tree_pack exactly."""
    levels = CHUNK.bit_length() - 1
    w_cur = 1
    out = []
    for k in range(1, levels + 1):
        full = max_code_bits << k
        cap_bits = full if k <= 4 else min(
            full, max(cap_bits_per_elem << k, 32 * w_cur))
        w_new = _word_cap(cap_bits)
        out.append((w_new, cap_bits, cap_bits < full))
        w_cur = w_new
    return out, w_cur


def _pack_kernel(packed_ref, words_ref, lens_ref, ovf_ref, *, schedule):
    packed = packed_ref[...]                 # (CHUNK, LANES) uint32
    bits = packed & jnp.uint32((1 << 27) - 1)
    sizes = packed >> 27

    buf = jnp.where(sizes == 0, jnp.uint32(0),
                    bits << (jnp.uint32(32) - sizes))
    buf = buf[None, :, :]                    # (w=1, elems, LANES)
    lens = sizes.astype(jnp.int32)           # (elems, LANES)
    ovf = jnp.zeros((1, LANES), jnp.int32)

    # Layout phase 1 (many elements, few words): (w, elems, LANES) so the
    # minor (elems, LANES) dims fill vregs.  Once elems drops below a
    # sublane (8), transpose to (elems, w, LANES) so (w, LANES) fills
    # vregs instead — the top levels carry the widest buffers.
    w_cur = 1
    n = CHUNK
    swapped = False
    for (w_new, cap_bits, check) in schedule:
        m = n // 2
        if not swapped and m <= 8 <= w_new:
            buf = buf.transpose(1, 0, 2)     # -> (elems, w, LANES)
            swapped = True
        if not swapped:
            a = buf[:, :m, :]
            b = buf[:, m:, :]
            pad = ((0, w_new - w_cur), (0, 0), (0, 0))
            wax = 0
        else:
            a = buf[:m, :, :]
            b = buf[m:, :, :]
            pad = ((0, 0), (0, w_new - w_cur), (0, 0))
            wax = 1
        la = lens[:m, :]
        lb = lens[m:, :]
        a = jnp.pad(a, pad)
        b = jnp.pad(b, pad)
        # shift b right by la bits: bit part (elementwise funnel over the
        # word axis) then word offset (static rolls + selects)
        sh_shape = (1, m, LANES) if not swapped else (m, 1, LANES)
        bshift = (la & 31).astype(jnp.uint32).reshape(sh_shape)
        woff = (la >> 5).reshape(sh_shape)

        def roll(x, s):
            if wax == 0:
                return jnp.pad(x[:-s], ((s, 0), (0, 0), (0, 0)))
            return jnp.pad(x[:, :-s], ((0, 0), (s, 0), (0, 0)))

        b_hi = roll(b, 1)
        b = jnp.where(bshift == 0, b,
                      (b >> bshift) | (b_hi << ((jnp.uint32(32) - bshift)
                                                & jnp.uint32(31))))
        step = 1
        while step <= w_cur:
            b = jnp.where((woff & step) != 0, roll(b, step), b)
            step <<= 1
        buf = a | b
        lens = la + lb
        if check:
            ovf = ovf | (lens > cap_bits).any(axis=0,
                                              keepdims=True).astype(jnp.int32)
        w_cur = w_new
        n = m

    out = buf[0, :, :] if swapped else buf[:, 0, :]
    words_ref[...] = out.T                   # (LANES, w_final) natural
    lens_ref[...] = lens.T
    ovf_ref[...] = ovf.T


def _bit_reverse_elems(x: jnp.ndarray) -> jnp.ndarray:
    """Permute the last axis (length 256) into bit-reversed order."""
    lead = x.shape[:-1]
    x = x.reshape(lead + (2,) * 8)
    perm = tuple(range(len(lead))) + tuple(
        len(lead) + i for i in reversed(range(8)))
    return x.transpose(perm).reshape(lead + (CHUNK,))


@partial(jax.jit, static_argnames=("max_code_bits", "cap_bits_per_elem",
                                   "interpret"))
def chunk_pack(bits: jnp.ndarray, sizes: jnp.ndarray,
               max_code_bits: int = 27, cap_bits_per_elem: int = 12,
               interpret: bool = False):
    """Per-chunk bit packing on TPU via Pallas.

    bits/sizes: (..., T, 256) per-element codes.  Returns
    (bufs (..., T, W), lens (..., T), overflow (..., T) bool), matching
    entropy/device.tree_pack's contract for 256-element chunks."""
    *lead, t, c = bits.shape
    assert c == CHUNK
    schedule, w_final = _schedule(max_code_bits, cap_bits_per_elem)

    # pack (size, bits) into one u32 (codes < 2^27, sizes <= 27 = 5 bits)
    # so the unavoidable HBM transpose into chunk-lane-major layout moves
    # half the bytes (the transpose runs at ~24 GB/s and dominates)
    packed = (sizes.astype(jnp.uint32) << 27) | bits.astype(jnp.uint32)
    packed = _bit_reverse_elems(packed).reshape(-1, CHUNK)
    total = packed.shape[0]
    pad_t = (-total) % LANES
    if pad_t:
        packed = jnp.pad(packed, ((0, pad_t), (0, 0)))
    blocks = packed.shape[0] // LANES
    packed = packed.T                        # (CHUNK, blocks*LANES)

    kernel = partial(_pack_kernel, schedule=schedule)
    words, lens, ovf = pl.pallas_call(
        kernel,
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((CHUNK, LANES), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((LANES, w_final), lambda i: (i, 0)),
            pl.BlockSpec((LANES, 1), lambda i: (i, 0)),
            pl.BlockSpec((LANES, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((blocks * LANES, w_final), jnp.uint32),
            jax.ShapeDtypeStruct((blocks * LANES, 1), jnp.int32),
            jax.ShapeDtypeStruct((blocks * LANES, 1), jnp.int32),
        ],
        interpret=interpret,
    )(packed)

    words = words[:total].reshape(*lead, t, w_final)
    lens = lens[:total, 0].reshape(*lead, t)
    ovf = ovf[:total, 0].reshape(*lead, t) != 0
    return words, lens, ovf
