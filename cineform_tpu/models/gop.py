"""TPU 2-frame GOP (FIELDPLUS) codec: batched JAX transform + host
entropy/bitstream — the device counterpart of models/gop_host.py, mirroring
how models/intra.py pairs with intra_host.

Device side (one traced XLA program, batched over groups):
  two YUY2 frames -> level-1 spatial wavelets per frame (progressive
  semantics, encoder.c:9504) -> 2-2 temporal between the frame LLs ->
  w3 spatial of the temporal high / w4 (prescale 2) + w5 spatial chain of
  the temporal low -> quantized subband planes in HBM.
Host side: gop_host.write_group assembles the byte-exact GROUP sample.

Coefficients are bit-exact vs the host oracle, so samples are byte-exact
vs the reference encoder.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from cineform_tpu.models import gop_host
from cineform_tpu.ops import intra_transform as ops
from cineform_tpu.ref import gop as gxf
from cineform_tpu.spec import tags


@dataclass(frozen=True)
class GopCodec:
    """A compiled FIELDPLUS group codec for one (width, height, quality)."""

    width: int
    height: int
    quality: int = 4

    def band_quant(self, channel: int) -> dict:
        return gxf.fieldplus_band_quant(self.quality, tags.PRECISION_10BIT,
                                        channel)

    @partial(jax.jit, static_argnums=0)
    def forward(self, frames0: jnp.ndarray, frames1: jnp.ndarray):
        """(B, H, 2W) uint8 YUY2 pairs -> per-channel (lowpass, bands dict).

        bands[k] matches ref/gop.forward_channel_gop: w0/w1/w4/w5 ->
        (LH, HL, HH); w3 -> (LL, LH, HL, HH).
        """
        p0 = ops.unpack_yuy2(frames0, tags.PRECISION_10BIT)
        p1 = ops.unpack_yuy2(frames1, tags.PRECISION_10BIT)
        out = []
        for ch in range(3):
            bq = self.band_quant(ch)
            ll0, b0 = ops.dwt2d_forward(p0[ch], 0, bq[0])
            ll1, b1 = ops.dwt2d_forward(p1[ch], 0, bq[1])
            tlow = ops.sat16(ll0 + ll1)
            thigh = ops.sat16(ll1 - ll0)
            # band-1 input: at narrow widths the row-0 overread lands on
            # the temporal lowpass' last two pixels (see ref/gop.py w3)
            r0 = tlow[..., -1, -2:] if (2 * thigh.shape[-1] *
                                        thigh.shape[-2]) % 64 == 0 else None
            ll3, h3 = ops.dwt2d_forward(thigh, 0, bq[3][1:], row0_prev=r0)
            w3 = (ops.quantize(ll3, bq[3][0]),) + h3
            ll4, w4 = ops.dwt2d_forward(tlow, 2, bq[4])
            ll5, w5 = ops.dwt2d_forward(ll4, 0, bq[5])
            out.append((ll5, {0: b0, 1: b1, 3: w3, 4: w4, 5: w5}))
        return out

    # --- fully device-side decode: entropy + FIELDPLUS inverse ---------------

    #: band-row classes for the 17-subband FIELDPLUS map
    #: (`Codec/decoder.c:11191-11192`): entries are (wavelet idx, slot)
    #: in gop_host.SUBBAND_MAP terms; level = band-dim shift (H >> level)
    _LEVEL_ENTRIES = {
        1: ((0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (1, 2)),
        2: ((3, 0), (3, 1), (3, 2), (3, 3), (4, 0), (4, 1), (4, 2)),
        3: ((5, 0), (5, 1), (5, 2)),
    }
    _DECODE_CLASSES = tuple((lvl, planes)
                            for lvl in (1, 2, 3) for planes in ((0,), (1, 2)))

    MIN_ROW_CHUNKS = 256

    def _class_dims(self, lvl: int, planes: tuple[int, ...]):
        from cineform_tpu.models.intra_host import align16_pixels

        bh = self.height >> lvl
        plane_w = self.width if planes == (0,) else self.width // 2
        bw = plane_w >> lvl
        return bh, bw, align16_pixels(bw)

    def _decode_rows_args(self, samples: list[bytes],
                          min_row_chunks: int | None = None):
        """Host header walk for GROUP samples -> per-class row tensors
        (mirrors IntraCodec._decode_rows_args over the 17-subband map).

        Returns (pays, nchs, qns, lins, lp, fallback): 6-tuples per
        _DECODE_CLASSES class with rows ordered (frame, channel, entry),
        the 3 lowpass planes, and frame indices needing host fallback
        (wrong dims/type, interlaced, peaks bands, raw 16-bit bands,
        scalar-tail widths)."""
        from cineform_tpu.bitstream import parse_sample
        from cineform_tpu.models import intra_host

        batch = len(samples)
        # the fused output stage has no scalar-tail region on device
        if (self.width % 32) or ((self.width // 2) % 16):
            return None, None, None, None, None, set(range(batch))
        payload_parts = {}
        lowpass = [[None] * batch for _ in range(3)]
        fallback = set()
        for i, sample in enumerate(samples):
            s = parse_sample(sample)
            if ((s.width, s.height) != (self.width, self.height)
                    or len(s.channels) != 3
                    or s.transform_type != tags.TRANSFORM_TYPE_FIELDPLUS
                    or not s.progressive):
                fallback.add(i)
                continue
            for ch, c in enumerate(s.channels):
                off = intra_host.lowpass_channel_offset(
                    c.lowpass.shape[1], num_frames=2)
                lowpass[ch][i] = ((c.lowpass + off).astype(c.lowpass.dtype)
                                  if off else c.lowpass)
                for b in c.bands:
                    if b.subband in (0, 255):
                        continue
                    widx, slot = gop_host.SUBBAND_MAP[b.subband]
                    if (b.peaks is not None or len(b.data) % 4
                            or getattr(b, "encoding",
                                       tags.BAND_ENCODING_RUNLENGTHS)
                            == tags.BAND_ENCODING_16BIT):
                        fallback.add(i)
                        continue
                    payload_parts[(ch, widx, slot, i)] = (
                        b.data, b.quantization,
                        1 if b.coding_flags == 18 else 0)
        for i in range(batch):
            if i in fallback:
                continue
            for ch in range(3):
                for lvl, entries in self._LEVEL_ENTRIES.items():
                    for widx, slot in entries:
                        if (ch, widx, slot, i) not in payload_parts:
                            fallback.add(i)
        live = [i for i in range(batch) if i not in fallback]

        minc = min_row_chunks or self.MIN_ROW_CHUNKS
        pays, nchs, qns, lins = [], [], [], []
        for lvl, planes in self._DECODE_CLASSES:
            entries = self._LEVEL_ENTRIES[lvl]
            rows = []
            for i in range(batch):
                for ch in planes:
                    for widx, slot in entries:
                        if i in fallback:
                            rows.append((b"", 1, 0))
                        else:
                            rows.append(payload_parts[(ch, widx, slot, i)])
            cap = minc
            maxc = max((len(d) // 4 for d, _, _ in rows), default=1)
            while cap < maxc:
                cap *= 2
            nr = len(rows)
            pay = np.zeros((nr, cap * 4), np.uint8)
            nch = np.zeros(nr, np.int32)
            qn = np.ones(nr, np.int32)
            lin = np.zeros(nr, np.int32)
            for r, (d, q, li) in enumerate(rows):
                pay[r, :len(d)] = np.frombuffer(d, np.uint8)
                nch[r] = len(d) // 4
                qn[r] = q
                lin[r] = li
            pays.append(jnp.asarray(pay))
            nchs.append(jnp.asarray(nch))
            qns.append(jnp.asarray(qn))
            lins.append(jnp.asarray(lin))

        lp = []
        lh, lw = self.height >> 3, self.width >> 3
        for ch in range(3):
            w = lw if ch == 0 else lw // 2
            arr = np.zeros((batch, lh, w), np.int32)
            for i in live:
                if lowpass[ch][i] is not None:
                    arr[i] = lowpass[ch][i]
            lp.append(jnp.asarray(arr))
        return (tuple(pays), tuple(nchs), tuple(qns), tuple(lins),
                tuple(lp), fallback)

    @partial(jax.jit, static_argnums=(0, 3, 4))
    def _class_reshape(self, co, ovf, ci: int, batch: int):
        lvl, planes = self._DECODE_CLASSES[ci]
        entries = self._LEVEL_ENTRIES[lvl]
        bh, bw, pitch = self._class_dims(lvl, planes)
        co = co.reshape(batch, len(planes), len(entries), bh, pitch)[..., :bw]
        return co, ovf.reshape(batch, -1).any(axis=1)

    def _decode_class_program(self, pay, nch, qn, lin, ci: int):
        """One GOP band row class -> ((B, planes, E, bh, bw) i32, (B,)
        overflow flags) via the device band entropy decoder.  Staged
        per-stage programs, like IntraCodec._decode_class_program (the
        fused formulation SIGKILLed the remote AOT compiler at 1080p
        payload capacities)."""
        from cineform_tpu.entropy import device_decode as ddec

        lvl, planes = self._DECODE_CLASSES[ci]
        entries = self._LEVEL_ENTRIES[lvl]
        bh, bw, pitch = self._class_dims(lvl, planes)
        co, ovf = ddec.decode_band_rows_staged(pay, nch, qn, lin,
                                               nout=bh * pitch)
        batch = pay.shape[0] // (len(planes) * len(entries))
        return self._class_reshape(co, ovf, ci, batch)

    def _decode_device_program(self, pay, nch, qn, lin, lowpass,
                               batch: int, dither_base: int,
                               reference_compatible: bool = True):
        """Per-class band payload rows -> ((B, H, 2W) uint8 YUY2 frame 0,
        frame 1, (B,) overflow flags): the full FIELDPLUS decode on
        device — band entropy decode feeding the w5/w4/w3 pyramid, the
        temporal combine and the fused 8-bit output stage
        (`Codec/decoder.c:11180` DecodeSampleGroup on the chip).  The
        pyramid border/tap quirks match gop_host.decode_group exactly
        (stale bottom taps on w5/w3, saturate-before->>1 combine)."""
        from cineform_tpu.models.intra import _dither_rows

        bands_by = {}
        ovfs = []
        for ci, (lvl, planes) in enumerate(self._DECODE_CLASSES):
            entries = self._LEVEL_ENTRIES[lvl]
            co, ovf = self._decode_class_program(pay[ci], nch[ci], qn[ci],
                                                 lin[ci], ci)
            for pi, ch in enumerate(planes):
                for ei, (widx, slot) in enumerate(entries):
                    bands_by[(ch, widx, slot)] = co[:, pi, ei]
            ovfs.append(ovf)
        ovf_frame = jnp.stack(ovfs, axis=0).any(axis=0)

        r0 = jnp.asarray(_dither_rows(self.height, dither_base))
        r1 = jnp.asarray(_dither_rows(self.height, dither_base + 1))
        d00 = ops.expand_dither_rows(r0, self.width, 16)
        d0c = ops.expand_dither_rows(r0, self.width // 2, 8)
        d10 = ops.expand_dither_rows(r1, self.width, 16)
        d1c = ops.expand_dither_rows(r1, self.width // 2, 8)
        f0planes, f1planes = [], []
        for ch in range(3):
            b = {widx: tuple(bands_by[(ch, widx, s)]
                             for s in range(4 if widx == 3 else 3))
                 for widx in (0, 1, 3, 4, 5)}
            ll4 = ops.dwt2d_inverse(jnp.asarray(lowpass[ch]), *b[5],
                                    descale=1, bottom_shift=True)
            tlow = ops.dwt2d_inverse(ll4, *b[4], descale=2)
            thigh = ops.dwt2d_inverse(b[3][0], *b[3][1:], descale=1,
                                      bottom_shift=True)
            ll0 = ops.sat16(tlow - thigh) >> 1

            def final(llf, wb, dither):
                lh, hl, hh = wb
                low = ops.v26_inverse(llf, hl)
                high = ops.v26_inverse(lh, hh)
                return ops.h26_inverse_to_output(low, high, 2, dither)

            d0 = d00 if ch == 0 else d0c
            d1 = d10 if ch == 0 else d1c
            f0planes.append(final(ll0, b[0], d0))
            if reference_compatible:
                f1planes.append(final(ll0, b[0], d1))
            else:
                ll1 = ops.sat16(tlow + thigh) >> 1
                f1planes.append(final(ll1, b[1], d1))
        return (ops.pack_yuy2(*f0planes), ops.pack_yuy2(*f1planes),
                ovf_frame)

    def decode_batch_device(self, samples: list[bytes],
                            reference_compatible: bool = True,
                            dither_base: int = 0,
                            min_row_chunks: int | None = None
                            ) -> tuple[np.ndarray, np.ndarray]:
        """Decode GROUP samples wholly on device: the host only walks
        headers and slices payloads; band entropy decode, the FIELDPLUS
        pyramid, temporal combine, dither and YUY2 pack run as traced
        programs.  Byte-identical to gop_host.decode_group; frames with
        peaks tables, raw 16-bit bands, interlaced flags or capacity
        overflows fall back to the host path per frame."""
        batch = len(samples)
        pays, nchs, qns, lins, lp, fallback = self._decode_rows_args(
            samples, min_row_chunks)

        def host_decode(subset):
            outs = [gop_host.decode_group(
                x, reference_compatible=reference_compatible,
                dither_base=dither_base) for x in subset]
            shape = (self.height, 2 * self.width)
            return (np.stack([np.frombuffer(o[0], np.uint8).reshape(shape)
                              for o in outs]),
                    np.stack([np.frombuffer(o[1], np.uint8).reshape(shape)
                              for o in outs]))

        if len(fallback) == batch:
            return host_decode(samples)

        f0, f1, ovf = self._decode_device_program(
            pays, nchs, qns, lins, lp, batch, dither_base,
            reference_compatible)
        f0 = np.asarray(jax.device_get(f0))
        f1 = np.asarray(jax.device_get(f1))
        for i in np.nonzero(np.asarray(ovf))[0]:
            fallback.add(int(i))
        if fallback:
            h0, h1 = host_decode([samples[i] for i in sorted(fallback)])
            for j, i in enumerate(sorted(fallback)):
                f0[i] = h0[j]
                f1[i] = h1[j]
        return f0, f1

    def encode_batch(self, frames0: np.ndarray, frames1: np.ndarray,
                     first_frame_number: int = 1,
                     metadata=None,
                     frame_numbers: list[int] | None = None,
                     assemble_count: int | None = None) -> list[bytes]:
        """Encode (B, H, 2W) uint8 YUY2 frame pairs to GROUP samples
        (byte-exact vs the reference encoder).  `metadata` may be one
        EncoderMetadata or one per group."""
        coeffs = jax.device_get(self.forward(jnp.asarray(frames0),
                                             jnp.asarray(frames1)))
        batch = frames0.shape[0]
        if frame_numbers is None:
            frame_numbers = [first_frame_number + i for i in range(batch)]
        if not isinstance(metadata, (list, tuple)):
            metadata = [metadata] * batch
        samples = []
        for i in range(batch if assemble_count is None
                       else min(batch, assemble_count)):
            channels = []
            for ch, (lowpass, bands) in enumerate(coeffs):
                bd = {k: tuple(np.asarray(b[i]) for b in bs)
                      for k, bs in bands.items()}
                channels.append((np.asarray(lowpass[i]), bd,
                                 self.band_quant(ch)))
            samples.append(gop_host.write_group(
                channels, self.width, self.height, self.quality,
                frame_numbers[i], metadata[i]))
        return samples
