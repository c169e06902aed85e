"""TPU CFHD intra codec: batched JAX transform + host entropy/bitstream.

Pipeline split (the TPU-native re-expression of `Codec/encoder.c:1897`):
- device (XLA, batched over frames): YUY2 unpack -> 3-level production DWT
  with fused quantization -> coefficient planes in HBM. One traced program
  per (resolution, quality); all shapes static.
- host: zero-run/Huffman entropy coding + CFHD tag/value sample assembly
  (models/intra_host.py machinery), byte-exact vs the reference encoder.

Decode mirrors it: host entropy decode -> device batched inverse DWT fused
with the 8-bit output conversion.

The reference's frame/channel/strip thread parallelism (`SURVEY.md` §2.4)
maps to the batch dimension here: many frames per XLA program, sharded over
chips with `jax.sharding` for scale-out (see parallel/).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from functools import lru_cache

from cineform_tpu.models import intra_host
from cineform_tpu.ops import intra_transform as ops
from cineform_tpu.spec.production import IntraParams, intra_prescale


@lru_cache(maxsize=64)
def _dither_rows(height: int, frame_index: int = 0) -> np.ndarray:
    """Reference-exact (H, 16) output dither row draws for the n-th
    decoded frame of a decoder process (glibc rand stream; see
    ref/intra.decode_dither_rows), as uint8 numpy.  Jitted decoders
    embed THESE (~17 KB at 1080p) and expand to the channel planes on
    device (ops.expand_dither_rows) — baking expanded (H, W) planes as
    program constants produced ~33 MB MLIR that hung AOT compilers."""
    from cineform_tpu.ref import intra as xf

    return np.ascontiguousarray(
        xf.decode_dither_rows(height, frame_index).astype(np.uint8))


# device-side input unpack + the COLOR_FORMAT code for the sample header
# (codes match api.Encoder._INPUT_FORMAT_CODES / `Codec/frame.c` unpackers).
# "encoded" selects the encoded format / channel configuration
# (`Codec/encoder.c:2109-2135` encoded-format dispatch):
#   YUV   = 10-bit 4:2:2, 3 channels (W, W/2, W/2)
#   RGB   = 12-bit 4:4:4, 3 full-width channels, chroma_full_res
#   RGBA  = 12-bit 4:4:4:4 (b64a: chroma tables stay chroma)
#   RGBA_FULL = RG64 (chroma_full_res like RGB)
#   BAYER = 12-bit quarter-res difference planes, rgb_quality=3
#           (`Codec/encoder.c:2637`)
_DEVICE_FORMATS = {
    "YUY2": {"code": 2, "row_bytes": lambda w: 2 * w, "encoded": "YUV"},
    "UYVY": {"code": 1, "row_bytes": lambda w: 2 * w, "encoded": "YUV"},
    "YU64": {"code": 12, "row_bytes": lambda w: 4 * w, "encoded": "YUV"},
    "V210": {"code": 10, "row_bytes": lambda w: ((w + 47) // 48) * 128,
             "encoded": "YUV"},
    "RG48": {"code": 120, "row_bytes": lambda w: 6 * w, "encoded": "RGB"},
    "B64A": {"code": 30, "row_bytes": lambda w: 8 * w, "encoded": "RGBA"},
    "RG64": {"code": 121, "row_bytes": lambda w: 8 * w,
             "encoded": "RGBA_FULL"},
    "BYR4": {"code": 104, "row_bytes": lambda w: 2 * w, "encoded": "BAYER"},
    "BYR5": {"code": 105, "row_bytes": lambda w: 3 * w // 2,
             "encoded": "BAYER"},
}


@dataclass(frozen=True)
class IntraCodec:
    """A compiled intra codec for one (width, height, quality, input) config."""

    width: int
    height: int
    quality: int
    input_format: str = "YUY2"

    @property
    def encoded(self) -> str:
        return _DEVICE_FORMATS[self.input_format]["encoded"]

    @property
    def params(self) -> IntraParams:
        from cineform_tpu.spec import tags as _t

        enc = self.encoded
        if enc == "YUV":
            return IntraParams(width=self.width, height=self.height,
                               quality=self.quality)
        if enc == "RGB":
            return IntraParams(width=self.width, height=self.height,
                               quality=self.quality,
                               precision=_t.PRECISION_12BIT,
                               chroma_full_res=True)
        if enc == "RGBA":
            return IntraParams(width=self.width, height=self.height,
                               quality=self.quality,
                               precision=_t.PRECISION_12BIT,
                               chroma_full_res=False)
        if enc == "RGBA_FULL":
            return IntraParams(width=self.width, height=self.height,
                               quality=self.quality,
                               precision=_t.PRECISION_12BIT,
                               chroma_full_res=True)
        # BAYER: channels are quarter-res difference planes
        return IntraParams(width=self.width // 2, height=self.height // 2,
                           quality=self.quality,
                           precision=_t.PRECISION_12BIT,
                           chroma_full_res=True, rgb_quality=3)

    @property
    def num_channels(self) -> int:
        return {"YUV": 3, "RGB": 3, "RGBA": 4, "RGBA_FULL": 4,
                "BAYER": 4}[self.encoded]

    def plane_width(self, ch: int) -> int:
        if self.encoded == "YUV" and ch > 0:
            return self.width // 2
        return self.params.width

    @property
    def _write_sample_kwargs(self) -> dict:
        from cineform_tpu.spec import tags as _t

        enc = self.encoded
        if enc == "YUV":
            return {"input_format": self.input_format_code}
        common = {"input_format": self.input_format_code,
                  "colorspace": None}
        if enc == "RGB":
            return {**common,
                    "encoded_format": _t.ENCODED_FORMAT_RGB_444}
        if enc in ("RGBA", "RGBA_FULL"):
            return {**common,
                    "encoded_format": _t.ENCODED_FORMAT_RGBA_4444,
                    "quality_high": 0x2000}
        return {**common, "encoded_format": _t.ENCODED_FORMAT_BAYER}

    @property
    def row_bytes(self) -> int:
        return _DEVICE_FORMATS[self.input_format]["row_bytes"](self.width)

    @property
    def input_format_code(self) -> int:
        return _DEVICE_FORMATS[self.input_format]["code"]

    def _unpack(self, frames: jnp.ndarray):
        p = self.params
        if self.input_format == "YUY2":
            return ops.unpack_yuy2(frames, p.precision)
        if self.input_format == "UYVY":
            return ops.unpack_uyvy(frames, p.precision)
        if self.input_format == "YU64":
            return ops.unpack_yu64(frames)
        if self.input_format == "V210":
            return ops.unpack_v210(frames, self.width)
        if self.input_format == "RG48":
            return ops.unpack_rg48(frames)
        if self.input_format == "B64A":
            return ops.unpack_b64a(frames)
        if self.input_format == "RG64":
            return ops.unpack_rg64(frames)
        if self.input_format == "BYR4":
            from cineform_tpu.ref.intra import byr4_log90_curve

            lut = jnp.asarray(byr4_log90_curve().astype(np.int32))
            return ops.unpack_byr4(frames, lut)
        if self.input_format == "BYR5":
            # natural BYR5 layout: quarter-res rows of 3W bytes
            lead = frames.shape[:-2]
            return ops.unpack_byr5(frames.reshape(
                lead + (self.height // 2, 3 * self.width)))
        raise ValueError(self.input_format)

    def _unpack_host(self, raw: bytes):
        from cineform_tpu.ref import intra as xf

        p = self.params
        if self.input_format == "YUY2":
            return xf.unpack_yuy2(raw, self.width, self.height, p.precision)
        if self.input_format == "UYVY":
            return xf.unpack_uyvy(raw, self.width, self.height, p.precision)
        if self.input_format == "YU64":
            return xf.unpack_yu64(raw, self.width, self.height)
        if self.input_format == "V210":
            return xf.unpack_v210(raw, self.width, self.height)
        if self.input_format == "RG48":
            return xf.unpack_rg48(raw, self.width, self.height)
        if self.input_format == "B64A":
            return xf.unpack_b64a(raw, self.width, self.height)
        if self.input_format == "RG64":
            return xf.unpack_rg64(raw, self.width, self.height)
        if self.input_format == "BYR4":
            return xf.unpack_byr4(raw, self.width, self.height)
        return xf.unpack_byr5(raw, self.width, self.height)

    # --- device programs ---------------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def forward(self, frames: jnp.ndarray):
        """(B, H, row_bytes) uint8 input -> per-channel (lowpass, bands).

        Everything here is traced once per config and fused by XLA.
        """
        p = self.params
        planes = self._unpack(frames)
        prescale = p.prescale
        out = []
        for ch, plane in enumerate(planes):
            quants = p.band_quant(ch)
            lowpass, bands = ops.forward_channel(plane, quants, prescale)
            out.append((lowpass, bands))
        return out

    @partial(jax.jit, static_argnums=0)
    def dequantize(self, coeffs):
        """Dequantize the quantized coefficient pytree (device side),
        mirroring what the entropy decoder folds into its tables."""
        p = self.params
        out = []
        for ch, (lowpass, bands) in enumerate(coeffs):
            quants = p.band_quant(ch)
            dq = [tuple(ops.dequantize(b, quants[k][i])
                        for i, b in enumerate(bs))
                  for k, bs in enumerate(bands)]
            out.append((lowpass, dq))
        return out

    @partial(jax.jit, static_argnums=(0, 2))
    def inverse(self, coeffs, frame_index: int = 0):
        """Per-channel (lowpass, bands) -> (B, H, 2W) uint8 YUY2 frames.

        Applies the reference decoder's output dither for the given frame
        index of the decode process (the rand stream advances per decoded
        frame; every frame in the batch shares the index, i.e. a batch
        models N parallel decoder processes at the same position)."""
        p = self.params
        prescale = p.prescale
        rows = jnp.asarray(_dither_rows(self.height, frame_index))
        dy = ops.expand_dither_rows(rows, self.width, 16)
        dc = ops.expand_dither_rows(rows, self.width // 2, 8)
        planes = [ops.inverse_channel_to_8bit(
            lowpass, bands, prescale, dither=dy if ch == 0 else dc)
            for ch, (lowpass, bands) in enumerate(coeffs)]
        return ops.pack_yuy2(*planes)

    @partial(jax.jit, static_argnums=0)
    def inverse_bgra(self, coeffs):
        """Per-channel (lowpass, bands) -> (B, H, W, 4) uint8 BGRA rows
        (bottom-up flip applied): the device port of the fused
        PackedRGB32 kernel (ops.bgra_jax), fed the final-level strips
        with the default +24 lowpass channel offset (+5 at odd lowpass
        widths, `Codec/decoder.c:12258`)."""
        from cineform_tpu.models.intra_host import lowpass_offset_absolute
        from cineform_tpu.ops import bgra_jax

        p = self.params
        strips = []
        for ch, (lowpass, bands) in enumerate(coeffs):
            off = lowpass_offset_absolute(int(lowpass.shape[-1]), False, 1)
            strips.append(ops.inverse_channel_strips(
                lowpass + off, bands, p.prescale))
        (yl, yh), (c1l, c1h), (c2l, c2h) = strips
        out = bgra_jax.strip_to_bgra(yl, yh, c2l, c2h, c1l, c1h,
                                     p.precision)
        return out[..., ::-1, :, :]

    def _row16u_planes(self, coeffs):
        """Per-channel Row16u reconstruction (deep paths take no lowpass
        offset, `decoder.c:12296-12319`): the device twin of
        intra_host._decode_row16u_planes' pyramid."""
        p = self.params
        planes = []
        for lowpass, bands in coeffs:
            low, high = ops.inverse_channel_strips(lowpass, bands,
                                                   p.prescale)
            planes.append(ops.h26_inverse_to_row16u(low, high, p.precision))
        return planes

    @partial(jax.jit, static_argnums=0)
    def inverse_rg48(self, coeffs):
        """RGB 4:4:4 coeffs (channels g, r, b) -> (B, H, 3W) uint16 RG48
        rows — the device port of intra_host.decode_sample_rgb('RG48')."""
        g, r, b = self._row16u_planes(coeffs)[:3]
        return jnp.stack([r, g, b], axis=-1).astype(jnp.uint16).reshape(
            *g.shape[:-1], -1)

    @partial(jax.jit, static_argnums=0)
    def inverse_b64a(self, coeffs):
        """RGBA 4:4:4:4 coeffs (g, r, b, a) -> (B, H, 4W) uint16 ARGB
        (b64a) rows with the decompanded alpha
        (intra_host.decode_sample_rgb('b64a'), 4-plane branch)."""
        planes = self._row16u_planes(coeffs)
        g, r, b = planes[0], planes[1], planes[2]
        if len(planes) == 4:
            a = jnp.clip((jnp.maximum(planes[3] - 4096, 0) * 9400) >> 13,
                         0, 65535)
        else:
            # 3-channel sources: 12-bit-domain cap except the final
            # right-border pair, opaque alpha (decode_sample_rgb)
            def cap(x):
                q = jnp.minimum(x, 65520)
                return q.at[..., -2:].set(x[..., -2:])
            g, r, b = cap(g), cap(r), cap(b)
            a = jnp.full_like(g, 65520)
        return jnp.stack([a, r, g, b], axis=-1).astype(jnp.uint16).reshape(
            *g.shape[:-1], -1)

    @partial(jax.jit, static_argnums=0)
    def inverse_byr4(self, coeffs):
        """Bayer coeffs (G, RG, BG, GD difference planes) -> (B, 2h, 2w)
        uint16 BYR4 mosaic: GenerateBYR2's un-difference with the
        BYR4LinearRestore log-to-linear LUT (`Codec/bayer.c:13237`,
        ref/demosaic.generate_byr2_components)."""
        from cineform_tpu.ref.demosaic import log2lin_lut

        G, RG, BG, GD = self._row16u_planes(coeffs)
        lut = jnp.asarray(log2lin_lut().astype(np.int32))
        g = G.astype(jnp.int32)
        r = jnp.clip(((RG.astype(jnp.int32) - 32768) << 1) + g, 0, 0xFFFF)
        b = jnp.clip(((BG.astype(jnp.int32) - 32768) << 1) + g, 0, 0xFFFF)
        gd = GD.astype(jnp.int32) - 32768
        g1 = jnp.clip(g + gd, 0, 0xFFFF)
        g2 = jnp.clip(g - gd, 0, 0xFFFF)
        r, g1, g2, b = (lut[r >> 2], lut[g1 >> 2], lut[g2 >> 2], lut[b >> 2])
        lead, (h, w) = G.shape[:-2], G.shape[-2:]
        lineA = jnp.stack([r, g1], axis=-1).reshape(*lead, h, 2 * w)
        lineB = jnp.stack([g2, b], axis=-1).reshape(*lead, h, 2 * w)
        return jnp.stack([lineA, lineB], axis=-2).reshape(
            *lead, 2 * h, 2 * w).astype(jnp.uint16)

    # --- fully device-side encode: transform + quant + entropy pack ---------

    def _band_groups(self, coeffs) -> list[list[int]]:
        """Group channels of equal plane shape so each distinct band shape
        instantiates the entropy coder ONCE (chroma pairs for 4:2:2; all
        3-4 channels for RGB/RGBA/Bayer)."""
        groups: list[list[int]] = []
        for ch in range(len(coeffs)):
            shape = coeffs[ch][1][0][0].shape[-2:]
            if groups and coeffs[groups[-1][0]][1][0][0].shape[-2:] == shape:
                groups[-1].append(ch)
            else:
                groups.append([ch])
        return groups

    @partial(jax.jit, static_argnums=(0, 2))
    def _encode_group_program(self, trios, cap_bits: int):
        """One (wavelet level, channel group) entropy program: tuple of
        G*3 (B, h, w) quantized band planes -> packed words/bit counts/
        overflow flags, (B, G, ...) each.  Split out as its own jitted
        program: the single fused forward_packed program lowers to ~3 MB
        of MLIR (13 MB optimized), which this environment's remote AOT
        compiler cannot hold — six ~0.4 MB programs with device-resident
        intermediates compile fine and run back-to-back."""
        from cineform_tpu.entropy import device as edev

        G = len(trios) // 3
        h, w = trios[0].shape[-2:]
        pitch = intra_host.align16_pixels(w)
        t = jnp.stack([jnp.stack(trios[3 * g:3 * g + 3], axis=1)
                       for g in range(G)], axis=1)
        t = jnp.pad(t, ((0, 0), (0, 0), (0, 0), (0, 0), (0, pitch - w)))
        flat = t.reshape(t.shape[0], G, 3, h * pitch)
        return edev.encode_band_arrays(flat, codeset=17,
                                       cap_bits_per_elem=cap_bits)

    def forward_packed_staged(self, frames: jnp.ndarray, cap_bits: int = 8):
        """forward_packed as a pipeline of small jitted programs (the
        transform program + one entropy program per level x channel
        group) with intermediates in HBM.  Identical results; compiles
        on the tunnel's remote AOT compiler where the fused program is
        SIGKILLed.  Dispatch is async, so the pieces run back-to-back on
        the chip like the fused version."""
        coeffs = self.forward(frames)
        groups = self._band_groups(coeffs)
        nch = len(coeffs)
        packed_by_ch: list[list] = [[] for _ in range(nch)]
        nlevels = len(coeffs[0][1])
        for k in range(nlevels):
            for grp in groups:
                trios = tuple(coeffs[ch][1][k][b]
                              for ch in grp for b in range(3))
                words, nbits, ovf = self._encode_group_program(
                    trios, cap_bits)
                for gi, ch in enumerate(grp):
                    packed_by_ch[ch].append((words[:, gi], nbits[:, gi],
                                             ovf[:, gi]))
        return [(coeffs[ch][0], packed_by_ch[ch]) for ch in range(nch)]

    @partial(jax.jit, static_argnums=(0, 2))
    def forward_packed(self, frames: jnp.ndarray, cap_bits: int = 8):
        """(B, H, 2W) uint8 YUY2 -> per-channel (lowpass planes, per-band
        packed entropy payloads).  The complete CFHD band bitstreams are
        produced in HBM: forward DWT + quantization (ops/intra_transform)
        feeding the device entropy coder (entropy/device) in one traced
        program — the TPU re-expression of the whole of EncodeSample's hot
        path (`Codec/encoder.c:1897` through `encoder.c:5702`)."""
        from cineform_tpu.entropy import device as edev

        coeffs = self.forward(frames)
        nch = len(coeffs)
        groups = self._band_groups(coeffs)
        packed_by_ch: list[list] = [[] for _ in range(nch)]
        nlevels = len(coeffs[0][1])
        for k in range(nlevels):
            for grp in groups:
                bs0 = coeffs[grp[0]][1][k]
                h, w = bs0[0].shape[-2:]
                pitch = intra_host.align16_pixels(w)
                # (B, G, 3, h, w): all of the group's trios in one call
                trios = jnp.stack([jnp.stack(coeffs[ch][1][k], axis=1)
                                   for ch in grp], axis=1)
                trios = jnp.pad(trios, ((0, 0), (0, 0), (0, 0), (0, 0),
                                        (0, pitch - w)))
                flat = trios.reshape(trios.shape[0], len(grp), 3, h * pitch)
                words, nbits, ovf = edev.encode_band_arrays(
                    flat, codeset=17, cap_bits_per_elem=cap_bits)
                for gi, ch in enumerate(grp):
                    packed_by_ch[ch].append((words[:, gi], nbits[:, gi],
                                             ovf[:, gi]))
        return [(coeffs[ch][0], packed_by_ch[ch]) for ch in range(nch)]

    def _frame_meta(self, batch, first_frame_number, frame_numbers, metadata):
        from cineform_tpu.models.intra_host import EncoderMetadata

        if frame_numbers is None:
            frame_numbers = [first_frame_number + i for i in range(batch)]
        if not isinstance(metadata, (list, tuple)):
            metadata = [metadata] * batch
        # per-frame metadata advance (UFRM + timecode), matching the sync
        # encoder: the reference bumps both on every EncodeSample
        # (`EncoderSDK/SampleEncoder.cpp:795-880`)
        out = []
        for fn, m in zip(frame_numbers, metadata):
            base = m if m is not None else EncoderMetadata()
            out.append(base.advanced(fn - 1)
                       if hasattr(base, "advanced") and fn >= 1 else base)
        return frame_numbers, out

    def encode_batch_device(self, frames: np.ndarray,
                            first_frame_number: int = 1,
                            metadata=None,
                            cap_bits: int = 8,
                            frame_numbers: list[int] | None = None,
                            assemble_count: int | None = None,
                            sharding=None) -> list[bytes]:
        """Encode (B, H, row_bytes) uint8 frames to CFHD samples with the
        entropy coding done on device; the host only slices packed words
        and writes headers.  Byte-identical to encode_batch.  `metadata`
        may be a single EncoderMetadata or one per frame.  `sharding`
        (e.g. parallel.mesh.batch_sharding) places the frame axis across
        a device mesh; jit compiles the same program SPMD, so multi-chip
        encode is the same call (SURVEY §2.4 TPU mapping)."""
        from cineform_tpu.entropy import device as edev

        p = self.params
        dev_frames = (jax.device_put(frames, sharding)
                      if sharding is not None else jnp.asarray(frames))
        result = jax.device_get(
            self.forward_packed_staged(dev_frames, cap_bits))
        batch = frames.shape[0]
        frame_numbers, metadata = self._frame_meta(
            batch, first_frame_number, frame_numbers, metadata)
        samples = []
        fallback = None
        for i in range(batch if assemble_count is None
                       else min(batch, assemble_count)):
            channels = []
            for ch, (lowpass, packed) in enumerate(result):
                payloads = []
                for k, (words, nbits, ovf) in enumerate(packed):
                    trio = []
                    for b in range(3):
                        if ovf[i, b]:
                            trio.append(None)      # host re-encode below
                        else:
                            trio.append(edev.finish_band_bytes(
                                words[i, b], int(nbits[i, b]), 17))
                    payloads.append(tuple(trio))
                plane_w = self.plane_width(ch)
                bands = [tuple(np.broadcast_to(
                    np.int32(0),
                    (p.height >> (k + 1), plane_w >> (k + 1)))
                    for _ in range(3)) for k in range(len(packed))]
                if any(t is None for tr in payloads for t in tr):
                    # capacity overflow: recompute this frame's coefficients
                    # on host for the C++ fallback coder (rare)
                    if fallback is None:
                        fb_planes = self._unpack_host(
                            np.ascontiguousarray(frames[i]).tobytes())
                        fallback = [intra_host.transform_channel(pl, p, c)
                                    for c, pl in enumerate(fb_planes)]
                    bands = fallback[ch].bands
                channels.append(intra_host.EncodedChannel(
                    lowpass=np.asarray(lowpass[i]),
                    bands=bands,
                    quants=p.band_quant(ch),
                    payloads=payloads))
            samples.append(intra_host.write_sample(
                channels, p, frame_numbers[i], metadata[i],
                **self._write_sample_kwargs))
            fallback = None
        return samples

    # --- full encode/decode (device transform + host entropy) ----------------

    def encode_batch(self, frames: np.ndarray,
                     first_frame_number: int = 1,
                     metadata=None,
                     frame_numbers: list[int] | None = None
                     ) -> list[bytes]:
        """Encode (B, H, row_bytes) uint8 frames to CFHD samples."""
        coeffs = jax.device_get(self.forward(jnp.asarray(frames)))
        p = self.params
        samples = []
        batch = frames.shape[0]
        frame_numbers, metadata = self._frame_meta(
            batch, first_frame_number, frame_numbers, metadata)
        for i in range(batch):
            channels = []
            for ch, (lowpass, bands) in enumerate(coeffs):
                channels.append(intra_host.EncodedChannel(
                    lowpass=np.asarray(lowpass[i]),
                    bands=[tuple(np.asarray(b[i]) for b in bs) for bs in bands],
                    quants=p.band_quant(ch),
                ))
            samples.append(intra_host.write_sample(
                channels, p, frame_numbers[i], metadata[i],
                **self._write_sample_kwargs))
        return samples

    # --- fully device-side decode: entropy + inverse transform --------------

    #: band classes: (wavelet index k, plane channels) — k indexes band
    #: dims plane >> (k+1).  YUV 4:2:2 luma and chroma have different
    #: widths so they decode as separate row classes; RGB/RGBA/Bayer
    #: channels are all full plane width and share one class per level.
    @property
    def _DECODE_CLASSES(self):
        if self.encoded == "YUV":
            return tuple((k, planes)
                         for k in range(3) for planes in ((0,), (1, 2)))
        chans = tuple(range(self.num_channels))
        return tuple((k, chans) for k in range(3))

    def _class_dims(self, k: int, planes: tuple[int, ...]):
        bh = self.params.height >> (k + 1)
        bw = self.plane_width(planes[0]) >> (k + 1)
        return bh, bw, intra_host.align16_pixels(bw)

    @partial(jax.jit, static_argnums=(0, 3, 4))
    def _class_reshape(self, co, ovf, ci: int, batch: int):
        k, planes = self._DECODE_CLASSES[ci]
        bh, bw, pitch = self._class_dims(k, planes)
        co = co.reshape(batch, len(planes), 3, bh, pitch)[..., :bw]
        return co, ovf.reshape(batch, -1).any(axis=1)

    def _decode_class_program(self, pay, nch, qn, lin, ci: int):
        """One band row class (pay (R, S*4) u8, rows (frame, channel,
        band)) -> ((B, planes, 3, bh, bw) i32 coefficients, (B,) overflow
        flags).  The TPU DecodeBandFSM16sNoGap (entropy/device_decode).

        Runs as a chain of per-stage jitted programs with HBM
        intermediates (decode_band_rows_staged): the fused one-program
        formulation compiled superlinearly in the payload capacity and
        SIGKILLed the remote AOT compiler at 1080p noise-content sizes
        (S=65536); each stage compiles in seconds, flat in S."""
        from cineform_tpu.entropy import device_decode as ddec

        k, planes = self._DECODE_CLASSES[ci]
        bh, bw, pitch = self._class_dims(k, planes)
        co, ovf = ddec.decode_band_rows_staged(pay, nch, qn, lin,
                                               nout=bh * pitch)
        batch = pay.shape[0] // (len(planes) * 3)
        return self._class_reshape(co, ovf, ci, batch)

    def _decode_device_program(self, pay, nch, qn, lin, lowpass,
                               batch: int, frame_index: int,
                               output: str = "YUY2"):
        """Per-class band payload rows -> ((B, H, 2W) uint8 YUY2, (B,)
        overflow flags).

        The whole of DecodeSample's hot path on device: band entropy
        decode feeding the batched inverse DWT fused with 8-bit output
        (`Codec/decoder.c:11584` DecodeSampleIntraFrame +
        `ReconstructSampleFrameToBuffer`).  pay/nch/qn/lin are 6-tuples
        (one per _DECODE_CLASSES row class).  Runs as 6 + 1 jitted
        programs with device-resident intermediates — one fused program
        compiled 4x slower on the TPU backend and hung LLVM on the CPU
        backend; callers wanting a single traced program (chained
        benchmarks, sharded steps) can trace THIS method inside an outer
        jit, which inlines the pieces."""
        coeffs_by = {}
        ovfs = []
        for ci, (k, planes) in enumerate(self._DECODE_CLASSES):
            co, ovf = self._decode_class_program(pay[ci], nch[ci], qn[ci],
                                                 lin[ci], ci)
            for pi, ch in enumerate(planes):
                coeffs_by[(ch, k)] = tuple(co[:, pi, b] for b in range(3))
            ovfs.append(ovf)
        coeffs = []
        for ch in range(self.num_channels):
            bands = [coeffs_by[(ch, k)] for k in range(3)]
            coeffs.append((jnp.asarray(lowpass[ch]), bands))
        ovf_frame = jnp.stack(ovfs, axis=0).any(axis=0)        # (batch,)
        if output == "BGRA":
            return self.inverse_bgra(coeffs), ovf_frame
        if output == "RG48":
            return self.inverse_rg48(coeffs), ovf_frame
        if output == "b64a":
            return self.inverse_b64a(coeffs), ovf_frame
        if output == "BYR4":
            return self.inverse_byr4(coeffs), ovf_frame
        return self.inverse(coeffs, frame_index), ovf_frame

    #: floor for the per-class row capacity bucket (chunks of 32 bits);
    #: buckets double from here so each config compiles a handful of
    #: programs.  Row classes keep every placement network's last axis
    #: bounded by one band's payload — the single giant 1-D payload
    #: formulation compiled superlinearly in total chunks (the
    #: associative transfer scan alone took ~20 min at 1080p scale).
    MIN_ROW_CHUNKS = 256

    def _decode_rows_args(self, samples: list[bytes],
                          min_row_chunks: int | None = None):
        """Host header walk: samples -> per-class row tensors.

        Returns (pays, nchs, qns, lins, lp, fallback) — 6-tuples of
        (R, S*4)/(R,) device arrays per _DECODE_CLASSES class (rows
        ordered (frame, channel, band)), the 3 lowpass planes, and the
        set of frame indices needing host fallback (wrong dims, legacy
        codesets, peaks bands); fallback frames get empty rows.

        The header walk and payload copies run in the native walker
        (native/samplewalk.cpp): one C pass per sample emits band
        offsets, then `fill_rows` memcpy's payloads straight from the
        sample buffer into the padded row tensors — the Python parser
        sliced every payload into a bytes object and copied again (the
        ~1.9 ms/frame host tail the round-3 verdict flagged)."""
        from cineform_tpu.bitstream import fastwalk

        batch = len(samples)
        p = self.params
        nch_total = self.num_channels
        lh = p.height >> 3
        lws = tuple(self.plane_width(ch) >> 3 for ch in range(nch_total))
        #: (ch, k, band, i) -> (data_off, data_len, quant, lin)
        payload_parts: dict = {}
        walks: list = [None] * batch
        fallback = set()
        for i, sample in enumerate(samples):
            r = fastwalk.walk(sample)
            if r is None or (r.width, r.height) != (p.width, p.height) \
                    or r.nchannels != nch_total or 0 in r.lowpass_off \
                    or r.lowpass_h != (lh,) * nch_total \
                    or r.lowpass_w != lws:
                fallback.add(i)
                continue
            walks[i] = r
            for (ch, bandno, subband), (off, ln, q, lin, fl) in \
                    r.bands.items():
                if not 1 <= subband <= 9:
                    fallback.add(i)
                    break
                widx = 2 - (subband - 1) // 3
                if fl & 1 or ln % 4:
                    fallback.add(i)
                    break
                payload_parts[(ch, widx, bandno, i)] = (off, ln, q, lin)
        for i in range(batch):
            if i in fallback:
                continue
            for ch in range(nch_total):
                for k in range(3):
                    for band in (1, 2, 3):
                        if (ch, k, band, i) not in payload_parts:
                            fallback.add(i)
        live = [i for i in range(batch) if i not in fallback]

        minc = min_row_chunks or self.MIN_ROW_CHUNKS
        pays, nchs, qns, lins = [], [], [], []
        for k, planes in self._DECODE_CLASSES:
            rows = []
            for i in range(batch):
                for ch in planes:
                    for band in (1, 2, 3):
                        if i in fallback:
                            rows.append((i, 0, 0, 1, 0))
                        else:
                            off, ln, q, lin = payload_parts[(ch, k, band, i)]
                            rows.append((i, off, ln, q, lin))
            cap = minc
            maxc = max(ln for _, _, ln, _, _ in rows) // 4
            while cap < maxc:
                cap *= 2
            nr = len(rows)
            meta = np.asarray([(ln // 4, q, lin)
                               for _, _, ln, q, lin in rows], np.int32)
            pay = np.zeros((nr, cap * 4), np.uint8)
            per_frame = nr // batch
            for i in live:
                sl = rows[i * per_frame:(i + 1) * per_frame]
                fastwalk.fill_rows(
                    pay, samples[i],
                    np.asarray([o for _, o, _, _, _ in sl], np.int64),
                    np.asarray([ln for _, _, ln, _, _ in sl], np.int64),
                    np.arange(i * per_frame, (i + 1) * per_frame))
            pays.append(jnp.asarray(pay))
            nchs.append(jnp.asarray(meta[:, 0]))
            qns.append(jnp.asarray(meta[:, 1]))
            lins.append(jnp.asarray(meta[:, 2]))

        # frames not decoded on device still need placeholder lowpass
        lp = []
        for ch in range(nch_total):
            w = lws[ch]
            arr = np.zeros((batch, lh, w), np.int32)
            # the deep RGB/Bayer reconstructions take no lowpass channel
            # offset (`decoder.c:12296-12319`); the YUV 8-bit path's bias
            # is pinned in lowpass_channel_offset
            bias = (intra_host.lowpass_channel_offset(w)
                    if self.encoded == "YUV" else 0)
            for i in live:
                fastwalk.lowpass_i32(samples[i], walks[i].lowpass_off[ch],
                                     lh, w, bias, arr[i])
            lp.append(jnp.asarray(arr))
        return (tuple(pays), tuple(nchs), tuple(qns), tuple(lins),
                tuple(lp), fallback)

    #: default device-decode output per encoded format (the host-path
    #: byte-exact counterparts used for fallbacks and identity tests)
    _DEFAULT_DECODE_OUTPUT = {"YUV": "YUY2", "RGB": "RG48",
                              "RGBA": "b64a", "RGBA_FULL": "b64a",
                              "BAYER": "BYR4"}

    def decode_batch_device(self, samples: list[bytes],
                            frame_index: int = 0,
                            min_row_chunks: int | None = None,
                            output: str | None = None) -> np.ndarray:
        """Decode CFHD samples wholly on device: the host only walks
        sample headers and slices payloads; entropy decode, inverse DWT,
        output conversion and packing all run on the chip.  Outputs:
        YUY2/BGRA for 4:2:2 YUV configs, RG48 for RGB 4:4:4, b64a for
        RGBA 4:4:4:4, BYR4 for Bayer — each byte-identical to the host
        path (the reference decodes every encoded format through the
        same threaded hot path, `Codec/decoder.c:11584`).  Frames whose
        streams use legacy codesets, peaks tables or overflow the
        payload capacity fall back to the host path per frame."""
        if output is None:
            output = self._DEFAULT_DECODE_OUTPUT[self.encoded]
        batch = len(samples)
        pays, nchs, qns, lins, lp, fallback = self._decode_rows_args(
            samples, min_row_chunks)

        def host_decode(subset):
            from cineform_tpu.models import intra_host as ih
            if output == "BGRA":
                return np.stack([np.frombuffer(
                    ih.decode_sample_bgra(x), np.uint8).reshape(
                        self.height, self.width, 4) for x in subset])
            if output in ("RG48", "b64a") and self.encoded != "BAYER":
                nc = 3 if output == "RG48" else 4
                return np.stack([np.frombuffer(
                    ih.decode_sample_rgb(x, output)[0], "<u2").reshape(
                        self.params.height, self.params.width * nc)
                    for x in subset])
            if output == "BYR4":
                return np.stack([np.frombuffer(
                    ih.decode_sample_bayer_to(x, "BYR4"), "<u2").reshape(
                        self.height, self.width) for x in subset])
            return self.decode_batch(subset, frame_index)

        if len(fallback) == batch:
            return host_decode(samples)

        out, ovf = self._decode_device_program(
            pays, nchs, qns, lins, lp, batch, frame_index, output)
        out = np.asarray(jax.device_get(out))
        for i in np.nonzero(np.asarray(ovf))[0]:
            fallback.add(int(i))
        if fallback:
            host = host_decode([samples[i] for i in sorted(fallback)])
            for j, i in enumerate(sorted(fallback)):
                out[i] = host[j]
        return out

    def decode_batch(self, samples: list[bytes],
                     frame_index: int = 0) -> np.ndarray:
        """Decode CFHD samples to (B, H, 2W) uint8 YUY2 frames.

        frame_index positions the output dither within the decoder
        process's rand stream (a sequential decoder passes 0, 1, 2, ...;
        the host path in ref/intra does the same)."""
        from cineform_tpu.bitstream import parse_sample
        from cineform_tpu.entropy import native as entropy_native

        per_frame = []
        for sample in samples:
            s = parse_sample(sample)
            chans = []
            for c in s.channels:
                bands: list[dict] = [dict() for _ in range(3)]
                for b in c.bands:
                    widx = 2 - (b.subband - 1) // 3
                    pitchw = intra_host.align16_pixels(b.width)
                    vals, _ = entropy_native.decode_band(
                        b.data, pitchw * b.height, codeset=17,
                        quant=b.quantization)
                    bands[widx][b.band] = vals.reshape(
                        b.height, pitchw)[:, :b.width]
                chans.append((c.lowpass,
                              [(bands[k][1], bands[k][2], bands[k][3])
                               for k in range(3)]))
            per_frame.append(chans)

        # Stack into batched arrays per channel
        coeffs = []
        for ch in range(3):
            lowpass = jnp.asarray(np.stack([f[ch][0] for f in per_frame]))
            bands = []
            for k in range(3):
                bands.append(tuple(
                    jnp.asarray(np.stack([f[ch][1][k][b] for f in per_frame]))
                    for b in range(3)))
            coeffs.append((lowpass, bands))
        return np.asarray(jax.device_get(self.inverse(coeffs, frame_index)))
