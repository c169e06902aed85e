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
