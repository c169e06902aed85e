"""cineform_tpu — a TPU-native CineForm HD (CFHD) wavelet video codec framework.

Re-implements the capabilities of the GoPro CineForm SDK (reference:
`/root/reference`, a C/C++/SSE2 codebase) as an idiomatic JAX/XLA/Pallas
framework: batched 2-6 wavelet transforms, dead-zone quantization with cubic
companding, zero-run/Huffman VLC entropy coding, the CFHD tag/value bitstream
syntax, and the CFHD_* encoder/decoder API surface, designed for TPU hardware
(MXU/VPU tiling, HBM-resident frame batches, ICI data-parallel sharding).

Layout:
  spec/     — the format contract as data: filter taps, quant tables,
              companding curves, codebooks, bitstream tags, subband maps.
  ref/      — NumPy scalar golden reference (bit-exact oracle for kernels).
  ops/      — JAX/Pallas device kernels (DWT, quant, color, entropy scan).
  models/   — full codec pipelines (intra encoder/decoder, GOP, Bayer).
  parallel/ — mesh/sharding strategy, async encoder pool.
  utils/    — bitstream I/O, image I/O, metrics.
"""

__version__ = "0.1.0"
