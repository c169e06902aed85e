"""Multi-chip scaling: data-parallel frame batches over a device mesh.

The reference codec's parallelism is frame-level (`CEncoderPool`, N worker
threads each encoding whole frames, `EncoderSDK/EncoderPool.cpp:59-382`) plus
intra-frame thread tiling.  On TPU the equivalents are:

- frame level  -> the leading batch axis, sharded over chips with
  `jax.sharding.NamedSharding` (pure data parallel: no cross-frame
  communication exists in the intra codec, SURVEY §2.4);
- channel/strip level -> XLA fusion inside one program (no threads).

No collectives are required for correctness; ICI carries only the initial
scatter/final gather when frames are fed from one host.
"""

from cineform_tpu.parallel.mesh import frame_mesh, shard_frames  # noqa: F401
