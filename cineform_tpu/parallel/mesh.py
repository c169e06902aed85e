"""Device mesh + sharding helpers for batched codec programs."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def frame_mesh(n_devices: int | None = None) -> Mesh:
    """A 1-D mesh over the frame-batch axis.

    The intra codec is embarrassingly parallel across frames (SURVEY §2.4),
    so a single 'frames' axis is the whole sharding story; deeper meshes
    (e.g. frames × strips) only become useful for single-frame latency.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("frames",))


def shard_frames(mesh: Mesh, arr: jax.Array | np.ndarray) -> jax.Array:
    """Place a (B, ...) frame batch sharded across the 'frames' axis."""
    sharding = NamedSharding(mesh, P("frames"))
    return jax.device_put(arr, sharding)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("frames"))
