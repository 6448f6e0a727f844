"""Device mesh + sharding helpers.

The TPU-native replacement for the reference's DDP/NCCL plumbing
(main.py:641,992-997): a 1-D ``data`` mesh over all devices, batches
sharded along it, parameters replicated. XLA inserts the collectives -
there is no hand-written communication anywhere. For the 28M-param model
family, data parallelism saturates the hardware; the mesh helpers accept an
``axes`` spec so larger models can add model axes without code changes.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(
    devices: Optional[Sequence] = None,
    axes: Tuple[str, ...] = ("data",),
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """Build a mesh over ``devices`` (default: all local devices).

    1-D by default; pass ``axes=( "data", "model")`` + ``shape`` for 2-D.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    return Mesh(devices.reshape(shape), axes)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across ``axis``, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """device_put a host batch with the leading dim sharded over the mesh."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1 else x,
        batch,
    )


def pad_batch_to_multiple(batch_np, multiple: int):
    """Pad the leading dim of every array to a multiple of ``multiple``
    (device count) so sharded batches divide evenly. Returns (batch, n)."""
    import numpy as np

    n = None
    out = {}
    for k, v in batch_np.items():
        if isinstance(v, np.ndarray) and v.ndim >= 1 and v.dtype != object:
            if n is None:
                n = v.shape[0]
            pad = (-v.shape[0]) % multiple
            if pad:
                widths = [(0, pad)] + [(0, 0)] * (v.ndim - 1)
                v = np.pad(v, widths)
            out[k] = v
        else:
            out[k] = v
    return out, n
