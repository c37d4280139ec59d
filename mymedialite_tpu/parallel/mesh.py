"""Device mesh + sharding helpers.

The TPU-native replacement for the reference's multicore runtime
(``MultiCore.cs:43-92`` DSGD block partitioning + ``Parallel.For``):
embedding tables are row-sharded over a 1-D ``data`` mesh axis and the
minibatch is sharded the same way; XLA's SPMD partitioner inserts the
all-gather / all-to-all / scatter collectives that the reference's
block-diagonal schedule emulated on shared memory (SURVEY §2.9 P1/P2).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    n = num_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n]), (axis,))


def row_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 across the mesh (embedding tables, batch arrays)."""
    return NamedSharding(mesh, P(axis))


def row_sharded_2d(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_rows_to_multiple(arr: np.ndarray, multiple: int) -> np.ndarray:
    """Pad dim 0 so row-sharding divides evenly (capacity padding also
    serves incremental growth, SURVEY §7 'incremental updates')."""
    n = arr.shape[0]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return arr
    pad_shape = (target - n,) + arr.shape[1:]
    return np.concatenate([arr, np.zeros(pad_shape, dtype=arr.dtype)], axis=0)


def shard_mf_params(params: dict, mesh: Mesh) -> dict:
    """Row-shard the factor tables and bias vectors of an MF-family
    params dict across the mesh; scalars replicated."""
    out = {}
    for name, value in params.items():
        if getattr(value, "ndim", 0) >= 1:
            padded = pad_rows_to_multiple(np.asarray(value),
                                          mesh.devices.size)
            sharding = (row_sharded_2d(mesh) if padded.ndim == 2
                        else row_sharded(mesh))
            out[name] = jax.device_put(padded, sharding)
        else:
            out[name] = jax.device_put(value, replicated(mesh))
    return out
