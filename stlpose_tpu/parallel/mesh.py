"""
Device mesh construction and sharding helpers.

One logical axis — "data" — is all this workload needs (SURVEY.md §2.9,
§5-long-context: small CNNs on fixed 256x192 crops scale in batch only).
The helpers are written so a future model-parallel axis slots in without
touching call sites.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


@functools.lru_cache(maxsize=None)
def get_mesh(n_devices: int | None = None) -> Mesh:
    """A 1-D data-parallel mesh over all (or the first n) local devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dimension sharding (leading axis split over the data axis)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh, leading axis sharded over devices.

    The leading dim must be divisible by the mesh size — the input pipeline
    guarantees that by padding the final partial batch (data/pipeline.py).
    """
    sharding = data_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def pad_to_multiple(array, multiple: int, axis: int = 0):
    """Pad an array's axis up to a multiple (returns array, n_valid)."""
    n = array.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return array, n
    pad = [(0, 0)] * array.ndim
    pad[axis] = (0, rem)
    return np.pad(array, pad, mode="edge"), n
