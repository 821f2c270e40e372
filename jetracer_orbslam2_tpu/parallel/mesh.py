"""Device-mesh construction helpers.

One axis is enough for map-scale parallelism: landmarks/edges shard over
`"lm"`.  Multi-host runs call `jax.distributed.initialize` first; a
single-device mesh runs the identical code (SURVEY.md §7.2 L5: the
single-chip path IS the distributed path with n=1).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "lm") -> Mesh:
    """A 1-D mesh over the first `n_devices` available devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def map_mesh(mesh: Mesh | None = None) -> Mesh:
    return mesh if mesh is not None else make_mesh()


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded_axis0(mesh: Mesh, axis: str = "lm") -> NamedSharding:
    return NamedSharding(mesh, P(axis))
