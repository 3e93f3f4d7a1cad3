"""Device-mesh helpers.

The TPU-native replacement for the reference's dead mpi4py layer
(nsigproclib_no_mpi.py:315-877): a 2-D logical mesh over axes

* ``'t'`` — time blocks (the reference's ``DivideByNP`` snapshot partition,
  nsigproclib:485-504);
* ``'s'`` — inlet-plane z tiles (spatial domain decomposition for the filter
  halo region).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: F401


def make_mesh(shard_time: int = 1, shard_space: int = 1, devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    n = shard_time * shard_space
    if n > len(devices):
        raise ValueError(
            f"mesh {shard_time}x{shard_space} needs {n} devices, "
            f"have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(shard_time, shard_space)
    return Mesh(dev, axis_names=("t", "s"))


def snapshot_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding of the packed snapshot matrix A (3*Np, Ns): rows (space)
    over 's', snapshots (time) over 't'."""
    return NamedSharding(mesh, P("s", "t"))


def field_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding of stacked fields (C, Ns, jma, kma): time over 't', the z
    axis over 's'."""
    return NamedSharding(mesh, P(None, "t", None, "s"))
