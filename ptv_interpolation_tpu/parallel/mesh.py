"""Device-mesh construction helpers.

The framework's scaling axis is problem size (particles N × grid points M),
parallelized SPMD-style: grid queries and z-slabs of fields are sharded
over a 1D mesh; particle sets are replicated (1M tracks ≈ 24 MB — cheap
against ICI all-gathers). This replaces the reference's only parallelism,
the fork-based process pool chunking RBF evaluation
(`/root/reference/interpolator.py:173-182`).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = DATA_AXIS) -> Mesh:
    """A 1D mesh over (the first ``n_devices``) available devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading dimension (query rows / z-slabs) over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def shard_fields(mesh: Mesh, *fields, axis_name: str = DATA_AXIS):
    """device_put (nz, ny, nx) fields with z sharded over the mesh — the
    layout under which the stencil/CG physics runs SPMD with XLA inserting
    one-voxel halo exchanges (collective-permute) automatically."""
    sharding = row_sharded(mesh, axis_name)
    out = tuple(jax.device_put(f, sharding) for f in fields)
    return out if len(out) > 1 else out[0]
