"""Device mesh + sharding helpers for data-parallel scale-out.

The reference is single-GPU with no distributed backend (SURVEY.md
§2.P: no DDP/NCCL/MPI anywhere). The TPU-native equivalent is JAX
collectives over ICI: a 1-D `Mesh(('data',))`, batch axis sharded with
`NamedSharding`, params replicated. Inference is embarrassingly
parallel across chips; training gradients are reduced by XLA-inserted
`psum`s that ride ICI (no hand-written comm code, per the
sharding-first design [spec]).

Tested on a virtual 8-device CPU mesh
(`--xla_force_host_platform_device_count=8`) in tests/test_sharding.py,
identically to how it runs on a real slice (SURVEY.md §4.5).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, *, axis: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the first `n_devices` devices."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)} "
                f"(hint: XLA_FLAGS=--xla_force_host_platform_device_count=N)")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, *, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, *, axis: str = DATA_AXIS):
    """Place every array in `tree` with its batch dim sharded on `mesh`."""
    sh = batch_sharding(mesh, axis=axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(tree, mesh: Mesh):
    """Fully replicate every array in `tree` across the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
