"""Device mesh helpers.

The reference's only distribution mechanism is single-host synchronous
data parallelism via ``tf.distribute.MirroredStrategy``
(`training/training.py:185-188`). TPU-native equivalent: a 1-D
``jax.sharding.Mesh`` over all chips with the global batch sharded on the
``data`` axis; gradients are combined with ``psum`` inside ``shard_map``
(see :mod:`.train_step`), riding the ICI instead of NCCL.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(
    devices: Optional[Sequence] = None, axis_name: str = DATA_AXIS
) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = None) -> NamedSharding:
    """Leading-axis sharding over the mesh's (single) axis; the default
    uses the name BOUND ON THE MESH, so custom-named meshes compose."""
    return NamedSharding(mesh, P(axis_name or mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = None):
    """Device_put pytree leaves with the leading axis sharded over the mesh.

    A single-device mesh uses plain placement: arrays carrying a
    NamedSharding force jit through the SPMD partitioner, which compiles
    ~8x slower step code on the TPU stack used here, with nothing to
    partition.

    Multi-process (multi-host) meshes receive each process's *local*
    batch shard and assemble the global array from the per-process data
    (``jax.make_array_from_process_local_data``); meshes whose devices
    all belong to one process (single-process runtimes, or a
    process-LOCAL mesh inside a multi-process runtime — the multi-host
    serving path in ``prediction/streaming.py``) receive the full batch
    for that mesh.
    """
    devices = mesh.devices.reshape(-1)
    if devices.size == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, devices[0]), batch
        )
    sharding = batch_sharding(mesh, axis_name)
    if len({d.process_index for d in devices}) > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
