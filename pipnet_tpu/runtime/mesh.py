"""Device mesh setup and batch sharding helpers.

The multi-chip story (replacing torchrun/DDP/NCCL, SURVEY §2.9/§5.8): a 1-D
``data`` mesh over all devices; parameters replicated, batches sharded on the
leading axis.  Under ``jax.jit`` with these shardings XLA inserts the gradient
all-reduce over ICI — there is no hand-written collective code to maintain.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(num_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def shard_batch(mesh: Mesh, *arrays):
    """Place arrays with the leading axis sharded over the data mesh."""
    sh = NamedSharding(mesh, P("data"))
    return tuple(jax.device_put(a, sh) for a in arrays)


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
