"""Runtime plumbing: mesh setup, logging."""

from .log import RunLog, Tee
from .mesh import (batch_sharding, data_mesh, replicate, replicated_sharding,
                   shard_batch)

__all__ = ["RunLog", "Tee", "data_mesh", "shard_batch", "replicate",
           "batch_sharding", "replicated_sharding"]
