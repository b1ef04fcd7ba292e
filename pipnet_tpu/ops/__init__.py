"""Compute ops: bucketed segment ops (XLA path) and Pallas kernels."""

from .segment import (segment_hard_gumbel, segment_max_to_nodes,
                      segment_softmax, segment_sum_to_nodes, soft_gumbel,
                      spatial_softmax)

__all__ = [
    "segment_softmax", "segment_hard_gumbel", "soft_gumbel", "spatial_softmax",
    "segment_sum_to_nodes", "segment_max_to_nodes",
]
