"""Evaluation: metrics and joint-distribution decoding re-exports."""

from ..models.pipnet import joint_leaf_distribution, joint_leaf_log_distribution
from .metrics import (abstained_count, fpr95_threshold, ood_id_fraction,
                      per_node_prf, sparsity_stats, topk_accuracy)

__all__ = [
    "joint_leaf_distribution", "joint_leaf_log_distribution",
    "abstained_count", "fpr95_threshold", "ood_id_fraction", "per_node_prf",
    "sparsity_stats", "topk_accuracy",
]
