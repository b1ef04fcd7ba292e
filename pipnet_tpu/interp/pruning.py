"""Post-hoc prototype pruning.

Threshold pruning (``prune_by_threshold.ipynb`` cells 11-14): for every
prototype, compute the mean of its top-k activations over each relevant leaf
descendant's projection images; if ANY leaf's mean falls below the threshold
the prototype is overspecific -> zero its entire classifier column.

Mask pruning (``--mask_prune_overspecific`` at inference): drop prototypes
whose learned presence logits favor "absent" (hard Gumbel / argmax,
``pipnet/pipnet.py:164-166``).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from ..tree.compile import TreeArrays
from .topk import ProjectionResult, topk_per_prototype_per_leaf


def threshold_prune(proj: ProjectionResult, tree: TreeArrays,
                    cls_weight: np.ndarray, w_eff: np.ndarray,
                    *, threshold: float = 0.4, topk: int = 10
                    ) -> Tuple[np.ndarray, Dict[int, Dict[int, float]]]:
    """Returns (pruned classifier weight, per-proto per-leaf mean activations).

    ``cls_weight`` is the raw (C, P) parameter; ``w_eff`` the effective
    (relu+mask) weights used for relevance thresholds."""
    per_leaf_topk = topk_per_prototype_per_leaf(proj, tree, w_eff, k=topk)
    new_w = np.array(cls_weight)
    means: Dict[int, Dict[int, float]] = {}
    for p, leaf_map in per_leaf_topk.items():
        if not leaf_map:
            continue
        m = {li: float(np.mean([s for _, s in entries]))
             for li, entries in leaf_map.items()}
        means[p] = m
        if any(v < threshold for v in m.values()):
            new_w[:, p] = 0.0
    return new_w, means


def presence_prune_mask(proto_presence: np.ndarray) -> np.ndarray:
    """Deterministic keep-mask from the learned presence logits: keep iff
    logit[p,1] > logit[p,0] (the argmax the hard Gumbel concentrates on)."""
    return (proto_presence[:, 1] > proto_presence[:, 0]).astype(np.float32)


def prototype_report(proj: ProjectionResult, tree: TreeArrays,
                     w_eff: np.ndarray, proto_presence: np.ndarray,
                     *, good_threshold: float = 0.2, topk: int = 10) -> str:
    """Per-node used/good prototype summary (the notebook's
    ``write_num_proto_details``): 'good' = mean top-k activation above
    ``good_threshold`` for EVERY relevant leaf descendant."""
    per_leaf_topk = topk_per_prototype_per_leaf(proj, tree, w_eff, k=topk)
    lines = []
    for ni, name in enumerate(tree.node_names):
        sl = tree.node_proto_slice(ni)
        protos = [p for p in range(sl.start, sl.stop) if p in per_leaf_topk]
        good = 0
        for p in protos:
            m = [np.mean([s for _, s in v]) for v in per_leaf_topk[p].values()]
            if m and all(x > good_threshold for x in m):
                good += 1
        keep = presence_prune_mask(proto_presence[sl])
        lines.append(f"Node:{name},Total:{sl.stop - sl.start},Used:{len(protos)},"
                     f"Good:{good},PresenceKeep:{int(keep.sum())}")
    return "\n".join(lines)
