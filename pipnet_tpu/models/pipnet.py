"""PIPNet: backbone + stacked prototype head, as one flax module.

TPU-native counterpart of the reference ``PIPNet`` (``pipnet/pipnet.py:54-185``)
and ``get_network`` (``pipnet/pipnet.py:1134-1258``).  The per-node dynamic
attributes (``_<node>_add_on`` etc.) become stacked arrays over a compiled
``TreeArrays`` (see ``tree/compile.py``); a forward pass is a single fixed
graph ready for ``jax.jit``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..tree.compile import TreeArrays
from ..tree.node import Node
from .convnext import convnext_tiny_7, convnext_tiny_13, convnext_tiny_26
from .heads import PrototypeHead
from .resnet import (resnet18_features, resnet34_features, resnet50_features,
                     resnet50_features_inat, resnet101_features, resnet152_features)
from .vit import dinov2_vits14

BACKBONES = {
    "convnext_tiny_26": (convnext_tiny_26, 768),
    "convnext_tiny_13": (convnext_tiny_13, 768),
    "convnext_tiny_7": (convnext_tiny_7, 768),
    "resnet18": (resnet18_features, 512),
    "resnet34": (resnet34_features, 512),
    "resnet50": (resnet50_features, 2048),
    "resnet50_inat": (resnet50_features_inat, 2048),
    "resnet101": (resnet101_features, 2048),
    "resnet152": (resnet152_features, 2048),
    "dinov2_vits14": (dinov2_vits14, 384),
}


class Stage4Reducer(nn.Module):
    """Optional 1x1-conv channel reducer stack after the backbone
    (ref pipnet/pipnet.py:1167-1183, ``--stage4_reducer_net 'in,out,gelu|...'``)."""
    layers: Tuple[Tuple[int, int, bool], ...]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, (cin, cout, gelu) in enumerate(self.layers):
            if x.shape[-1] != cin:
                raise ValueError(f"reducer layer {i} expects {cin} channels, got {x.shape[-1]}")
            x = nn.Dense(cout, dtype=self.dtype, name=f"reducer{i}")(x)
            if gelu:
                x = jax.nn.gelu(x, approximate=False)
        return x


class PIPNet(nn.Module):
    """Hierarchical prototype network over a compiled tree."""

    tree: TreeArrays
    cfg: ModelConfig

    def setup(self):
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        if self.cfg.backbone not in BACKBONES:
            raise ValueError(f"unknown backbone {self.cfg.backbone}; options: {list(BACKBONES)}")
        ctor, channels = BACKBONES[self.cfg.backbone]
        if self.cfg.gaussian_stages:
            if not self.cfg.backbone.startswith("convnext"):
                raise ValueError("gaussian multiplier surgery is a ConvNeXt-only "
                                 "option (ref pipnet/pipnet.py:1142-1143)")
            self.backbone = ctor(dtype=dtype,
                                 gaussian_stages=self.cfg.gaussian_stages,
                                 gaussian_sigma=self.cfg.gaussian_sigma,
                                 gaussian_factor=self.cfg.gaussian_factor,
                                 fast_gelu=self.cfg.fast_gelu)
        elif self.cfg.backbone.startswith("convnext"):
            self.backbone = ctor(dtype=dtype, fast_gelu=self.cfg.fast_gelu,
                                 use_pallas=self.cfg.use_pallas_backbone)
        else:
            self.backbone = ctor(dtype=dtype)
        if self.cfg.stage4_reducer:
            self.reducer = Stage4Reducer(self.cfg.stage4_reducer, dtype=dtype)
            channels = self.cfg.stage4_reducer[-1][1]
        self.head = PrototypeHead(tree=self.tree, cfg=self.cfg.head,
                                  in_channels=channels,
                                  use_pallas=self.cfg.use_pallas_head,
                                  dtype=dtype)
        if self.cfg.use_byol:
            from .byol import PatchMLP
            self.projector = PatchMLP(channels, dtype=dtype)
            self.predictor = PatchMLP(channels, dtype=dtype)

    def features(self, xs: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        f = self.backbone(xs, train=train)
        if self.cfg.stage4_reducer:
            f = self.reducer(f)
        return f

    def __call__(self, xs: jnp.ndarray, *, train: bool = False, inference: bool = False,
                 apply_overspecificity_mask: bool = False,
                 gumbel_rng: Optional[jax.Array] = None,
                 mask_rng: Optional[jax.Array] = None,
                 with_byol: bool = False,
                 fuse_align_pf: bool = False) -> Dict[str, jnp.ndarray]:
        """Returns {'features', 'proto_features', 'pooled', 'logits'} with the
        stacked layouts (B,H,W,D), (B,H,W,P), (B,P), (B,C); with
        ``with_byol`` also 'byol_online' = predictor(projector(features))
        (ref pipnet_byol/pipnet_byol.py:105-110).  ``fuse_align_pf`` (pallas
        head only): replace 'proto_features' with 'align_pf_logsum' (B, N) —
        the maps stay in VMEM (see ops/pallas_head.make_fused_head_nopf)."""
        f = self.features(xs, train=train)
        out = self.head(f, inference=inference,
                        apply_overspecificity_mask=apply_overspecificity_mask,
                        gumbel_rng=gumbel_rng, mask_rng=mask_rng,
                        fuse_align_pf=fuse_align_pf)
        out["features"] = f
        if with_byol:
            if not self.cfg.use_byol:
                raise ValueError("model built without use_byol")
            out["byol_online"] = self.predictor(self.projector(f, train=train),
                                                train=train)
        return out

    def byol_target_projection(self, xs: jnp.ndarray, *, train: bool = False):
        """Target branch: projector(backbone(xs)) — applied with the EMA
        target parameter tree (ref pipnet_byol/pipnet_byol.py:110)."""
        return self.projector(self.features(xs, train=train), train=train)


# ----------------------------------------------------------------------------
# joint distribution over leaves
# ----------------------------------------------------------------------------

def leave_out_decode_tables(tree: TreeArrays, leave_out_idx) -> tuple:
    """Static tables implementing the reference's leave-out-class (LOU)
    short-circuit (``util/node.py:319-326``): at a node where ANY child's
    entire leaf set is left out, the whole subtree distribution is replaced by
    a deterministic indicator on that node's first left-out LEAF child — this
    is the mechanism that routes unseen species through the tree
    (``calc_acc_LOU.ipynb``).  The recursion is top-down, so only the TOPMOST
    triggering node on a leaf's root path applies.

    Returns ``(use_mask (L, N) f32, extra (L,) f32)``: a leaf's log joint is
    the sum of its path edges where ``use_mask`` is 1 plus ``extra``
    (0 for the chosen indicator leaf, -inf for other leaves under a trigger).
    """
    L, N = tree.leaf_under_node.shape
    lo = np.zeros(L, bool)
    lo[np.asarray(list(leave_out_idx), np.int64)] = True
    under = tree.leaf_under_node.astype(bool)                       # (L, N)
    child_leaf = tree.child_leaf_matrix.astype(bool)                # (L, C)

    trigger = np.zeros(N, bool)
    chosen = np.full(N, -1, np.int64)
    for ni in range(N):
        cs = tree.node_child_slice(ni)
        cols = np.arange(cs.start, cs.stop)
        full_out = [c for c in cols
                    if child_leaf[:, c].any() and lo[child_leaf[:, c]].all()]
        if not full_out:
            continue
        trigger[ni] = True
        leaf_cols = [c for c in cols
                     if tree.child_leaf_class[c] >= 0
                     and lo[tree.child_leaf_class[c]]]
        if not leaf_cols:
            # the reference indexes [0] of an empty list here
            # (util/node.py:321) — an internal child fully left out with no
            # left-out leaf sibling crashes it; we raise with context instead
            raise ValueError(
                f"node {tree.node_names[ni]}: an internal child subtree is "
                "fully left out but no direct leaf child is left out — the "
                "reference decode is undefined here (util/node.py:319-326)")
        chosen[ni] = int(tree.child_leaf_class[leaf_cols[0]])

    # depth = number of strict ancestors (nodes with a strict leafset superset)
    sizes = under.sum(axis=0)
    depth = np.zeros(N, np.int64)
    for n in range(N):
        for m in range(N):
            if m != n and sizes[m] > sizes[n] and not (under[:, n] & ~under[:, m]).any():
                depth[n] += 1

    use = under.copy()
    extra = np.zeros(L, np.float32)
    for leaf in range(L):
        path = np.flatnonzero(under[leaf])
        trig = [n for n in path if trigger[n]]
        if not trig:
            continue
        top = min(trig, key=lambda n: depth[n])
        for n in path:
            if depth[n] >= depth[top]:
                use[leaf, n] = False        # T's edge and everything below
        extra[leaf] = 0.0 if leaf == chosen[top] else -np.inf
    return use.astype(np.float32), extra


def degenerate_nodes_traced(masked_w: jnp.ndarray, tree: TreeArrays) -> jnp.ndarray:
    """(N,) bool from the Gumbel-masked effective classifier, traced.

    A node is degenerate when ANY of its child classes keeps no weight
    > 1e-3 after presence masking (ref util/node.py:342-347; the reference
    reads the raw weight, but raw w <= 1e-3  <=>  relu(w) <= 1e-3, and the
    off-block entries are -0.5 there / 0 here — degenerate under both).
    ``masked_w`` is ``effective_cls_weight() * keep[None, :]`` with shape
    (num_children_total, num_protos_padded); child rows are contiguous per
    node (tree/compile.py), so the per-node ANY is one segment_max."""
    import numpy as np
    row_node = jnp.asarray(np.repeat(np.arange(tree.num_nodes),
                                     np.asarray(tree.node_num_children)))
    row_deg = (jnp.max(masked_w, axis=1) <= 1e-3).astype(jnp.int32)
    return jax.ops.segment_max(row_deg, row_node,
                               num_segments=tree.num_nodes) > 0


def masked_decode_degenerates(model, params, tree: TreeArrays,
                              mask_rng) -> jnp.ndarray:
    """Degenerate-node verdict for a masked decode, from the SAME hard-Gumbel
    presence sample the head's forward draws with ``mask_rng`` — so pooled
    masking and the leaf-count-prior fallback (ref util/node.py:336-361)
    agree.  Shared by ``train.step.make_eval_step`` and ``serve.Predictor``;
    the tau=0.5 here must match the head's (``ops/segment.py``)."""
    from ..ops.segment import segment_hard_gumbel
    keep = segment_hard_gumbel(params["head"]["proto_presence"],
                               mask_rng, tau=0.5)[:, 1]
    w_eff = model.apply({"params": params},
                        method=lambda m: m.head.effective_cls_weight())
    return degenerate_nodes_traced(w_eff * keep[None, :], tree)


def joint_leaf_log_distribution(logits: jnp.ndarray, tree: TreeArrays,
                                softmax_tau: float = 1.0,
                                degenerate_nodes=None,
                                leave_out_idx=None) -> jnp.ndarray:
    """Log joint distribution over the fine classes.

    Vectorized form of the reference's recursive
    ``distribution_over_furthest_descendents`` (``util/node.py:300-395``):
    at every node, child probabilities are ``softmax(log1p(out^2)/tau)``; a
    leaf's joint probability is the product along its root-to-leaf path.  With
    the (leaf, node) lookup tables this is one gather + masked sum:

        logp[leaf] = sum over nodes n with leaf under n of
                     log_softmax_n(log1p(out_n^2)/tau)[child_col(leaf, n)]

    The output is ordered by sorted class name — identical to the reference's
    post-hoc ``argsort(names)`` (``pipnet/pipnet.py:179-181``) because our
    class indices are already name-sorted.

    ``degenerate_nodes`` is an optional (N,) bool: nodes whose (masked)
    classifier has a child with no surviving prototypes fall back to
    leaf-count priors for their child distribution
    (ref util/node.py:336-361, the apply_overspecificity_mask path).

    ``leave_out_idx`` is an optional sequence of left-out class indices:
    applies the reference's LOU short-circuit (see
    ``leave_out_decode_tables``; ref util/node.py:319-326).
    """
    B, C = logits.shape
    N = tree.num_nodes
    z = jnp.log1p(logits ** 2) / softmax_tau
    # per-node log-softmax over each node's child columns: dense (B, N, Cmax)
    cmax = tree.max_children
    cols = np.full((N, cmax), -1, np.int64)
    for ni in range(N):
        cn = int(tree.node_num_children[ni])
        cols[ni, :cn] = np.arange(tree.node_child_offset[ni], tree.node_child_offset[ni] + cn)
    valid = jnp.asarray(cols >= 0)
    zc = z[:, jnp.asarray(np.clip(cols, 0, C - 1))]                   # (B, N, Cmax)
    zc = jnp.where(valid[None], zc, -jnp.inf)
    logp_children = jax.nn.log_softmax(zc, axis=-1)                   # (B, N, Cmax)

    if degenerate_nodes is not None:
        # leaf-count prior per child column, dense (N, Cmax)
        prior = np.zeros((N, tree.max_children), np.float32)
        for ni in range(N):
            cn = int(tree.node_num_children[ni])
            counts = tree.child_num_leaves[
                tree.node_child_offset[ni]: tree.node_child_offset[ni] + cn]
            prior[ni, :cn] = np.log(counts / counts.sum())
        deg = jnp.asarray(degenerate_nodes).reshape(1, N, 1)
        logp_children = jnp.where(deg, jnp.asarray(prior)[None], logp_children)

    slot = jnp.asarray(np.where(tree.leaf_child_slot >= 0, tree.leaf_child_slot, 0))  # (L, N)
    if leave_out_idx is not None and len(leave_out_idx) > 0:
        use_np, extra_np = leave_out_decode_tables(tree, leave_out_idx)
        under = jnp.asarray(use_np)
        extra = jnp.asarray(extra_np)[None]
    else:
        under = jnp.asarray(tree.leaf_under_node)                      # (L, N)
        extra = 0.0
    # gather logp_children at (b, n, slot[l, n]) -> (B, L, N)
    g = jnp.take_along_axis(logp_children[:, None, :, :].repeat(slot.shape[0], axis=1),
                            slot[None, :, :, None], axis=-1)[..., 0]
    g = jnp.where(under[None] > 0, g, 0.0)
    return g.sum(axis=-1) + extra                                      # (B, L)


def joint_leaf_distribution(logits: jnp.ndarray, tree: TreeArrays,
                            softmax_tau: float = 1.0) -> jnp.ndarray:
    return jnp.exp(joint_leaf_log_distribution(logits, tree, softmax_tau))


# ----------------------------------------------------------------------------
# construction helpers
# ----------------------------------------------------------------------------

def assign_prototype_budgets(root: Node, cfg: ModelConfig) -> None:
    """Apply the per-node budget rule from the driver (main.py:148-155)."""
    if cfg.num_features == 0 and cfg.num_protos_per_descendant == 0 and cfg.num_protos_per_child == 0:
        raise ValueError("one of num_features / num_protos_per_descendant / num_protos_per_child must be > 0")
    for node in root.nodes_with_children():
        node.set_num_protos(num_protos_per_descendant=cfg.num_protos_per_descendant,
                            num_protos_per_child=cfg.num_protos_per_child,
                            min_protos=cfg.num_features,
                            split_protos=not cfg.head.protopool)


def build_pipnet(root: Node, cfg: ModelConfig, *, weighted: bool = False,
                 class_names=None) -> Tuple[PIPNet, TreeArrays]:
    """Budget the tree, compile it, and construct the model."""
    from ..tree.compile import compile_tree

    assign_prototype_budgets(root, cfg)
    tree = compile_tree(root, class_names=class_names,
                        protopool=cfg.head.protopool, weighted=weighted)
    return PIPNet(tree=tree, cfg=cfg), tree


def latent_shape(cfg: ModelConfig) -> Tuple[int, int]:
    """Static latent (H, W) for an image_size, replacing the reference's
    runtime shape probe (main.py:400-407)."""
    s = cfg.image_size
    if cfg.backbone.startswith("convnext"):
        s4 = s // 4
        if cfg.backbone.endswith("_26"):
            h = (s4 - 2) // 2 + 1   # down1 stride 2
            h = h - 1               # down2 stride 1, k2 VALID
            h = h - 1               # down3 stride 1
        elif cfg.backbone.endswith("_13"):
            h = (s4 - 2) // 2 + 1
            h = (h - 2) // 2 + 1
            h = h - 1
        else:
            h = s // 32
        return (h, h)
    if cfg.backbone.startswith("resnet"):
        return (s // 8, s // 8)     # stride-1 layer3/4
    if cfg.backbone.startswith("dinov2"):
        return (s // 14, s // 14)   # ViT-S/14 patch grid (ref pipnet.py:1137)
    raise ValueError(cfg.backbone)
