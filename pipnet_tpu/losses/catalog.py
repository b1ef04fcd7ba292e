"""The HComP-Net loss catalog as pure, batched functions.

The reference computes every loss inside a Python loop over tree nodes with
inner loops over children and leaf descendants, selecting batch rows by
*string comparison per batch* (``pipnet/train.py:852-1341``).  Here every loss
is a masked segment reduction over the stacked prototype/classifier axes using
the lookup tables from ``tree/compile.py`` — a fixed graph, one pass, jittable.

Batch layout convention: inputs hold the two augmented views concatenated
``[view1; view2]`` with labels duplicated (``pipnet/train.py:213-214``); OOD
rows carry label -1 and sit at the tail of EACH view block (the reference
appends both OOD views after both in-distribution views, which silently
mispairs rows in its align losses when OOD is enabled — we keep views aligned
instead; identical when no OOD loader is used, which includes every shipped
config).

Reference-quirk notes (each also cited at the function):
* tanh_desc includes leaf descendants absent from the batch — their pooled sum
  is 0, contributing the constant ``-log(EPS)`` (``pipnet/train.py:1108-1123``).
* the overspecificity denominator counts relevant prototypes of children that
  have no in-batch descendants, while the numerator skips them
  (``pipnet/train.py:965,975-976``).
* the reference resamples (and nests) Gumbel noise on the SAME presence tensor
  once per child (``pipnet/train.py:978`` reassigns ``proto_presence`` inside
  the child loop); we sample once per step — equal in distribution for the
  first child and strictly cleaner after.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..tree.compile import TreeArrays

EPS = 1e-8           # calculate_loss is invoked with EPS=1e-8 (pipnet/train.py:238)
ALIGN_EPS = 1e-12    # CARL align loss epsilon (pipnet/train.py:1399-1405)


class TreeConsts(NamedTuple):
    """Device-resident constants derived from TreeArrays.

    Label tables carry an extra trailing row (index L) representing "no class"
    used for OOD rows (label -1): all-false / -1 entries.
    """
    proto_node: jnp.ndarray        # (P,) int32, clipped to [0, N-1]; padding -> node 0
    proto_valid: jnp.ndarray       # (P,) f32
    proto_child_slot: jnp.ndarray  # (P,) int32 (protopool='n' partition; -1 otherwise)
    node_onehot: jnp.ndarray       # (P, N) f32 one-hot of proto_node (0 rows for padding)
    under: jnp.ndarray             # (L+1, N) f32: leaf under node
    leaf_slot: jnp.ndarray         # (L+1, N) int32: child slot, -1 when absent
    colmat: jnp.ndarray            # (L+1, P) int32: child column of leaf at proto's node, -1 absent
    child_leaf: jnp.ndarray        # (L+1, C) f32: leaf descendant of child column
    node_cols: jnp.ndarray         # (N, Cmax) int32 child columns, -1 padding
    node_cols_valid: jnp.ndarray   # (N, Cmax) f32
    node_num_protos: jnp.ndarray   # (N,) f32
    node_num_children: jnp.ndarray # (N,) f32
    node_num_leaves: jnp.ndarray   # (N,) f32
    node_weights: jnp.ndarray      # (C,) f32
    num_leaves: int
    num_nodes: int


def make_tree_consts(tree: TreeArrays) -> TreeConsts:
    L, N, P, C = tree.num_classes, tree.num_nodes, tree.num_protos_padded, tree.num_children_total
    pn = np.clip(tree.proto_node, 0, N - 1)
    onehot = np.zeros((P, N), np.float32)
    onehot[np.arange(P), pn] = (tree.proto_node >= 0).astype(np.float32)
    under = np.zeros((L + 1, N), np.float32)
    under[:L] = tree.leaf_under_node
    slot = np.full((L + 1, N), -1, np.int32)
    slot[:L] = tree.leaf_child_slot
    colmat = np.full((L + 1, P), -1, np.int32)
    colmat[:L] = np.where(tree.proto_node[None, :] >= 0,
                          tree.leaf_child_col[:, pn], -1)
    child_leaf = np.zeros((L + 1, C), np.float32)
    child_leaf[:L] = tree.child_leaf_matrix
    cmax = tree.max_children
    node_cols = np.full((N, cmax), -1, np.int64)
    for ni in range(N):
        cn = int(tree.node_num_children[ni])
        node_cols[ni, :cn] = np.arange(tree.node_child_offset[ni],
                                       tree.node_child_offset[ni] + cn)
    return TreeConsts(
        proto_node=jnp.asarray(pn), proto_valid=jnp.asarray(tree.proto_valid, jnp.float32),
        proto_child_slot=jnp.asarray(tree.proto_child_slot),
        node_onehot=jnp.asarray(onehot), under=jnp.asarray(under),
        leaf_slot=jnp.asarray(slot), colmat=jnp.asarray(colmat),
        child_leaf=jnp.asarray(child_leaf),
        node_cols=jnp.asarray(np.maximum(node_cols, 0)),
        node_cols_valid=jnp.asarray((node_cols >= 0).astype(np.float32)),
        node_num_protos=jnp.asarray(tree.node_num_protos, jnp.float32),
        node_num_children=jnp.asarray(tree.node_num_children, jnp.float32),
        node_num_leaves=jnp.asarray(tree.node_num_leaves, jnp.float32),
        node_weights=jnp.asarray(tree.node_weights, jnp.float32),
        num_leaves=L, num_nodes=N,
    )


def _yidx(ys: jnp.ndarray, L: int) -> jnp.ndarray:
    """Fine label -> LUT row, mapping OOD (-1) to the sentinel row L."""
    return jnp.where(ys >= 0, ys, L)


# ---------------------------------------------------------------------------
# global (non-tree) losses
# ---------------------------------------------------------------------------

def flatten_patches(features: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,D) -> (B*H*W, D)  (ref flatten_tensor, pipnet/train.py:1344-1349)."""
    return features.reshape(-1, features.shape[-1])


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """torch F.normalize semantics: x / max(||x||, eps)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def align_loss_unit_space(x: jnp.ndarray, y: jnp.ndarray, alpha: float = 2.0) -> jnp.ndarray:
    """mean ||x - y||^alpha over rows (Wang-Isola alignment,
    ref pipnet/train.py:1395-1396).

    For alpha=2 (the only value used) this is computed as a plain sum of
    squares: identical math, but smooth at x==y, where the norm's gradient is
    NaN — two augmented views CAN coincide (identity photometric op + same
    crop), which would poison the whole step."""
    if alpha == 2.0:
        return jnp.mean(jnp.sum((x - y) ** 2, axis=-1))
    return jnp.mean(jnp.linalg.norm(x - y, axis=-1) ** alpha)


def uniform_loss(x: jnp.ndarray, t: float = 2.0, block: int = 2048) -> jnp.ndarray:
    """log(mean over i<j of exp(-t ||xi-xj||^2) + 1e-10)
    (ref pipnet/train.py:1376-1386).

    Blocked over rows so the n^2 distance matrix never materializes at once —
    at 224^2/ConvNeXt-26 the flattened patch count is ~43k rows/view.
    """
    n = x.shape[0]
    nb = -(-n // block)
    pad = nb * block - n
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    rowvalid = jnp.pad(jnp.ones(n, x.dtype), (0, pad))
    sq = jnp.sum(xp * xp, axis=-1)
    idx = jnp.arange(nb * block)

    def body(carry, i):
        s = carry
        rows = jax.lax.dynamic_slice_in_dim(xp, i * block, block)
        rsq = jax.lax.dynamic_slice_in_dim(sq, i * block, block)
        rid = jax.lax.dynamic_slice_in_dim(idx, i * block, block)
        rv = jax.lax.dynamic_slice_in_dim(rowvalid, i * block, block)
        d2 = rsq[:, None] + sq[None, :] - 2.0 * (rows @ xp.T)
        d2 = jnp.maximum(d2, 0.0)
        mask = (rid[:, None] < idx[None, :]) & (rv[:, None] > 0) & (rowvalid[None, :] > 0)
        s = s + jnp.sum(jnp.where(mask, jnp.exp(-t * d2), 0.0))
        return s, None

    total, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), jnp.arange(nb))
    pairs = n * (n - 1) / 2.0
    return jnp.log(total / pairs + 1e-10)


def align_and_uniform(features: jnp.ndarray, *, align: bool, uni: bool):
    """Backbone-feature alignment + uniformity over the two views
    (ref pipnet/train.py:898-928)."""
    f1, f2 = jnp.split(features, 2, axis=0)
    x1 = l2_normalize(flatten_patches(f1))
    x2 = l2_normalize(flatten_patches(f2))
    a = align_loss_unit_space(x1, x2) if align else jnp.zeros(())
    u = ((uniform_loss(x1) + uniform_loss(x2)) / 2.0) if uni else jnp.zeros(())
    return a, u


def byol_regression_loss(online: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Normalized MSE between the crossed views
    (ref regression_loss pipnet/train.py:1414-1419 and usage 887-893)."""
    o1, o2 = jnp.split(online, 2, axis=0)
    t1, t2 = jnp.split(target, 2, axis=0)

    def reg(x, y):
        xn, yn = l2_normalize(x), l2_normalize(y)
        return jnp.mean(jnp.sum((xn - yn) ** 2, axis=-1))

    return (reg(o1, jax.lax.stop_gradient(t2)) + reg(o2, jax.lax.stop_gradient(t1))) / 2.0


def entropy_loss(probs: jnp.ndarray) -> jnp.ndarray:
    """Mean entropy over the batch (ref pipnet/train.py:28-37)."""
    p = jnp.clip(probs, 1e-9, None)
    return jnp.mean(-jnp.sum(p * jnp.log(p), axis=-1))


# ---------------------------------------------------------------------------
# per-node losses over the stacked axes
# ---------------------------------------------------------------------------

def node_batch_masks(tc: TreeConsts, ys: jnp.ndarray):
    """(B, N) in-node mask and per-node in-batch counts."""
    under = tc.under[_yidx(ys, tc.num_leaves)]         # (B, N)
    counts = under.sum(axis=0)                          # (N,)
    return under, counts


def align_pf_loss(tc: TreeConsts, proto_features: jnp.ndarray, ys: jnp.ndarray,
                  eps: float = ALIGN_EPS) -> jnp.ndarray:
    """CARL alignment of softmaxed prototype maps between views, per node over
    in-node samples; both stop-grad directions (ref pipnet/train.py:1063-1074).

    ``eps``: reference-exact ALIGN_EPS=1e-12 by default; LossConfig.align_eps
    overrides it (opt-in random-init stabilizer bounding the 1/(ip+eps)
    gradient).

    Returns sum over nodes of the per-node loss / num_nodes.
    """
    B = proto_features.shape[0] // 2
    pf1, pf2 = proto_features[:B], proto_features[B:]
    ys1 = ys[:B]
    # The reference averages two stop-gradient directions whose FORWARD values
    # coincide; 0.5*(a*sg(b) + sg(a)*b) has the same forward value AND the same
    # gradient as that average, so one einsum replaces two.
    prod = 0.5 * (pf1 * jax.lax.stop_gradient(pf2)
                  + jax.lax.stop_gradient(pf1) * pf2)
    ip = jnp.einsum("bhwp,pn->bhwn", prod, tc.node_onehot)
    under, counts = node_batch_masks(tc, ys1)           # (B,N), (N,)
    hw = pf1.shape[1] * pf1.shape[2]
    m = under[:, None, None, :]
    t = -jnp.log(ip + eps) * m
    per_node = t.sum(axis=(0, 1, 2)) / jnp.maximum(counts * hw, 1.0)
    per_node = jnp.where(counts > 0, per_node, 0.0)
    return per_node.sum() / tc.num_nodes, per_node


def align_pf_from_logsum(tc: TreeConsts, logsum: jnp.ndarray, ys: jnp.ndarray,
                         hw: int):
    """align_pf from the fused head's in-kernel reduction
    logsum[b, n] = sum_hw log(ip + ALIGN_EPS)  (ops/pallas_head.py,
    make_fused_head_nopf) — algebraically identical to ``align_pf_loss``;
    only the (B, H, W, P) intermediates are gone."""
    B = logsum.shape[0]
    under, counts = node_batch_masks(tc, ys[:B])        # (B, N), (N,)
    per_node = -(logsum * under).sum(axis=0) / jnp.maximum(counts * hw, 1.0)
    per_node = jnp.where(counts > 0, per_node, 0.0)
    return per_node.sum() / tc.num_nodes, per_node


def tanh_loss(tc: TreeConsts, pooled: jnp.ndarray, ys: jnp.ndarray,
              eps: float = EPS) -> jnp.ndarray:
    """-log(tanh(sum over in-node batch of pooled))
    averaged over each node's prototypes, per view (ref pipnet/train.py:1076-1087).

    ``eps``: calculate_loss receives EPS=1e-8 but its min-contrast block
    locally rebinds EPS=1e-12 (pipnet/train.py:1024) BEFORE any tanh term
    runs, so with min_contrast active the reference's effective tanh epsilon
    is 1e-12 — verified by tests/test_reference_parity.py against the real
    code.  The caller passes the matching value."""
    B = pooled.shape[0] // 2
    under, counts = node_batch_masks(tc, ys[:B])        # same labels per view

    def per_view(pool_v, under_v):
        mask_p = under_v[:, tc.proto_node]              # (B, P): sample under proto's node
        s = jnp.sum(pool_v * mask_p, axis=0)            # (P,)
        lt = jnp.log(jnp.tanh(s) + eps) * tc.proto_valid
        per_node = -(lt @ tc.node_onehot) / jnp.maximum(tc.node_num_protos, 1.0)
        return per_node

    pn = (per_view(pooled[:B], under) + per_view(pooled[B:], under)) / 2.0
    pn = jnp.where(counts > 0, pn, 0.0)
    return pn.sum() / tc.num_nodes, pn


def _relevance(tc: TreeConsts, w_eff: jnp.ndarray, ys_rows: jnp.ndarray,
               threshold: float) -> jnp.ndarray:
    del ys_rows
    return (w_eff > threshold).astype(jnp.float32)


def per_leaf_view_sums(tc: TreeConsts, pooled: jnp.ndarray, ys: jnp.ndarray):
    """Per-leaf pooled sums for each view: two (L+1, P) matrices
    (vectorizing the reference's per-descendant boolean indexing,
    pipnet/train.py:1108-1121)."""
    B = pooled.shape[0] // 2
    yid = _yidx(ys[:B], tc.num_leaves)
    s1 = jax.ops.segment_sum(pooled[:B], yid, num_segments=tc.num_leaves + 1)
    s2 = jax.ops.segment_sum(pooled[B:], yid, num_segments=tc.num_leaves + 1)
    return s1, s2


def tanh_desc_loss(tc: TreeConsts, pooled: jnp.ndarray, ys: jnp.ndarray,
                   w_eff: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """Per-descendant tanh loss (ref pipnet/train.py:1089-1134).

    For every node n and every leaf descendant l (PRESENT OR NOT — absent
    leaves sum to 0 and contribute the constant -log(eps), faithfully to the
    reference), over the prototypes relevant (> 1e-3) to l's child of n:
        term(l, n) = -mean_p log(tanh(per-leaf per-view pooled sum) + eps)
    node loss = mean over its leaf descendants; total = sum/N.

    ``eps``: see tanh_loss — the reference's min-contrast block rebinds the
    shared local EPS to 1e-12 (pipnet/train.py:1024).
    """
    s1, s2 = per_leaf_view_sums(tc, pooled, ys)          # (L+1, P) each
    thr = (w_eff > 1e-3).astype(jnp.float32)             # (C, P)
    colsafe = jnp.maximum(tc.colmat, 0)
    rel = jnp.take_along_axis(thr, colsafe, axis=0)      # (L+1, P)
    rel = rel * (tc.colmat >= 0) * tc.proto_valid[None, :]

    lt = (jnp.log(jnp.tanh(s1) + eps) + jnp.log(jnp.tanh(s2) + eps)) / 2.0
    numer = (-lt * rel) @ tc.node_onehot                 # (L+1, N)
    cnt = rel @ tc.node_onehot                           # (L+1, N)
    term = jnp.where(cnt > 0, numer / jnp.maximum(cnt, 1.0), 0.0)
    # node mean over leaf descendants with >=1 relevant proto
    desc_valid = tc.under[:tc.num_leaves + 1] * (cnt > 0)
    node_numer = (term * desc_valid).sum(axis=0)
    node_cnt = desc_valid.sum(axis=0)
    per_node = jnp.where(node_cnt > 0, node_numer / jnp.maximum(node_cnt, 1.0), 0.0)
    return per_node.sum() / tc.num_nodes, per_node


def classification_loss(tc: TreeConsts, logits: jnp.ndarray, ys: jnp.ndarray,
                        multiplier: jnp.ndarray, *, pipnet_sparsity: bool = True,
                        weighted: bool = True,
                        focal_gamma: Optional[float] = None) -> jnp.ndarray:
    """Per-node weighted NLL on in-node rows (both views)
    (ref pipnet/train.py:1153-1163 + util/custom_losses.py WeightedNLLLoss).

    ``softmax_inputs = log1p(logits^m)`` when pipnet_sparsity; weighting is
    per-sample w[y] with a plain mean over rows (NOT normalized by sum of
    weights — mirroring ``weighted_losses.mean()``).
    ``focal_gamma`` switches to the focal-loss criterion
    (ref util/custom_losses.py:37-44, kornia semantics: alpha ignored at 1).
    """
    B, C = logits.shape
    z = jnp.log1p(logits ** multiplier) if pipnet_sparsity else logits
    zc = z[:, tc.node_cols.reshape(-1)].reshape(B, *tc.node_cols.shape)  # (B,N,Cmax)
    zc = jnp.where(tc.node_cols_valid[None] > 0, zc, -jnp.inf)
    logp = jax.nn.log_softmax(zc, axis=-1)               # (B, N, Cmax)
    yid = _yidx(ys, tc.num_leaves)
    slot = tc.leaf_slot[yid]                             # (B, N)
    under = (slot >= 0).astype(logits.dtype)
    picked = jnp.take_along_axis(logp, jnp.maximum(slot, 0)[..., None], axis=-1)[..., 0]
    nll = -picked
    if focal_gamma is not None:
        p = jnp.exp(picked)
        nll = (1.0 - p) ** focal_gamma * nll
    if weighted:
        col = tc.node_cols[jnp.arange(tc.num_nodes)[None, :], jnp.maximum(slot, 0)]
        w = tc.node_weights[col]
        nll = nll * w
    counts = under.sum(axis=0)
    per_node = jnp.where(counts > 0, (nll * under).sum(axis=0) / jnp.maximum(counts, 1.0), 0.0)
    return per_node.sum() / tc.num_nodes, per_node


def ood_bce_loss(tc: TreeConsts, logits: jnp.ndarray, ys: jnp.ndarray,
                 multiplier: jnp.ndarray) -> jnp.ndarray:
    """Push non-descendant (incl. OOD) rows' node logits toward 0:
    BCE(sigmoid(log1p(logits^m)), 0) == softplus(log1p(logits^m)), averaged
    over (rows not under node) x (node children) (ref pipnet/train.py:1166-1178)."""
    B, C = logits.shape
    z = jnp.log1p(logits ** multiplier)
    bce = jax.nn.softplus(z)                             # (B, C)
    yid = _yidx(ys, tc.num_leaves)
    under = tc.under[yid]                                # (B, N)
    not_under = (1.0 - under)[:, :, None]                # (B, N, 1)
    bce_n = bce[:, tc.node_cols.reshape(-1)].reshape(B, *tc.node_cols.shape)
    num = (bce_n * not_under * tc.node_cols_valid[None]).sum(axis=(0, 2))
    den = (not_under * tc.node_cols_valid[None]).sum(axis=(0, 2))
    per_node = jnp.where(den > 0, num / jnp.maximum(den, 1.0), 0.0)
    return per_node.sum() / tc.num_nodes, per_node


def kernel_orth_loss(tree: TreeArrays, tc: TreeConsts, add_on_kernel: jnp.ndarray,
                     w_eff: jnp.ndarray,
                     cap: Optional[float] = None) -> jnp.ndarray:
    """Orthogonality of the class-relevant prototype kernels per node
    (ref pipnet/train.py:1136-1147 + orth_dist 1408-1412).

    The reference builds a compact (P_rel, D) kernel matrix per node (dynamic
    shape) and computes ||G - I|| on whichever gram is smaller.  We compute the
    masked (P x P) gram per bucket — identical Frobenius norm — and apply the
    rank-correction  ||A^T A - I_D||^2 = ||A A^T - I_P||^2 - P_rel + D  when
    P_rel >= D, recovering the reference's transpose branch with static shapes.
    """
    D = add_on_kernel.shape[0]
    rel = (w_eff > 1e-3).max(axis=0)                     # (P,) any class
    rel = rel * tc.proto_valid
    per_node_sq = []
    per_node_rel = []
    for b in tree.buckets:
        sl = slice(b.proto_offset, b.proto_offset + b.num_nodes * b.width)
        k = add_on_kernel[:, sl].reshape(D, b.num_nodes, b.width)
        r = rel[sl].reshape(b.num_nodes, b.width)
        km = k * r[None]
        g = jnp.einsum("dnw,dnv->nwv", km, km)
        eye = r[:, :, None] * r[:, None, :] * jnp.eye(b.width)[None]
        # note: reference subtracts the FULL identity of the compact gram; with
        # masked rows the identity only exists on relevant diagonal entries
        diff = g - eye
        per_node_sq.append(jnp.sum(diff * diff, axis=(1, 2)))
        per_node_rel.append(r.sum(axis=1))
    sq = jnp.concatenate(per_node_sq)
    nrel = jnp.concatenate(per_node_rel)
    sq = jnp.where(nrel >= D, sq - nrel + D, sq)
    per_node = jnp.sqrt(jnp.maximum(sq, 0.0))
    if cap is not None:
        # bounded restoring force: above the cap the node's contribution is
        # rescaled to exactly `cap` and its gradient to (cap/ko)*d(ko) — a
        # per-node gradient clip on this one term (see LossConfig.kernel_orth_cap)
        per_node = per_node * (cap / jax.lax.stop_gradient(
            jnp.maximum(per_node, cap)))
    return per_node.sum() / tc.num_nodes, per_node


def overspecificity_losses(tc: TreeConsts, pooled: jnp.ndarray, ys: jnp.ndarray,
                           w_eff: jnp.ndarray, presence: jnp.ndarray,
                           *, boost: Optional[float] = None,
                           geometric_mean: bool = False,
                           sg_score: bool = True) -> Dict[str, jnp.ndarray]:
    """Overspecificity mask-pruning + presence-mask L1
    (ref pipnet/train.py:946-1015; weights 2.0 / 0.5 hard-coded at 957-958).

    ``presence`` is the (P,) keep-probability column of the soft
    Gumbel-softmaxed presence logits (sampled once per step by the caller —
    the reference resamples, and accidentally nests, the Gumbel transform per
    child at pipnet/train.py:978).

    score(p) = product over in-batch leaf descendants of p's child of the
    batch-max pooled activation (optionally boosted & clamped to 1, or the
    geometric mean); loss = -sum(score * presence) normalized by the total
    relevant-prototype count (which, faithfully to the reference, also counts
    children with no in-batch descendants).
    """
    Lp1 = tc.num_leaves + 1
    yid = _yidx(ys, tc.num_leaves)
    maxs = jax.ops.segment_max(pooled, yid, num_segments=Lp1)        # (L+1, P)
    present = jax.ops.segment_sum(jnp.ones_like(yid, jnp.float32), yid, num_segments=Lp1)
    present = (present > 0).astype(jnp.float32)
    present = present.at[tc.num_leaves].set(0.0)                     # OOD row never counts
    maxs = jnp.where(present[:, None] > 0, maxs, 0.0)

    vals = maxs
    if boost is not None:
        vals = jnp.minimum(vals * boost, 1.0)
    logv = jnp.log(jnp.maximum(vals, 1e-30))
    # membership (L+1, P): leaf l is a descendant of the child owning proto p.
    # colmat[l,p] is the column of l's child at p's node; p belongs to column
    # proto_child_col(p) — membership is equality of the two (protopool='n').
    member = (tc.colmat == _proto_child_col(tc)) & (tc.colmat >= 0)
    member = member.astype(jnp.float32) * present[:, None]

    if geometric_mean:
        n_desc_present = member.sum(axis=0)                          # (P,)
        logsum = (logv * member).sum(axis=0) / jnp.maximum(n_desc_present, 1.0)
    else:
        logsum = (logv * member).sum(axis=0)
        n_desc_present = member.sum(axis=0)
    score = jnp.where(n_desc_present > 0, jnp.exp(logsum), 0.0)      # (P,)
    if sg_score:
        score = jax.lax.stop_gradient(score)

    rel = (jnp.take_along_axis((w_eff > 1e-3).astype(jnp.float32),
                               jnp.maximum(_proto_child_col(tc), 0)[None, :], axis=0)[0])
    rel = rel * (_proto_child_col(tc) >= 0) * tc.proto_valid

    total_rel = rel @ tc.node_onehot                                  # (N,)
    num_os = ((score * presence * rel) @ tc.node_onehot)
    num_l1 = ((presence * rel * (n_desc_present > 0)) @ tc.node_onehot)
    # reference: mask_l1 numerator only for children with >=1 present
    # descendant (the `continue` skips both terms), denominator counts all
    per_node_os = jnp.where(total_rel > 0, -num_os / jnp.maximum(total_rel, 1.0), 0.0)
    per_node_l1 = jnp.where(total_rel > 0, num_l1 / jnp.maximum(total_rel, 1.0), 0.0)

    n = tc.num_nodes
    return {
        "overspecificity": 2.0 * per_node_os.sum() / n,
        "mask_l1": 0.5 * per_node_l1.sum() / n,
        "overspecificity_per_node": per_node_os,
        "mask_l1_per_node": per_node_l1,
    }


def _proto_child_col(tc: TreeConsts) -> jnp.ndarray:
    """Global child column owning each prototype (protopool='n'), -1 otherwise."""
    # reconstructed from slot + node: col = node_cols[node, slot]
    has = tc.proto_child_slot >= 0
    col = tc.node_cols[tc.proto_node, jnp.maximum(tc.proto_child_slot, 0)]
    return jnp.where(has, col, -1)


def min_contrast_loss(tc: TreeConsts, pooled: jnp.ndarray, ys: jnp.ndarray,
                      w_eff: jnp.ndarray, *, topk: int = 1) -> jnp.ndarray:
    """Minimize top-K activations of each child's prototypes over the
    *contrasting set* — in-node samples NOT belonging to that child
    (ref pipnet/train.py:1017-1060; requires protopool='n').

    mean over (K x relevant prototype columns of children with a non-empty
    contrast set).  The reference crashes if a contrast set has fewer than K
    rows; we count only the rows that exist.
    """
    B = pooled.shape[0]
    yid = _yidx(ys, tc.num_leaves)
    pcol = _proto_child_col(tc)                                      # (P,)
    # contrast(i, p): sample under p's node but NOT under p's child
    under_node = tc.under[yid][:, tc.proto_node]                     # (B, P)
    under_child = jnp.take_along_axis(tc.child_leaf[yid], jnp.maximum(pcol, 0)[None, :]
                                      .repeat(B, 0), axis=1)         # (B, P)
    contrast = under_node * (1.0 - under_child)
    vals = jnp.where(contrast > 0, pooled, -jnp.inf)
    top = jax.lax.top_k(vals.T, topk)[0]                             # (P, K)
    valid_rows = jnp.isfinite(top)
    rel = (jnp.take_along_axis((w_eff > 1e-5).astype(jnp.float32),
                               jnp.maximum(pcol, 0)[None, :], axis=0)[0])
    rel = rel * (pcol >= 0) * tc.proto_valid                         # (P,)
    has_contrast = contrast.sum(axis=0) > 0
    col_ok = rel * has_contrast
    numer_p = jnp.sum(jnp.where(valid_rows, top, 0.0), axis=1) * col_ok    # (P,)
    denom_p = jnp.sum(valid_rows, axis=1) * col_ok
    numer = numer_p @ tc.node_onehot                                       # (N,)
    denom = denom_p @ tc.node_onehot
    per_node = jnp.where(denom > 0, numer / jnp.maximum(denom, 1.0), 0.0)
    return per_node.sum() / tc.num_nodes, per_node


def ood_entropy_loss(tc: TreeConsts, logits: jnp.ndarray, ys: jnp.ndarray,
                     multiplier: jnp.ndarray) -> jnp.ndarray:
    """Mean per-node softmax entropy on rows NOT under the node.

    The reference's ``--OOD_ent`` flag exists (``util/args.py:251-255``) but
    the live loss never fills ``OOD_ent_loss`` (only the dead superset copy
    computes it, ``pipnet/pipnet.py:840-851``); provided here as the working
    equivalent.
    """
    B, C = logits.shape
    z = jnp.log1p(logits ** multiplier)
    zc = z[:, tc.node_cols.reshape(-1)].reshape(B, *tc.node_cols.shape)
    zc = jnp.where(tc.node_cols_valid[None] > 0, zc, -jnp.inf)
    p = jax.nn.softmax(zc, axis=-1)
    ent = -jnp.sum(jnp.where(p > 0, p * jnp.log(jnp.clip(p, 1e-9, None)), 0.0), axis=-1)
    not_under = 1.0 - tc.under[_yidx(ys, tc.num_leaves)]
    num = (ent * not_under).sum(axis=0)
    den = not_under.sum(axis=0)
    per_node = jnp.where(den > 0, num / jnp.maximum(den, 1.0), 0.0)
    return per_node.sum() / tc.num_nodes, per_node
