"""Bucketed segment ops over the stacked prototype axis.

The reference loops over tree nodes applying ``softmax(dim=1)`` per node's
prototype bank (``pipnet/pipnet.py:124-148``).  Here all banks live on one
stacked axis ``P`` (see ``tree/compile.py``) and nodes are grouped into
*buckets* of equal padded width, so a per-node softmax is a dense
``reshape (…, N_b*W_b) -> (…, N_b, W_b) -> softmax(-1)`` per bucket — a
handful of large fused XLA ops instead of O(nodes) kernel launches.

All functions take ``x[..., P]`` with the prototype axis minor-most.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..tree.compile import TreeArrays


def _bucket_views(x: jnp.ndarray, tree: TreeArrays):
    """Yield (bucket, view) where view is x's bucket slice reshaped to
    (..., num_nodes, width)."""
    for b in tree.buckets:
        size = b.num_nodes * b.width
        view = x[..., b.proto_offset: b.proto_offset + size]
        yield b, view.reshape(*x.shape[:-1], b.num_nodes, b.width)


def _valid_mask(tree: TreeArrays, bucket) -> np.ndarray:
    """(num_nodes, width) bool validity mask for one bucket (static numpy)."""
    size = bucket.num_nodes * bucket.width
    return tree.proto_valid[bucket.proto_offset: bucket.proto_offset + size].reshape(
        bucket.num_nodes, bucket.width)


def segment_softmax(x: jnp.ndarray, tree: TreeArrays, tau: float = 1.0,
                    gumbel_rng: Optional[jax.Array] = None,
                    gumbel_tau: float = 1.0,
                    method: str = "matmul",
                    precise: bool = True) -> jnp.ndarray:
    """Per-node softmax over the prototype axis, per patch.

    Matches ``softmax(proto_features / tau, dim=1)`` applied per node
    (ref pipnet/pipnet.py:146-148).  Padded prototype slots come out exactly 0.
    With ``gumbel_rng``, adds Gumbel noise before the (temperature
    ``gumbel_tau``) softmax — the soft ``F.gumbel_softmax`` variant
    (ref pipnet/pipnet.py:43-51,150-152).

    ``method='matmul'`` (default, MXU-friendly): exploit softmax's per-segment
    shift invariance — center by the per-patch row max over ALL prototypes
    (one lane reduction), then per-segment sums and their broadcast-back are
    two matmuls against the static (P, N) node one-hot.  No ragged reshapes,
    tiny HLO, exact same math (exponentials of far-below-max segments can
    underflow f32 below ~e^-80; irrelevant at practical activation ranges).
    ``method='bucketed'``: per-bucket reshape + per-segment max (the fully
    range-robust fallback).
    """
    if gumbel_rng is not None:
        g = jax.random.gumbel(gumbel_rng, x.shape, dtype=x.dtype)
        x = (x + g) / gumbel_tau
        tau = 1.0

    if method == "matmul":
        onehot = _node_onehot(tree)                                  # (P, N) numpy
        # precise=True: f32 end-to-end with HIGHEST-precision normalization
        # matmuls (the parity target is <=1e-4).  precise=False: keep the
        # input dtype (bf16 training) — HBM traffic halves and ~0.4% bf16
        # rounding is far below gradient noise.
        ct = jnp.float32 if precise else x.dtype
        prec = jax.lax.Precision.HIGHEST if precise else None
        z = x.astype(ct) / tau
        # true per-segment max via the bucketed reduce, broadcast back with a
        # one-hot matmul.  The shift is pure numerical centering: softmax is
        # invariant to any per-segment constant and the shift's gradient
        # contribution cancels exactly, so stop_gradient(c) is exact and skips
        # the max/reshape backward entirely.
        m = segment_max_to_nodes(z, tree, fill=-jnp.inf)             # (..., N)
        c = jax.lax.stop_gradient(
            jnp.matmul(m, jnp.asarray(onehot.T, ct), precision=prec))
        # clip both sides: valid slots sit in (-inf, ~0] after the shift; the
        # padded tail has c=0 and raw z, whose exp must stay finite before the
        # validity mask zeroes it (inf * 0 = nan)
        e = jnp.exp(jnp.clip(z - c, -80.0, 60.0)) * jnp.asarray(
            tree.proto_valid.astype(np.float32), ct)
        seg_sums = jnp.matmul(e, jnp.asarray(onehot, ct), precision=prec)
        denom = jnp.matmul(seg_sums, jnp.asarray(onehot.T, ct), precision=prec)
        # floor must be sqrt-of-f32-min safe: the division VJP computes x/y^2,
        # and (1e-30)^2 underflows f32 to 0 -> 0/0 NaN in gradients
        p = e / jnp.maximum(denom, 1e-18)
        return p.astype(x.dtype)

    out_parts: List[jnp.ndarray] = []
    for b, view in _bucket_views(x, tree):
        valid = _valid_mask(tree, b)
        z = view / tau
        z = jnp.where(valid, z, -jnp.inf)
        p = jax.nn.softmax(z, axis=-1)
        p = jnp.where(valid, p, 0.0)
        out_parts.append(p.reshape(*x.shape[:-1], b.num_nodes * b.width))
    out = jnp.concatenate(out_parts, axis=-1)
    tail = x.shape[-1] - out.shape[-1]
    if tail:
        out = jnp.concatenate([out, jnp.zeros((*x.shape[:-1], tail), out.dtype)], axis=-1)
    return out


def _node_onehot(tree: TreeArrays) -> np.ndarray:
    # cached on the TreeArrays instance as NUMPY (a jnp array created inside a
    # jit trace would leak a tracer; an id()-keyed global cache would be wrong
    # because ids are reused after garbage collection)
    cached = getattr(tree, "_node_onehot_cache", None)
    if cached is None:
        onehot = np.zeros((tree.num_protos_padded, tree.num_nodes), np.float32)
        pn = np.clip(tree.proto_node, 0, tree.num_nodes - 1)
        onehot[np.arange(tree.num_protos_padded), pn] = (
            tree.proto_node >= 0).astype(np.float32)
        object.__setattr__(tree, "_node_onehot_cache", onehot)
        cached = onehot
    return cached


def segment_hard_gumbel(logits2: jnp.ndarray, rng: jax.Array, tau: float = 0.5) -> jnp.ndarray:
    """Hard (straight-through) Gumbel-softmax over the last axis of shape-(P,2)
    presence logits; returns one-hot with soft gradients
    (ref ``F.gumbel_softmax(..., tau=0.5, hard=True)`` at pipnet/pipnet.py:165)."""
    g = jax.random.gumbel(rng, logits2.shape, dtype=logits2.dtype)
    y = jax.nn.softmax((logits2 + g) / tau, axis=-1)
    hard = jax.nn.one_hot(jnp.argmax(y, axis=-1), logits2.shape[-1], dtype=y.dtype)
    return hard + y - jax.lax.stop_gradient(y)


def soft_gumbel(logits2: jnp.ndarray, rng: jax.Array, tau: float = 0.5) -> jnp.ndarray:
    """Soft Gumbel-softmax over the last axis (ref pipnet/train.py:978)."""
    g = jax.random.gumbel(rng, logits2.shape, dtype=logits2.dtype)
    return jax.nn.softmax((logits2 + g) / tau, axis=-1)


def spatial_softmax(x: jnp.ndarray) -> jnp.ndarray:
    """Softmax over the spatial axes of ``(B, H, W, P)`` per prototype —
    the ``softmax_over_channel='y'`` variant (ref pipnet/pipnet.py:138-144,
    which reshapes (B,C,H,W)->(B,C,HW) and softmaxes over the last axis)."""
    B, H, W, P = x.shape
    flat = x.reshape(B, H * W, P)
    p = jax.nn.softmax(flat, axis=1)
    return p.reshape(B, H, W, P)


def segment_sum_to_nodes(x: jnp.ndarray, tree: TreeArrays) -> jnp.ndarray:
    """Sum ``x[..., P]`` within each node's segment -> ``(..., N)``."""
    parts: List[jnp.ndarray] = []
    for b, view in _bucket_views(x, tree):
        parts.append(view.sum(axis=-1))
    return jnp.concatenate(parts, axis=-1)


def segment_max_to_nodes(x: jnp.ndarray, tree: TreeArrays,
                         fill: float = -jnp.inf) -> jnp.ndarray:
    """Max of ``x[..., P]`` within each node's segment -> ``(..., N)``,
    with padded slots replaced by ``fill``."""
    parts: List[jnp.ndarray] = []
    for b, view in _bucket_views(x, tree):
        valid = _valid_mask(tree, b)
        parts.append(jnp.where(valid, view, fill).max(axis=-1))
    return jnp.concatenate(parts, axis=-1)
