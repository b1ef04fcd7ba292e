"""Fused Pallas prototype-head kernel.

The hot head computation (BASELINE.json north star) — stacked 1x1 add-on conv
-> per-node softmax over the prototype dim per patch -> global max-pool —
fused into one TPU kernel: per grid cell the kernel loads one image's feature
block and one prototype-column tile into VMEM, runs the matmul on the MXU,
normalizes per node *in registers/VMEM*, reduces the spatial max, and writes
both the softmaxed maps and the pooled vector.  This removes the HBM
round-trips between conv, softmax and pool that the XLA composition pays
(z write+read ~0.7 GB/step at CUB-190 scale).

Segment softmax inside a tile uses the shift-invariance of softmax: any
per-row constant can center the exponentials, so a per-row max over the whole
tile (one lane reduction) replaces ragged per-segment maxima; per-segment
sums and their broadcast back are two tiny MXU matmuls against a static
one-hot segment matrix.  Tiles are sized to whole nodes (tile width = k *
bucket width), so segments never straddle tiles.

Use via ``fused_head_forward`` (drop-in for the XLA path on matching configs:
plain conv add-on, per-node softmax, no focal/multiply_cs).  Training uses a
``jax.custom_vjp`` whose backward recomputes z from the residual (features,
kernel) — no extra activation storage.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tree.compile import TreeArrays


def _plan_tiles(tree: TreeArrays, target: Optional[int] = None,
                max_tile_w: int = 2048) -> Optional[list]:
    """Per-bucket tile plan with Mosaic-legal widths.

    Tile width must be node-aligned (multiple of the bucket width) AND
    lane-aligned (multiple of 128), so it is a multiple of lcm(W, 128) —
    e.g. W=20 -> 640.  Buckets whose lcm exceeds ``max_tile_w`` fall back to a
    single whole-bucket tile when it fits VMEM; otherwise returns None and the
    caller should use the XLA composition.
    """
    import math
    import os
    if target is None:
        # tuning knob; 512 measured best at the flagship layout (sweep in
        # BENCH_NOTES) but other trees may prefer other widths
        target = int(os.environ.get("PIPNET_HEAD_TILE_TARGET", 512))
    plans = []
    for b in tree.buckets:
        base = math.lcm(b.width, 128)
        if base <= max_tile_w:
            tile_w = base * max(1, target // base)
            nodes_per_tile = tile_w // b.width
            n_tiles = -(-b.num_nodes // nodes_per_tile)
        else:
            span = b.num_nodes * b.width
            if span % 128 != 0 or span > 4096:
                return None
            tile_w, nodes_per_tile, n_tiles = span, b.num_nodes, 1
        plans.append(dict(offset=b.proto_offset, width=b.width,
                          nodes_per_tile=nodes_per_tile, tile_w=tile_w,
                          n_tiles=n_tiles, num_nodes=b.num_nodes))
    return plans


def _head_kernel(f_ref, k_ref, oh_ref, valid_ref, pf_ref,
                 pooled_ref, *, tau: float):
    """One (image, tile) cell: z = F @ K; segment softmax; spatial max-pool.

    f_ref:      (1, HW, D)    features of one image
    k_ref:      (D, TW)       kernel tile
    oh_ref:     (TW, NS)      prototype->segment one-hot (NS = padded node
                              count of the tile); per-segment sums and their
                              broadcast-back are two SKINNY matmuls
                              (TWxNS + NSxTW) instead of the earlier (TW,TW)
                              block-diagonal, which cost as much MXU work as
                              the conv itself
    valid_ref:  (1, TW)       1.0 for real prototype slots
    pf_ref:     (1, HW, TW)   softmaxed maps out
    pooled_ref: (1, 1, TW)    max-pooled out
    """
    f = f_ref[0]
    k = k_ref[:]
    z = jnp.dot(f, k, preferred_element_type=jnp.float32) * (1.0 / tau)
    valid = valid_ref[0, :]
    z = jnp.where(valid > 0, z, -1e30)
    # shift by the per-row tile max (softmax is shift-invariant per segment)
    c = jnp.max(z, axis=1, keepdims=True)
    e = jnp.exp(z - c)
    e = jnp.where(valid > 0, e, 0.0)
    oh = oh_ref[:]
    seg = jnp.dot(e, oh, preferred_element_type=jnp.float32)      # (HW, NS)
    denom = jnp.dot(seg, oh.T, preferred_element_type=jnp.float32)
    p = e / jnp.maximum(denom, 1e-18)
    pf_ref[0] = p.astype(pf_ref.dtype)
    pooled_ref[0, 0, :] = jnp.max(p, axis=0).astype(pooled_ref.dtype)


def _run_bucket(features2d: jnp.ndarray, kernel: jnp.ndarray,
                tree: TreeArrays, plan: dict, tau: float,
                interpret: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """features2d (B, HW, D); kernel slice for this bucket; returns
    (pf (B, HW, TWtot), pooled (B, TWtot)) for the bucket's padded span."""
    B, HW, D = features2d.shape
    tw, npt, ntiles = plan["tile_w"], plan["nodes_per_tile"], plan["n_tiles"]
    span = tw * ntiles
    # pad the kernel slice and validity to the tile span
    off = plan["offset"]
    k = jax.lax.dynamic_slice_in_dim(kernel, off, min(span, kernel.shape[1] - off), axis=1)
    if k.shape[1] < span:
        k = jnp.pad(k, ((0, 0), (0, span - k.shape[1])))
    valid = np.zeros((1, span), np.float32)
    real = tree.proto_valid[off: off + min(span, tree.num_protos_padded - off)]
    valid[0, : len(real)] = real
    # per-tile prototype->segment one-hot, node axis padded to a full lane set
    ns = max(128, -(-npt // 128) * 128)
    oh = np.zeros((tw, ns), np.float32)
    for s in range(npt):
        oh[s * plan["width"]:(s + 1) * plan["width"], s] = 1.0

    grid = (B, ntiles)
    out_shape = (jax.ShapeDtypeStruct((B, HW, span), features2d.dtype),
                 jax.ShapeDtypeStruct((B, 1, span), jnp.float32))
    # round-5 VMEM-budget lever (BENCH_NOTES round-5 head study): both grid
    # dims are independent, and a raised VMEM ceiling admits wider tiles;
    # env knobs so the sweep needs no rebuild.  compiler_params is passed
    # ONLY when a knob is set: an explicit all-default CompilerParams wedged
    # the axon tunnel's remote Mosaic compile (two hung launches, round 5)
    import os as _os
    _vl = _os.environ.get("PIPNET_HEAD_VMEM_LIMIT")
    _par = _os.environ.get("PIPNET_HEAD_PARALLEL_GRID") == "1"
    extra = {}
    if _vl or _par:
        extra["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel") if _par else None,
            vmem_limit_bytes=int(_vl) if _vl else None)
    pf, pooled = pl.pallas_call(
        functools.partial(_head_kernel, tau=tau),
        grid=grid,
        **extra,
        in_specs=[
            pl.BlockSpec((1, HW, D), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((D, tw), lambda b, j: (0, j)),
            pl.BlockSpec((tw, ns), lambda b, j: (0, 0)),
            pl.BlockSpec((1, tw), lambda b, j: (0, j)),
        ],
        out_specs=(
            pl.BlockSpec((1, HW, tw), lambda b, j: (b, 0, j)),
            pl.BlockSpec((1, 1, tw), lambda b, j: (b, 0, j)),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(features2d, k, jnp.asarray(oh), jnp.asarray(valid))
    return pf, pooled[:, 0, :]


def fused_head_forward(features: jnp.ndarray, kernel: jnp.ndarray,
                       tree: TreeArrays, *, tau: float = 1.0,
                       interpret: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused conv+softmax+maxpool.

    features (B, H, W, D), kernel (D, P) -> (pf (B, H, W, P), pooled (B, P)).
    Matches ``segment_softmax(features @ kernel / ..)`` + spatial max
    (the XLA reference composition) to ~1e-6.
    """
    B, H, W, D = features.shape
    P = tree.num_protos_padded
    f2 = features.reshape(B, H * W, D)
    plans = _plan_tiles(tree)
    if plans is None:
        raise ValueError("tree layout not tileable for the fused head; use the "
                         "XLA composition (segment_softmax) instead")
    pf_parts, pooled_parts = [], []
    covered = 0
    for plan in plans:
        pf_b, pooled_b = _run_bucket(f2, kernel, tree, plan, tau, interpret)
        span_real = plan["num_nodes"] * plan["width"]
        pf_parts.append(pf_b[:, :, :span_real])
        pooled_parts.append(pooled_b[:, :span_real])
        covered = plan["offset"] + span_real
    pf = jnp.concatenate(pf_parts, axis=-1)
    pooled = jnp.concatenate(pooled_parts, axis=-1)
    if covered < P:
        pf = jnp.pad(pf, ((0, 0), (0, 0), (0, P - covered)))
        pooled = jnp.pad(pooled, ((0, 0), (0, P - covered)))
    return pf.reshape(B, H, W, P), pooled


# ---------------------------------------------------------------------------
# no-pf variant: pooled + align_pf's per-node cross-view log-reductions
# in-kernel, never writing the (B, H, W, P) softmaxed maps to HBM
# ---------------------------------------------------------------------------


def _head_nopf_kernel(f1_ref, f2_ref, k_ref, oh_ref, valid_ref,
                      pooled1_ref, pooled2_ref, logsum_ref,
                      *, tau: float, eps: float):
    """One (image-pair, tile) cell: both views' softmaxed maps stay in VMEM;
    outputs are the two pooled vectors plus align_pf's per-node patch
    reduction  logsum[n] = sum_hw log(sum_{p in n} pf1*pf2 + eps)
    (the CARL inner product of ref pipnet/train.py:1063-1074, log applied
    per patch).  The (HW, TW) maps are never written out."""
    k = k_ref[:]
    oh = oh_ref[:]
    valid = valid_ref[0, :]

    def softmaxed(f):
        z = jnp.dot(f, k, preferred_element_type=jnp.float32) * (1.0 / tau)
        z = jnp.where(valid > 0, z, -1e30)
        c = jnp.max(z, axis=1, keepdims=True)
        e = jnp.exp(z - c)
        e = jnp.where(valid > 0, e, 0.0)
        seg = jnp.dot(e, oh, preferred_element_type=jnp.float32)
        denom = jnp.dot(seg, oh.T, preferred_element_type=jnp.float32)
        return e / jnp.maximum(denom, 1e-18)

    p1 = softmaxed(f1_ref[0])
    p2 = softmaxed(f2_ref[0])
    pooled1_ref[0, 0, :] = jnp.max(p1, axis=0).astype(pooled1_ref.dtype)
    pooled2_ref[0, 0, :] = jnp.max(p2, axis=0).astype(pooled2_ref.dtype)
    ip = jnp.dot(p1 * p2, oh, preferred_element_type=jnp.float32)   # (HW, NS)
    logsum_ref[0, 0, :] = jnp.sum(jnp.log(ip + eps), axis=0)


def _run_bucket_nopf(f1: jnp.ndarray, f2: jnp.ndarray, kernel: jnp.ndarray,
                     tree: TreeArrays, plan: dict, tau: float, eps: float,
                     interpret: bool):
    B, HW, D = f1.shape
    tw, npt, ntiles = plan["tile_w"], plan["nodes_per_tile"], plan["n_tiles"]
    span = tw * ntiles
    off = plan["offset"]
    k = jax.lax.dynamic_slice_in_dim(kernel, off,
                                     min(span, kernel.shape[1] - off), axis=1)
    if k.shape[1] < span:
        k = jnp.pad(k, ((0, 0), (0, span - k.shape[1])))
    valid = np.zeros((1, span), np.float32)
    real = tree.proto_valid[off: off + min(span, tree.num_protos_padded - off)]
    valid[0, : len(real)] = real
    ns = max(128, -(-npt // 128) * 128)
    oh = np.zeros((tw, ns), np.float32)
    for s in range(npt):
        oh[s * plan["width"]:(s + 1) * plan["width"], s] = 1.0

    # logsum rows are laid out (B*ntiles, 1, ns): a (1, 1, ns) block over a
    # (B, ntiles, ns) array is ILLEGAL Mosaic when ntiles > 1 (the
    # second-to-last BLOCK dim must divide 8 or equal the array dim), so the
    # (b, j) grid cell instead owns whole row b*ntiles+j of the flat layout
    out_shape = (jax.ShapeDtypeStruct((B, 1, span), jnp.float32),
                 jax.ShapeDtypeStruct((B, 1, span), jnp.float32),
                 jax.ShapeDtypeStruct((B * ntiles, 1, ns), jnp.float32))
    pooled1, pooled2, logsum = pl.pallas_call(
        functools.partial(_head_nopf_kernel, tau=tau, eps=eps),
        grid=(B, ntiles),
        in_specs=[
            pl.BlockSpec((1, HW, D), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, HW, D), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((D, tw), lambda b, j: (0, j)),
            pl.BlockSpec((tw, ns), lambda b, j: (0, 0)),
            pl.BlockSpec((1, tw), lambda b, j: (0, j)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, tw), lambda b, j: (b, 0, j)),
            pl.BlockSpec((1, 1, tw), lambda b, j: (b, 0, j)),
            pl.BlockSpec((1, 1, ns), lambda b, j: (b * ntiles + j, 0, 0)),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(f1, f2, k, jnp.asarray(oh), jnp.asarray(valid))
    # tile-local segments -> bucket node order
    logsum = logsum.reshape(B, ntiles, ns)[:, :, :npt]
    logsum = logsum.reshape(B, ntiles * npt)[:, :plan["num_nodes"]]
    return pooled1[:, 0, :], pooled2[:, 0, :], logsum


def fused_head_nopf_forward(features: jnp.ndarray, kernel: jnp.ndarray,
                            tree: TreeArrays, *, tau: float = 1.0,
                            eps: float = 1e-12, interpret: bool = False
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """features (2B, H, W, D) — two stacked views — and kernel (D, P) ->
    (pooled (2B, P) f32, logsum (B, N) f32) without materializing pf.

    logsum[b, n] = sum_hw log(sum_{p in n} pf[b]*pf[b+B] + eps): exactly the
    per-patch CARL term of align_pf (losses/catalog.py:align_pf_loss) before
    the in-batch masking/normalization, which stays in the loss fn."""
    B2, H, W, D = features.shape
    B = B2 // 2
    P = tree.num_protos_padded
    f1 = features[:B].reshape(B, H * W, D)
    f2 = features[B2 - B:].reshape(B, H * W, D)
    plans = _plan_tiles(tree)
    if plans is None:
        raise ValueError("tree layout not tileable for the fused head")
    p1_parts, p2_parts, ls_parts, node_ids = [], [], [], []
    covered = 0
    for plan in plans:
        p1b, p2b, lsb = _run_bucket_nopf(f1, f2, kernel, tree, plan, tau, eps,
                                         interpret)
        span_real = plan["num_nodes"] * plan["width"]
        p1_parts.append(p1b[:, :span_real])
        p2_parts.append(p2b[:, :span_real])
        ls_parts.append(lsb)
        node_ids.extend(int(tree.proto_node[plan["offset"] + i * plan["width"]])
                        for i in range(plan["num_nodes"]))
        covered = plan["offset"] + span_real
    pooled1 = jnp.concatenate(p1_parts, axis=-1)
    pooled2 = jnp.concatenate(p2_parts, axis=-1)
    if covered < P:
        pooled1 = jnp.pad(pooled1, ((0, 0), (0, P - covered)))
        pooled2 = jnp.pad(pooled2, ((0, 0), (0, P - covered)))
    pooled = jnp.concatenate([pooled1, pooled2], axis=0)
    ls = jnp.concatenate(ls_parts, axis=-1)
    logsum = jnp.zeros((B, tree.num_nodes), jnp.float32)
    logsum = logsum.at[:, jnp.asarray(np.asarray(node_ids))].set(ls)
    return pooled, logsum


def make_fused_head_nopf(tree: TreeArrays, tau: float = 1.0,
                         eps: float = 1e-12, interpret: bool = False):
    """(features (2B,H,W,D), kernel) -> (pooled, logsum) with a custom VJP.

    Forward: the no-pf Mosaic kernel above — saves the pf HBM write (~0.7 GB
    at flagship shape) AND the loss-side pf1*pf2 elementwise + einsum over
    (B,H,W,P).  Backward recomputes pf once in XLA (flash-attention style:
    recompute beats storing) and applies the analytic adjoints.  The align_pf
    stop-grad symmetrization 0.5*(pf1*sg(pf2)) + 0.5*(sg(pf1)*pf2) (ref
    pipnet/train.py:1063-1074) is baked into d logsum/d pf: each view gets
    half the inner-product cotangent."""
    from .segment import _node_onehot, segment_softmax

    onehot = _node_onehot(tree)

    @jax.custom_vjp
    def fused(features, kernel):
        return fused_head_nopf_forward(features, kernel, tree, tau=tau,
                                       eps=eps, interpret=interpret)

    def fwd(features, kernel):
        out = fused_head_nopf_forward(features, kernel, tree, tau=tau,
                                      eps=eps, interpret=interpret)
        return out, (features, kernel)

    def bwd(res, cts):
        features, kernel = res
        g_pooled, g_logsum = cts
        B = features.shape[0] // 2
        ct = features.dtype
        # recompute the softmaxed maps ONCE (the forward stored nothing)
        z = features @ kernel.astype(features.dtype)
        pf = segment_softmax(z, tree, tau=tau,
                             precise=features.dtype == jnp.float32)
        oh = jnp.asarray(onehot, ct)
        pf1, pf2 = pf[:B], pf[B:]
        ip = jnp.matmul(pf1 * pf2, oh,
                        preferred_element_type=jnp.float32)     # (B,H,W,N)
        gip = (g_logsum[:, None, None, :] / (ip + eps))
        gseg = jnp.matmul(gip.astype(ct), oh.T,
                          preferred_element_type=jnp.float32).astype(ct)
        g_pf = jnp.concatenate([0.5 * gseg * pf2, 0.5 * gseg * pf1], axis=0)
        # pooled cotangent routed to the spatial argmax (ties split evenly);
        # recompute max from pf itself for dtype-safety (see make_fused_head)
        is_max = (pf == jnp.max(pf, axis=(1, 2), keepdims=True)).astype(ct)
        counts = jnp.maximum(is_max.sum(axis=(1, 2), keepdims=True)
                             .astype(jnp.float32), 1.0)
        g_tot = g_pf + is_max / counts.astype(ct) * g_pooled[:, None, None, :].astype(ct)
        inner = jnp.matmul(g_tot * pf, oh,
                           preferred_element_type=jnp.float32)
        dz = pf * (g_tot - jnp.matmul(inner.astype(ct), oh.T,
                                      preferred_element_type=jnp.float32
                                      ).astype(ct)) * jnp.asarray(1.0 / tau, ct)
        dz = dz.astype(features.dtype)
        f2d = features.reshape(-1, features.shape[-1])
        dz2 = dz.reshape(-1, dz.shape[-1])
        dF = (dz2 @ kernel.T.astype(dz2.dtype)).reshape(features.shape)
        dK = jnp.matmul(f2d.T, dz2, preferred_element_type=jnp.float32)
        return dF, dK.astype(kernel.dtype)

    fused.defvjp(fwd, bwd)
    return fused


# ---------------------------------------------------------------------------
# training-ready wrapper: fused Pallas forward + analytic XLA backward
# ---------------------------------------------------------------------------

def make_fused_head(tree: TreeArrays, tau: float = 1.0,
                    interpret: bool = False):
    """Returns fused(features, kernel) -> (pf, pooled) with a custom VJP.

    Forward runs the fused Mosaic kernel; backward is the analytic softmax /
    max-pool adjoint in plain XLA using the kernel's own outputs as residuals
    (no extra activation storage):

        g_tot = g_pf + route(g_pooled to spatial argmax, ties split evenly)
        dz    = p * (g_tot - broadcast_seg(sum_seg(g_tot * p))) / tau
        dF    = dz @ K^T ;  dK = F^T @ dz
    """
    from .segment import _node_onehot

    onehot = _node_onehot(tree)

    @jax.custom_vjp
    def fused(features, kernel):
        return fused_head_forward(features, kernel, tree, tau=tau,
                                  interpret=interpret)

    def fwd(features, kernel):
        pf, pooled = fused_head_forward(features, kernel, tree, tau=tau,
                                        interpret=interpret)
        return (pf, pooled), (features, kernel, pf, pooled)

    def bwd(res, cts):
        features, kernel, pf, pooled = res
        del pooled  # see below: max is recomputed from pf for dtype-safety
        g_pf, g_pooled = cts
        B, H, W, P = pf.shape
        # adjoint runs in the COMPUTE dtype (bf16 in training): the (B,H,W,P)
        # cotangent tensors are ~0.7 GB each at flagship shape, and an f32
        # adjoint pays 2x the HBM traffic for precision far below gradient
        # noise (grad-parity guarded by
        # tests/test_interp.py::test_fused_vjp_bf16_matches_xla)
        ct = pf.dtype
        # route the pooled cotangent to the spatial argmax (ties split evenly,
        # matching jnp.max's VJP).  The max MUST be recomputed from pf itself:
        # pf is stored in the compute dtype while the kernel's pooled output
        # is f32, so `pf == pooled` almost never holds under bf16 rounding and
        # would silently drop the pooled gradient (advisor finding, round 1).
        # Comparing pf against its own max is exact in any dtype.
        is_max = (pf == jnp.max(pf, axis=(1, 2), keepdims=True)).astype(ct)
        counts = jnp.maximum(is_max.sum(axis=(1, 2), keepdims=True)
                             .astype(jnp.float32), 1.0)
        g_tot = g_pf.astype(ct) + (is_max / counts.astype(ct)
                                   * g_pooled[:, None, None, :].astype(ct))
        # segment softmax adjoint; per-node inner products accumulate in f32
        # on the MXU (preferred_element_type), stored small (B,H,W,N)
        oh = jnp.asarray(onehot, ct)
        inner = jnp.matmul(g_tot * pf, oh,
                           preferred_element_type=jnp.float32)   # (B,H,W,N)
        dz = pf * (g_tot - jnp.matmul(inner.astype(ct), oh.T,
                                      preferred_element_type=jnp.float32
                                      ).astype(ct)) * jnp.asarray(1.0 / tau, ct)
        dz = dz.astype(features.dtype)
        f2 = features.reshape(-1, features.shape[-1])
        dz2 = dz.reshape(-1, P)
        dF = (dz2 @ kernel.T).reshape(features.shape)
        dK = jnp.matmul(f2.T, dz2, preferred_element_type=jnp.float32)
        return dF, dK.astype(kernel.dtype)

    fused.defvjp(fwd, bwd)
    return fused


def head_supports_fusion(cfg, tree: Optional[TreeArrays] = None) -> bool:
    """The fused kernel covers the flagship head semantics: plain conv add-on
    with per-node temperature softmax (no bias/focal/cosine/gumbel variants);
    with ``tree`` given, also requires a Mosaic-tileable prototype layout."""
    ok = (cfg.add_on_type == "conv" and not cfg.add_on_bias
          and cfg.softmax_tau is not None and not cfg.softmax_over_channel
          and not cfg.multiply_cs_softmax and not cfg.gumbel_softmax
          and not cfg.focal)
    if ok and tree is not None:
        ok = _plan_tiles(tree) is not None
    return ok
