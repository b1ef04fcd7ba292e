"""Fused ConvNeXt-block kernel.

The backbone dominates the train step (~85%); each ConvNeXt block's branch —
depthwise 7x7 conv -> LayerNorm -> Dense(4C) -> GELU -> Dense(C) ->
layer-scale — materializes ~1.2 GB of intermediates per block per step at the
CUB-190 flagship shape.  This kernel computes the whole branch for one image
inside VMEM: the depthwise conv is 49 shifted multiply-adds on the VPU, the
LayerNorm reduces over the lane (channel) axis, and the two MLP matmuls run
back-to-back on the MXU — HBM sees only the block input and output (~10x
traffic reduction).

Training uses a ``jax.custom_vjp``: forward is the fused kernel, backward is
the VJP of the identical XLA composition with recompute-from-input (no stored
intermediates), so gradients are exactly those of the unfused block.

STATUS: experimental, off by default.  Measured on v5e (B=64, bf16): the XLA
composition already fuses this block well (stage3 2.3 ms vs 3.1 ms fused;
stage4 4.5 vs 6.2) — the 49-tap sequential depthwise loop on the VPU loses
more than the saved HBM round-trips.  Kept as the starting point for a
properly pipelined variant (vector shifts instead of re-sliced halo reads).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def cnblock_branch_xla(x, dw_kernel, dw_bias, ln_scale, ln_bias,
                       w1, b1, w2, b2, layer_scale, *, fast_gelu: bool):
    """Reference XLA composition of the block branch (flax CNBlock without the
    residual add / stochastic depth)."""
    C = x.shape[-1]
    h = jax.lax.conv_general_dilated(
        x, dw_kernel.reshape(7, 7, 1, C), (1, 1), [(3, 3), (3, 3)],
        feature_group_count=C, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h = h + dw_bias
    h32 = h.astype(jnp.float32)
    mu = h32.mean(-1, keepdims=True)
    var = ((h32 - mu) ** 2).mean(-1, keepdims=True)
    z = ((h32 - mu) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)
    z = z * ln_scale + ln_bias
    h1 = jax.nn.gelu(z @ w1 + b1, approximate=fast_gelu)
    h2 = h1 @ w2 + b2
    return h2 * layer_scale


def _cnblock_kernel(x_ref, dwk_ref, dwb_ref, lns_ref, lnb_ref,
                    w1_ref, b1_ref, w2_ref, b2_ref, ls_ref,
                    out_ref, xpad_ref, *, H: int, W: int, fast_gelu: bool,
                    h_tiles: int):
    """One image per grid step.

    x_ref   (1, H, W, C)     block input
    dwk_ref (7, 8, C)        depthwise kernel, padded 7x7 -> 7x8 sublanes
    vectors (1, C) / (1, 4C)
    out_ref (1, H, W, C)     branch output
    xpad_ref VMEM (H+6, W+6, C) f32 scratch for the halo

    The MLP hidden dim is processed in ``h_tiles`` column tiles so stage-4
    shapes (C=768, hidden=3072) fit in VMEM.
    """
    C = x_ref.shape[-1]
    hidden = w1_ref.shape[1]
    tile = hidden // h_tiles
    x = x_ref[0].astype(jnp.float32)
    # halo-pad into scratch (zeros outside)
    xpad_ref[:] = jnp.zeros_like(xpad_ref)
    xpad_ref[3:3 + H, 3:3 + W, :] = x
    # depthwise 7x7 as 49 shifted multiply-adds (VPU)
    acc = jnp.zeros((H, W, C), jnp.float32)
    for dy in range(7):
        for dx in range(7):
            acc = acc + xpad_ref[dy:dy + H, dx:dx + W, :] * dwk_ref[dy, dx, :]
    acc = acc + dwb_ref[0, :]
    # LayerNorm over channels (lanes)
    mu = acc.mean(axis=-1, keepdims=True)
    var = ((acc - mu) ** 2).mean(axis=-1, keepdims=True)
    z = (acc - mu) * jax.lax.rsqrt(var + 1e-6)
    z = z * lns_ref[0, :] + lnb_ref[0, :]
    # MLP on the MXU, hidden dim tiled
    z2 = z.reshape(H * W, C).astype(x_ref.dtype)
    h2 = jnp.zeros((H * W, C), jnp.float32)
    for t in range(h_tiles):
        sl = slice(t * tile, (t + 1) * tile)
        h1 = jnp.dot(z2, w1_ref[:, sl], preferred_element_type=jnp.float32)
        h1 = h1 + b1_ref[0, sl]
        h1 = jax.nn.gelu(h1, approximate=fast_gelu).astype(x_ref.dtype)
        h2 = h2 + jnp.dot(h1, w2_ref[sl, :], preferred_element_type=jnp.float32)
    h2 = (h2 + b2_ref[0, :]) * ls_ref[0, :]
    out_ref[0] = h2.reshape(H, W, C).astype(out_ref.dtype)


def _fused_forward(x, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2, b2,
                   layer_scale, *, fast_gelu: bool, interpret: bool):
    B, H, W, C = x.shape
    hidden = w1.shape[1]
    # tile the hidden dim so the f32 h1 tile stays under ~4.5 MB of VMEM
    h_tiles = 1
    while (H * W) * (hidden // h_tiles) * 4 > 4_500_000 and hidden % (2 * h_tiles) == 0:
        h_tiles *= 2
    dwk = jnp.pad(dw_kernel, ((0, 0), (0, 1), (0, 0)))       # (7, 8, C) sublane pad
    vec = lambda v: v.reshape(1, -1)
    return pl.pallas_call(
        functools.partial(_cnblock_kernel, H=H, W=W, fast_gelu=fast_gelu,
                          h_tiles=h_tiles),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((7, 8, C), lambda b: (0, 0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
            pl.BlockSpec((C, hidden), lambda b: (0, 0)),
            pl.BlockSpec((1, hidden), lambda b: (0, 0)),
            pl.BlockSpec((hidden, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((H + 6, W + 6, C), jnp.float32)],
        interpret=interpret,
    )(x, dwk, vec(dw_bias), vec(ln_scale), vec(ln_bias),
      w1, vec(b1), w2, vec(b2), vec(layer_scale))


@functools.lru_cache(maxsize=8)
def make_fused_cnblock(fast_gelu: bool = False, interpret: bool = False):
    """Fused block branch with exact gradients (backward = XLA recompute)."""

    @jax.custom_vjp
    def fused(x, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2, b2, ls):
        return _fused_forward(x, dw_kernel, dw_bias, ln_scale, ln_bias,
                              w1, b1, w2, b2, ls,
                              fast_gelu=fast_gelu, interpret=interpret)

    def fwd(*args):
        return fused(*args), args

    def bwd(args, g):
        _, vjp = jax.vjp(
            lambda *a: cnblock_branch_xla(*a, fast_gelu=fast_gelu), *args)
        return vjp(g.astype(args[0].dtype))

    fused.defvjp(fwd, bwd)
    return fused
