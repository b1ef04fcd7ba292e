"""Depthwise 7x7 convolution kernel (the ConvNeXt block's dwconv).

The standalone XLA ``conv_general_dilated(feature_group_count=C)`` costs
3.4-5 ms at every ConvNeXt-26 stage shape while a depthwise conv is
nominally memory-bound (~0.2 ms of HBM traffic at stage-1 shape): this
kernel streams each image's halo-padded block through VMEM once and does
the 49 taps as shifted multiply-accumulates on the VPU.

The backward pass reuses the same kernel: dL/dx is the depthwise conv of the
padded cotangent with the spatially-flipped kernel; dL/dw is a 49-tap
windowed reduction done as one fused XLA contraction per tap over the saved
input (cheap: output is only (49, C)).

Exactness: identical (max |diff| == 0 in f32) to the XLA grouped conv —
asserted in tests/test_pallas_dwconv.py for values and gradients.

STATUS: experimental, OFF — a negative result, recorded so it is not
re-attempted blindly.  Measured on v5e at stage-1 shape (128, 56², 96):
XLA grouped fwd 3.7 ms vs this kernel 6.9 ms; in-graph (fused with the
surrounding block) XLA's dwconv costs only ~2.5 ms/block fwd+bwd (measured
by center-tap ablation over the whole backbone: 169.5 -> 124.8 ms fwd+bwd,
i.e. ~45 ms across all 18 blocks).  The 49-tap VPU loop's floor
(~1 T MAC/s -> ~2 ms fwd) cannot beat that by enough to matter, and two
other formulations also lose: a banded-Toeplitz batched matmul
(einsum "bhwc,cwo->bohc" per row-tap; 3.5-10.5 ms — XLA's batching
transposes dominate) and a sublane-roll variant (Mosaic cannot lower
dynamic_rotate on 3-D tiles).  The non-dwconv backbone fwd is AT the MXU
roofline (34.8 ms measured vs ~33 ms FLOP floor at B=128), so the whole
backbone has <= ~45 ms of theoretical headroom, reachable only with a
dwconv at VPU/memory floor that no available lowering achieves here.

This replaces the hot loop of the reference's torchvision ConvNeXt blocks
(``features/convnext_features.py:7-42`` -> torchvision CNBlock).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def dwconv_xla(x, kernel):
    """Reference XLA grouped conv.  x (B, H, W, C), kernel (7, 7, C)."""
    C = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, kernel.reshape(7, 7, 1, C), (1, 1), [(3, 3), (3, 3)],
        feature_group_count=C, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _dw_kernel(xp_ref, k_ref, out_ref, *, H: int, W: int):
    """One image per grid step.  xp_ref (1, H+6, W+6, C) halo-padded input,
    k_ref (8, 8, C) sublane-padded 7x7 weights, out_ref (1, H, W, C)."""
    acc = jnp.zeros((H, W, xp_ref.shape[-1]), jnp.float32)
    for dy in range(7):
        for dx in range(7):
            acc += (xp_ref[0, dy:dy + H, dx:dx + W, :].astype(jnp.float32)
                    * k_ref[dy, dx, :].astype(jnp.float32))
    out_ref[0] = acc.astype(out_ref.dtype)


def _dwconv_fwd_impl(x, kernel, *, interpret: bool = False):
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    kp = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0)))      # (8, 8, C)
    return pl.pallas_call(
        functools.partial(_dw_kernel, H=H, W=W),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H + 6, W + 6, C), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((8, 8, C), lambda b: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(xp, kp)


def _dw_weight_grad(x, g):
    """dL/dkernel (7, 7, C): per-tap windowed contraction
    dw[dy, dx, c] = sum_{b,y,x} xp[b, y+dy, x+dx, c] · g[b, y, x, c]."""
    B, H, W, C = x.shape
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (3, 3), (3, 3), (0, 0)))
    g32 = g.astype(jnp.float32)
    rows = []
    for dy in range(7):
        row = []
        for dx in range(7):
            win = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (B, H, W, C))
            row.append(jnp.sum(win * g32, axis=(0, 1, 2)))
        rows.append(jnp.stack(row))
    return jnp.stack(rows)                                # (7, 7, C)


@functools.lru_cache(maxsize=4)
def make_dwconv7x7(interpret: bool = False):
    """Depthwise 7x7 'SAME' conv (B, H, W, C) with exact custom VJP."""

    @jax.custom_vjp
    def dwconv(x, kernel):
        return _dwconv_fwd_impl(x, kernel, interpret=interpret)

    def fwd(x, kernel):
        return dwconv(x, kernel), (x, kernel)

    def bwd(res, g):
        x, kernel = res
        g = g.astype(x.dtype)
        # dx: depthwise conv of g with the spatially-flipped kernel
        dx = _dwconv_fwd_impl(g, kernel[::-1, ::-1, :], interpret=interpret)
        dw = _dw_weight_grad(x, g).astype(kernel.dtype)
        return dx, dw

    dwconv.defvjp(fwd, bwd)
    return dwconv
