"""Fused depthwise 7x7 convolution (Pallas, TPU).

The ConvNeXt depthwise conv is the non-MXU cost of stages 1/2 (the MLP
matmuls there are small, so XLA's conv lowering dominates the block: stage1
runs at ~24% utilization while stages 3/4 sit at the matmul roofline —
BENCH_NOTES round-2 audit).  This kernel computes the 7x7 depthwise conv for
one image per grid cell entirely in VMEM:

* the halo-padded input lives in a VMEM scratch laid out (H, W, C) with C on
  lanes and W on sublanes;
* the 49 taps become H-slices (free) x ``pltpu.roll`` along the W sublanes
  (cheap, lane-preserving) — the round-1 attempt's dynamically re-sliced
  halo reads forced a Mosaic relayout per tap, which is why it lost to XLA
  (ops/pallas_convnext.py STATUS note);
* accumulation in f32 registers, one bf16 write.

Backward is exact: dx is the same kernel run with the spatially-flipped
7x7 weights (stride-1 SAME self-adjointness); dk is a 49-tap reduction kernel
accumulating (7, 8, C) weight gradients across the image grid in a revisited
output block; db is a plain XLA sum.

Reference counterpart: the torchvision ConvNeXt block's depthwise conv
(features/convnext_features.py via torchvision CNBlock); numerics match
``jax.lax.conv_general_dilated`` with feature_group_count=C to f32 accuracy
(tests/test_interp.py::TestPallasDwConv).

STATUS: experimental, NOT wired into the model.  Measured on v5e-1 (B=128,
bf16): XLA's conv lowering wins at every stage shape — fwd+bwd
pallas/xla ms: stage1 21.0/5.9, stage2 10.8/6.3, stage3 15.3/5.5,
stage4 33.1/6.5.  The 49 sublane rolls move ~65 MB/image through VMEM,
which costs more than XLA's native conv pays in HBM.  Conclusion recorded
so round 3 doesn't retry shift-based dwconv: the depthwise conv is NOT the
stage-1/2 bottleneck (XLA does it in ~6 ms fwd+bwd); the remaining stage-1/2
gap vs roofline is layout/padding-bound (C=96/192 lane padding), not
conv-bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(x_ref, k_ref, out_ref, xpad_ref, *, H: int, W: int):
    """x_ref (1,H,W,C) -> out_ref (1,H,W,C); k_ref (8,8,C) zero-padded 7x7.

    xpad_ref: VMEM scratch (H+6, Wp, C) f32 where Wp = W+6 rounded up to the
    sublane multiple (zero-filled right edge acts as halo padding).
    """
    Wp = xpad_ref.shape[1]
    xpad_ref[:] = jnp.zeros_like(xpad_ref)
    xpad_ref[3:3 + H, 3:3 + W, :] = x_ref[0].astype(jnp.float32)
    acc = jnp.zeros((H, Wp, x_ref.shape[-1]), jnp.float32)
    for dy in range(7):
        slab = xpad_ref[dy:dy + H, :, :]
        for dx in range(7):
            # left-shift by dx == roll right by Wp-dx (pltpu.roll requires a
            # non-negative shift); wrapped columns land at >= Wp-dx >= W,
            # outside the final [:, :W] take
            shifted = pltpu.roll(slab, shift=Wp - dx, axis=1) if dx else slab
            acc = acc + shifted * k_ref[dy, dx, :]
    out_ref[0] = acc[:, :W, :].astype(out_ref.dtype)


def _dk_kernel(x_ref, g_ref, dk_ref, xpad_ref, *, H: int, W: int):
    """Weight gradient: dk[dy,dx,c] = sum_{b,h,w} xpad[h+dy, w+dx, c] * g[h,w,c].

    Accumulates across the image grid in the revisited (8,8,C) output block.
    """
    b = pl.program_id(0)
    Wp = xpad_ref.shape[1]
    xpad_ref[:] = jnp.zeros_like(xpad_ref)
    xpad_ref[3:3 + H, 3:3 + W, :] = x_ref[0].astype(jnp.float32)
    g = jnp.pad(g_ref[0].astype(jnp.float32), ((0, 0), (0, Wp - W), (0, 0)))

    @pl.when(b == 0)
    def _():
        dk_ref[:] = jnp.zeros_like(dk_ref)

    for dy in range(7):
        slab = xpad_ref[dy:dy + H, :, :]
        for dx in range(7):
            shifted = pltpu.roll(slab, shift=Wp - dx, axis=1) if dx else slab
            dk_ref[dy, dx, :] += jnp.sum(shifted * g, axis=(0, 1))


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _dwconv_fwd_call(x: jnp.ndarray, k77c: jnp.ndarray, *, interpret: bool):
    B, H, W, C = x.shape
    kpad = jnp.zeros((8, 8, C), jnp.float32).at[:7, :7, :].set(
        k77c.astype(jnp.float32))
    Wp = _round_up(W + 6, 8)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, H=H, W=W),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0)),
                  pl.BlockSpec((8, 8, C), lambda b: (0, 0, 0))],
        out_specs=pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((H + 6, Wp, C), jnp.float32)],
        interpret=interpret,
    )(x, kpad)


def _dwconv_dk_call(x: jnp.ndarray, g: jnp.ndarray, *, interpret: bool):
    B, H, W, C = x.shape
    Wp = _round_up(W + 6, 8)
    dk = pl.pallas_call(
        functools.partial(_dk_kernel, H=H, W=W),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0)),
                  pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0))],
        out_specs=pl.BlockSpec((8, 8, C), lambda b: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 8, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((H + 6, Wp, C), jnp.float32)],
        interpret=interpret,
    )(x, g)
    return dk[:7, :7, :]


@functools.lru_cache(maxsize=4)
def make_dwconv7(interpret: bool = False):
    """Returns ``dw(x (B,H,W,C), kernel (7,7,C)) -> (B,H,W,C)`` (SAME padding,
    stride 1) with an exact custom VJP, all three passes as Pallas kernels."""

    @jax.custom_vjp
    def dw(x, k):
        return _dwconv_fwd_call(x, k, interpret=interpret)

    def fwd(x, k):
        return dw(x, k), (x, k)

    def bwd(res, g):
        x, k = res
        # input grad: conv of g with the spatially flipped kernel
        dx = _dwconv_fwd_call(g.astype(x.dtype), k[::-1, ::-1, :],
                              interpret=interpret)
        dk = _dwconv_dk_call(x, g, interpret=interpret)
        return dx, dk.astype(k.dtype)

    dw.defvjp(fwd, bwd)
    return dw


def dwconv7_xla(x: jnp.ndarray, k77c: jnp.ndarray) -> jnp.ndarray:
    """Reference XLA composition (identical math)."""
    C = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, k77c.reshape(7, 7, 1, C).astype(x.dtype), (1, 1),
        [(3, 3), (3, 3)], feature_group_count=C,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
