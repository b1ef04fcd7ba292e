"""ConvNeXt-Tiny backbone in flax, with the PIP-Net stride surgery.

TPU-native re-design of the reference backbone
(``features/convnext_features.py:7-42``): torchvision's ConvNeXt-Tiny with the
classification head removed and every stride-2 downsampling conv whose input
channel count exceeds a threshold re-strided to 1:

* threshold 100 -> 26x26 latent at 224^2 (``convnext_tiny_26``)
* threshold 300 -> 13x13 (``convnext_tiny_13``)
* no surgery   -> 7x7  (``convnext_tiny_7``)

Layout is NHWC throughout (TPU-friendly); convolutions lower to XLA
``conv_general_dilated`` and hit the MXU.  Parameter tree mirrors torchvision's
``features.<i>`` indexing so checkpoints can be imported 1:1
(see ``models/torch_import.py``).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

CONVNEXT_TINY_DEPTHS = (3, 3, 9, 3)
CONVNEXT_TINY_DIMS = (96, 192, 384, 768)


class LayerNorm2d(nn.Module):
    """Channel-last LayerNorm with eps=1e-6 (torchvision LayerNorm2d parity)."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)


def gaussian_window(size: int, sigma: float) -> jnp.ndarray:
    """Normalized 2-D Gaussian window (ref BasicGaussianMultiplierConv2D.
    generate_gaussian_kernel, features/convnext_features.py:65-74)."""
    c = (size - 1) / 2.0
    yy, xx = jnp.mgrid[0:size, 0:size]
    k = jnp.exp(-(((xx - c) ** 2 + (yy - c) ** 2) / (2.0 * sigma ** 2)))
    k = k / (2.0 * jnp.pi * sigma ** 2)
    return k / k.sum()


class CNBlock(nn.Module):
    """ConvNeXt block: dw7x7 -> LN -> MLP(4x, GELU) -> layer-scale -> +residual.

    ``sd_prob`` is the stochastic-depth drop probability ("row" mode: whole
    residual branch dropped per sample during training).

    ``gaussian_multiplier=(sigma, factor)`` reproduces the reference's
    receptive-field-shaping surgery (features/convnext_features.py:44-95):
    the 7x7 depthwise kernel is multiplied by a fixed Gaussian window x factor
    at forward time; the reference reads ``weight.data`` so NO gradient
    reaches the kernel through this path — preserved with stop_gradient.
    """
    dim: int
    sd_prob: float = 0.0
    gaussian_multiplier: Optional[Tuple[float, float]] = None
    fast_gelu: bool = False      # tanh-approximate GELU (erf exact = torchvision parity)
    use_pallas: bool = False     # fused in-VMEM branch kernel (ops/pallas_convnext.py)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        residual = x
        dim = self.dim
        kernel = self.param("dwconv_kernel", nn.initializers.lecun_normal(),
                            (7, 7, 1, dim))
        dw_bias = self.param("dwconv_bias", nn.initializers.zeros, (dim,))
        ln_scale = self.param("norm_scale", nn.initializers.ones, (dim,))
        ln_bias = self.param("norm_bias", nn.initializers.zeros, (dim,))
        w1 = self.param("mlp_in_kernel", nn.initializers.lecun_normal(), (dim, 4 * dim))
        b1 = self.param("mlp_in_bias", nn.initializers.zeros, (4 * dim,))
        w2 = self.param("mlp_out_kernel", nn.initializers.lecun_normal(), (4 * dim, dim))
        b2 = self.param("mlp_out_bias", nn.initializers.zeros, (dim,))
        scale = self.param("layer_scale", nn.initializers.constant(1e-6), (dim,))

        dt = self.dtype
        cast = lambda a: a.astype(dt)
        xd = cast(x)
        if self.gaussian_multiplier is not None:
            sigma, factor = self.gaussian_multiplier
            g = gaussian_window(7, sigma)[:, :, None, None] * factor
            dw_k = jax.lax.stop_gradient(kernel) * g.astype(kernel.dtype)
            dw_b = jax.lax.stop_gradient(dw_bias)
        else:
            dw_k, dw_b = kernel, dw_bias

        if self.use_pallas and self.gaussian_multiplier is None:
            from ..ops.pallas_convnext import make_fused_cnblock
            fused = make_fused_cnblock(fast_gelu=self.fast_gelu)
            h = fused(xd, cast(dw_k[:, :, 0, :]), cast(dw_b), cast(ln_scale),
                      cast(ln_bias), cast(w1), cast(b1), cast(w2), cast(b2),
                      cast(scale))
        else:
            h = jax.lax.conv_general_dilated(
                xd, cast(dw_k), (1, 1), [(3, 3), (3, 3)],
                feature_group_count=dim,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            h = h + cast(dw_b)
            h32 = h.astype(jnp.float32)
            mu = h32.mean(-1, keepdims=True)
            var = ((h32 - mu) ** 2).mean(-1, keepdims=True)
            h = ((h32 - mu) * jax.lax.rsqrt(var + 1e-6)).astype(dt)
            h = h * cast(ln_scale) + cast(ln_bias)
            h = jax.nn.gelu(h @ cast(w1) + cast(b1), approximate=self.fast_gelu)
            h = h @ cast(w2) + cast(b2)
            h = h * cast(scale)

        if train and self.sd_prob > 0.0:
            rng = self.make_rng("droppath")
            keep = 1.0 - self.sd_prob
            mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
            h = jnp.where(mask, h / keep, 0.0)
        return residual + h


class ConvNeXtTiny(nn.Module):
    """ConvNeXt-Tiny feature extractor (no pooling/classifier).

    ``stride_threshold``: downsampling convs with ``in_channels > threshold``
    use stride 1 (keeping their 2x2 kernel VALID padding, so each such stage
    shrinks the map by 1 pixel — this is what produces 26x26 from 224^2).
    """
    stride_threshold: Optional[int] = 100
    stochastic_depth_prob: float = 0.1
    depths: Sequence[int] = CONVNEXT_TINY_DEPTHS
    dims: Sequence[int] = CONVNEXT_TINY_DIMS
    # ref --basic_cnext_gaussian_multiplier 'stages|sigma|factor': 1-based
    # stages whose blocks get the Gaussian-window kernel multiplier
    gaussian_stages: Sequence[int] = ()
    gaussian_sigma: float = 1.0
    gaussian_factor: float = 50.0
    fast_gelu: bool = False
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @property
    def out_channels(self) -> int:
        return self.dims[-1]

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        # stem: conv k4 s4 + LN  (torchvision features.0)
        x = nn.Conv(self.dims[0], kernel_size=(4, 4), strides=(4, 4), padding="VALID",
                    dtype=self.dtype, name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)

        total_blocks = sum(self.depths)
        block_id = 0
        for stage, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if stage > 0:
                in_ch = self.dims[stage - 1]
                stride = 2
                if self.stride_threshold is not None and in_ch > self.stride_threshold:
                    stride = 1
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"down{stage}_norm")(x)
                x = nn.Conv(dim, kernel_size=(2, 2), strides=(stride, stride), padding="VALID",
                            dtype=self.dtype, name=f"down{stage}_conv")(x)
            gm = ((self.gaussian_sigma, self.gaussian_factor)
                  if (stage + 1) in self.gaussian_stages else None)
            for blk in range(depth):
                sd = self.stochastic_depth_prob * block_id / max(total_blocks - 1, 1)
                x = CNBlock(dim, sd_prob=sd, gaussian_multiplier=gm,
                            fast_gelu=self.fast_gelu, use_pallas=self.use_pallas,
                            dtype=self.dtype,
                            name=f"stage{stage}_block{blk}")(x, train=train)
                block_id += 1
        return x


def convnext_tiny_26(dtype=jnp.float32, **kw) -> ConvNeXtTiny:
    return ConvNeXtTiny(stride_threshold=100, dtype=dtype, **kw)


def convnext_tiny_13(dtype=jnp.float32, **kw) -> ConvNeXtTiny:
    return ConvNeXtTiny(stride_threshold=300, dtype=dtype, **kw)


def convnext_tiny_7(dtype=jnp.float32, **kw) -> ConvNeXtTiny:
    return ConvNeXtTiny(stride_threshold=None, dtype=dtype, **kw)


def convnext_param_groups(params: dict) -> dict:
    """Partition parameter paths into the reference optimizer groups
    (``util/args.py:500-515``): last block of stage 4 -> 'train';
    rest of stages 3/4 (torchvision features.6/7) -> 'freeze';
    stages 2/3 (features.4/5) -> 'backbone'; everything earlier -> 'frozen'.

    Returns a dict mapping top-level module name -> group label.
    """
    groups = {}
    for name in params:
        if name == "stage3_block2":                       # torchvision features.7.2
            groups[name] = "train"
        elif name.startswith("stage3") or name == "down3_conv" or name == "down3_norm":
            groups[name] = "freeze"                       # features.7 / features.6
        elif name.startswith("stage2") or name == "down2_conv" or name == "down2_norm":
            groups[name] = "backbone"                     # features.5 / features.4
        else:
            groups[name] = "frozen"                       # stem, stages 1-2 (features.0-3)
    return groups
