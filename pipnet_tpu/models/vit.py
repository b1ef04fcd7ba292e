"""DINOv2-style ViT-S/14 backbone in flax.

Counterpart of the reference's ``DinoV2`` wrapper
(``pipnet/pipnet.py:1121-1132``), which pulls ``dinov2_vits14`` from torch.hub
and reshapes ``x_norm_patchtokens`` to (B, C, H/14, W/14).  Here the ViT is
native flax (MXU-friendly fused attention via dot products) and returns NHWC
patch features; weights import from a DINOv2 checkpoint via
``torch_import.convert_dinov2_vits14``.

Architecture (DINOv2 ViT-S/14): patch embed conv 14x14/s14 -> +cls token +
learned pos embed (bicubic-interpolated to the grid) -> 12 pre-LN blocks
(6-head attention + 4x MLP, both with LayerScale) -> final LN; patch tokens
only are returned.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class Attention(nn.Module):
    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, D = x.shape
        H = self.num_heads
        qkv = nn.Dense(3 * D, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(B, N, 3, H, D // H), 3, axis=2)
        q, k, v = (t[:, :, 0].transpose(0, 2, 1, 3) for t in (q, k, v))  # (B,H,N,hd)
        scale = (D // H) ** -0.5
        attn = jax.nn.softmax(jnp.einsum("bhnd,bhmd->bhnm", q * scale, k), axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
        return nn.Dense(D, dtype=self.dtype, name="proj")(out)


class Block(nn.Module):
    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = Attention(self.dim, self.num_heads, dtype=self.dtype, name="attn")(h)
        ls1 = self.param("ls1", nn.initializers.constant(1e-5), (self.dim,))
        x = x + h * ls1.astype(h.dtype)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(4 * self.dim, dtype=self.dtype, name="mlp_in")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_out")(h)
        ls2 = self.param("ls2", nn.initializers.constant(1e-5), (self.dim,))
        return x + h * ls2.astype(h.dtype)


class DinoV2ViT(nn.Module):
    """Returns NHWC patch features (B, S/14, S/14, dim)."""
    dim: int = 384
    depth: int = 12
    num_heads: int = 6
    patch: int = 14
    pretrain_grid: int = 37      # DINOv2 pos embed trained at 518/14
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        return self.dim

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        del train
        B, S, _, _ = x.shape
        g = S // self.patch
        h = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x)
        h = h.reshape(B, g * g, self.dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, self.pretrain_grid ** 2 + 1, self.dim))
        patch_pos = pos[:, 1:].reshape(1, self.pretrain_grid, self.pretrain_grid,
                                       self.dim)
        if g != self.pretrain_grid:
            patch_pos = jax.image.resize(patch_pos, (1, g, g, self.dim), "bicubic")
        h = h + patch_pos.reshape(1, g * g, self.dim).astype(h.dtype)
        cls_tok = (cls + pos[:, :1]).astype(h.dtype)
        h = jnp.concatenate([jnp.broadcast_to(cls_tok, (B, 1, self.dim)), h], axis=1)
        for i in range(self.depth):
            h = Block(self.dim, self.num_heads, dtype=self.dtype, name=f"block{i}")(h)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(h)
        return h[:, 1:].reshape(B, g, g, self.dim)


def dinov2_vits14(dtype=jnp.float32):
    return DinoV2ViT(dtype=dtype)


def vit_param_groups(params: dict) -> dict:
    """Optimizer partitioning (ref util/args.py:516-524): block 11 + final
    norm -> train; blocks 9-10 -> freeze; rest -> backbone."""
    groups = {}
    for name in params:
        if name in ("block11", "norm"):
            groups[name] = "train"
        elif name in ("block9", "block10"):
            groups[name] = "freeze"
        else:
            groups[name] = "backbone"
    return groups
