"""Maximum inner-product search (MIPS) over latent patches.

Counterpart of the reference's MIPS notebooks (``MIPS.ipynb``,
``MIPS-Stage1.ipynb``): build an index of backbone patch embeddings over a
loader and retrieve, for arbitrary query vectors (e.g. prototype kernels),
the top-k (image, patch location) pairs by inner product or cosine
similarity.  The scoring is one MXU matmul + top_k per query block."""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.pipnet import PIPNet


@dataclasses.dataclass
class PatchIndex:
    features: np.ndarray      # (n_patches, D) float32
    image_idx: np.ndarray     # (n_patches,) int32
    h_idx: np.ndarray         # (n_patches,)
    w_idx: np.ndarray         # (n_patches,)
    latent_hw: Tuple[int, int]

    def __len__(self):
        return len(self.features)


def build_patch_index(model: PIPNet, params, batch_stats, loader,
                      *, max_images: Optional[int] = None,
                      batch_size: int = 16) -> PatchIndex:
    """Sweep a loader collecting every image's patch embeddings."""
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    feat_fn = jax.jit(lambda xs: model.apply(
        variables, xs, train=False,
        method=lambda m, x, train: m.features(x, train=train)))
    feats, imgs, hs, ws = [], [], [], []
    count = 0
    buf = []

    def flush():
        nonlocal count
        if not buf:
            return None
        xs = jnp.asarray(np.stack(buf))
        f = np.asarray(feat_fn(xs))                     # (b, H, W, D)
        b, H, W, D = f.shape
        feats.append(f.reshape(-1, D))
        hh, ww = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        for _ in range(b):
            imgs.append(np.full(H * W, count, np.int32))
            hs.append(hh.ravel())
            ws.append(ww.ravel())
            count += 1
        buf.clear()
        return (H, W)

    latent_hw = None
    for batch in loader.epoch(0):
        for i in range(len(batch.ys)):
            if max_images is not None and count + len(buf) >= max_images:
                break
            buf.append(batch.xs1[i])
            if len(buf) == batch_size:
                latent_hw = flush() or latent_hw
        else:
            continue
        break
    latent_hw = flush() or latent_hw
    return PatchIndex(features=np.concatenate(feats),
                      image_idx=np.concatenate(imgs),
                      h_idx=np.concatenate(hs), w_idx=np.concatenate(ws),
                      latent_hw=latent_hw)


def mips_query(index: PatchIndex, queries: np.ndarray, k: int = 10,
               cosine: bool = False) -> List[List[Tuple[int, int, int, float]]]:
    """Top-k patches per query row; returns per query a list of
    (image_idx, h, w, score)."""
    f = jnp.asarray(index.features)
    q = jnp.asarray(queries, jnp.float32)
    if cosine:
        f = f / (jnp.linalg.norm(f, axis=1, keepdims=True) + 1e-12)
        q = q / (jnp.linalg.norm(q, axis=1, keepdims=True) + 1e-12)
    scores = q @ f.T                                     # (Q, n_patches)
    vals, idx = jax.lax.top_k(scores, k)
    vals, idx = np.asarray(vals), np.asarray(idx)
    out = []
    for qi in range(len(queries)):
        out.append([(int(index.image_idx[i]), int(index.h_idx[i]),
                     int(index.w_idx[i]), float(v))
                    for i, v in zip(idx[qi], vals[qi])])
    return out
