"""Device-side photometric augmentation (transform2 on the TPU).

The training host has ~1 CPU core; the reference's per-view photometric
TrivialAugment + normalize (``util/data.py:929-952`` + transform2) costs more
host time than the device spends on the whole train step.  This module moves
transform2 onto the device: the loader ships ONE shared geometric view per
sample as uint8 (4x smaller H2D than f32), and the jitted train step derives
the two photometric views + random crop + ImageNet normalization on the VPU —
they fuse into the first backbone convs.

Every op reproduces PIL's algorithm (including its uint8 rounding of the
degenerate image and the blend) so the augmentation SPACE matches the
reference exactly; only the RNG stream differs (jax.random instead of the
loader's numpy generator), which is a sampling-source change, not a
distribution change.  PIL parity is asserted per-op in
``tests/test_device_augment.py``.

Op algorithms (PIL sources):
* Brightness/Color/Contrast/Sharpness — ``ImageEnhance``: degenerate image
  (black / L-gray / mean-gray / SMOOTH-filtered) blended with the original:
  ``out = degenerate + factor * (img - degenerate)``, rounded, clipped.
* Posterize — keep the top ``bits`` bits (``ImageOps.posterize``).
* Solarize — invert pixels >= threshold (``ImageOps.solarize``).
* AutoContrast — per-channel remap [min, max] -> [0, 255] with PIL's
  truncating LUT (``ImageOps.autocontrast`` at cutoff=0).
* Equalize — PIL's integer-arithmetic histogram equalization per channel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.augment import (IMAGENET_MEAN, IMAGENET_STD, NUM_BINS,
                            _space_no_shape, _space_no_shape_with_color)

# ITU-R 601-2 luma, PIL's exact integer coefficients (convert("L")):
# L = (R*19595 + G*38470 + B*7471 + 0x8000) >> 16
_L_R, _L_G, _L_B = 19595.0, 38470.0, 7471.0


def _pil_gray(x: jnp.ndarray) -> jnp.ndarray:
    """PIL convert('L') with its integer rounding; x float in [0,255],
    (..., 3) -> (..., 1)."""
    l = (x[..., 0] * _L_R + x[..., 1] * _L_G + x[..., 2] * _L_B + 32768.0)
    return jnp.floor(l / 65536.0)[..., None]


def _u8(x: jnp.ndarray) -> jnp.ndarray:
    """Round-half-up to the uint8 lattice (PIL blend/filter rounding),
    staying in float."""
    return jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)


def _blend(degenerate: jnp.ndarray, img: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    return _u8(degenerate + factor * (img - degenerate))


def brightness(x, factor):
    return _blend(jnp.zeros_like(x), x, factor)


def color(x, factor):
    return _blend(jnp.broadcast_to(_pil_gray(x), x.shape), x, factor)


def contrast(x, factor):
    # PIL: mean = int(ImageStat.Stat(image.convert("L")).mean[0] + 0.5)
    mean = jnp.floor(jnp.mean(_pil_gray(x), axis=(-3, -2, -1), keepdims=True) + 0.5)
    return _blend(jnp.broadcast_to(mean, x.shape), x, factor)


def sharpness(x, factor):
    """ImageEnhance.Sharpness: degenerate = SMOOTH filter
    ([1,1,1;1,5,1;1,1,1]/13), border pixels left unfiltered."""
    k = jnp.asarray([[1., 1., 1.], [1., 5., 1.], [1., 1., 1.]]) / 13.0
    # depthwise 3x3 via padding + 9 shifted adds (cheap, fuses on VPU)
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)), mode="edge")
    sm = jnp.zeros_like(x)
    for dy in range(3):
        for dx in range(3):
            sm = sm + k[dy, dx] * xp[dy:dy + x.shape[0], dx:dx + x.shape[1], :]
    sm = _u8(sm)
    # PIL leaves the 1-px border equal to the source
    h, w = x.shape[0], x.shape[1]
    ii = jnp.arange(h)[:, None, None]
    jj = jnp.arange(w)[None, :, None]
    interior = (ii > 0) & (ii < h - 1) & (jj > 0) & (jj < w - 1)
    sm = jnp.where(interior, sm, x)
    return _blend(sm, x, factor)


def posterize(x, bits):
    keep = jnp.left_shift(jnp.right_shift(x.astype(jnp.int32), 8 - bits), 8 - bits)
    return keep.astype(x.dtype)


def solarize(x, threshold):
    return jnp.where(x >= threshold, 255.0 - x, x)


def autocontrast(x, _=None):
    lo = jnp.min(x, axis=(-3, -2), keepdims=True)
    hi = jnp.max(x, axis=(-3, -2), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1.0)
    # PIL builds the LUT with int() truncation: int(ix*scale + offset)
    out = jnp.floor((x - lo) * scale + 1e-5)
    return jnp.where(hi > lo, jnp.clip(out, 0.0, 255.0), x)


def _channel_histograms(x: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) float values in [0,255] -> (3, 256) histogram."""
    v = x.astype(jnp.int32).reshape(-1, 3)
    ids = v + jnp.arange(3)[None, :] * 256                   # (HW, 3)
    h = jax.ops.segment_sum(jnp.ones_like(ids, jnp.float32).reshape(-1),
                            ids.reshape(-1), num_segments=768)
    return h.reshape(3, 256)


def equalize(x, _=None):
    """PIL ImageOps.equalize: per channel,
    step = (npixels - count(last nonzero bin)) // 255;
    lut[i] = clip((step//2 + cumsum_excl(h)[i]) // step); identity if step==0."""
    h = _channel_histograms(x)                               # (3, 256)
    nz = h > 0
    last_idx = 255 - jnp.argmax(nz[:, ::-1], axis=1)         # (3,)
    last_cnt = jnp.take_along_axis(h, last_idx[:, None], axis=1)[:, 0]
    total = h.sum(axis=1)
    step = jnp.floor((total - last_cnt) / 255.0)             # (3,)
    csum = jnp.cumsum(h, axis=1) - h                         # exclusive
    lut = jnp.clip(jnp.floor((jnp.floor(step[:, None] / 2.0) + csum)
                             / jnp.maximum(step[:, None], 1.0)), 0.0, 255.0)
    ident = (step <= 0) | (nz.sum(axis=1) <= 1)
    idx = x.astype(jnp.int32)                                # (H, W, 3)
    mapped = jnp.stack([lut[c][idx[..., c]] for c in range(3)], axis=-1)
    return jnp.where(ident[None, None, :], x, mapped)


# ---------------------------------------------------------------------------
# TrivialAugment over a batch
# ---------------------------------------------------------------------------

def _space_tables(cars: bool):
    """Static (op names, bins (n_ops, NUM_BINS), signed (n_ops,)) from the
    host-side space definitions — single source of truth."""
    space = _space_no_shape_with_color() if cars else _space_no_shape()
    names = list(space.keys())
    bins = np.zeros((len(names), NUM_BINS), np.float32)
    signed = np.zeros(len(names), bool)
    for i, n in enumerate(names):
        _, b, s = space[n]
        bins[i, :len(b)] = b
        if len(b) == 1:
            bins[i, :] = b[0]
        signed[i] = s
    return names, bins, signed


def sample_photometric(rng: jax.Array, batch: int, cars: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """TrivialAugment sampling (one op, one of 31 bins, sign flip w.p. 0.5 for
    signed ops — data/augment.py TrivialAugment.__call__) for a batch.
    Returns (op_idx (B,), magnitude (B,))."""
    names, bins, signed = _space_tables(cars)
    r_op, r_bin, r_sign = jax.random.split(rng, 3)
    op = jax.random.randint(r_op, (batch,), 0, len(names))
    bin_ = jax.random.randint(r_bin, (batch,), 0, NUM_BINS)
    mag = jnp.asarray(bins)[op, bin_]
    flip = jax.random.bernoulli(r_sign, 0.5, (batch,))
    mag = jnp.where(jnp.asarray(signed)[op] & flip, -mag, mag)
    return op, mag


def _apply_one(x: jnp.ndarray, op: jnp.ndarray, mag: jnp.ndarray,
               cars: bool) -> jnp.ndarray:
    """Apply the selected op to ONE image (H, W, 3) float [0,255]."""
    names, _, _ = _space_tables(cars)
    branches = []
    for n in names:
        if n == "Identity":
            branches.append(lambda x, m: x)
        elif n == "Brightness":
            branches.append(lambda x, m: brightness(x, 1.0 + m))
        elif n == "Color":
            branches.append(lambda x, m: color(x, 1.0 + m))
        elif n == "Contrast":
            branches.append(lambda x, m: contrast(x, 1.0 + m))
        elif n == "Sharpness":
            branches.append(lambda x, m: sharpness(x, 1.0 + m))
        elif n == "Posterize":
            branches.append(lambda x, m: posterize(x, m.astype(jnp.int32)))
        elif n == "Solarize":
            branches.append(lambda x, m: solarize(x, m))
        elif n == "AutoContrast":
            branches.append(lambda x, m: autocontrast(x))
        elif n == "Equalize":
            branches.append(lambda x, m: equalize(x))
        else:  # pragma: no cover
            raise ValueError(n)
    return jax.lax.switch(op, branches, x, mag)


def photometric_batch(x_u8: jnp.ndarray, rng: jax.Array, cars: bool = False
                      ) -> jnp.ndarray:
    """TrivialAugment one op per image over a uint8 batch (B, H, W, 3);
    returns float32 values still on the [0,255] uint8 lattice."""
    B = x_u8.shape[0]
    op, mag = sample_photometric(rng, B, cars)
    x = x_u8.astype(jnp.float32)
    return jax.vmap(functools.partial(_apply_one, cars=cars))(x, op, mag)


def random_crop_batch(x: jnp.ndarray, rng: jax.Array, out_size: int) -> jnp.ndarray:
    """Per-image random crop (B, S, S, C) -> (B, out, out, C) (transform2's
    RandomCrop, util/data.py:787)."""
    B, S = x.shape[0], x.shape[1]
    if S == out_size:
        return x
    ry, rx = jax.random.split(rng)
    ys = jax.random.randint(ry, (B,), 0, S - out_size + 1)
    xs = jax.random.randint(rx, (B,), 0, S - out_size + 1)

    def crop(img, y, x0):
        return jax.lax.dynamic_slice(img, (y, x0, 0),
                                     (out_size, out_size, img.shape[-1]))

    return jax.vmap(crop)(x, ys, xs)


def normalize(x: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[0,255] -> ImageNet-normalized."""
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
    std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0
    return ((x - mean) / std).astype(dtype)


def two_view_transform2(x_u8: jnp.ndarray, rng: jax.Array, image_size: int,
                        *, cars: bool = False, dtype=jnp.float32
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device transform2 for BOTH views from one shared geometric view:
    TrivialAugment(photometric) -> RandomCrop(image_size) -> normalize,
    independently per view (ref TwoAugSupervisedDataset, util/data.py:895-898).
    """
    r1, r2, c1, c2 = jax.random.split(rng, 4)
    v1 = normalize(random_crop_batch(photometric_batch(x_u8, r1, cars), c1,
                                     image_size), dtype)
    v2 = normalize(random_crop_batch(photometric_batch(x_u8, r2, cars), c2,
                                     image_size), dtype)
    return v1, v2
