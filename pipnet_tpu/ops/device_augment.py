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
    ([1,1,1;1,5,1;1,1,1]/13), border pixels left unfiltered.

    Batch-generic: x (..., H, W, C), spatial axes -3/-2."""
    k = jnp.asarray([[1., 1., 1.], [1., 5., 1.], [1., 1., 1.]]) / 13.0
    h, w = x.shape[-3], x.shape[-2]
    pad = [(0, 0)] * (x.ndim - 3) + [(1, 1), (1, 1), (0, 0)]
    # depthwise 3x3 via padding + 9 shifted adds (cheap, fuses on VPU)
    xp = jnp.pad(x, pad, mode="edge")
    sm = jnp.zeros_like(x)
    for dy in range(3):
        for dx in range(3):
            sm = sm + k[dy, dx] * jax.lax.slice_in_dim(
                jax.lax.slice_in_dim(xp, dy, dy + h, axis=-3),
                dx, dx + w, axis=-2)
    sm = _u8(sm)
    # PIL leaves the 1-px border equal to the source
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


def _nibble_onehots(x: jnp.ndarray):
    """(B, H, W, 3) float on the u8 lattice -> high/low-nibble one-hots
    (B, HW, 48) bf16 with slot c*16 + nibble (channel-major).

    TPU has no fast gather/scatter, so both the per-channel histogram AND the
    LUT application of equalize are expressed as MXU matmuls over 16-wide
    one-hots of the two nibbles of each pixel (v = 16*hi + lo):
    histogram[hi, lo] = OhiT @ Olo; lut lookup = (Ohi @ L) . Olo.  The three
    channels ride one 48-wide axis so the contraction tiles are not
    degenerate (the 3x16x16 off-channel blocks are computed and discarded —
    trivial next to the conv FLOPs they replace)."""
    B, H, W, C = x.shape
    v = x.reshape(B, H * W, C).astype(jnp.int32)
    hi, lo = v >> 4, v & 15
    iota = jnp.arange(16, dtype=jnp.int32)
    ohi = (hi[..., None] == iota).reshape(B, H * W, 3 * 16).astype(jnp.bfloat16)
    olo = (lo[..., None] == iota).reshape(B, H * W, 3 * 16).astype(jnp.bfloat16)
    return ohi, olo


def equalize_batch(x: jnp.ndarray) -> jnp.ndarray:
    """PIL ImageOps.equalize over a batch (B, H, W, 3): per channel,
    step = (npixels - count(last nonzero bin)) // 255;
    lut[i] = clip((step//2 + cumsum_excl(h)[i]) // step); identity if step==0.

    Histogram and LUT application run as one-hot matmuls (_nibble_onehots) —
    the earlier per-image segment_sum + table gather was the single slowest
    device-augment op on TPU."""
    B, H, W, _ = x.shape
    ohi, olo = _nibble_onehots(x)
    # per-channel histograms: diagonal (c, c) 16x16 blocks of the (48, 48)
    # one-hot gram matrix; counts <= HW fit f32 exactly
    g = jnp.einsum("bpx,bpy->bxy", ohi, olo,
                   preferred_element_type=jnp.float32)        # (B, 48, 48)
    g5 = g.reshape(B, 3, 16, 3, 16)
    h = jnp.stack([g5[:, c, :, c, :] for c in range(3)], 1).reshape(B, 3, 256)
    nz = h > 0
    last_idx = 255 - jnp.argmax(nz[:, :, ::-1], axis=2)       # (B, 3)
    last_cnt = jnp.take_along_axis(h, last_idx[..., None], axis=2)[..., 0]
    total = h.sum(axis=2)
    step = jnp.floor((total - last_cnt) / 255.0)              # (B, 3)
    csum = jnp.cumsum(h, axis=2) - h                          # exclusive
    lut = jnp.clip(jnp.floor((jnp.floor(step[..., None] / 2.0) + csum)
                             / jnp.maximum(step[..., None], 1.0)), 0.0, 255.0)
    ident = (step <= 0) | (nz.sum(axis=2) <= 1)               # (B, 3)
    # block-diagonal (48, 48) LUT; values <= 255 are exact in bf16
    lfull = jnp.zeros((B, 3, 16, 3, 16), jnp.float32)
    lut4 = lut.reshape(B, 3, 16, 16)
    for c in range(3):
        lfull = lfull.at[:, c, :, c, :].set(lut4[:, c])
    lfull = lfull.reshape(B, 48, 48).astype(jnp.bfloat16)
    t = jnp.einsum("bpx,bxy->bpy", ohi, lfull,
                   preferred_element_type=jnp.float32)        # (B, HW, 48)
    mapped = (t.reshape(B, H * W, 3, 16)
              * olo.reshape(B, H * W, 3, 16).astype(jnp.float32)).sum(-1)
    mapped = mapped.reshape(B, H, W, 3)
    return jnp.where(ident[:, None, None, :], x, mapped)


def equalize(x, _=None):
    """Single-image (H, W, 3) wrapper over ``equalize_batch``."""
    return equalize_batch(x[None])[0]


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


def _apply_all_select(x: jnp.ndarray, op: jnp.ndarray, mag: jnp.ndarray,
                      cars: bool) -> jnp.ndarray:
    """Apply TrivialAugment over a batch: every op computed on the FULL batch
    (vectorized, per-image magnitudes broadcast), then a per-image select.

    A ``vmap(lax.switch)`` computes all branches per image anyway (different
    lanes need different branches), but as B tiny per-image kernels per op;
    this formulation runs 9 large batched kernels instead — measured 176 ms
    -> a few ms per train step at flagship shape."""
    names, _, _ = _space_tables(cars)
    m = mag.reshape(-1, 1, 1, 1)
    f = 1.0 + m
    out = x
    for i, n in enumerate(names):
        if n == "Identity":
            continue
        elif n == "Brightness":
            o = brightness(x, f)
        elif n == "Color":
            o = color(x, f)
        elif n == "Contrast":
            o = contrast(x, f)
        elif n == "Sharpness":
            o = sharpness(x, f)
        elif n == "Posterize":
            o = posterize(x, jnp.clip(m.astype(jnp.int32), 0, 8))
        elif n == "Solarize":
            o = solarize(x, m)
        elif n == "AutoContrast":
            o = autocontrast(x)
        elif n == "Equalize":
            o = equalize_batch(x)
        else:  # pragma: no cover
            raise ValueError(n)
        out = jnp.where((op == i).reshape(-1, 1, 1, 1), o, out)
    return out


def _apply_one(x: jnp.ndarray, op: jnp.ndarray, mag: jnp.ndarray,
               cars: bool) -> jnp.ndarray:
    """Apply the selected op to ONE image (H, W, 3) float [0,255]."""
    return _apply_all_select(x[None], jnp.reshape(op, (1,)),
                             jnp.reshape(mag, (1,)).astype(jnp.float32),
                             cars)[0]


def photometric_batch(x_u8: jnp.ndarray, rng: jax.Array, cars: bool = False
                      ) -> jnp.ndarray:
    """TrivialAugment one op per image over a uint8 batch (B, H, W, 3);
    returns float32 values still on the [0,255] uint8 lattice."""
    B = x_u8.shape[0]
    op, mag = sample_photometric(rng, B, cars)
    x = x_u8.astype(jnp.float32)
    return _apply_all_select(x, op, mag, cars)


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
