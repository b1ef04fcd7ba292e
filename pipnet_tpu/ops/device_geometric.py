"""Device-side geometric augmentation (transform1 on the TPU).

The 1-core loader host spends ~5-8 ms/image on transform1's PIL work —
TrivialAugment-NoColor's shear/rotate affine warps dominate (profiled in
``scripts/profile_host_pipeline.py``) — which caps end-to-end training at
~90-150 img/s while the device step takes ~170 ms/batch.  This module moves
the whole transform1 tail onto the device: the loader ships the CACHED
resized base image (``image_size + 8``², uint8; ``+ 32`` for pretraining) and
the jitted train step applies

    TrivialAugment-NoColor (nearest affine) -> HFlip -> RandomResizedCrop

to the full batch (counterpart of the host chain in
``data/augment.py:TwoViewTransform.transform1``, itself the rebuild of the
reference recipe at ``util/data.py:768-809``).

TPU mapping:
* the NEAREST affine warp (TA's shear/translate/rotate, torchvision
  ``F.affine`` matrix semantics reproduced from ``data/augment.py:_affine``)
  is one flat ``take_along_axis`` gather per batch — a single (B, HW) gather
  of uint8 is cheap next to the backbone convs, and nearest needs one tap;
* RandomResizedCrop + flip are axis-aligned, so the bilinear resample is
  separable: two per-image einsum contractions with dense PIL-style
  triangle-filter weight matrices (B, out, S) — they run on the MXU.
  PIL's fixed-point accumulation is approximated in float (integer results
  match PIL within ±1 grey level; asserted in tests);
* the RRC box search (10 tries of area/log-ratio sampling with a
  center-crop fallback, torchvision semantics) is vectorized: all 10
  candidates are drawn up front and the first valid one is selected with a
  masked argmax — no data-dependent Python control flow under jit.

Only the RNG source differs from the host path (``jax.random`` instead of
the loader's numpy generator) — a sampling-stream change, not a
distribution change, same trade as ``ops/device_augment``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..data.augment import NUM_BINS

# TA-NoColor magnitude tables (data/augment.py:_space_no_color; ref
# util/data.py:904-913).  Order is fixed: affine params are computed
# per-op below, so the table lives here rather than via the host callables.
GEO_NAMES = ("Identity", "ShearX", "ShearY", "TranslateX", "TranslateY",
             "Rotate")
_GEO_MAX = {"ShearX": 0.5, "ShearY": 0.5, "TranslateX": 16.0,
            "TranslateY": 16.0, "Rotate": 60.0}


def _geo_bins() -> np.ndarray:
    bins = np.zeros((len(GEO_NAMES), NUM_BINS), np.float32)
    for i, n in enumerate(GEO_NAMES):
        if n in _GEO_MAX:
            bins[i] = np.linspace(0.0, _GEO_MAX[n], NUM_BINS)
    return bins


def sample_geometric(rng: jax.Array, batch: int):
    """One uniformly-chosen geometric op at a uniformly-chosen signed
    strength per image (TrivialAugment semantics).  Returns
    (op (B,) int32, magnitude (B,) f32)."""
    r_op, r_bin, r_sign = jax.random.split(rng, 3)
    op = jax.random.randint(r_op, (batch,), 0, len(GEO_NAMES))
    bin_ = jax.random.randint(r_bin, (batch,), 0, NUM_BINS)
    mag = jnp.asarray(_geo_bins())[op, bin_]
    flip = jax.random.bernoulli(r_sign, 0.5, (batch,))
    signed = jnp.asarray([n in _GEO_MAX for n in GEO_NAMES])
    return op, jnp.where(signed[op] & flip, -mag, mag)


def ta_affine_coeffs(op: jnp.ndarray, mag: jnp.ndarray, size: int):
    """Per-image inverse affine (output -> input) coefficients
    (m0..m5 each (B,)) for the selected TA op, reproducing
    ``data/augment.py:_affine`` (torchvision F.affine matrix about the
    image center, then inverted for PIL's output->input convention)."""
    cx = cy = size * 0.5
    zero = jnp.zeros_like(mag)

    # forward linear part per op family (see _affine: angle/translate/shear)
    deg2rad = math.pi / 180.0

    def coeffs(rot, sx, sy, tx, ty):
        a = jnp.cos(rot - sy) / jnp.cos(sy)
        b = -jnp.cos(rot - sy) * jnp.tan(sx) / jnp.cos(sy) - jnp.sin(rot)
        c = jnp.sin(rot - sy) / jnp.cos(sy)
        d = -jnp.sin(rot - sy) * jnp.tan(sx) / jnp.cos(sy) + jnp.cos(rot)
        det = a * d - b * c
        ia, ib, ic, id_ = d / det, -b / det, -c / det, a / det
        m2 = cx - ia * (cx + tx) - ib * (cy + ty)
        m5 = cy - ic * (cx + tx) - id_ * (cy + ty)
        return ia, ib, m2, ic, id_, m5

    # shear magnitudes go through degrees(atan(mag)) then back to radians
    shear = jnp.arctan(mag)
    trans = jnp.round(mag)
    rot = mag * deg2rad

    variants = [
        coeffs(zero, zero, zero, zero, zero),        # Identity
        coeffs(zero, shear, zero, zero, zero),       # ShearX
        coeffs(zero, zero, shear, zero, zero),       # ShearY
        coeffs(zero, zero, zero, trans, zero),       # TranslateX
        coeffs(zero, zero, zero, zero, trans),       # TranslateY
        coeffs(rot, zero, zero, zero, zero),         # Rotate
    ]
    stacked = [jnp.stack([v[i] for v in variants]) for i in range(6)]  # (6, B)
    return [jnp.take_along_axis(s, op[None, :], axis=0)[0] for s in stacked]


def nearest_affine_warp(x_u8: jnp.ndarray, m) -> jnp.ndarray:
    """PIL ``transform(..., AFFINE, resample=NEAREST)`` over a batch:
    out[y, x] = in[floor(m3·(x+.5)+m4·(y+.5)+m5), floor(m0·(x+.5)+m1·(y+.5)+m2)],
    0 (black) outside — PIL samples at output pixel centers and truncates.

    One flat take_along_axis gather (B, HW) — nearest needs a single tap."""
    B, H, W, C = x_u8.shape
    m0, m1, m2, m3, m4, m5 = (v[:, None, None] for v in m)
    ys, xs = jnp.mgrid[0:H, 0:W].astype(jnp.float32)
    xin = m0 * (xs + 0.5) + m1 * (ys + 0.5) + m2
    yin = m3 * (xs + 0.5) + m4 * (ys + 0.5) + m5
    # TA magnitudes are rationals (k/60 shears), so sample positions land
    # EXACTLY on integer boundaries for whole columns/rows.  The +1e-4 bias
    # (>> f32 rounding error at coordinates <= 256, << any non-boundary
    # fraction in the tables) makes those boundary pixels floor to the
    # boundary index deterministically instead of at the mercy of f32
    # rounding.  NOTE: PIL's own NEAREST affine quantizes the COEFFICIENTS
    # to 16.16 fixed point (Geometry.c affine_fixed), so on exact-boundary
    # columns PIL may sample the adjacent source pixel — this warp uses true
    # real-valued coordinates (boundary-free draws match PIL exactly; the
    # per-op and random-draw bounds are asserted in
    # tests/test_device_geometric.py).
    ix = jnp.floor(xin + 1e-4).astype(jnp.int32)
    iy = jnp.floor(yin + 1e-4).astype(jnp.int32)
    inside = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
    idx = (jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)).reshape(B, H * W)
    out = jnp.take_along_axis(x_u8.reshape(B, H * W, C), idx[..., None], axis=1)
    return jnp.where(inside.reshape(B, H * W, 1), out, 0).reshape(B, H, W, C)


def sample_rrc_box(rng: jax.Array, batch: int, size: int,
                   scale=(0.95, 1.0), ratio=(3 / 4, 4 / 3)):
    """torchvision RandomResizedCrop box sampling on a ``size``² image:
    10 tries of (area·U[scale], exp(U[log ratio])) — first valid wins —
    with the center-crop fallback (``data/augment.py:random_resized_crop``).
    Returns integer (x, y, cw, ch) each (B,)."""
    r_area, r_ar, r_x, r_y = jax.random.split(rng, 4)
    area = float(size * size)
    target = area * jax.random.uniform(r_area, (batch, 10),
                                       minval=scale[0], maxval=scale[1])
    logr = jax.random.uniform(r_ar, (batch, 10),
                              minval=math.log(ratio[0]), maxval=math.log(ratio[1]))
    ar = jnp.exp(logr)
    cw = jnp.round(jnp.sqrt(target * ar)).astype(jnp.int32)
    ch = jnp.round(jnp.sqrt(target / ar)).astype(jnp.int32)
    valid = (cw > 0) & (cw <= size) & (ch > 0) & (ch <= size)
    # first valid try per image; argmax returns the first True
    first = jnp.argmax(valid, axis=1)                          # (B,)
    any_valid = jnp.any(valid, axis=1)
    cw = jnp.take_along_axis(cw, first[:, None], axis=1)[:, 0]
    ch = jnp.take_along_axis(ch, first[:, None], axis=1)[:, 0]
    # center-crop fallback: square input with ratio ∈ [3/4, 4/3] always
    # admits (cw, ch) = (size, size) (in_ratio == 1 is inside the band)
    cw = jnp.where(any_valid, cw, size)
    ch = jnp.where(any_valid, ch, size)
    # uniform ints in [0, size - c]; uniform float scaled avoids a
    # per-image randint bound (bounds are traced)
    ux = jax.random.uniform(r_x, (batch,))
    uy = jax.random.uniform(r_y, (batch,))
    x = jnp.floor(ux * (size - cw + 1).astype(jnp.float32)).astype(jnp.int32)
    y = jnp.floor(uy * (size - ch + 1).astype(jnp.float32)).astype(jnp.int32)
    x = jnp.where(any_valid, x, (size - cw) // 2)
    y = jnp.where(any_valid, y, (size - ch) // 2)
    return x, y, cw, ch


def _pil_triangle_weights(start: jnp.ndarray, length: jnp.ndarray,
                          in_size: int, out_size: int) -> jnp.ndarray:
    """Dense per-image PIL-bilinear resampling weights (B, out_size, in_size)
    for a 1-D resize of ``[start, start+length)`` -> ``out_size``.

    PIL (ImagingResampleHorizontal): scale = length/out, support =
    1·max(1, scale); center = start + (xx+0.5)·scale; w(i) =
    triangle((i + 0.5 - center)/max(1, scale)), taps clipped to the IMAGE
    (not the box) and normalized to sum 1."""
    scale = length.astype(jnp.float32)[:, None, None] / float(out_size)
    ss = jnp.maximum(scale, 1.0)
    xx = jnp.arange(out_size, dtype=jnp.float32)[None, :, None]
    center = start.astype(jnp.float32)[:, None, None] + (xx + 0.5) * scale
    i = jnp.arange(in_size, dtype=jnp.float32)[None, None, :]
    w = jnp.maximum(0.0, 1.0 - jnp.abs((i + 0.5 - center) / ss))
    return w / jnp.maximum(w.sum(axis=2, keepdims=True), 1e-12)


def rrc_flip_resize(x: jnp.ndarray, rng: jax.Array, out_size: int,
                    dtype=jnp.bfloat16) -> jnp.ndarray:
    """HFlip (p=.5) + RandomResizedCrop to ``out_size``² as two per-image
    MXU einsums (separable PIL-bilinear).  x (B, S, S, C) float [0,255];
    returns float32 [0,255] on the uint8 lattice (PIL-rounded)."""
    B, S = x.shape[0], x.shape[1]
    r_flip, r_box = jax.random.split(rng)
    x0, y0, cw, ch = sample_rrc_box(r_box, B, S)
    flip = jax.random.bernoulli(r_flip, 0.5, (B,))
    # fold hflip into the horizontal weights: flipping the image then
    # cropping [x0, x0+cw) equals sampling the original at mirrored
    # positions — reverse the weight rows and mirror the start
    wx = _pil_triangle_weights(x0, cw, S, out_size)            # (B, out, S)
    wx_f = _pil_triangle_weights(S - x0 - cw, cw, S, out_size)[:, ::-1, :]
    wx = jnp.where(flip[:, None, None], wx_f, wx)
    wy = _pil_triangle_weights(y0, ch, S, out_size)
    xc = x.astype(dtype)
    y = jnp.einsum("boi,bihc->bohc", wy.astype(dtype), xc,
                   preferred_element_type=jnp.float32)         # rows
    z = jnp.einsum("boj,bhjc->bhoc", wx.astype(dtype), y.astype(dtype),
                   preferred_element_type=jnp.float32)         # cols
    return jnp.clip(jnp.floor(z + 0.5), 0.0, 255.0)


def transform1_batch(x_u8: jnp.ndarray, rng: jax.Array, out_size: int,
                     dtype=jnp.bfloat16) -> jnp.ndarray:
    """The full device transform1 tail on a batch of resized base images:
    TA-NoColor (nearest affine) -> HFlip -> RandomResizedCrop(out_size).
    Input (B, S, S, 3) uint8; output (B, out, out, 3) float32 on the uint8
    lattice (ready for ``device_augment.two_view_transform2``'s ops, which
    expect PIL-rounded values)."""
    B = x_u8.shape[0]
    r_ta, r_rrc = jax.random.split(rng)
    op, mag = sample_geometric(r_ta, B)
    m = ta_affine_coeffs(op, mag, x_u8.shape[1])
    warped = nearest_affine_warp(x_u8, m)
    return rrc_flip_resize(warped.astype(jnp.float32), r_rrc, out_size,
                           dtype=dtype)
