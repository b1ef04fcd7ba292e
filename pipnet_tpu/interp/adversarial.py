"""Adversarial prototype-relocation attack.

Counterpart of ``adversarial/adv_attack.py:244-343`` and
``adversarial/utils.py:48-84``: a PGD-style attack (eps=8/255, alpha=2/255,
40 steps) on one image trying to MOVE a prototype's peak activation away from
its original location into low-activation regions.  Success (peak lands in
the adversarial mask) indicates a non-robust prototype.

TPU-native: the whole attack is one ``lax.fori_loop`` of jitted
gradient-ascent steps — no per-step host round trips.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.pipnet import PIPNet

IMAGENET_MEAN = jnp.asarray((0.485, 0.456, 0.406))
IMAGENET_STD = jnp.asarray((0.229, 0.224, 0.225))


def adversarial_locs_mask(activation: jnp.ndarray, threshold: float = 0.4,
                          window: int = 5) -> jnp.ndarray:
    """Low-activation target mask: everywhere the activation <= threshold,
    excluding a (window x window) box around the current peak
    (ref adversarial/utils.py:48-70)."""
    H, W = activation.shape
    idx = jnp.argmax(activation)
    ph, pw = idx // W, idx % W
    hh = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    ww = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    half = window // 2
    near_peak = (jnp.abs(hh - ph) <= half) & (jnp.abs(ww - pw) <= half)
    return (~near_peak) & (activation <= threshold)


def _relocation_loss(activation: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """mean(act * mask) - mean(act * ~mask)  (ref adv_attack.py:326-334);
    minimized, i.e. activation is pushed OUT of the masked target zone by the
    SGD step on the image — the attack then checks whether the peak moved."""
    m = mask.astype(activation.dtype)
    return jnp.mean(activation * m) - jnp.mean(activation * (1.0 - m))


def adversarial_attack(model: PIPNet, params, batch_stats, x_norm: jnp.ndarray,
                       proto_idx: int, *, num_steps: int = 40,
                       epsilon: float = 8 / 255, alpha: float = 2 / 255,
                       threshold: float = 0.4, window: int = 5,
                       rng: Optional[jax.Array] = None) -> Tuple[bool, np.ndarray]:
    """Attack one normalized image (H,W,3) on prototype ``proto_idx``.

    Returns (peak_relocated, adversarial image in [0,1] pixel space).
    """
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats

    def proto_map(img01):
        xn = (img01 - IMAGENET_MEAN) / IMAGENET_STD
        out = model.apply(variables, xn[None])
        return out["proto_features"][0, :, :, proto_idx]

    x01 = jnp.clip(x_norm * IMAGENET_STD + IMAGENET_MEAN, 0.0, 1.0)
    act0 = proto_map(x01)
    mask = adversarial_locs_mask(act0, threshold, window)

    img = x01
    if rng is not None:
        img = jnp.clip(img + jax.random.uniform(rng, img.shape,
                                                minval=-epsilon, maxval=epsilon),
                       0.0, 1.0)

    grad_fn = jax.grad(lambda im: _relocation_loss(proto_map(im), mask))

    @jax.jit
    def run(img):
        def body(_, im):
            g = grad_fn(im)
            im = im - alpha * g                                   # SGD on the loss
            im = x01 + jnp.clip(im - x01, -epsilon, epsilon)      # eps-ball
            return jnp.clip(im, 0.0, 1.0)

        return jax.lax.fori_loop(0, num_steps, body, img)

    adv = run(img)
    act_adv = proto_map(adv)
    H, W = act_adv.shape
    peak = int(jnp.argmax(act_adv))
    moved = bool(np.asarray(mask)[peak // W, peak % W])
    return moved, np.asarray(adv)


def integrated_gradients_patch(model: PIPNet, params, batch_stats,
                               x_norm: jnp.ndarray, proto_idx: int,
                               *, num_steps: int = 50):
    """Integrated-gradients localization of the image region responsible for a
    prototype's pooled activation (counterpart of
    plot_proto_activations_using_gradients.py:152-211): IG of pooled[p] from a
    black baseline, attribution summed over channels -> (H, W) saliency."""
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats

    def pooled_p(img):
        out = model.apply(variables, img[None])
        return out["pooled"][0, proto_idx]

    grad_fn = jax.grad(pooled_p)
    baseline = jnp.zeros_like(x_norm)

    def body(i, acc):
        alpha = (i + 0.5) / num_steps
        return acc + grad_fn(baseline + alpha * (x_norm - baseline))

    total = jax.lax.fori_loop(0, num_steps, body, jnp.zeros_like(x_norm))
    ig = (x_norm - baseline) * total / num_steps
    return jnp.abs(ig).sum(axis=-1)            # (H, W) saliency
