"""Heatmap overlays and prototype patch galleries.

Counterpart of the rendering in ``util/vis_pipnet.py:120-241``,
``util/vis_hpipnet.py:306-389`` and ``util/visualize_prediction.py``: JET
colormap overlays of per-prototype activation maps, cropped argmax patches
with bounding boxes, and grid montages — using matplotlib's colormap tables
(no OpenCV dependency required, though cv2 is available)."""

from __future__ import annotations

import os
from typing import Iterable, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageDraw

from .patches import get_img_coordinates, get_patch_size

IMAGENET_MEAN = np.asarray((0.485, 0.456, 0.406), np.float32)
IMAGENET_STD = np.asarray((0.229, 0.224, 0.225), np.float32)


def denormalize(x: np.ndarray) -> np.ndarray:
    """Normalized HWC float -> uint8 RGB."""
    img = (x * IMAGENET_STD + IMAGENET_MEAN) * 255.0
    return np.clip(img, 0, 255).astype(np.uint8)


def jet_heatmap(activation: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Min-max normalized activation -> JET-colored uint8 RGB at ``size``."""
    from matplotlib import cm
    a = activation.astype(np.float32)
    a = (a - a.min()) / (a.max() - a.min() + 1e-8)
    a = np.asarray(Image.fromarray((a * 255).astype(np.uint8)).resize(
        size, Image.BICUBIC), np.float32) / 255.0
    rgba = cm.jet(a)
    return (rgba[..., :3] * 255).astype(np.uint8)


def overlay_heatmap(img_uint8: np.ndarray, activation: np.ndarray,
                    alpha: float = 0.3) -> np.ndarray:
    """0.7*img + 0.3*jet(activation) blend (ref vis_hpipnet.py:134-153)."""
    hm = jet_heatmap(activation, (img_uint8.shape[1], img_uint8.shape[0]))
    return np.clip((1 - alpha) * img_uint8 + alpha * hm, 0, 255).astype(np.uint8)


def draw_patch_box(img: Image.Image, box: Tuple[int, int, int, int],
                   color=(255, 255, 0), width: int = 2) -> Image.Image:
    h0, h1, w0, w1 = box
    d = ImageDraw.Draw(img)
    d.rectangle([w0, h0, w1 - 1, h1 - 1], outline=color, width=width)
    return img


def crop_patch(img_uint8: np.ndarray, box: Tuple[int, int, int, int]) -> np.ndarray:
    h0, h1, w0, w1 = box
    return img_uint8[h0:h1, w0:w1]


def save_image_grid(images: Sequence[np.ndarray], path: str,
                    cols: Optional[int] = None, pad: int = 2,
                    labels: Optional[Sequence[str]] = None) -> str:
    """Montage of equally-sized uint8 images."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if not images:
        return path
    h, w = images[0].shape[:2]
    n = len(images)
    cols = cols or n
    rows = -(-n // cols)
    canvas = np.full(((h + pad) * rows - pad, (w + pad) * cols - pad, 3), 255,
                     np.uint8)
    for i, im in enumerate(images):
        r, c = divmod(i, cols)
        canvas[r * (h + pad): r * (h + pad) + h,
               c * (w + pad): c * (w + pad) + w] = im
    out = Image.fromarray(canvas)
    if labels:
        d = ImageDraw.Draw(out)
        for i, lab in enumerate(labels[:n]):
            r, c = divmod(i, cols)
            d.text((c * (w + pad) + 2, r * (h + pad) + 2), lab, fill=(255, 0, 0))
    out.save(path)
    return path


def save_topk_gallery(proj, topk: dict, out_dir: str, *, prefix: str = "prototype",
                      with_heatmap: bool = False,
                      proto_features: Optional[np.ndarray] = None) -> List[str]:
    """Per-prototype top-k patch grids (``visualize_topk`` second pass,
    util/vis_pipnet.py:120-241).  Loads images from proj.paths, crops the
    argmax patch of each top-k image."""
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for p, entries in topk.items():
        if not entries:
            continue
        patches = []
        for img_idx, score in entries:
            if score <= 0.1:
                continue
            with Image.open(proj.paths[img_idx]) as im:
                im = im.convert("RGB").resize((proj.image_size, proj.image_size),
                                              Image.BILINEAR)
            arr = np.asarray(im, np.uint8)
            box = proj.patch_box(img_idx, p)
            patches.append(crop_patch(arr, box))
        if patches:
            written.append(save_image_grid(
                patches, os.path.join(out_dir, f"{prefix}_{p}.png")))
    return written
