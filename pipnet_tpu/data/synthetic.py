"""Synthetic dataset fixture: a tiny on-disk ImageFolder + matching Newick
phylogeny, so tests and smoke runs need no cluster data paths
(the reference hard-codes cluster filesystems in util/data.py:126-425)."""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image


def synthetic_class_names(num_classes: int) -> List[str]:
    return [f"syn_{i + 1:03d}_Species_{chr(65 + i % 26)}{i}" for i in range(num_classes)]


def make_synthetic_newick(class_names: List[str], rng: np.random.Generator) -> str:
    """Random binary phylogeny over the class names with random branch lengths."""
    items = [f"{n}:{rng.uniform(0.5, 2.0):.3f}" for n in class_names]
    rng_order = rng.permutation(len(items))
    items = [items[i] for i in rng_order]
    while len(items) > 1:
        a = items.pop(int(rng.integers(len(items))))
        b = items.pop(int(rng.integers(len(items))))
        items.append(f"({a},{b}):{rng.uniform(0.5, 2.0):.3f}")
    return items[0].rsplit(":", 1)[0] + ";"


def _class_cues(ci: int) -> Tuple[np.ndarray, float, float, int]:
    """Deterministic per-class visual cues that survive resizing to 224px and
    the training augmentations: a golden-ratio-spread HSV color (well-separated
    even at 190 classes, unlike uniform-random RGB draws which collide), a
    stripe ORIENTATION angle, a stripe frequency bounded to 2-6 cycles per
    image width (the old ``ci+2`` half-cycles aliased above Nyquist for
    ci>~30, leaving most of a 190-class set distinguishable by color alone),
    and a shape family (disc / ring / bar)."""
    import colorsys
    hue = (ci * 0.61803398875) % 1.0
    sat = 0.55 + 0.4 * ((ci // 2) % 2)
    val = 0.6 + 0.35 * ((ci // 4) % 2)
    color = np.array(colorsys.hsv_to_rgb(hue, sat, val)) * 255.0
    angle = np.deg2rad((ci * 49.3) % 180.0)
    freq = 2.0 + (ci % 5)
    shape = ci % 3
    return color, angle, freq, shape


def generate_synthetic_dataset(root: str, *, num_classes: int = 8,
                               images_per_class: int = 6, image_size: int = 128,
                               seed: int = 0) -> Tuple[str, str, str]:
    """Create train/ and test/ ImageFolders plus a phylogeny .phy file.

    Each class combines four robust cues (color / stripe orientation / stripe
    frequency / blob shape, see ``_class_cues``) over randomized positions, so
    a model trained FROM RANDOM INIT can actually fit a 190-class set — the
    reference always starts from ImageNet weights, which this sandbox cannot
    download, so the fixture has to carry more signal than a natural-image
    benchmark would.  Returns (train_dir, test_dir, phylo_path).
    """
    rng = np.random.default_rng(seed)
    names = synthetic_class_names(num_classes)
    train_dir = os.path.join(root, "train")
    test_dir = os.path.join(root, "test")
    yy, xx = np.mgrid[:image_size, :image_size].astype(np.float64)
    for ci, name in enumerate(names):
        color, angle, freq, shape = _class_cues(ci)
        for split, n_imgs, off in ((train_dir, images_per_class, 0),
                                   (test_dir, max(2, images_per_class // 3), 1000)):
            cdir = os.path.join(split, name)
            os.makedirs(cdir, exist_ok=True)
            for ii in range(n_imgs):
                r = np.random.default_rng((seed, ci, ii + off))
                img = r.integers(0, 60, (image_size, image_size, 3)).astype(np.float64)
                # oriented low-frequency stripes over the whole image
                proj = (xx * np.cos(angle) + yy * np.sin(angle)) / image_size
                phase = r.uniform(0, 2 * np.pi)
                stripe = np.sin(2 * np.pi * freq * proj + phase) > 0.3
                img[stripe] = np.clip(img[stripe] + color * 0.45, 0, 255)
                # 1-2 shaped blobs in the class color at random positions
                for _ in range(int(r.integers(1, 3))):
                    cx, cy = r.integers(image_size // 4, 3 * image_size // 4, 2)
                    rad = image_size / 5.0
                    d2 = (xx - cx) ** 2 + (yy - cy) ** 2
                    if shape == 0:                       # disc
                        blob = d2 < rad ** 2
                    elif shape == 1:                     # ring
                        blob = (d2 < rad ** 2) & (d2 > (0.55 * rad) ** 2)
                    else:                                # bar along the angle
                        u = (xx - cx) * np.cos(angle) + (yy - cy) * np.sin(angle)
                        v = -(xx - cx) * np.sin(angle) + (yy - cy) * np.cos(angle)
                        blob = (np.abs(u) < rad) & (np.abs(v) < 0.35 * rad)
                    img[blob] = np.clip(color + r.integers(-20, 20, 3), 0, 255)
                Image.fromarray(img.astype(np.uint8)).save(
                    os.path.join(cdir, f"img_{ii:03d}.png"))
    phylo_path = os.path.join(root, "phylogeny.phy")
    with open(phylo_path, "w") as f:
        f.write(make_synthetic_newick(names, rng))
    return train_dir, test_dir, phylo_path
