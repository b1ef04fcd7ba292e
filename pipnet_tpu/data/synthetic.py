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


def generate_synthetic_dataset(root: str, *, num_classes: int = 8,
                               images_per_class: int = 6, image_size: int = 64,
                               seed: int = 0) -> Tuple[str, str, str]:
    """Create train/ and test/ ImageFolders plus a phylogeny .phy file.

    Each class is a colored blob pattern so a small model can actually fit it.
    Returns (train_dir, test_dir, phylo_path).
    """
    rng = np.random.default_rng(seed)
    names = synthetic_class_names(num_classes)
    train_dir = os.path.join(root, "train")
    test_dir = os.path.join(root, "test")
    for ci, name in enumerate(names):
        base_color = rng.integers(40, 215, 3)
        for split, n_imgs, off in ((train_dir, images_per_class, 0),
                                   (test_dir, max(2, images_per_class // 3), 1000)):
            cdir = os.path.join(split, name)
            os.makedirs(cdir, exist_ok=True)
            for ii in range(n_imgs):
                r = np.random.default_rng((seed, ci, ii + off))
                img = r.integers(0, 60, (image_size, image_size, 3))
                cx, cy = r.integers(image_size // 4, 3 * image_size // 4, 2)
                yy, xx = np.mgrid[:image_size, :image_size]
                blob = ((xx - cx) ** 2 + (yy - cy) ** 2) < (image_size // 5) ** 2
                img[blob] = base_color + r.integers(-20, 20, 3)
                # class-specific stripe frequency, a second learnable cue
                stripe = (np.sin(xx * (ci + 2) * np.pi / image_size) > 0.5)
                img[stripe] = np.clip(img[stripe] + base_color // 3, 0, 255)
                Image.fromarray(img.astype(np.uint8)).save(
                    os.path.join(cdir, f"img_{ii:03d}.png"))
    phylo_path = os.path.join(root, "phylogeny.phy")
    with open(phylo_path, "w") as f:
        f.write(make_synthetic_newick(names, rng))
    return train_dir, test_dir, phylo_path
