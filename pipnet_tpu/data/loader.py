"""Batch loaders: two-view training loader, eval/projection loaders.

Counterpart of ``util/data.py:466-652`` (``get_dataloaders``'s seven loaders)
re-designed for a single-host JAX input pipeline:

* map-style datasets over ``ImageFolder`` with numpy RNG (seeded, resumable);
* the reference's drop_last rule: drop the remainder iff it is < 20%% of a
  batch (``util/data.py:511-515``);
* weighted (inverse class frequency) sampling with replacement
  (``util/data.py:497-507``);
* leave-out-class filtering (``util/data.py:486-495,516-523``);
* per-host sharding for multi-host training (the DistributedSampler
  equivalent, ``main_dist.py:54-68``): each host reads a strided subset;
* background-thread prefetch (the host has few cores; decode/augment overlap
  with device steps).
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .augment import EvalTransform, TwoViewTransform
from .folder import ImageFolder


@dataclass
class Batch:
    xs1: np.ndarray          # (B, H, W, 3) float32, normalized
    xs2: Optional[np.ndarray]
    ys: np.ndarray           # (B,) int64


class TwoViewDataset:
    """(view1, view2, target) per sample (ref TwoAugSupervisedDataset,
    util/data.py:880-901)."""

    def __init__(self, folder: ImageFolder, transform: TwoViewTransform):
        self.folder = folder
        self.transform = transform

    def __len__(self):
        return len(self.folder)

    def get(self, index: int, rng: np.random.Generator):
        img, target = self.folder.load(index)
        v1, v2 = self.transform(img, rng)
        return v1, v2, target


class EvalDataset:
    def __init__(self, folder: ImageFolder, transform: EvalTransform):
        self.folder = folder
        self.transform = transform

    def __len__(self):
        return len(self.folder)

    def get(self, index: int, rng=None):
        img, target = self.folder.load(index)
        return self.transform(img), None, target


def reference_drop_last(n: int, batch_size: int) -> bool:
    """Drop the ragged tail iff it is < 20% of a batch (util/data.py:511-515)."""
    return (n % batch_size) / batch_size < 0.2


class Loader:
    """Epoch-based batch iterator with shuffling / weighted sampling /
    leave-out filtering / host sharding / threaded prefetch."""

    def __init__(self, dataset, batch_size: int, *, seed: int = 1,
                 shuffle: bool = True, drop_last: Optional[bool] = None,
                 weighted: bool = False,
                 keep_labels: Optional[Sequence[int]] = None,
                 num_hosts: int = 1, host_id: int = 0,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.weighted = weighted
        self.num_hosts = num_hosts
        self.host_id = host_id
        self.prefetch = prefetch

        targets = dataset.folder.targets
        idx = np.arange(len(dataset))
        if keep_labels is not None:
            keep = np.isin(targets, np.asarray(list(keep_labels)))
            idx = idx[keep]
        self.indices = idx
        self.targets = targets
        if weighted:
            counts = np.bincount(targets[idx])
            w = 1.0 / np.maximum(counts, 1)
            self.sample_weights = w[targets[idx]]
            self.sample_weights /= self.sample_weights.sum()
        else:
            self.sample_weights = None

        n_local = len(self.indices) // num_hosts if num_hosts > 1 else len(self.indices)
        self.drop_last = (reference_drop_last(n_local, batch_size)
                          if drop_last is None else drop_last)
        self._epoch_len = (n_local // batch_size if self.drop_last
                           else -(-n_local // batch_size))

    def __len__(self):
        return self._epoch_len

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        rng = np.random.default_rng((self.seed, epoch))
        if self.weighted:
            order = rng.choice(self.indices, size=len(self.indices), replace=True,
                               p=self.sample_weights)
        elif self.shuffle:
            order = rng.permutation(self.indices)
        else:
            order = self.indices
        if self.num_hosts > 1:
            # strided shard like DistributedSampler (pad by wrapping)
            n = -(-len(order) // self.num_hosts) * self.num_hosts
            order = np.concatenate([order, order[: n - len(order)]])
            order = order[self.host_id::self.num_hosts]
        return order

    def epoch(self, epoch: int = 0) -> Iterator[Batch]:
        order = self._epoch_indices(epoch)
        nb = self._epoch_len
        rng = np.random.default_rng((self.seed, epoch, self.host_id, 7))

        def make_batch(bi: int) -> Batch:
            rows = order[bi * self.batch_size:(bi + 1) * self.batch_size]
            v1s, v2s, ts = [], [], []
            for i in rows:
                v1, v2, t = self.dataset.get(int(i), rng)
                v1s.append(v1)
                if v2 is not None:
                    v2s.append(v2)
                ts.append(t)
            return Batch(xs1=np.stack(v1s),
                         xs2=np.stack(v2s) if v2s else None,
                         ys=np.asarray(ts, np.int64))

        if self.prefetch <= 0:
            for bi in range(nb):
                yield make_batch(bi)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            for bi in range(nb):
                if stop.is_set():
                    return
                q.put(make_batch(bi))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                b = q.get()
                if b is None:
                    return
                yield b
        finally:
            stop.set()


@dataclass
class Loaders:
    """The reference's seven-loader bundle (util/data.py:652)."""
    train: Loader
    train_pretraining: Loader
    train_normal: Loader
    train_normal_augment: Loader
    project: Loader
    test: Loader
    test_project: Loader
    classes: List[str]


def build_loaders(train_dir: str, test_dir: str, *, image_size: int = 224,
                  batch_size: int = 64, batch_size_pretrain: int = 128,
                  seed: int = 1, project_dir: Optional[str] = None,
                  train_dir_pretrain: Optional[str] = None,
                  test_dir_projection: Optional[str] = None,
                  weighted: bool = False,
                  leave_out_classes: Optional[Sequence[str]] = None,
                  disable_transform2: bool = False, cars: bool = False,
                  grayscale: bool = False,
                  num_hosts: int = 1, host_id: int = 0) -> Loaders:
    from .folder import scan_image_folder

    train_folder = scan_image_folder(train_dir)
    test_folder = scan_image_folder(test_dir)
    project_folder = scan_image_folder(project_dir or train_dir)
    pretrain_folder = (scan_image_folder(train_dir_pretrain)
                       if train_dir_pretrain else train_folder)
    testproj_folder = (scan_image_folder(test_dir_projection)
                       if test_dir_projection else test_folder)

    keep = None
    if leave_out_classes:
        if weighted:
            raise ValueError("leave_out_classes and weighted sampling are mutually "
                             "exclusive (ref util/data.py:483-484)")
        keep = [train_folder.class_to_idx[c] for c in train_folder.classes
                if c not in set(leave_out_classes)]

    tv = TwoViewTransform(image_size, disable_transform2=disable_transform2,
                          cars=cars, grayscale=grayscale)
    tvp = TwoViewTransform(image_size, pretrain=True,
                           disable_transform2=disable_transform2, cars=cars,
                           grayscale=grayscale)
    ev = EvalTransform(image_size, grayscale=grayscale)

    common = dict(seed=seed, num_hosts=num_hosts, host_id=host_id)
    return Loaders(
        train=Loader(TwoViewDataset(train_folder, tv), batch_size,
                     weighted=weighted, keep_labels=keep, **common),
        train_pretraining=Loader(TwoViewDataset(pretrain_folder, tvp),
                                 batch_size_pretrain, weighted=weighted,
                                 keep_labels=keep, **common),
        train_normal=Loader(EvalDataset(train_folder, ev), batch_size,
                            keep_labels=keep, **common),
        train_normal_augment=Loader(TwoViewDataset(train_folder, tv), batch_size,
                                    keep_labels=keep, **common),
        project=Loader(EvalDataset(project_folder, ev), 1, shuffle=False,
                       drop_last=False, seed=seed),
        test=Loader(EvalDataset(test_folder, ev), batch_size, shuffle=True,
                    drop_last=False, seed=seed),
        test_project=Loader(EvalDataset(testproj_folder, ev), 1, shuffle=False,
                            drop_last=False, seed=seed),
        classes=train_folder.classes,
    )
