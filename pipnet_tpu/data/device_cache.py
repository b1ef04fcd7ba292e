"""Device-resident dataset cache: the whole resized uint8 base array lives in
HBM; the per-step host->device transfer shrinks to a (B,) index vector.

TPU-idiomatic for small/medium datasets (CUB-scale fits easily: 5994 train
images at 232² uint8 = 0.97 GB of a v5e's 16 GB): the input pipeline becomes
one device gather + the existing on-device augmentation
(ops/device_geometric + ops/device_augment), so end-to-end throughput equals
device-only throughput — there is nothing left to overlap.

It is also the load-bearing fix for this sandbox's tunneled backend, whose
proxy client retains the host staging buffer of EVERY host->device transfer
for the life of the process (measured: ~40 MB leaked per training step with
per-batch puts, unconditionally — surviving full syncs, gc, explicit
``.delete()``, and buffer reuse; probe script in BENCH_NOTES round 3).  With
per-step payloads reduced to a few hundred bytes the retention is noise.

The cache is per-dataset-object and built lazily on first use; the trainer
drops the pretraining cache after the pretrain phase to return its HBM.

Reference equivalence: none — the reference streams every batch through
torch DataLoader workers + PCIe each step (util/data.py:652-700).  The
gathered bytes are bit-identical to the streamed path's ``xs1`` (the SAME
``base_view``/eval-resize uint8 arrays, stacked once instead of per batch);
for eval the ImageNet normalize runs on device in f32, matching
``to_normalized_array`` to float rounding.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .augment import IMAGENET_MEAN, IMAGENET_STD
from .loader import EvalDataset, Loader, TwoViewDataset


class DeviceDataCache:
    """One dataset's base images as a single device-resident uint8 array.

    ``kind``:
      - ``"u8base"`` — TwoViewDataset in device_geometric mode; ``fetch``
        returns the uint8 base batch the jitted train step's on-device
        transform1 consumes.
      - ``"eval"`` — EvalDataset; ``fetch`` returns the normalized f32 batch
        (gather + ImageNet normalize fused in one jitted fn on device).
    """

    def __init__(self, array_host: np.ndarray, kind: str, mesh=None):
        import jax
        import jax.numpy as jnp

        self.kind = kind
        self.nbytes = int(array_host.nbytes)
        if mesh is not None and mesh.devices.size > 1:
            # multi-device: replicate the base array across the mesh; the
            # index vector arrives sharded on the data axis, so each device
            # gathers only ITS batch shard from its local replica and the
            # gathered batch comes out data-sharded — no collective needed
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(mesh, P())
            self.array = jax.device_put(array_host, rep)
            out = NamedSharding(mesh, P("data"))
            kw = dict(in_shardings=(rep, out), out_shardings=out)
        else:
            self.array = jax.device_put(array_host)
            kw = {}

        if kind == "u8base":
            self._fetch = jax.jit(lambda d, i: d[i], **kw)
        else:
            mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
            std = jnp.asarray(IMAGENET_STD, jnp.float32)

            def _norm(d, i):
                x = d[i].astype(jnp.float32) / 255.0
                return (x - mean) / std

            self._fetch = jax.jit(_norm, **kw)

    def fetch(self, rows: np.ndarray):
        """Device batch for host index rows (a tiny H2D + one device gather)."""
        return self._fetch(self.array, np.ascontiguousarray(rows, np.int32))

    def gather(self, rows_device):
        """Device batch for an already-transferred index vector."""
        return self._fetch(self.array, rows_device)

    def delete(self) -> None:
        """Return the HBM (e.g. the pretrain cache after the pretrain phase)."""
        try:
            self.array.delete()
        except Exception:
            pass


def estimate_bytes(dataset) -> Optional[int]:
    """Device bytes the cache for ``dataset`` would take; None if the dataset
    kind is not cacheable."""
    n = len(dataset)
    if isinstance(dataset, TwoViewDataset):
        if not dataset.device_geometric:
            return None
        s = dataset.transform.resize_to
        return n * s * s * 3
    if isinstance(dataset, EvalDataset):
        s = dataset.transform.image_size
        return n * s * s * 3
    return None


def build_device_cache(loader: Loader, mesh=None) -> Optional[DeviceDataCache]:
    """Materialize the device cache for ``loader``'s dataset, or None when the
    dataset kind does not support it.  Budget/enable gating is the caller's
    job (train/trainer.py applies PIPNET_DEVICE_DATA / PIPNET_DEVICE_CACHE_MB).
    With a multi-device ``mesh`` the array replicates across it and gathers
    stay local per data shard."""
    ds = loader.dataset
    if isinstance(ds, TwoViewDataset) and ds.device_geometric:
        base = np.stack([ds._base(i) for i in range(len(ds))])
        return DeviceDataCache(base, "u8base", mesh=mesh)
    if isinstance(ds, EvalDataset):
        base = np.stack([ds.transform.base_view(ds.folder.load(i)[0])
                         for i in range(len(ds))])
        return DeviceDataCache(base, "eval", mesh=mesh)
    return None
