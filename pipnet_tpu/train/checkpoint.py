"""Checkpointing with orbax: step-in-state, no filename parsing.

Replaces the reference's torch.save dict + parse-epoch-from-filename resume
(``main.py:703-724``, ``main_dist.py:405-408``).  Checkpoint names mirror the
reference's cadence so downstream tooling finds the same artifacts:
``net_pretrained``, ``net_trained``, ``net_trained_<E>``, ``net_trained_last``
under ``<log_dir>/checkpoints`` (ref util/log.py:31-32)."""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .step import TrainState


def _to_saveable(state: TrainState) -> Dict[str, Any]:
    return {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_mu": state.opt.mu,
        "opt_nu": state.opt.nu,
        "opt_count": state.opt.count,
        "rng": jax.random.key_data(state.rng) if jax.dtypes.issubdtype(
            state.rng.dtype, jax.dtypes.prng_key) else state.rng,
        "byol": state.byol,
    }


def save_checkpoint(checkpoint_dir: str, name: str, state: TrainState,
                    **extra) -> str:
    """Crash-safe overwrite: the new checkpoint is fully written to
    ``<name>.new`` (orbax's own tmp->rename makes that step atomic) BEFORE the
    previous one is touched, then the two are swapped.  A hang or crash
    mid-save — observed in practice when the device->host fetch inside orbax
    serialization wedges on the tunneled backend — can therefore never
    destroy the last complete checkpoint (the earlier delete-then-save
    ordering did exactly that)."""
    import glob
    import json
    import shutil

    path = os.path.abspath(os.path.join(checkpoint_dir, name))
    new, old = path + ".new", path + ".old"
    # leftovers from a previous crashed/hung save of this name
    for stale in [new, old] + glob.glob(path + "*.orbax-checkpoint-tmp"):
        if os.path.isdir(stale):
            shutil.rmtree(stale)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(new, _to_saveable(state), force=True)
    ckptr.wait_until_finished()
    # run metadata (epoch, phase, ...) travels in a sidecar JSON, not the
    # array tree — the reference instead parses epochs out of checkpoint
    # FILENAMES (main_dist.py:405-408)
    with open(new + ".meta.json", "w") as f:
        json.dump(extra, f)
    if os.path.isdir(path):
        os.rename(path, old)
    os.rename(new, path)
    os.replace(new + ".meta.json", path + ".meta.json")
    if os.path.isdir(old):
        shutil.rmtree(old)
    return path


def resolve_checkpoint_dir(path: str) -> Optional[str]:
    """The directory to restore for checkpoint ``path``, surviving a crash at
    any point of the save/swap: the final name, else a completed-but-unswapped
    ``.new``, else the displaced ``.old``.  None if no complete checkpoint
    exists."""
    p = os.path.abspath(path)
    for cand in (p, p + ".new", p + ".old"):
        if os.path.isdir(cand):
            return cand
    return None


def restore_checkpoint(path: str, template: Optional[TrainState] = None):
    """Returns (TrainState, extra dict).  With a template the restore is
    shape/dtype checked; without, raw arrays are returned."""
    import json
    resolved = resolve_checkpoint_dir(path)
    if resolved is None:
        raise FileNotFoundError(f"no checkpoint at {path} (nor .new/.old)")
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        restored = ckptr.restore(resolved, _to_saveable(template))
    else:
        restored = ckptr.restore(resolved)
    meta_path = resolved + ".meta.json"
    if not os.path.exists(meta_path):
        meta_path = os.path.abspath(path) + ".meta.json"
    extra = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            extra = json.load(f)
    from .optimizer import AdamState
    rng = restored["rng"]
    if not jax.dtypes.issubdtype(getattr(rng, "dtype", np.uint32),
                                 jax.dtypes.prng_key):
        rng = jax.random.wrap_key_data(np.asarray(rng, np.uint32))
    state = TrainState(
        params=restored["params"], batch_stats=restored.get("batch_stats") or {},
        opt=AdamState(mu=restored["opt_mu"], nu=restored["opt_nu"],
                      count=restored["opt_count"]),
        rng=rng, byol=restored.get("byol") or ())
    return state, extra


def load_backbone_only(path: str, state: TrainState) -> TrainState:
    """Partial load of backbone + add-on, like ``--state_dict_dir_backbone``
    (main.py:319-348): everything else (classifier, presence) keeps its fresh
    init; the multiplier is pinned to 2.0."""
    restored, _ = restore_checkpoint(path)
    new_params = dict(state.params)
    new_params["backbone"] = restored.params["backbone"]
    head = dict(state.params["head"])
    head["add_on_kernel"] = restored.params["head"]["add_on_kernel"]
    if "add_on_bias" in restored.params["head"] and "add_on_bias" in head:
        head["add_on_bias"] = restored.params["head"]["add_on_bias"]
    head["multiplier"] = np.asarray([2.0], np.float32)
    new_params["head"] = head
    bs = restored.batch_stats if restored.batch_stats else state.batch_stats
    return state._replace(params=new_params, batch_stats=bs)
