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


def _repair_interrupted_swap(path: str) -> None:
    """Finish a swap a previous save crashed in the middle of — never delete
    the only (or the newest) complete checkpoint of this name.  A ``.new``
    whose in-dir metadata landed is a fully finished save that just never got
    swapped in: PROMOTE it (it is strictly newer than the final dir).  Orbax's
    own tmp->rename makes ``.new`` existing imply its arrays are complete
    (partial writes live under ``*.orbax-checkpoint-tmp-<ts>`` names); the
    metadata check guards the microscopic window between array completion and
    the meta write, where the older checkpoint's epoch record is worth more
    than meta-less newer arrays."""
    import shutil

    new, old = path + ".new", path + ".old"
    if (os.path.isdir(new)
            and os.path.exists(os.path.join(new, "pipnet_meta.json"))):
        if os.path.isdir(path):
            if os.path.isdir(old):
                shutil.rmtree(old)
            os.rename(path, old)
        os.rename(new, path)
        if os.path.isdir(old):
            shutil.rmtree(old)
    elif not os.path.isdir(path) and os.path.isdir(old):
        os.rename(old, path)


def save_checkpoint(checkpoint_dir: str, name: str, state: TrainState,
                    **extra) -> str:
    """Crash-safe overwrite: the new checkpoint is fully written to
    ``<name>.new`` (orbax's own tmp->rename makes that step atomic) BEFORE the
    previous one is touched, then the two are swapped.  A hang or crash
    mid-save — observed in practice when the device->host fetch inside orbax
    serialization wedges on the tunneled backend — can therefore never
    destroy the last complete checkpoint (the earlier delete-then-save
    ordering did exactly that).  Run metadata (epoch, phase, ...) is written
    INSIDE the checkpoint directory (``pipnet_meta.json``) so weights and
    metadata swap in one atomic rename; the reference instead parses epochs
    out of checkpoint FILENAMES (main_dist.py:405-408)."""
    import glob
    import json
    import shutil

    path = os.path.abspath(os.path.join(checkpoint_dir, name))
    new, old = path + ".new", path + ".old"
    # leftovers from a previous crashed/hung save of this name: repair an
    # interrupted swap first (promote, don't delete), then drop what remains
    _repair_interrupted_swap(path)
    for stale in [new, old] + glob.glob(path + "*orbax-checkpoint-tmp*"):
        if os.path.isdir(stale):
            shutil.rmtree(stale)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(new, _to_saveable(state), force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(new, "pipnet_meta.json"), "w") as f:
        json.dump(extra, f)
    if os.path.isdir(path):
        os.rename(path, old)
    os.rename(new, path)
    if os.path.isdir(old):
        shutil.rmtree(old)
    # stale sidecar from the pre-in-dir-meta format would otherwise shadow
    # nothing but confuse humans reading the directory
    if os.path.exists(path + ".meta.json"):
        os.remove(path + ".meta.json")
    return path


def resolve_checkpoint_dir(path: str) -> Optional[str]:
    """The directory to restore for checkpoint ``path``, surviving a crash at
    any point of the save/swap: the final name, else a completed-but-unswapped
    ``.new``, else the displaced ``.old``.  None if no complete checkpoint
    exists."""
    p = os.path.abspath(path)
    if os.path.isdir(p):
        return p
    new, old = p + ".new", p + ".old"
    if os.path.isdir(new) and os.path.exists(
            os.path.join(new, "pipnet_meta.json")):
        return new
    for cand in (old, new):
        if os.path.isdir(cand):
            return cand
    return None


def checkpoint_meta(path: str) -> Optional[Dict[str, Any]]:
    """The run-metadata dict of checkpoint ``path`` without restoring arrays;
    None if no complete checkpoint exists there.  Reads the in-dir
    ``pipnet_meta.json``, falling back to the legacy ``.meta.json`` sidecars."""
    import json
    resolved = resolve_checkpoint_dir(path)
    if resolved is None:
        return None
    for mp in (os.path.join(resolved, "pipnet_meta.json"),
               resolved + ".meta.json",
               os.path.abspath(path) + ".meta.json"):
        if os.path.exists(mp):
            with open(mp) as f:
                return json.load(f)
    return {}


def latest_train_checkpoint(checkpoint_dir: str):
    """(path, meta) of the NEWEST restorable train-phase checkpoint by
    recorded epoch — the rolling ``net_trained`` plus any ``net_trained_<E>``
    / ``net_trained_last`` snapshots.  With ``--checkpoint_every > 1`` a
    periodic snapshot can be newer than the rolling save; resuming from the
    rolling name alone would silently discard those epochs.
    (None, {}) when nothing restorable exists."""
    names = set()
    if os.path.isdir(checkpoint_dir):
        for entry in os.listdir(checkpoint_dir):
            base = entry
            for suf in (".meta.json", ".new", ".old"):
                if base.endswith(suf):
                    base = base[: -len(suf)]
            if base == "net_trained" or base.startswith("net_trained_"):
                names.add(base)
    best = None
    for name in sorted(names):
        p = os.path.join(checkpoint_dir, name)
        meta = checkpoint_meta(p)
        if meta is None:
            continue
        key = (int(meta.get("epoch", -1)), name == "net_trained")
        if best is None or key > best[0]:
            best = (key, p, meta)
    return (best[1], best[2]) if best else (None, {})


def restore_checkpoint(path: str, template: Optional[TrainState] = None):
    """Returns (TrainState, extra dict).  With a template the restore is
    shape/dtype checked; without, raw arrays are returned."""
    resolved = resolve_checkpoint_dir(path)
    if resolved is None:
        raise FileNotFoundError(f"no checkpoint at {path} (nor .new/.old)")
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        restored = ckptr.restore(resolved, _to_saveable(template))
    else:
        restored = ckptr.restore(resolved)
    extra = checkpoint_meta(path) or {}
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
