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
    path = os.path.abspath(os.path.join(checkpoint_dir, name))
    # force=True alone is not enough on this orbax version: the atomic
    # tmp->final rename still collides with a prior checkpoint of the same
    # name (seen when net_trained is re-saved every save_every epochs), so
    # drop the stale directory first
    if os.path.isdir(path):
        import shutil
        shutil.rmtree(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _to_saveable(state), force=True)
    ckptr.wait_until_finished()
    # run metadata (epoch, phase, ...) travels in a sidecar JSON, not the
    # array tree — the reference instead parses epochs out of checkpoint
    # FILENAMES (main_dist.py:405-408)
    import json
    with open(path + ".meta.json", "w") as f:
        json.dump(extra, f)
    return path


def restore_checkpoint(path: str, template: Optional[TrainState] = None):
    """Returns (TrainState, extra dict).  With a template the restore is
    shape/dtype checked; without, raw arrays are returned."""
    import json
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        restored = ckptr.restore(os.path.abspath(path), _to_saveable(template))
    else:
        restored = ckptr.restore(os.path.abspath(path))
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
