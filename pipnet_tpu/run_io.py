"""Rebuild a trained run from its artifacts (the ``args.pickle`` analog).

The reference's notebooks/serving scripts all reload ``metadata/args.pickle``
and re-instantiate the network from it (``test_nb.py:44-48``,
``adversarial/adv_attack.py:7-14``).  Here the equivalent is
``metadata/config.json`` (+ ``metadata/classes.json``); this module turns a
run directory back into a live (model, tree, state) bundle for the
evaluation and serving drivers.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import List, NamedTuple, Optional

from .config import (HeadConfig, LossConfig, ModelConfig, OptimConfig,
                     RunConfig, TrainConfig)

_SUBCONFIGS = {"head": HeadConfig, "optim": OptimConfig, "loss": LossConfig,
               "model": ModelConfig, "train": TrainConfig}


def config_from_dict(cls, d: dict):
    """Rebuild a (nested, frozen) config dataclass from its asdict() JSON."""
    kw = {}
    for fld in dataclasses.fields(cls):
        if fld.name in d:
            v = d[fld.name]
            if fld.name in _SUBCONFIGS:
                v = config_from_dict(_SUBCONFIGS[fld.name], v)
            elif isinstance(v, list):
                v = tuple(tuple(x) if isinstance(x, list) else x for x in v)
            kw[fld.name] = v
    return cls(**kw)


def load_run_config(run_dir: str) -> RunConfig:
    with open(os.path.join(run_dir, "metadata", "config.json")) as f:
        saved = json.load(f)
    return RunConfig(
        model=config_from_dict(ModelConfig, saved["model"]),
        train=config_from_dict(TrainConfig, saved["train"]),
        **{k: saved[k] for k in ("log_dir", "dataset", "phylo_config",
                                 "leave_out_classes")
           if saved.get(k) is not None})


def load_classes(run_dir: str) -> Optional[List[str]]:
    """Class names saved at training time (``metadata/classes.json``) —
    lets serving run without the training dataset on disk."""
    path = os.path.join(run_dir, "metadata", "classes.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return None


class RunBundle(NamedTuple):
    cfg: RunConfig
    model: object                 # PIPNet
    tree: object                  # TreeArrays
    state: object                 # TrainState with restored params
    extra: dict                   # checkpoint sidecar (epoch, phase, ...)
    classes: List[str]


def load_run(run_dir: str, checkpoint: str = "net_trained_last",
             dataset: Optional[str] = None,
             classes: Optional[List[str]] = None,
             phylo_path: Optional[str] = None) -> RunBundle:
    """Run directory -> live model.

    ``classes`` (or ``metadata/classes.json``) avoids touching the dataset;
    otherwise the run's dataset (or the ``dataset`` override) is resolved to
    recover class names, exactly like the reference notebooks re-walking the
    ImageFolder.  ``phylo_path`` overrides the tree source (the evaluation
    driver passes the dataset's bundled phylogeny).
    """
    import jax.numpy as jnp  # noqa: F401  (jax initialized lazily)
    import jax

    from .datasets import resolve_dataset
    from .models import build_pipnet
    from .train.checkpoint import restore_checkpoint
    from .train.step import init_train_state
    from .tree import build_tree_from_config, flat_tree
    from .tree.node import Node

    cfg = load_run_config(run_dir)
    classes = classes or load_classes(run_dir)
    tree_json = os.path.join(run_dir, "metadata", "tree.json")
    have_tree_source = os.path.exists(tree_json) or phylo_path is not None

    # resolve the training dataset only when something is still missing —
    # class names, or (for runs predating metadata/tree.json) a bundled
    # phylogeny that was never recorded in the config
    if classes is None or (not have_tree_source and cfg.phylo_config is None):
        ds = dataset or cfg.dataset
        try:
            train_dir, _test, _proj, dkw = resolve_dataset(ds,
                                                           seed=cfg.train.seed)
        except Exception as e:
            missing = "class names" if classes is None else "the hierarchy"
            raise RuntimeError(
                f"cannot rebuild run {run_dir!r}: {missing} must come from "
                f"the training dataset ({ds!r}), which failed to resolve on "
                f"this host ({e}).  Pass dataset=/classes= explicitly, or "
                f"re-save the run with a version that writes "
                f"metadata/classes.json and metadata/tree.json") from e
        if classes is None:
            classes = sorted(e.name for e in os.scandir(train_dir)
                             if e.is_dir())
        phylo_path = phylo_path or dkw.get("phylo_path")

    if os.path.exists(tree_json):
        # the exact trained topology, persisted by RunLog.save_tree —
        # authoritative over any phylogeny re-derivation
        with open(tree_json) as f:
            root = Node.from_dict(json.load(f))
    elif phylo_path and str(phylo_path).endswith((".phy", ".tre")):
        root = build_tree_from_config(phylo_path, None)
    elif cfg.phylo_config:
        if not os.path.exists(str(cfg.phylo_config)):
            raise RuntimeError(
                f"run {run_dir!r} records phylogeny "
                f"{cfg.phylo_config!r}, which does not exist on this host; "
                f"refusing to fall back to a flat tree (the checkpoint "
                f"shapes would not match).  Restore that file, or pass "
                f"phylo_path=")
        if str(cfg.phylo_config).endswith((".phy", ".tre")):
            root = build_tree_from_config(cfg.phylo_config, None)
        else:
            import yaml
            with open(cfg.phylo_config) as f:
                pc = yaml.safe_load(f)
            d = pc.get("phyloDistances_string")
            # $ENV_VAR references keep shipped configs portable — same
            # expansion main.py applies when training (main.py:228)
            root = build_tree_from_config(
                os.path.expandvars(pc["phylogeny_path"]),
                None if d in ("None", None) else d)
    else:
        root = flat_tree(classes, cfg.model.num_features or 512)

    model, tree = build_pipnet(root, cfg.model,
                               weighted=cfg.train.loss.weighted_ce,
                               class_names=classes)
    state = init_train_state(
        model, jax.random.PRNGKey(cfg.train.seed),
        jnp.zeros((2, cfg.model.image_size, cfg.model.image_size, 3)))
    ckpt = os.path.join(run_dir, "checkpoints", checkpoint)
    state, extra = restore_checkpoint(ckpt, state)
    return RunBundle(cfg=cfg, model=model, tree=tree, state=state,
                     extra=extra, classes=list(classes))
