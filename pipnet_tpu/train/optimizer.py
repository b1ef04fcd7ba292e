"""Optimizers, schedules and phase masks.

The reference uses TWO torch AdamW optimizers with parameter groups at
different learning rates (``util/args.py:447-571``), per-batch schedulers
(CosineAnnealingLR for the net, CosineAnnealingWarmRestarts with fractional
epochs for the classifier, ``main.py:398,502-507``), and an epoch-level
``requires_grad`` state machine (``main.py:521-626``).

TPU-native redesign: one functional AdamW with
* a static **group label tree** (backbone / freeze / train / add_on /
  classifier / presence / frozen) mapping each parameter to its base LR;
* per-leaf step counts and moment masking, so "not stepped this epoch" leaves
  keep their Adam state and bias correction exactly like torch params with
  ``requires_grad=False`` (whose ``.grad`` stays None);
* schedules as pure functions of the step counter evaluated inside the jitted
  step (no Python scheduler objects to fast-forward on resume — cf. the
  reference's replay hack, ``main_dist.py:542-567``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import OptimConfig, TrainConfig

PyTree = Any


# ---------------------------------------------------------------------------
# group labeling
# ---------------------------------------------------------------------------

def _flat_paths(tree: PyTree):
    return jax.tree_util.tree_flatten_with_path(tree)


def path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def label_params(params: PyTree, backbone_arch: str) -> PyTree:
    """Assign each parameter a group label.

    Mirrors the reference partitioning (``util/args.py:464-556``):
    net optimizer groups 'backbone' @ lr_net, 'freeze'/'train' @ lr_block,
    'add_on' @ lr_block*10; classifier optimizer 'classifier' and 'presence'
    @ lr; 'frozen' params never update (requires_grad=False in the reference).
    """
    from ..models.convnext import convnext_param_groups
    from ..models.resnet import resnet_param_groups

    leaves, treedef = _flat_paths(params)
    # find backbone module names
    labels = []
    for path, leaf in leaves:
        p = path_str(path)
        if "/head/" in p or p.startswith("head/") or "head" == p.split("/")[0] or (
                "params/head" in p):
            if "add_on" in p:
                labels.append("add_on")
            elif "cls_weight" in p or "cls_bias" in p:
                labels.append("classifier")
            elif "proto_presence" in p:
                labels.append("presence")
            elif "multiplier" in p:
                labels.append("frozen")        # frozen at 2.0 (main.py:347,368,387)
            else:
                labels.append("frozen")
        elif "reducer" in p:
            labels.append("train")             # stage4_reducer trains with the tail
        elif "projector" in p or "predictor" in p:
            # BYOL heads train with the net optimizer (the reference's BYOL
            # optimizer path is NotImplemented, util/args.py:453-454; standard
            # BYOL practice puts them at the backbone-tail learning rate)
            labels.append("train")
        elif "backbone" in p:
            mod = p.split("backbone/")[-1].split("/")[0]
            if backbone_arch.startswith("convnext"):
                grp = convnext_param_groups({mod: None})[mod]
            elif backbone_arch.startswith("dinov2"):
                from ..models.vit import vit_param_groups
                grp = vit_param_groups({mod: None})[mod]
            else:
                grp = resnet_param_groups({mod: None}, backbone_arch)[mod]
            labels.append(grp)
        else:
            labels.append("frozen")
    return jax.tree_util.tree_unflatten(treedef, labels)


GROUP_TO_OPT = {
    "backbone": "net", "freeze": "net", "train": "net", "add_on": "net",
    "classifier": "cls", "presence": "cls", "frozen": None,
}


def base_lrs(cfg: OptimConfig) -> Dict[str, float]:
    return {
        "backbone": cfg.lr_net,
        "freeze": cfg.lr_block,
        "train": cfg.lr_block,
        "add_on": cfg.lr_block * 10.0,       # util/args.py:556
        "classifier": cfg.lr,
        "presence": cfg.lr,                  # util/args.py:562
        "frozen": 0.0,
    }


# ---------------------------------------------------------------------------
# schedules (pure functions of fractional progress)
# ---------------------------------------------------------------------------

def cosine_annealing(base_lr, eta_min, t, t_max):
    """torch CosineAnnealingLR value at step t of t_max."""
    frac = jnp.clip(t / jnp.maximum(t_max, 1), 0.0, 1.0)
    return eta_min + (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * frac)) / 2.0


def cosine_warm_restarts(base_lr, eta_min, epoch_frac, t0):
    """torch CosineAnnealingWarmRestarts (T_mult=1) at fractional epoch."""
    tcur = jnp.mod(epoch_frac, t0)
    return eta_min + (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * tcur / t0)) / 2.0


def clip_gradients(grads: PyTree, labels: PyTree, clip: float,
                   *, per_group: bool = False):
    """Gradient-norm clipping; returns (clipped_grads, pre-clip global norm).

    ``per_group=False``: one shared scale min(1, clip/||g||) over every leaf
    (torch clip_grad_norm_ over all parameters).  ``per_group=True``: one
    norm PER parameter group (backbone/freeze/train/add_on/classifier/
    presence) — a group with huge gradients but negligible updates (the
    just-thawed random-init deep backbone) must not shrink the steps of the
    groups doing the learning; the reference's two-optimizer split makes
    per-group the closer torch analogy anyway.  The returned norm is the
    GLOBAL one either way (logged as grad_norm for trail continuity).
    """
    gleaves = jax.tree_util.tree_leaves(grads)
    global_norm = jnp.sqrt(sum(
        jnp.sum(jnp.square(g.astype(jnp.float32))) for g in gleaves))
    if not per_group:
        scale = jnp.minimum(1.0, clip / (global_norm + 1e-12))
        return jax.tree_util.tree_map(
            lambda g: g * scale.astype(g.dtype), grads), global_norm
    lleaves = jax.tree_util.tree_leaves(labels)
    gsq: Dict[str, jnp.ndarray] = {}
    for g, lab in zip(gleaves, lleaves):
        gsq[lab] = gsq.get(lab, 0.0) + jnp.sum(
            jnp.square(g.astype(jnp.float32)))
    gscale = {lab: jnp.minimum(1.0, clip / (jnp.sqrt(s) + 1e-12))
              for lab, s in gsq.items()}
    return jax.tree_util.tree_map(
        lambda g, lab: g * gscale[lab].astype(g.dtype), grads, labels
    ), global_norm


# ---------------------------------------------------------------------------
# functional AdamW with per-leaf masking/counts
# ---------------------------------------------------------------------------

class AdamState(NamedTuple):
    mu: PyTree
    nu: PyTree
    count: PyTree        # per-leaf int32 step counts


def adam_init(params: PyTree) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    counts = jax.tree.map(lambda p: jnp.zeros((), jnp.int32), params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params), count=counts)


def adam_update(params: PyTree, grads: PyTree, state: AdamState,
                lr_tree: PyTree, mask_tree: PyTree,
                weight_decay: float = 0.0,
                b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8
                ) -> Tuple[PyTree, AdamState]:
    """One masked AdamW step.  Leaves with mask 0 keep params AND state
    untouched (torch ``requires_grad=False`` parity)."""

    def leaf(p, g, mu, nu, cnt, lr, m):
        new_cnt = cnt + m.astype(jnp.int32)
        new_mu = b1 * mu + (1 - b1) * g
        new_nu = b2 * nu + (1 - b2) * (g * g)
        c = jnp.maximum(new_cnt, 1).astype(p.dtype)
        mu_hat = new_mu / (1 - b1 ** c)
        nu_hat = new_nu / (1 - b2 ** c)
        step = lr * (mu_hat / (jnp.sqrt(nu_hat) + eps) + weight_decay * p)
        mf = m.astype(p.dtype)
        return (p - mf * step,
                jnp.where(m, new_mu, mu),
                jnp.where(m, new_nu, nu),
                new_cnt)

    out = jax.tree.map(leaf, params, grads, state.mu, state.nu, state.count,
                       lr_tree, mask_tree)
    new_params = jax.tree.map(lambda t: t[0], out, is_leaf=lambda x: isinstance(x, tuple))
    new_mu = jax.tree.map(lambda t: t[1], out, is_leaf=lambda x: isinstance(x, tuple))
    new_nu = jax.tree.map(lambda t: t[2], out, is_leaf=lambda x: isinstance(x, tuple))
    new_cnt = jax.tree.map(lambda t: t[3], out, is_leaf=lambda x: isinstance(x, tuple))
    return new_params, AdamState(mu=new_mu, nu=new_nu, count=new_cnt)


# ---------------------------------------------------------------------------
# phase machinery
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Phase:
    """Static description of one training phase's trainability
    (the requires_grad machine, main.py:431-445,521-626)."""
    name: str
    pretrain: bool = False
    finetune: bool = False
    mask_only: bool = False         # epoch > epochs_finetune_mask_prune
    backbone_frozen: bool = True    # until freeze_epochs
    classifier_trains: bool = True  # net vs classifier optimizer stepping
    net_trains: bool = True
    add_on_trains: bool = True


def phase_for_epoch(epoch: int, cfg: TrainConfig, *, pretrain: bool) -> Phase:
    if pretrain:
        return Phase(name="pretrain", pretrain=True, classifier_trains=False,
                     backbone_frozen=True, add_on_trains=True)
    if epoch <= cfg.epochs_finetune_classifier:
        return Phase(name="finetune_classifier", finetune=True, net_trains=False,
                     add_on_trains=False)
    if epoch <= cfg.epochs_finetune:
        return Phase(name="finetune", finetune=True, net_trains=False,
                     add_on_trains=True)
    if epoch > cfg.epochs_finetune_mask_prune:
        return Phase(name="mask_only", mask_only=True, net_trains=False)
    return Phase(name="train", backbone_frozen=epoch <= cfg.freeze_epochs)


def group_trainable(group: str, phase: Phase) -> bool:
    """Whether a parameter group updates in this phase."""
    if group == "frozen":
        return False
    if phase.mask_only:
        return group == "presence"
    if group in ("classifier", "presence"):
        return phase.classifier_trains and not phase.pretrain
    if not phase.net_trains:
        return False
    if group == "add_on":
        return phase.add_on_trains
    if group == "train" or group == "freeze":
        # 'freeze' group participates at lr_block whenever the net trains
        # (main.py:442-443,606-616 keep requires_grad True for params_to_freeze)
        return True
    if group == "backbone":
        return not phase.backbone_frozen and not phase.pretrain
    return False


def masks_and_lrs(labels: PyTree, phase: Phase, cfg: OptimConfig,
                  net_factor, cls_factor,
                  backbone_factor=None) -> Tuple[PyTree, PyTree]:
    """Per-leaf (mask, lr) trees for one step.

    ``net_factor``/``cls_factor`` are traced scalars in [0,1]-ish produced by
    the schedules; net groups use cosine-annealed lr, classifier groups the
    warm-restart lr.  The torch schedulers anneal each group's base lr toward
    a shared eta_min, so factors here are (lr_now / base_lr) computed by the
    caller per optimizer with base = the group base; we pass absolute lrs.

    ``backbone_factor`` (optional) overrides ``net_factor`` for the deep
    'backbone' group only — used by OptimConfig.unfreeze_warmup_epochs to
    ramp the just-unfrozen backbone lr from zero.
    """
    lrs = base_lrs(cfg)

    def to_mask(label):
        return jnp.asarray(group_trainable(label, phase))

    def to_lr(label):
        opt = GROUP_TO_OPT.get(label)
        if opt == "net":
            if label == "backbone" and backbone_factor is not None:
                return backbone_factor(lrs[label])
            return net_factor(lrs[label])
        if opt == "cls":
            return cls_factor(lrs[label])
        return jnp.zeros(())

    return jax.tree.map(to_mask, labels), jax.tree.map(to_lr, labels)
