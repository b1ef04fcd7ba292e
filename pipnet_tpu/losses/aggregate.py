"""Total-loss aggregation with the reference's phase-dependent weight schedule.

Mirrors ``train_pipnet``'s hard-coded weight tables
(``pipnet/train.py:148-177``) and ``calculate_loss``'s gating rules
(``pipnet/train.py:852-1217``) as one pure function suitable for
``jax.value_and_grad`` inside a jitted train step.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import LossConfig
from . import catalog as C
from .catalog import TreeConsts


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """Phase weight table (ref pipnet/train.py:148-177)."""
    align_pf: float
    byol: float
    align: float = 0.5
    unif: float = 3.0
    tanh: float = 5.0
    cl: float = 0.0
    ood: float = 0.0
    orth: float = 0.5

    @staticmethod
    def pretrain(epoch: int, nr_epochs: int) -> "LossWeights":
        return LossWeights(align_pf=float(epoch) / float(nr_epochs), byol=0.5,
                           tanh=5.0, cl=0.0, ood=0.0)

    @staticmethod
    def train(cl_weight: float) -> "LossWeights":
        return LossWeights(align_pf=5.0, byol=2.0, tanh=2.0, cl=cl_weight, ood=0.2)


def resolve_tanh_eps(cfg: LossConfig, min_contrast_ran: bool) -> float:
    """Epsilon for every -log(tanh(x)+eps) term this step.

    Reference-exact default (verified by tests/test_reference_parity.py):
    calculate_loss receives EPS=1e-8 (pipnet/train.py:238) but its
    min-contrast block rebinds the local EPS to 1e-12 BEFORE any tanh term
    runs (pipnet/train.py:1024), so min-contrast steps use 1e-12.
    ``cfg.tanh_eps`` overrides both — the opt-in random-init stabilizer
    bounding the -1/(x+eps) gradient (see LossConfig.tanh_eps).
    """
    if cfg.tanh_eps is not None:
        return cfg.tanh_eps
    return 1e-12 if min_contrast_ran else C.EPS


def compute_total_loss(tc: TreeConsts,
                       outputs: Dict[str, jnp.ndarray],
                       ys: jnp.ndarray,
                       w_eff: jnp.ndarray,
                       add_on_kernel: jnp.ndarray,
                       proto_presence: jnp.ndarray,
                       multiplier: jnp.ndarray,
                       cfg: LossConfig,
                       weights: LossWeights,
                       *,
                       tree=None,
                       pretrain: bool,
                       finetune: bool,
                       epoch: int = 1,
                       ood_present: bool = False,
                       rng: Optional[jax.Array] = None,
                       byol_online: Optional[jnp.ndarray] = None,
                       byol_target: Optional[jnp.ndarray] = None,
                       ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One step's total loss + per-loss scalars for logging.

    ``outputs`` is the model forward dict (features/proto_features/pooled/
    logits) on the two-view batch; ``ys`` the duplicated labels (-1 = OOD).
    Gating mirrors calculate_loss: every per-node term is normalized by the
    node count; nodes with no in-batch descendants contribute 0.
    """
    aux: Dict[str, jnp.ndarray] = {}
    total = jnp.zeros((), jnp.float32)

    if cfg.byol and not finetune and byol_online is not None:
        byol = C.byol_regression_loss(byol_online, byol_target)
        total = total + weights.byol * byol
        aux["byol"] = byol

    if not finetune and (cfg.align or cfg.uni):
        if cfg.uni and not cfg.align:
            raise ValueError("uni can only be used together with align (ref pipnet/train.py:923-924)")
        a, u = C.align_and_uniform(outputs["features"], align=cfg.align, uni=cfg.uni)
        if cfg.align:
            total = total + weights.align * a
            aux["align"] = a
        if cfg.uni:
            total = total + weights.unif * u
            aux["uniform"] = u

    pooled, logits = outputs["pooled"], outputs["logits"]

    if (not pretrain) and cfg.mask_prune_overspecific and epoch >= cfg.mask_prune_start_epoch:
        from ..ops.segment import soft_gumbel
        presence_rng = (jax.random.fold_in(rng, 1) if rng is not None
                        else jax.random.PRNGKey(0))
        presence = soft_gumbel(proto_presence, presence_rng, tau=0.5)[:, 1]
        os = C.overspecificity_losses(
            tc, pooled, ys, w_eff, presence,
            boost=cfg.mask_prune_boost,
            geometric_mean=cfg.geometric_mean_overspecificity,
            sg_score=cfg.sg_before_masking)
        total = total + os["overspecificity"] + os["mask_l1"]
        aux["overspecificity"] = os["overspecificity"]
        aux["mask_l1"] = os["mask_l1"]

    min_contrast_ran = (not pretrain) and (not finetune) and cfg.minimize_contrasting_set
    if min_contrast_ran:
        mc, mc_pn = C.min_contrast_loss(tc, pooled, ys, w_eff, topk=cfg.min_contrast_topk)
        total = total + cfg.min_contrast_weight * mc
        aux["min_contrast"] = mc

    tanh_eps = resolve_tanh_eps(cfg, min_contrast_ran)

    if not finetune and cfg.align_pf:
        if "align_pf_logsum" in outputs:
            # fused no-pf head: the per-patch log-reduction already happened
            # in-kernel (ops/pallas_head.make_fused_head_nopf)
            hw = outputs["features"].shape[1] * outputs["features"].shape[2]
            apf, apf_pn = C.align_pf_from_logsum(
                tc, outputs["align_pf_logsum"], ys, hw)
        else:
            align_eps = (cfg.align_eps if cfg.align_eps is not None
                         else C.ALIGN_EPS)
            apf, apf_pn = C.align_pf_loss(tc, outputs["proto_features"], ys,
                                          eps=align_eps)
        total = total + weights.align_pf * apf
        aux["align_pf"] = apf
        aux["align_pf_per_node"] = apf_pn

    if not finetune and cfg.tanh and (cfg.tanh_during_second_phase or pretrain):
        th, th_pn = C.tanh_loss(tc, pooled, ys, eps=tanh_eps)
        total = total + weights.tanh * th
        aux["tanh"] = th
        aux["tanh_per_node"] = th_pn

    if (not finetune) and (not pretrain) and cfg.tanh_desc:
        td, td_pn = C.tanh_desc_loss(tc, pooled, ys, w_eff, eps=tanh_eps)
        total = total + cfg.tanh_desc_weight * td
        aux["tanh_desc"] = td
        aux["tanh_desc_per_node"] = td_pn

    if (not pretrain) and (not finetune) and cfg.kernel_orth:
        ko, ko_pn = C.kernel_orth_loss(tree, tc, add_on_kernel, w_eff,
                                       cap=cfg.kernel_orth_cap)
        total = total + weights.orth * ko
        aux["kernel_orth"] = ko
        aux["kernel_orth_per_node"] = ko_pn

    if not pretrain:
        cl, cl_pn = C.classification_loss(
            tc, logits, ys, multiplier,
            pipnet_sparsity=cfg.pipnet_sparsity, weighted=cfg.weighted_ce,
            focal_gamma=cfg.focal_loss_gamma if cfg.focal_loss else None)
        total = total + weights.cl * cl
        aux["class"] = cl
        aux["class_per_node"] = cl_pn

        if ood_present:
            ob, ob_pn = C.ood_bce_loss(tc, logits, ys, multiplier)
            total = total + weights.ood * ob
            aux["ood_bce"] = ob

    if cfg.minmaximize:
        raise NotImplementedError(
            "minmaximize survives in the reference only as a dead stub that would "
            "crash if enabled (pipnet/train.py:1203-1214 backwards an int); not supported")

    aux["total"] = total
    return total, aux
