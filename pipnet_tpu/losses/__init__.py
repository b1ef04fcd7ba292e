"""Loss catalog and aggregation."""

from .aggregate import LossWeights, compute_total_loss
from .catalog import (ALIGN_EPS, EPS, TreeConsts, align_and_uniform,
                      align_loss_unit_space, align_pf_loss,
                      byol_regression_loss, classification_loss, entropy_loss,
                      kernel_orth_loss, l2_normalize, make_tree_consts,
                      min_contrast_loss, ood_bce_loss, ood_entropy_loss,
                      overspecificity_losses, tanh_desc_loss, tanh_loss,
                      uniform_loss)

__all__ = [
    "LossWeights", "compute_total_loss", "TreeConsts", "make_tree_consts",
    "align_and_uniform", "align_loss_unit_space", "align_pf_loss",
    "byol_regression_loss", "classification_loss", "entropy_loss",
    "kernel_orth_loss", "l2_normalize", "min_contrast_loss", "ood_bce_loss",
    "ood_entropy_loss", "overspecificity_losses", "tanh_desc_loss",
    "tanh_loss", "uniform_loss", "EPS", "ALIGN_EPS",
]
