"""Interpretability: projection, galleries, pruning, part purity."""

from .heatmaps import (denormalize, draw_patch_box, jet_heatmap,
                       overlay_heatmap, save_image_grid, save_topk_gallery)
from .part_purity import eval_prototypes_parts_csv, write_topk_patch_csv
from .patches import get_img_coordinates, get_patch_size
from .pruning import presence_prune_mask, prototype_report, threshold_prune
from .topk import (ProjectionResult, make_projection_step, run_projection,
                   topk_per_prototype, topk_per_prototype_per_leaf)

__all__ = [
    "denormalize", "draw_patch_box", "jet_heatmap", "overlay_heatmap",
    "save_image_grid", "save_topk_gallery", "eval_prototypes_parts_csv",
    "write_topk_patch_csv", "get_img_coordinates", "get_patch_size",
    "presence_prune_mask", "prototype_report", "threshold_prune",
    "ProjectionResult", "make_projection_step", "run_projection",
    "topk_per_prototype", "topk_per_prototype_per_leaf",
]
