"""Host-side data pipeline: ImageFolder, two-view TrivialAugment, loaders."""

from .augment import (EvalTransform, TrivialAugment, TwoViewTransform,
                      trivial_augment_no_color, trivial_augment_no_shape,
                      trivial_augment_no_shape_with_color)
from .folder import ImageFolder, scan_image_folder
from .loader import (Batch, EvalDataset, Loader, Loaders, TwoViewDataset,
                     build_loaders, reference_drop_last)
from .synthetic import generate_synthetic_dataset, synthetic_class_names

__all__ = [
    "EvalTransform", "TrivialAugment", "TwoViewTransform",
    "trivial_augment_no_color", "trivial_augment_no_shape",
    "trivial_augment_no_shape_with_color",
    "ImageFolder", "scan_image_folder",
    "Batch", "EvalDataset", "Loader", "Loaders", "TwoViewDataset",
    "build_loaders", "reference_drop_last",
    "generate_synthetic_dataset", "synthetic_class_names",
]
