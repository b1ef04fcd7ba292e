"""Model zoo: flax backbones and the stacked prototype-head PIPNet."""

from .convnext import (ConvNeXtTiny, convnext_param_groups, convnext_tiny_7,
                       convnext_tiny_13, convnext_tiny_26)
from .heads import PrototypeHead
from .pipnet import (BACKBONES, PIPNet, assign_prototype_budgets, build_pipnet,
                     joint_leaf_distribution, joint_leaf_log_distribution,
                     latent_shape)
from .resnet import (ResNetFeatures, resnet18_features, resnet34_features,
                     resnet50_features, resnet50_features_inat,
                     resnet101_features, resnet152_features,
                     resnet_param_groups)

__all__ = [
    "ConvNeXtTiny", "convnext_tiny_26", "convnext_tiny_13", "convnext_tiny_7",
    "convnext_param_groups", "PrototypeHead", "PIPNet", "BACKBONES",
    "assign_prototype_budgets", "build_pipnet", "latent_shape",
    "joint_leaf_distribution", "joint_leaf_log_distribution",
    "ResNetFeatures", "resnet18_features", "resnet34_features",
    "resnet50_features", "resnet50_features_inat", "resnet101_features",
    "resnet152_features", "resnet_param_groups",
]
