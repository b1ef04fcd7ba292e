"""Torch checkpoint -> flax parameter conversion.

The reference initializes backbones from torchvision ImageNet weights
(``features/resnet_features.py:231-327``, ``features/convnext_features.py:18-42``)
and loads full-model / backbone-only torch checkpoints (``main.py:289-388``).
This module maps those state dicts onto our flax parameter trees:

* torchvision ``convnext_tiny`` ``features.<i>...`` keys -> ``ConvNeXtTiny``;
* torchvision ``resnet{18,34,50,101,152}`` keys -> ``ResNetFeatures``
  (including the BBN iNaturalist remap ``cb_block/rb_block -> layer4.2``,
  ref features/resnet_features.py:281-297);
* reference PIPNet full checkpoints (``module._net.* / module._<node>_add_on.*
  / module._<node>_classification.*``) -> the stacked head layout.

Conventions: torch conv weight (O, I, kH, kW) -> flax (kH, kW, I, O);
torch linear weight (O, I) -> flax dense kernel (I, O).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

from ..tree.compile import TreeArrays


def _t(x) -> np.ndarray:
    try:
        import torch
        if isinstance(x, torch.Tensor):
            return x.detach().cpu().numpy()
    except ImportError:
        pass
    return np.asarray(x)


def conv_w(x) -> np.ndarray:
    return _t(x).transpose(2, 3, 1, 0)


def dense_w(x) -> np.ndarray:
    return _t(x).transpose(1, 0)


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        return ckpt["model_state_dict"]
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        return ckpt["state_dict"]
    return ckpt


# ---------------------------------------------------------------------------
# ConvNeXt-Tiny
# ---------------------------------------------------------------------------

def convert_convnext_tiny(sd: Mapping[str, Any], prefix: str = "") -> Dict[str, Any]:
    """torchvision convnext_tiny features.* -> ConvNeXtTiny param dict."""
    p = prefix
    out: Dict[str, Any] = {}
    out["stem_conv"] = {"kernel": conv_w(sd[p + "features.0.0.weight"]),
                        "bias": _t(sd[p + "features.0.0.bias"])}
    out["stem_norm"] = {"scale": _t(sd[p + "features.0.1.weight"]),
                        "bias": _t(sd[p + "features.0.1.bias"])}
    depths = (3, 3, 9, 3)
    for stage in range(4):
        feat_idx = 1 + 2 * stage              # blocks at features.1/3/5/7
        if stage > 0:
            down_idx = 2 * stage              # downsample at features.2/4/6
            out[f"down{stage}_norm"] = {
                "scale": _t(sd[f"{p}features.{down_idx}.0.weight"]),
                "bias": _t(sd[f"{p}features.{down_idx}.0.bias"])}
            out[f"down{stage}_conv"] = {
                "kernel": conv_w(sd[f"{p}features.{down_idx}.1.weight"]),
                "bias": _t(sd[f"{p}features.{down_idx}.1.bias"])}
        for blk in range(depths[stage]):
            b = f"{p}features.{feat_idx}.{blk}.block."
            # torchvision CNBlock: 0=dwconv, 2=LayerNorm, 3=Linear, 5=Linear
            out[f"stage{stage}_block{blk}"] = {
                "dwconv_kernel": conv_w(sd[b + "0.weight"]),
                "dwconv_bias": _t(sd[b + "0.bias"]),
                "norm_scale": _t(sd[b + "2.weight"]),
                "norm_bias": _t(sd[b + "2.bias"]),
                "mlp_in_kernel": dense_w(sd[b + "3.weight"]),
                "mlp_in_bias": _t(sd[b + "3.bias"]),
                "mlp_out_kernel": dense_w(sd[b + "5.weight"]),
                "mlp_out_bias": _t(sd[b + "5.bias"]),
                "layer_scale": _t(sd[f"{p}features.{feat_idx}.{blk}.layer_scale"]).reshape(-1),
            }
    return out


# ---------------------------------------------------------------------------
# ResNet
# ---------------------------------------------------------------------------

def _bn(sd, key) -> Tuple[Dict, Dict]:
    return ({"scale": _t(sd[key + ".weight"]), "bias": _t(sd[key + ".bias"])},
            {"mean": _t(sd[key + ".running_mean"]), "var": _t(sd[key + ".running_var"])})


def convert_resnet(sd: Mapping[str, Any], layers: Tuple[int, ...],
                   bottleneck: bool, prefix: str = "") -> Tuple[Dict, Dict]:
    """torchvision resnet state dict -> (params, batch_stats)."""
    sd = {k: v for k, v in sd.items()}
    # BBN iNaturalist checkpoint remap (ref features/resnet_features.py:281-297)
    remap = {}
    for k in list(sd):
        if "cb_block" in k or "rb_block" in k:
            nk = k.replace("cb_block", "layer4.2").replace("rb_block", "layer4.3")
            remap[nk] = sd[k]
    sd.update(remap)

    p = prefix
    params: Dict[str, Any] = {"conv1": {"kernel": conv_w(sd[p + "conv1.weight"])}}
    stats: Dict[str, Any] = {}
    params["bn1"], stats["bn1"] = _bn(sd, p + "bn1")
    convs = ("conv1", "conv2", "conv3") if bottleneck else ("conv1", "conv2")
    for li, blocks in enumerate(layers):
        for bi in range(blocks):
            tname = f"{p}layer{li + 1}.{bi}."
            fname = f"layer{li + 1}_block{bi}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for ci, cname in enumerate(convs):
                bp[cname] = {"kernel": conv_w(sd[tname + f"conv{ci + 1}.weight"])}
                bp[f"bn{ci + 1}"], bs[f"bn{ci + 1}"] = _bn(sd, tname + f"bn{ci + 1}")
            if tname + "downsample.0.weight" in sd:
                bp["down_conv"] = {"kernel": conv_w(sd[tname + "downsample.0.weight"])}
                bp["down_bn"], bs["down_bn"] = _bn(sd, tname + "downsample.1")
            params[fname] = bp
            stats[fname] = bs
    return params, stats


RESNET_SPECS = {
    "resnet18": ((2, 2, 2, 2), False),
    "resnet34": ((3, 4, 6, 3), False),
    "resnet50": ((3, 4, 6, 3), True),
    "resnet50_inat": ((3, 4, 6, 3), True),
    "resnet101": ((3, 4, 23, 3), True),
    "resnet152": ((3, 8, 36, 3), True),
}


def convert_backbone(arch: str, sd: Mapping[str, Any], prefix: str = ""
                     ) -> Tuple[Dict, Dict]:
    """Returns (params, batch_stats) for the named backbone."""
    if arch.startswith("convnext"):
        return convert_convnext_tiny(sd, prefix), {}
    if arch in RESNET_SPECS:
        layers, bottleneck = RESNET_SPECS[arch]
        return convert_resnet(sd, layers, bottleneck, prefix)
    if arch.startswith("dinov2"):
        return convert_dinov2_vits14(sd, prefix), {}
    raise ValueError(f"unknown backbone arch {arch}")


# ---------------------------------------------------------------------------
# reference PIPNet full checkpoints -> stacked head
# ---------------------------------------------------------------------------

def convert_reference_pipnet(sd: Mapping[str, Any], tree: TreeArrays,
                             arch: str) -> Tuple[Dict, Dict]:
    """Map a reference HComP-Net checkpoint (per-node ``module._<node>_add_on``
    conv weights and ``module._<node>_classification`` NonNegLinear weights,
    pipnet/pipnet.py:73-98) into the stacked layout.

    Enables activation-parity checks and serving reference-trained models.
    """
    pref = "module._net." if any(k.startswith("module._net.") for k in sd) else "_net."
    backbone, stats = convert_backbone(arch, sd, pref)

    P, C, D = tree.num_protos_padded, tree.num_children_total, None
    mpre = "module." if pref.startswith("module.") else ""
    add_on = None
    presence = np.zeros((P, 2), np.float32)
    cls_w = np.full((C, P), -0.5, np.float32)
    cls_b = None
    for ni, name in enumerate(tree.node_names):
        w = conv_w(sd[f"{mpre}_{name}_add_on.weight"])[0, 0]     # (D, P_n)
        if add_on is None:
            D = w.shape[0]
            add_on = np.zeros((D, P), np.float32)
        sl = tree.node_proto_slice(ni)
        add_on[:, sl] = w
        cw = _t(sd[f"{mpre}_{name}_classification.weight"])       # (C_n, P_n)
        cs = tree.node_child_slice(ni)
        cls_w[cs, sl] = cw
        bk = f"{mpre}_{name}_classification.bias"
        if bk in sd:
            if cls_b is None:
                cls_b = np.zeros(C, np.float32)
            cls_b[cs] = _t(sd[bk])
        pk = f"{mpre}_{name}_proto_presence"
        if pk in sd:
            presence[sl] = _t(sd[pk])

    head: Dict[str, Any] = {
        "add_on_kernel": add_on,
        "cls_weight": cls_w,
        "proto_presence": presence,
        "multiplier": _t(sd.get(f"{mpre}_multiplier", np.asarray([2.0]))).reshape(1),
    }
    if cls_b is not None:
        head["cls_bias"] = cls_b
    ab = f"{mpre}_{tree.node_names[0]}_add_on.bias"
    if ab in sd:
        bias = np.zeros(P, np.float32)
        for ni, name in enumerate(tree.node_names):
            bias[tree.node_proto_slice(ni)] = _t(sd[f"{mpre}_{name}_add_on.bias"])
        head["add_on_bias"] = bias
    params = {"backbone": backbone, "head": head}
    return params, stats


# ---------------------------------------------------------------------------
# DINOv2 ViT-S/14
# ---------------------------------------------------------------------------

def convert_dinov2_vits14(sd: Mapping[str, Any], prefix: str = "") -> Dict[str, Any]:
    """torch.hub dinov2_vits14 state dict -> DinoV2ViT params
    (the backbone the reference pulls at pipnet/pipnet.py:1125)."""
    p = prefix
    out: Dict[str, Any] = {
        "patch_embed": {"kernel": conv_w(sd[p + "patch_embed.proj.weight"]),
                        "bias": _t(sd[p + "patch_embed.proj.bias"])},
        "cls_token": _t(sd[p + "cls_token"]),
        "pos_embed": _t(sd[p + "pos_embed"]),
        "norm": {"scale": _t(sd[p + "norm.weight"]),
                 "bias": _t(sd[p + "norm.bias"])},
    }
    i = 0
    while f"{p}blocks.{i}.norm1.weight" in sd:
        b = f"{p}blocks.{i}."
        out[f"block{i}"] = {
            "norm1": {"scale": _t(sd[b + "norm1.weight"]),
                      "bias": _t(sd[b + "norm1.bias"])},
            "attn": {"qkv": {"kernel": dense_w(sd[b + "attn.qkv.weight"]),
                             "bias": _t(sd[b + "attn.qkv.bias"])},
                     "proj": {"kernel": dense_w(sd[b + "attn.proj.weight"]),
                              "bias": _t(sd[b + "attn.proj.bias"])}},
            "ls1": _t(sd[b + "ls1.gamma"]),
            "norm2": {"scale": _t(sd[b + "norm2.weight"]),
                      "bias": _t(sd[b + "norm2.bias"])},
            "mlp_in": {"kernel": dense_w(sd[b + "mlp.fc1.weight"]),
                       "bias": _t(sd[b + "mlp.fc1.bias"])},
            "mlp_out": {"kernel": dense_w(sd[b + "mlp.fc2.weight"]),
                        "bias": _t(sd[b + "mlp.fc2.bias"])},
            "ls2": _t(sd[b + "ls2.gamma"]),
        }
        i += 1
    return out
