"""Export a trained pipnet_tpu checkpoint as a reference-named torch
state_dict — the inverse of ``torch_import.convert_reference_pipnet``.

Lets a reference (harishB97/PIPNet) user load a model trained here into the
original PyTorch code (``pipnet/pipnet.py:73-98`` per-node modules,
torchvision backbone naming) for their own notebooks/serving, and gives the
parity story a two-way check: ``convert_reference_pipnet(export(...))``
round-trips bit-exactly (tests/test_torch_import.py).

CLI::

    python -m pipnet_tpu.models.torch_export --run_dir runs/x --out net.pth

Not exported (no reference counterpart or no fixed reference naming):
BYOL target networks, optimizer state, Stage4Reducer weights, DINOv2
backbones (the reference loads those from torch hub, not its checkpoints).
"""

from __future__ import annotations

import argparse
from typing import Any, Dict, Mapping, Tuple

import numpy as np

from ..tree.compile import TreeArrays


def _conv_w(x: np.ndarray) -> np.ndarray:
    """HWIO (flax) -> OIHW (torch)."""
    return np.asarray(x).transpose(3, 2, 0, 1)


def _dense_w(x: np.ndarray) -> np.ndarray:
    return np.asarray(x).transpose(1, 0)


def export_convnext_tiny(params: Mapping[str, Any],
                         prefix: str = "_net.") -> Dict[str, np.ndarray]:
    """ConvNeXtTiny param dict -> torchvision ``features.*`` names
    (inverse of torch_import.convert_convnext_tiny)."""
    p = prefix
    sd: Dict[str, np.ndarray] = {}
    sd[p + "features.0.0.weight"] = _conv_w(params["stem_conv"]["kernel"])
    sd[p + "features.0.0.bias"] = np.asarray(params["stem_conv"]["bias"])
    sd[p + "features.0.1.weight"] = np.asarray(params["stem_norm"]["scale"])
    sd[p + "features.0.1.bias"] = np.asarray(params["stem_norm"]["bias"])
    depths = (3, 3, 9, 3)
    for stage in range(4):
        feat_idx = 1 + 2 * stage
        if stage > 0:
            down_idx = 2 * stage
            dn = params[f"down{stage}_norm"]
            dc = params[f"down{stage}_conv"]
            sd[f"{p}features.{down_idx}.0.weight"] = np.asarray(dn["scale"])
            sd[f"{p}features.{down_idx}.0.bias"] = np.asarray(dn["bias"])
            sd[f"{p}features.{down_idx}.1.weight"] = _conv_w(dc["kernel"])
            sd[f"{p}features.{down_idx}.1.bias"] = np.asarray(dc["bias"])
        for blk in range(depths[stage]):
            bp = params[f"stage{stage}_block{blk}"]
            b = f"{p}features.{feat_idx}.{blk}."
            sd[b + "block.0.weight"] = _conv_w(bp["dwconv_kernel"])
            sd[b + "block.0.bias"] = np.asarray(bp["dwconv_bias"])
            sd[b + "block.2.weight"] = np.asarray(bp["norm_scale"])
            sd[b + "block.2.bias"] = np.asarray(bp["norm_bias"])
            sd[b + "block.3.weight"] = _dense_w(bp["mlp_in_kernel"])
            sd[b + "block.3.bias"] = np.asarray(bp["mlp_in_bias"])
            sd[b + "block.5.weight"] = _dense_w(bp["mlp_out_kernel"])
            sd[b + "block.5.bias"] = np.asarray(bp["mlp_out_bias"])
            # torchvision stores layer_scale as (C, 1, 1)
            sd[b + "layer_scale"] = np.asarray(
                bp["layer_scale"]).reshape(-1, 1, 1)
    return sd


def _bn_out(sd, key, scale_tree, stat_tree) -> None:
    sd[key + ".weight"] = np.asarray(scale_tree["scale"])
    sd[key + ".bias"] = np.asarray(scale_tree["bias"])
    sd[key + ".running_mean"] = np.asarray(stat_tree["mean"])
    sd[key + ".running_var"] = np.asarray(stat_tree["var"])


def export_resnet(params: Mapping[str, Any], stats: Mapping[str, Any],
                  layers: Tuple[int, ...], bottleneck: bool,
                  prefix: str = "_net.") -> Dict[str, np.ndarray]:
    """ResNet param/batch-stat dicts -> torchvision names
    (inverse of torch_import.convert_resnet)."""
    p = prefix
    sd: Dict[str, np.ndarray] = {p + "conv1.weight":
                                 _conv_w(params["conv1"]["kernel"])}
    _bn_out(sd, p + "bn1", params["bn1"], stats["bn1"])
    convs = ("conv1", "conv2", "conv3") if bottleneck else ("conv1", "conv2")
    for li, blocks in enumerate(layers):
        for bi in range(blocks):
            tname = f"{p}layer{li + 1}.{bi}."
            fname = f"layer{li + 1}_block{bi}"
            bp, bs = params[fname], stats[fname]
            for ci, cname in enumerate(convs):
                sd[tname + f"conv{ci + 1}.weight"] = _conv_w(bp[cname]["kernel"])
                _bn_out(sd, tname + f"bn{ci + 1}", bp[f"bn{ci + 1}"],
                        bs[f"bn{ci + 1}"])
            if "down_conv" in bp:
                sd[tname + "downsample.0.weight"] = _conv_w(
                    bp["down_conv"]["kernel"])
                _bn_out(sd, tname + "downsample.1", bp["down_bn"],
                        bs["down_bn"])
    return sd


def export_reference_pipnet(params: Mapping[str, Any],
                            batch_stats: Mapping[str, Any],
                            tree: TreeArrays, arch: str,
                            module_prefix: bool = False
                            ) -> Dict[str, np.ndarray]:
    """Stacked pipnet_tpu params -> reference per-node state_dict.

    ``module_prefix`` emits ``module.*`` names (the reference saves through
    ``nn.DataParallel``, pipnet/pipnet.py:1170); off gives bare names, which
    ``convert_reference_pipnet`` also accepts.
    """
    from .torch_import import RESNET_SPECS

    mp = "module." if module_prefix else ""
    pref = mp + "_net."
    if arch.startswith("convnext_tiny"):
        sd = export_convnext_tiny(params["backbone"], pref)
    elif arch in RESNET_SPECS:
        layers, bottleneck = RESNET_SPECS[arch]
        # the live batch_stats collection nests under "backbone", mirroring
        # params; export_resnet indexes stats["bn1"] etc. directly
        stats = (batch_stats or {}).get("backbone", batch_stats or {})
        sd = export_resnet(params["backbone"], stats,
                           layers, bottleneck, pref)
    else:
        raise ValueError(f"no reference export for backbone {arch!r} "
                         "(DINOv2 lives on torch hub, not in reference "
                         "checkpoints)")

    head = params["head"]
    add_on = np.asarray(head["add_on_kernel"])          # (D, P)
    cls_w = np.asarray(head["cls_weight"])              # (C, P)
    presence = np.asarray(head["proto_presence"])       # (P, 2)
    for ni, name in enumerate(tree.node_names):
        sl = tree.node_proto_slice(ni)
        cs = tree.node_child_slice(ni)
        # (D, P_n) -> torch conv1x1 (P_n, D, 1, 1)
        sd[f"{mp}_{name}_add_on.weight"] = (
            add_on[:, sl].transpose(1, 0)[:, :, None, None])
        sd[f"{mp}_{name}_classification.weight"] = cls_w[cs, sl]
        sd[f"{mp}_{name}_proto_presence"] = presence[sl]
        if "add_on_bias" in head:
            sd[f"{mp}_{name}_add_on.bias"] = np.asarray(
                head["add_on_bias"])[sl]
        if "cls_bias" in head:
            sd[f"{mp}_{name}_classification.bias"] = np.asarray(
                head["cls_bias"])[cs]
    sd[f"{mp}_multiplier"] = np.asarray(head["multiplier"]).reshape(1)
    return sd


def save_torch(sd: Dict[str, np.ndarray], path: str) -> None:
    """Write as a torch ``model_state_dict`` checkpoint (the reference's
    ``torch.save({'model_state_dict': ...})`` shape, main.py:706-714); falls
    back to ``.npz`` when torch is unavailable."""
    try:
        import torch
        # copy=True: jax fetches are read-only buffers, torch wants writable
        torch.save({"model_state_dict":
                    {k: torch.from_numpy(np.array(v, copy=True))
                     for k, v in sd.items()}}, path)
    except ImportError:
        np.savez(path, **sd)


def run(argv=None) -> int:
    p = argparse.ArgumentParser(
        "Export a pipnet_tpu run as a reference torch checkpoint")
    p.add_argument("--run_dir", required=True)
    p.add_argument("--checkpoint", default="net_trained_last")
    p.add_argument("--out", required=True)
    p.add_argument("--module_prefix", action="store_true",
                   help="emit DataParallel-style module.* names")
    args = p.parse_args(argv)

    from ..run_io import load_run
    bundle = load_run(args.run_dir, checkpoint=args.checkpoint)
    import jax
    params = jax.tree.map(np.asarray, bundle.state.params)
    stats = jax.tree.map(np.asarray, bundle.state.batch_stats)
    sd = export_reference_pipnet(params, stats, bundle.tree,
                                 bundle.cfg.model.backbone,
                                 module_prefix=args.module_prefix)
    save_torch(sd, args.out)
    print(f"wrote {len(sd)} tensors to {args.out}")
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(run())
