"""Standalone evaluation driver (counterpart of ``test_nb.py``):
rebuild a model from a run directory's saved config + checkpoint and run the
test pass (top-1/5, sparsity, optional overspecificity mask / leave-out).

    python -m pipnet_tpu.evaluate --run_dir ./runs/cub190 \
        [--checkpoint net_trained_last] [--apply_overspecificity_mask] \
        [--path_prob_softmax_tau 1.0] [--leave_out_classes file.txt]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def resolve_gallery_nodes(spec: str, tree) -> list:
    """``--galleries_nodes`` spec -> internal-node index list.

    ``'auto:K'`` picks K nodes spread across the tree (internal nodes
    sorted by leaf-descendant count — a depth proxy — sampled evenly, so
    the root, mid-level clades and near-leaf nodes all appear); otherwise
    a comma-separated node-name list resolved against ``tree.node_names``.
    """
    if spec.startswith("auto:"):
        k = min(max(1, int(spec.split(":", 1)[1])), tree.num_nodes)
        order = sorted(range(tree.num_nodes),
                       key=lambda ni: -int(tree.node_num_leaves[ni]))
        idx = [order[int(round(i * (len(order) - 1) / max(k - 1, 1)))]
               for i in range(k)]
        return sorted(set(idx))
    name_to_idx = {n: i for i, n in enumerate(tree.node_names)}
    missing = [n for n in spec.split(",") if n not in name_to_idx]
    if missing:
        raise SystemExit(f"--galleries_nodes: unknown nodes {missing}; "
                         f"known: {tree.node_names[:5]}...")
    return [name_to_idx[n] for n in spec.split(",")]


def run(argv=None) -> int:
    p = argparse.ArgumentParser("Evaluate a trained pipnet_tpu run")
    p.add_argument("--run_dir", required=True)
    p.add_argument("--checkpoint", default="net_trained_last")
    p.add_argument("--apply_overspecificity_mask", action="store_true")
    p.add_argument("--fixed_mask_seed", type=int, default=None,
                   help="with the overspecificity mask: draw ONE presence "
                        "sample for the whole pass (the deterministic pruned "
                        "artifact serve.py deploys) instead of the "
                        "reference's per-batch resampling")
    p.add_argument("--path_prob_softmax_tau", type=float, default=1.0)
    p.add_argument("--leave_out_classes", default=None)
    p.add_argument("--dataset", default=None)
    p.add_argument("--OOD_dataset", default=None,
                   help="OOD dataset name: adds the eval_ood ID-fraction "
                        "report (ref pipnet/test.py:242-292 / OOD_checking.ipynb)")
    p.add_argument("--skip_per_node", action="store_true",
                   help="skip the per-node accuracy/F1 sweep")
    p.add_argument("--threshold_prune", default=None,
                   help="prune_by_threshold.ipynb cells 11-14: zero the "
                        "classifier columns of prototypes whose top-k mean "
                        "activation over ANY relevant leaf's projection "
                        "images falls below this threshold; writes "
                        "prototype_report.txt and re-evaluates.  A comma-"
                        "separated list sweeps thresholds (the accuracy-vs-"
                        "pruned curve) computing the projection stats once")
    p.add_argument("--prune_leaf_parents", action="store_true",
                   help="with --threshold_prune: ALSO prune prototypes at "
                        "nodes whose children are all leaves — the reference "
                        "notebook exempts those nodes (cell 11's "
                        "non_leaf_children check); this flag reproduces the "
                        "round-4 non-reference behavior for A/B")
    p.add_argument("--part_purity_csv", action="store_true",
                   help="write the per-prototype top-k patch-box CSV "
                        "(util/eval_cub_csv.py get_topk_cub); with the three "
                        "annotation paths below, also score part purity")
    p.add_argument("--parts_loc", default=None,
                   help="CUB parts/part_locs.txt (with --part_purity_csv)")
    p.add_argument("--parts_name", default=None,
                   help="CUB parts/parts.txt (with --part_purity_csv)")
    p.add_argument("--images_id", default=None,
                   help="CUB images.txt id<->path map (with --part_purity_csv)")
    p.add_argument("--galleries_nodes", default=None,
                   help="node-scoped hierarchy galleries on THIS run: a "
                        "comma-separated internal-node name list, or "
                        "'auto:K' to pick K nodes spread across tree depths. "
                        "Lifts the driver's <=60-class final-viz gate (ref "
                        "main.py:835) for real-tree-scale artifacts; "
                        "descendant + non-descendant grids and heatmap "
                        "overlays per util/vis_hpipnet.py:184-389.")
    args = p.parse_args(argv)

    from .runtime.profiling import enable_compilation_cache
    enable_compilation_cache()
    from .data import build_loaders
    from .datasets import resolve_dataset
    from .eval import sparsity_stats
    from .run_io import load_run, load_run_config
    from .runtime.log import RunLog
    from .train.trainer import Trainer

    cfg = load_run_config(args.run_dir)
    dataset = args.dataset or cfg.dataset
    train_dir, test_dir, project_dir, dkw = resolve_dataset(dataset,
                                                            seed=cfg.train.seed)
    loaders = build_loaders(train_dir, test_dir, project_dir=project_dir,
                            image_size=cfg.model.image_size,
                            batch_size=cfg.train.batch_size,
                            batch_size_pretrain=cfg.train.batch_size_pretrain,
                            seed=cfg.train.seed)
    bundle = load_run(args.run_dir, checkpoint=args.checkpoint,
                      dataset=dataset, classes=loaders.classes,
                      phylo_path=dkw.get("phylo_path"))
    model, tree = bundle.model, bundle.tree
    # evaluation needs no model parallelism: a run TRAINED with
    # --model_parallel N must still evaluate on a host with fewer devices
    # (run dirs relocate; serve.py makes the same choice), so the trained
    # mesh shape is not replayed here
    import dataclasses

    import jax as _jax
    dp = min(cfg.train.data_parallel or len(_jax.devices()),
             len(_jax.devices()))
    if cfg.train.model_parallel > 1 or dp != cfg.train.data_parallel:
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, model_parallel=1, data_parallel=dp))
    trainer = Trainer(model, tree, cfg, loaders, log=RunLog(args.run_dir))
    trainer.adopt_state(bundle.state)
    print(f"restored {os.path.join(args.run_dir, 'checkpoints', args.checkpoint)}: "
          f"{bundle.extra}")

    leave_out = None
    if args.leave_out_classes:
        with open(args.leave_out_classes) as f:
            leave_out = [line.strip() for line in f if line.strip()]
    result = trainer.evaluate(
        loaders.test, leave_out_classes=leave_out,
        apply_overspecificity_mask=args.apply_overspecificity_mask,
        path_prob_softmax_tau=args.path_prob_softmax_tau,
        fixed_mask_seed=args.fixed_mask_seed)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from .eval.metrics import (abstained_count, eval_ood,
                               pred_path_explanation_size)
    from .train.step import make_eval_step
    from .train.trainer import evaluate_per_node

    w_eff = np.asarray(model.apply(
        {"params": trainer.state.params},
        method=lambda m: m.head.effective_cls_weight()))

    # full test-set sweep collecting joint scores / pooled / logits for the
    # metrics the reference reports in pipnet/test.py:66-96,152-292
    step = make_eval_step(model, tree,
                          path_prob_softmax_tau=args.path_prob_softmax_tau,
                          apply_overspecificity_mask=args.apply_overspecificity_mask)

    def collect(loader):
        scores, pooleds, logitss, ys = [], [], [], []
        rng = jax.random.PRNGKey(0)
        fixed = (jax.random.PRNGKey(args.fixed_mask_seed)
                 if args.fixed_mask_seed is not None else None)
        for batch in loader.epoch(0):
            rng, sub = jax.random.split(rng)
            if fixed is not None:
                sub = fixed
            out = step(trainer.state.params, trainer.state.batch_stats,
                       jnp.asarray(batch.xs1), jnp.asarray(batch.ys), sub)
            scores.append(np.exp(np.asarray(out["log_joint"], np.float64)))
            pooleds.append(np.asarray(out["pooled"]))
            logitss.append(np.asarray(out["logits"]))
            ys.append(batch.ys)
        return (np.concatenate(scores), np.concatenate(pooleds),
                np.concatenate(logitss), np.concatenate(ys))

    scores, pooled, logits, ys = collect(loaders.test)
    result.update(sparsity_stats(w_eff, pooled))
    result.update(pred_path_explanation_size(
        pooled, w_eff, tree.leaf_child_col, tree.leaf_under_node,
        np.argmax(scores, axis=-1)))
    # abstain: no positive classifier evidence anywhere (ref pipnet/test.py:66-70)
    result["abstained"] = abstained_count(logits)

    if leave_out:
        # the calc_acc_LOU.ipynb surface reports BOTH numbers: top1/top5
        # above are the left-out images under the LOU decode short-circuit
        # (ref util/node.py:319-325); held_in_* is the plain decode
        # restricted to the classes the model actually trained on —
        # collect() runs the plain step, so the scores here are exactly
        # that decode
        lo = {i for i, c in enumerate(tree.class_names) if c in leave_out}
        held = np.asarray([y not in lo for y in ys])
        order = np.argsort(scores, axis=-1)[:, ::-1]
        result["left_out_n"] = int((~held).sum())
        result["held_in_n"] = int(held.sum())
        result["held_in_top1"] = float(
            (order[held, 0] == ys[held]).mean())
        result["held_in_top5"] = float(
            (order[held, :5] == ys[held, None]).any(axis=1).mean())

    if not args.skip_per_node:
        result["per_node"] = evaluate_per_node(trainer, loaders.test)

    if args.OOD_dataset:
        otrain, otest, oproj, okw = resolve_dataset(args.OOD_dataset,
                                                    seed=cfg.train.seed)
        ood_loaders = build_loaders(otrain, otest, project_dir=oproj,
                                    image_size=cfg.model.image_size,
                                    batch_size=cfg.train.batch_size,
                                    seed=cfg.train.seed)
        ood_scores, *_ = collect(ood_loaders.test)
        result["ood"] = eval_ood(scores, ys, ood_scores, tree.num_classes)

    if (args.threshold_prune is not None or args.part_purity_csv
            or args.galleries_nodes):
        from .interp import (eval_prototypes_parts_csv, prototype_report,
                             run_projection, write_topk_patch_csv)
        from .interp.pruning import apply_threshold_prune, prune_means
        proj = run_projection(model, tree, trainer.state.params,
                              trainer.state.batch_stats, loaders.project,
                              image_size=cfg.model.image_size)

    if args.part_purity_csv:
        csv_path = os.path.join(args.run_dir, "topk_patches.csv")
        write_topk_patch_csv(proj, csv_path, k=10, tree=tree, w_eff=w_eff)
        result["topk_patch_csv"] = csv_path
        if args.parts_loc and args.parts_name and args.images_id:
            result["part_purity"] = eval_prototypes_parts_csv(
                csv_path, args.parts_loc, args.parts_name, args.images_id,
                image_size=cfg.model.image_size)

    if args.threshold_prune is not None:
        # zero overspecific prototypes' classifier columns, report, re-test
        # (ref prune_by_threshold.ipynb cells 11-14: accuracy before/after);
        # a comma-separated threshold list sweeps the accuracy-vs-pruned
        # curve off ONE projection pass
        thresholds = [float(t) for t in str(args.threshold_prune).split(",")]
        cls_w = np.asarray(trainer.state.params["head"]["cls_weight"])
        means = prune_means(proj, tree, w_eff)
        report = prototype_report(
            proj, tree, w_eff,
            np.asarray(trainer.state.params["head"]["proto_presence"]))
        rp = os.path.join(args.run_dir, "prototype_report.txt")
        with open(rp, "w") as f:
            f.write(report + "\n")
        dead_before = int((np.abs(cls_w).sum(0) == 0).sum())
        state_before = trainer.state
        sweep = []
        for t in thresholds:
            new_w = apply_threshold_prune(
                means, tree, cls_w, threshold=t,
                include_leaf_parent_nodes=args.prune_leaf_parents)
            dead_after = int((np.abs(new_w).sum(0) == 0).sum())
            pruned_params = dict(trainer.state.params)
            pruned_params["head"] = dict(pruned_params["head"])
            pruned_params["head"]["cls_weight"] = jnp.asarray(new_w)
            trainer.state = state_before._replace(params=pruned_params)
            after = trainer.evaluate(
                loaders.test, leave_out_classes=leave_out,
                apply_overspecificity_mask=args.apply_overspecificity_mask,
                path_prob_softmax_tau=args.path_prob_softmax_tau)
            sweep.append({
                "threshold": t,
                "pruned_columns": dead_after - dead_before,
                "top1_after": after["top1"], "top5_after": after["top5"],
            })
            print(f"threshold_prune {t}: pruned {dead_after - dead_before} "
                  f"columns, top1 {result['top1']:.4f} -> {after['top1']:.4f}")
        trainer.state = state_before
        # the non-reference A/B (leaf parents pruned too) gets its own key
        # so a later merge-on-write never clobbers the reference-criterion
        # sweep with A/B numbers
        key = ("threshold_prune_leaf_parents_ab" if args.prune_leaf_parents
               else "threshold_prune")
        result[key] = {
            **sweep[0],
            "top1_before": result["top1"], "top5_before": result["top5"],
            "prune_leaf_parents": bool(args.prune_leaf_parents),
            "prototype_report": rp,
            "sweep": sweep,
        }

    suffix = ""
    if args.apply_overspecificity_mask:
        suffix += "_masked"
    if leave_out:
        suffix += "_lou"
    if args.path_prob_softmax_tau != 1.0:
        suffix += f"_tau{args.path_prob_softmax_tau:g}"
    report_path = os.path.join(args.run_dir, f"eval_report{suffix}.json")
    # merge-on-write: a cheaper re-run (e.g. --skip_per_node, no --OOD_dataset)
    # refreshes only the keys it computed and keeps the expensive sections
    # (per_node sweep, ood, threshold_prune) from the previous report of the
    # SAME suffix, instead of silently dropping them.  Carry-over is gated on
    # checkpoint identity: a report produced from a DIFFERENT checkpoint (the
    # run trained further, or --checkpoint changed) is discarded, not mixed —
    # stale per_node/ood sections next to fresh top-1 would read as one
    # coherent evaluation.  Delete the file for a from-scratch report.
    result["checkpoint_id"] = {
        "checkpoint": args.checkpoint,
        "epoch": bundle.extra.get("epoch"),
        "phase": bundle.extra.get("phase"),
    }
    if os.path.exists(report_path):
        try:
            with open(report_path) as f:
                merged = json.load(f)
            if merged.get("checkpoint_id") == result["checkpoint_id"]:
                merged.update(result)
                result = merged
            else:
                print(f"eval_report: previous report was from checkpoint "
                      f"{merged.get('checkpoint_id')}, current is "
                      f"{result['checkpoint_id']}; starting fresh")
        except (json.JSONDecodeError, OSError):
            pass
    with open(report_path, "w") as f:
        json.dump(result, f, indent=2, default=float)

    # galleries LAST, after the metrics are already on disk: a gallery
    # failure (e.g. an OOM at an unusually large node) must not lose the
    # eval numbers (measured: the round-4 sweep's first attempt died in
    # the root-node heatmap forward and took the whole report with it)
    if args.galleries_nodes:
        import time as _time

        from .interp import save_hierarchy_galleries
        from .interp.hierarchy_viz import make_heatmap_forward
        node_idx = resolve_gallery_nodes(args.galleries_nodes, tree)
        t0 = _time.perf_counter()
        hm_fwd = make_heatmap_forward(model, tree, trainer.state.params,
                                      trainer.state.batch_stats, proj)
        gdir = os.path.join(args.run_dir, "node_galleries")
        written = save_hierarchy_galleries(
            proj, tree, w_eff,
            np.asarray(trainer.state.params["head"]["proto_presence"]),
            gdir, k=10, heatmap_forward=hm_fwd, nodes=node_idx)
        result["node_galleries"] = {
            "nodes": [tree.node_names[i] for i in node_idx],
            "files": len(written), "dir": gdir,
            "seconds": round(_time.perf_counter() - t0, 1),
        }
        print(f"node galleries: {len(written)} files in "
              f"{result['node_galleries']['seconds']}s -> {gdir}")

        with open(report_path, "w") as f:
            json.dump(result, f, indent=2, default=float)

    print(json.dumps(result, indent=2, default=float))
    print(f"report written to {report_path}")
    return 0


if __name__ == "__main__":
    sys.exit(run())
