"""Benchmark: train throughput (images/sec/chip) of the flagship HComP-Net
config (ConvNeXt-tiny-26, hierarchical tree, full loss set, batch 64, 224^2).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline context (BASELINE.md): the reference publishes no numbers; the
recorded target is >= 3x an A100's train images/sec/chip.  A100 torch DDP
throughput for this model is ~250-350 img/s (measured externally; the repo
itself records none), so vs_baseline is reported against 300 img/s.
"""

import json
import time

import numpy as np

A100_BASELINE_IMG_PER_SEC = 300.0


def main():
    import jax

    from pipnet_tpu.runtime.profiling import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from pipnet_tpu.config import (HeadConfig, LossConfig, ModelConfig,
                                   OptimConfig, RunConfig, TrainConfig)
    from pipnet_tpu.data.synthetic import (make_synthetic_newick,
                                           synthetic_class_names)
    from pipnet_tpu.models import build_pipnet
    from pipnet_tpu.train.optimizer import phase_for_epoch
    from pipnet_tpu.train.step import (Scalars, StepStatics, init_train_state,
                                       make_train_step)
    from pipnet_tpu.tree import Phylogeny, construct_phylo_tree

    # CUB-190-scale synthetic phylogeny (189 internal nodes at 190 classes)
    num_classes = 190
    batch = 64
    image_size = 224
    rng = np.random.default_rng(0)
    names = synthetic_class_names(num_classes)
    phylo = Phylogeny(newick=make_synthetic_newick(names, rng))
    root = construct_phylo_tree(phylo=phylo)
    root.assign_all_descendents()
    mcfg = ModelConfig(backbone="convnext_tiny_26", image_size=image_size,
                       num_protos_per_child=10,
                       head=HeadConfig(softmax_tau=1.0, protopool=False),
                       compute_dtype="bfloat16", fast_gelu=True, use_pallas_head=True)
    model, tree = build_pipnet(root, mcfg, weighted=True)

    cfg = RunConfig(
        model=mcfg,
        train=TrainConfig(
            batch_size=batch, epochs=60, epochs_pretrain=3,
            optim=OptimConfig(),
            # the flagship run_pipnet.sh loss set (align_pf, tanh, tanh_desc,
            # kernel_orth, min_contrast, weighted CE)
            loss=LossConfig(align=False, uni=False, align_pf=True, tanh=True,
                            tanh_during_second_phase=True, tanh_desc=True,
                            kernel_orth=True, minimize_contrasting_set=True,
                            weighted_ce=True)))

    phase = phase_for_epoch(20, cfg.train, pretrain=False)  # steady-state phase
    statics = StepStatics(phase=phase, eta_min_net=5e-6)
    step = jax.jit(make_train_step(model, tree, cfg, statics), donate_argnums=(0,))

    key = jax.random.PRNGKey(0)
    state = init_train_state(model, key, jnp.zeros((2, image_size, image_size, 3)))

    r = np.random.default_rng(1)
    xs1 = jnp.asarray(r.standard_normal((batch, image_size, image_size, 3)),
                      jnp.float32)
    xs2 = jnp.asarray(r.standard_normal((batch, image_size, image_size, 3)),
                      jnp.float32)
    ys = jnp.asarray(r.integers(0, num_classes, batch))
    scalars = Scalars(net_t=jnp.float32(0), net_T=jnp.float32(10000),
                      epoch_frac=jnp.float32(0.5),
                      align_pf_weight=jnp.float32(5.0),
                      tanh_weight=jnp.float32(2.0))

    # warmup / compile.  NOTE: device-queue fencing uses an actual scalar
    # fetch because block_until_ready is unreliable over the axon tunnel.
    state, metrics = step(state, xs1, xs2, ys, scalars)
    float(np.asarray(metrics["loss"]))

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, xs1, xs2, ys, scalars)
    float(np.asarray(metrics["loss"]))
    dt = time.perf_counter() - t0
    img_per_sec = iters * batch / dt

    print(json.dumps({
        "metric": "train_images_per_sec_per_chip_cub190_hcompnet",
        "value": round(img_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / A100_BASELINE_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
