"""Ablation timing on the real chip: backbone fwd, head fwd, full fwd,
fwd+bwd, full train step — locates the throughput bottleneck."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def _force(out):
    # axon (tunneled TPU) block_until_ready is unreliable; force a real
    # device->host scalar fetch to fence the device queue
    leaf = jax.tree.leaves(out)[0]
    return float(np.asarray(leaf).ravel()[0])


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters


def main():
    from pipnet_tpu.config import HeadConfig, LossConfig, ModelConfig, OptimConfig, RunConfig, TrainConfig
    from pipnet_tpu.data.synthetic import make_synthetic_newick, synthetic_class_names
    from pipnet_tpu.models import build_pipnet
    from pipnet_tpu.train.optimizer import phase_for_epoch
    from pipnet_tpu.train.step import Scalars, StepStatics, init_train_state, make_train_step
    from pipnet_tpu.tree import Phylogeny, construct_phylo_tree

    B, S = 64, 224
    rng = np.random.default_rng(0)
    names = synthetic_class_names(190)
    phylo = Phylogeny(newick=make_synthetic_newick(names, rng))
    root = construct_phylo_tree(phylo=phylo)
    root.assign_all_descendents()
    mcfg = ModelConfig(backbone="convnext_tiny_26", image_size=S,
                       num_protos_per_child=10,
                       head=HeadConfig(softmax_tau=1.0, protopool=False),
                       compute_dtype="bfloat16", fast_gelu=True,
                       use_pallas_head=True)
    model, tree = build_pipnet(root, mcfg, weighted=True)
    print(tree.summary(), flush=True)

    key = jax.random.PRNGKey(0)
    xs = jnp.asarray(rng.standard_normal((2 * B, S, S, 3)), jnp.float32)
    state = init_train_state(model, key, xs[:2])
    params = state.params

    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x)["logits"])
    t = timeit(fwd, params, xs)
    print(f"full fwd: {t*1e3:.1f} ms -> {2*B/t:.0f} img/s", flush=True)

    def loss_only(p, x):
        out = model.apply({"params": p}, x)
        return out["pooled"].sum() + out["logits"].sum() + out["proto_features"].sum()

    g = jax.jit(jax.grad(loss_only))
    t = timeit(g, params, xs)
    print(f"fwd+bwd (dummy loss): {t*1e3:.1f} ms -> {2*B/t:.0f} img/s", flush=True)

    cfg = RunConfig(model=mcfg, train=TrainConfig(
        batch_size=B, optim=OptimConfig(),
        loss=LossConfig(align=False, uni=False, align_pf=True, tanh=True,
                        tanh_during_second_phase=True, tanh_desc=True,
                        kernel_orth=True, minimize_contrasting_set=True,
                        weighted_ce=True)))
    phase = phase_for_epoch(20, cfg.train, pretrain=False)
    step = jax.jit(make_train_step(model, tree, cfg, StepStatics(phase=phase, eta_min_net=5e-6)))
    sc = Scalars.make(net_t=0, net_T=1e4, epoch_frac=0.5,
                      align_pf_weight=5.0, tanh_weight=2.0)
    xs1, xs2 = xs[:B], xs[B:]
    ys = jnp.asarray(rng.integers(0, 190, B))

    def run(state):
        s2, m = step(state, xs1, xs2, ys, sc)
        return m["loss"]

    t = timeit(run, state, iters=5)
    print(f"full train step: {t*1e3:.1f} ms -> {B/t:.0f} labeled img/s", flush=True)


if __name__ == "__main__":
    main()
