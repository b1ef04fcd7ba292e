"""Finer split: backbone fwd / backbone fwd+bwd / head fwd+bwd."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def _force(out):
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
    from pipnet_tpu.config import HeadConfig, ModelConfig
    from pipnet_tpu.data.synthetic import make_synthetic_newick, synthetic_class_names
    from pipnet_tpu.models import build_pipnet
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
                       compute_dtype="bfloat16")
    model, tree = build_pipnet(root, mcfg, weighted=True)

    key = jax.random.PRNGKey(0)
    xs = jnp.asarray(rng.standard_normal((2 * B, S, S, 3)), jnp.float32)
    variables = model.init(key, xs[:2])
    params = variables["params"]

    def bb_fwd(p, x):
        return model.apply({"params": p}, x, train=False,
                           method=lambda m, xx, train: m.features(xx, train=train))

    t = timeit(jax.jit(bb_fwd), params, xs)
    print(f"backbone fwd: {t*1e3:.1f} ms", flush=True)

    bb_grad = jax.jit(jax.grad(lambda p, x: bb_fwd(p, x).astype(jnp.float32).sum()))
    t = timeit(bb_grad, params, xs)
    print(f"backbone fwd+bwd: {t*1e3:.1f} ms", flush=True)

    feats = jax.jit(bb_fwd)(params, xs)
    feats = jax.device_put(np.asarray(feats))

    def head_fwd(p, f):
        out = model.apply({"params": p}, f, method=lambda m, ff: m.head(ff))
        return (out["pooled"].astype(jnp.float32).sum()
                + out["logits"].astype(jnp.float32).sum()
                + out["proto_features"].astype(jnp.float32).sum())

    t = timeit(jax.jit(head_fwd), params, feats)
    print(f"head fwd: {t*1e3:.1f} ms", flush=True)
    t = timeit(jax.jit(jax.grad(head_fwd)), params, feats)
    print(f"head fwd+bwd: {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
