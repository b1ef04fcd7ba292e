"""Head-forward microbench: the round-5 VMEM-budget study (BENCH_NOTES).

Times ONLY the fused Pallas head forward (conv -> per-node softmax ->
max-pool, ops/pallas_head.py) at the flagship shape (B=64, 26x26x768
features, 3840 prototype slots / 189 nodes) across tile-width x VMEM-limit
x grid-semantics combos, against the XLA composition baseline.  The output
is reduced to a scalar inside jit so the tunnel never ships the (B, HW, P)
maps (see verify notes: un-donated outputs are synchronously fetched).

Usage:  python scripts/bench_head.py [--iters 30]
"""

import argparse
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--quick", action="store_true",
                    help="4 representative combos instead of the full sweep")
    args = ap.parse_args()

    from pipnet_tpu.runtime.profiling import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from pipnet_tpu.config import HeadConfig, ModelConfig
    from pipnet_tpu.data.synthetic import (make_synthetic_newick,
                                           synthetic_class_names)
    from pipnet_tpu.models import build_pipnet
    from pipnet_tpu.ops.pallas_head import fused_head_forward
    from pipnet_tpu.ops.segment import segment_softmax
    from pipnet_tpu.tree import Phylogeny, construct_phylo_tree

    rng = np.random.default_rng(0)
    names = synthetic_class_names(190)
    phylo = Phylogeny(newick=make_synthetic_newick(names, rng))
    root = construct_phylo_tree(phylo=phylo)
    root.assign_all_descendents()
    mcfg = ModelConfig(backbone="convnext_tiny_26", image_size=224,
                       num_protos_per_child=10,
                       head=HeadConfig(softmax_tau=1.0, protopool=False),
                       compute_dtype="bfloat16", use_pallas_head=True)
    _model, tree = build_pipnet(root, mcfg, weighted=True)

    B, H, W, D = args.batch, 26, 26, 768
    feats = jnp.asarray(rng.standard_normal((B, H, W, D)), jnp.bfloat16)
    kernel = jnp.asarray(rng.standard_normal((D, tree.num_protos_padded)) * 0.05,
                         jnp.bfloat16)

    # On the tunneled axon backend block_until_ready returns before the
    # remote execution finishes (every combo measured "0.02 ms" — 85x
    # below the MXU FLOP floor for this shape, physically impossible),
    # and a per-iteration device->host fetch is swamped by 20-60 ms of
    # tunnel round-trip jitter.  Amortize instead: chain `iters` kernel
    # invocations inside ONE jitted lax.scan (the carry perturbs the
    # input so XLA cannot hoist or CSE the body) and fetch one scalar.
    import jax.lax as lax

    def timeit(fn, *xs):
        def scanned(f, k):
            def body(c, _):
                out = fn(f * (1 + c * 1e-38).astype(f.dtype), k)
                return out.astype(jnp.float32), None
            return lax.scan(body, jnp.float32(0), None, length=args.iters)[0]
        jf = jax.jit(scanned)
        float(jf(*xs))  # compile + warm
        t0 = time.perf_counter()
        float(jf(*xs))
        return (time.perf_counter() - t0) / args.iters * 1e3

    null_ms = timeit(lambda f, k: f.sum(),
                     jnp.zeros((8, 128), jnp.bfloat16), 0) * args.iters
    print(f"tunnel round-trip (amortized over {args.iters} iters): "
          f"{null_ms:.2f} ms total")
    null_ms /= args.iters

    def fused(f, k):
        pf, pooled = fused_head_forward(f, k, tree, tau=1.0)
        return pf.astype(jnp.float32).sum() + pooled.sum()

    def xla_ref(f, k):
        z = jnp.einsum("bhwd,dp->bhwp", f, k).astype(jnp.float32)
        p = segment_softmax(z, tree)
        return p.sum() + jnp.max(p, axis=(1, 2)).sum()

    print(f"XLA composition: {timeit(jax.jit(xla_ref), feats, kernel) - null_ms:.2f} ms")
    # env knobs are read at trace time; a FRESH jit wrapper per combo forces
    # a retrace so each combo actually compiles with its own settings
    if args.quick:
        combos = [(512, None, "0"), (1280, None, "0"),
                  (3840, None, "0"), (1280, 100 * 2**20, "1")]
    else:
        combos = [(t, v, p) for t in (512, 640, 1280, 1920, 3840)
                  for v in (None, 100 * 2**20) for p in ("0", "1")]
    for tile, vmem, par in combos:
        os.environ["PIPNET_HEAD_TILE_TARGET"] = str(tile)
        os.environ["PIPNET_HEAD_PARALLEL_GRID"] = par
        if vmem is None:
            os.environ.pop("PIPNET_HEAD_VMEM_LIMIT", None)
        else:
            os.environ["PIPNET_HEAD_VMEM_LIMIT"] = str(vmem)
        label = (f"tile={tile} vmem={'dflt' if vmem is None else vmem // 2**20}M "
                 f"par={par}")
        try:
            ms = timeit(jax.jit(fused), feats, kernel) - null_ms
            print(f"fused {label}: {ms:.2f} ms")
        except Exception as e:
            print(f"fused {label}: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
