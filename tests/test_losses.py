"""Golden-parity tests for the loss catalog.

Each vectorized loss is checked against an independent naive numpy
implementation that follows the reference's per-node/per-child/per-descendant
loop semantics literally (pipnet/train.py:852-1341)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pipnet_tpu.losses import (EPS, align_and_uniform, align_pf_loss,
                               classification_loss, kernel_orth_loss,
                               make_tree_consts, min_contrast_loss,
                               ood_bce_loss, tanh_desc_loss, tanh_loss,
                               uniform_loss)
from pipnet_tpu.tree import compile_tree


@pytest.fixture(scope="module")
def setup(tiny_root):
    for node in tiny_root.nodes_with_children():
        node.set_num_protos(num_protos_per_descendant=0, num_protos_per_child=4,
                            min_protos=0, split_protos=True)
    tree = compile_tree(tiny_root, protopool=False, weighted=True, pad_total_to=8)
    tc = make_tree_consts(tree)
    nodes = {n.name: n for n in tiny_root.nodes_with_children()}
    rng = np.random.default_rng(42)
    Bv = 6
    ys_v = rng.integers(0, tree.num_classes, Bv)
    ys = np.concatenate([ys_v, ys_v])
    pooled = rng.uniform(0.01, 1.0, (2 * Bv, tree.num_protos_padded)).astype(np.float32)
    pooled[:, ~tree.proto_valid] = 0.0
    # classifier weights: positive in-block, zero outside
    w_eff = (rng.uniform(0, 1, (tree.num_children_total, tree.num_protos_padded))
             .astype(np.float32)) * tree.child_block_mask
    logits = pooled @ w_eff.T
    return tree, tc, nodes, ys, pooled, w_eff, logits, rng


def node_rows(tree, nodes, name, ys):
    """Row indices of batch samples under a node (the reference's children_idx)."""
    node = nodes[name]
    return np.array([i for i, y in enumerate(ys)
                     if y >= 0 and tree.class_names[y] in node.leaf_descendents])


class TestTanh:
    def test_tanh_loss(self, setup):
        tree, tc, nodes, ys, pooled, w_eff, logits, rng = setup
        B = len(ys) // 2
        total, per_node = tanh_loss(tc, jnp.asarray(pooled), jnp.asarray(ys))
        want_total = 0.0
        for ni, name in enumerate(tree.node_names):
            rows = node_rows(tree, nodes, name, ys)
            sl = tree.node_proto_slice(ni)
            r1 = rows[rows < B]
            r2 = rows[rows >= B]
            t1 = -np.log(np.tanh(pooled[r1][:, sl].sum(0)) + EPS).mean()
            t2 = -np.log(np.tanh(pooled[r2][:, sl].sum(0)) + EPS).mean()
            want = (t1 + t2) / 2
            np.testing.assert_allclose(per_node[ni], want, rtol=1e-5)
            want_total += want
        np.testing.assert_allclose(total, want_total / tree.num_nodes, rtol=1e-5)

    def test_tanh_desc(self, setup):
        tree, tc, nodes, ys, pooled, w_eff, logits, rng = setup
        B = len(ys) // 2
        total, per_node = tanh_desc_loss(tc, jnp.asarray(pooled), jnp.asarray(ys),
                                         jnp.asarray(w_eff))
        for ni, name in enumerate(tree.node_names):
            node = nodes[name]
            terms = []
            for child in node.children:
                col = tree.node_child_offset[ni] + node.children_to_labels[child.name]
                rel = np.nonzero(w_eff[col] > 1e-3)[0]
                leaf_set = ({child.name} if child.is_leaf()
                            else node.leaf_descendents_of_child[child.name])
                for leaf in sorted(leaf_set):
                    if len(rel) == 0:
                        continue
                    li = tree.class_names.index(leaf)
                    rows = np.array([i for i, y in enumerate(ys) if y == li])
                    r1, r2 = rows[rows < B], rows[rows >= B]
                    s1 = pooled[r1][:, rel].sum(0) if len(r1) else np.zeros(len(rel))
                    s2 = pooled[r2][:, rel].sum(0) if len(r2) else np.zeros(len(rel))
                    t = -(np.log(np.tanh(s1) + EPS).mean()
                          + np.log(np.tanh(s2) + EPS).mean()) / 2
                    terms.append(t)
            want = np.mean(terms)
            np.testing.assert_allclose(per_node[ni], want, rtol=1e-5)


class TestClassification:
    def test_weighted_nll(self, setup):
        tree, tc, nodes, ys, pooled, w_eff, logits, rng = setup
        m = 2.0
        total, per_node = classification_loss(
            tc, jnp.asarray(logits), jnp.asarray(ys), jnp.asarray(m),
            pipnet_sparsity=True, weighted=True)
        for ni, name in enumerate(tree.node_names):
            node = nodes[name]
            rows = node_rows(tree, nodes, name, ys)
            cs = tree.node_child_slice(ni)
            z = np.log1p(logits[rows][:, cs] ** m)
            z = z - z.max(-1, keepdims=True)
            logp = z - np.log(np.exp(z).sum(-1, keepdims=True))
            losses = []
            for r, row in zip(rows, logp):
                leaf = tree.class_names[ys[r]]
                slot = node.children_to_labels[node.closest_descendent_for(leaf).name]
                w = tree.node_weights[tree.node_child_offset[ni] + slot]
                losses.append(-row[slot] * w)
            np.testing.assert_allclose(per_node[ni], np.mean(losses), rtol=1e-5)

    def test_ood_bce(self, setup):
        tree, tc, nodes, ys, pooled, w_eff, logits, rng = setup
        m = 2.0
        ys_ood = ys.copy()
        ys_ood[2] = -1  # mark one row per view OOD
        ys_ood[len(ys) // 2 + 2] = -1
        total, per_node = ood_bce_loss(tc, jnp.asarray(logits), jnp.asarray(ys_ood),
                                       jnp.asarray(m))
        for ni, name in enumerate(tree.node_names):
            node = nodes[name]
            out_rows = np.array([i for i, y in enumerate(ys_ood)
                                 if y < 0 or tree.class_names[y] not in node.leaf_descendents])
            cs = tree.node_child_slice(ni)
            z = np.log1p(logits[out_rows][:, cs] ** m)
            sig = 1 / (1 + np.exp(-z))
            want = np.mean(-np.log(1 - sig + 1e-38))
            np.testing.assert_allclose(per_node[ni], want, rtol=1e-4)


class TestKernelOrth:
    @pytest.mark.parametrize("D", [3, 30])
    def test_vs_compact(self, setup, D):
        """Masked gram + rank correction == compact orth_dist with the
        transpose branch (ref pipnet/train.py:1408-1412)."""
        tree, tc, nodes, ys, pooled, w_eff, logits, rng = setup
        kernel = rng.standard_normal((D, tree.num_protos_padded)).astype(np.float32)
        total, per_node = kernel_orth_loss(tree, tc, jnp.asarray(kernel), jnp.asarray(w_eff))
        for ni in range(tree.num_nodes):
            sl = tree.node_proto_slice(ni)
            cs = tree.node_child_slice(ni)
            rel = (w_eff[cs][:, sl] > 1e-3).any(0)
            A = kernel[:, sl].T[rel]          # (P_rel, D) compact kernels
            mat = A.T if A.shape[0] < A.shape[1] else A
            want = np.linalg.norm(mat.T @ mat - np.eye(mat.shape[1]))
            np.testing.assert_allclose(per_node[ni], want, rtol=1e-4, atol=1e-4)


class TestKernelOrthCap:
    def test_cap_bounds_value_and_gradient(self, setup):
        """Per-node cap: capped nodes report exactly `cap` and their kernel
        gradient is rescaled by cap/ko; uncapped nodes are reference-exact
        (LossConfig.kernel_orth_cap — the runs/lou_190 seed-1 runaway guard)."""
        import jax
        tree, tc, nodes, ys, pooled, w_eff, logits, rng = setup
        D = 8
        # scale one node's kernels so its ko dwarfs the others
        kernel = rng.standard_normal((D, tree.num_protos_padded)).astype(np.float32)
        hot = tree.node_proto_slice(1)
        kernel[:, hot] *= 50.0
        kj = jnp.asarray(kernel)
        wj = jnp.asarray(w_eff)
        _, pn_ref = kernel_orth_loss(tree, tc, kj, wj)
        cap = float(np.median(np.asarray(pn_ref)))  # caps node 1, spares most
        _, pn_cap = kernel_orth_loss(tree, tc, kj, wj, cap=cap)
        pn_ref_np, pn_cap_np = np.asarray(pn_ref), np.asarray(pn_cap)
        over = pn_ref_np > cap
        assert over[1] and not over.all()
        np.testing.assert_allclose(pn_cap_np[over], cap, rtol=1e-5)
        np.testing.assert_allclose(pn_cap_np[~over], pn_ref_np[~over], rtol=1e-5)

        g_ref = jax.grad(lambda k: kernel_orth_loss(tree, tc, k, wj)[1][1])(kj)
        g_cap = jax.grad(
            lambda k: kernel_orth_loss(tree, tc, k, wj, cap=cap)[1][1])(kj)
        np.testing.assert_allclose(np.asarray(g_cap),
                                   np.asarray(g_ref) * (cap / pn_ref_np[1]),
                                   rtol=1e-4, atol=1e-6)


class TestMinContrast:
    @pytest.mark.parametrize("topk", [1, 2])
    def test_vs_naive(self, setup, topk):
        tree, tc, nodes, ys, pooled, w_eff, logits, rng = setup
        total, per_node = min_contrast_loss(tc, jnp.asarray(pooled), jnp.asarray(ys),
                                            jnp.asarray(w_eff), topk=topk)
        for ni, name in enumerate(tree.node_names):
            node = nodes[name]
            rows = node_rows(tree, nodes, name, ys)
            entries = []
            for child in node.children:
                slot = node.children_to_labels[child.name]
                col = tree.node_child_offset[ni] + slot
                rel = np.nonzero(w_eff[col] > 1e-5)[0]
                if len(rel) == 0:
                    continue
                leaf_set = ({child.name} if child.is_leaf()
                            else node.leaf_descendents_of_child[child.name])
                contrast = [r for r in rows if tree.class_names[ys[r]] not in leaf_set]
                if not contrast:
                    continue
                v = pooled[np.array(contrast)][:, rel]
                k = min(topk, len(contrast))
                top = np.sort(v, axis=0)[::-1][:k]
                entries.append(top.reshape(-1))
            if entries:
                want = np.concatenate(entries).mean()
                np.testing.assert_allclose(per_node[ni], want, rtol=1e-5)
            else:
                assert per_node[ni] == 0


class TestAlign:
    def test_uniform_blocked_vs_naive(self, rng):
        x = rng.standard_normal((65, 8)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        got = uniform_loss(jnp.asarray(x), block=16)
        d2 = ((x[:, None] - x[None]) ** 2).sum(-1)
        iu = np.triu_indices(65, 1)
        want = np.log(np.exp(-2 * d2[iu]).mean() + 1e-10)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_align_and_uniform_shapes(self, rng):
        f = rng.standard_normal((4, 3, 3, 8)).astype(np.float32)
        a, u = align_and_uniform(jnp.asarray(f), align=True, uni=True)
        f1 = f[:2].reshape(-1, 8)
        f2 = f[2:].reshape(-1, 8)
        n1 = f1 / np.linalg.norm(f1, axis=1, keepdims=True)
        n2 = f2 / np.linalg.norm(f2, axis=1, keepdims=True)
        want_a = (np.linalg.norm(n1 - n2, axis=1) ** 2).mean()
        np.testing.assert_allclose(a, want_a, rtol=1e-5)

    def test_align_pf(self, setup):
        tree, tc, nodes, ys, pooled, w_eff, logits, rng = setup
        B = len(ys) // 2
        H = W = 3
        pf = rng.uniform(0.01, 1, (2 * B, H, W, tree.num_protos_padded)).astype(np.float32)
        pf[..., ~tree.proto_valid] = 0.0
        total, per_node = align_pf_loss(tc, jnp.asarray(pf), jnp.asarray(ys))
        for ni, name in enumerate(tree.node_names):
            rows = node_rows(tree, nodes, name, ys)
            r1 = rows[rows < B]
            sl = tree.node_proto_slice(ni)
            p1 = pf[r1][..., sl].reshape(-1, sl.stop - sl.start)
            p2 = pf[r1 + B][..., sl].reshape(-1, sl.stop - sl.start)
            ip = (p1 * p2).sum(-1)
            want = -np.log(ip + 1e-12).mean()  # both directions equal in value
            np.testing.assert_allclose(per_node[ni], want, rtol=1e-5)


class TestOverspecificity:
    @pytest.mark.parametrize("boost,geo", [(None, False), (1.1, False), (None, True)])
    def test_vs_naive(self, setup, boost, geo):
        from pipnet_tpu.losses import overspecificity_losses
        tree, tc, nodes, ys, pooled, w_eff, logits, rng = setup
        presence = rng.uniform(0, 1, tree.num_protos_padded).astype(np.float32)
        out = overspecificity_losses(tc, jnp.asarray(pooled), jnp.asarray(ys),
                                     jnp.asarray(w_eff), jnp.asarray(presence),
                                     boost=boost, geometric_mean=geo, sg_score=True)
        present_leaves = {tree.class_names[y] for y in ys if y >= 0}
        want_os, want_l1 = 0.0, 0.0
        for ni, name in enumerate(tree.node_names):
            node = nodes[name]
            os_n, l1_n, total_rel = 0.0, 0.0, 0.0
            for child in node.children:
                col = tree.node_child_offset[ni] + node.children_to_labels[child.name]
                rel = np.nonzero(w_eff[col] > 1e-3)[0]
                total_rel += len(rel)
                leaf_set = ({child.name} if child.is_leaf()
                            else node.leaf_descendents_of_child[child.name])
                present = sorted(leaf_set & present_leaves)
                if not present:
                    continue
                maxs = []
                for leaf in present:
                    li = tree.class_names.index(leaf)
                    rows = np.array([i for i, y in enumerate(ys) if y == li])
                    maxs.append(pooled[rows][:, rel].max(0))
                maxs = np.stack(maxs)  # (n_present, n_rel)
                if boost is not None:
                    score = np.clip(maxs * boost, None, 1.0).prod(0)
                elif geo:
                    score = (maxs ** (1.0 / len(present))).prod(0)
                else:
                    score = maxs.prod(0)
                os_n += -(score * presence[rel]).sum()
                l1_n += presence[rel].sum()
            if total_rel > 0:
                want_os += 2.0 * (os_n / total_rel) / tree.num_nodes
                want_l1 += 0.5 * (l1_n / total_rel) / tree.num_nodes
        np.testing.assert_allclose(out["overspecificity"], want_os, rtol=1e-4)
        np.testing.assert_allclose(out["mask_l1"], want_l1, rtol=1e-4)


class TestTanhEpsOverride:
    """--tanh_eps: opt-in gradient bound for the -log(tanh(x)+eps) terms."""

    def test_resolution_order(self):
        from pipnet_tpu.config import LossConfig, from_reference_flags
        from pipnet_tpu.losses.aggregate import resolve_tanh_eps
        # reference-exact defaults: 1e-8, rebound to 1e-12 under min-contrast
        assert resolve_tanh_eps(LossConfig(), False) == EPS
        assert resolve_tanh_eps(LossConfig(), True) == 1e-12
        # the override wins in both regimes
        cfg = LossConfig(tanh_eps=1e-2)
        assert resolve_tanh_eps(cfg, False) == 1e-2
        assert resolve_tanh_eps(cfg, True) == 1e-2
        # flag plumbing (unset stays reference-exact)
        assert from_reference_flags({"tanh_eps": "0.01"}).train.loss.tanh_eps == 0.01
        assert from_reference_flags({}).train.loss.tanh_eps is None

    def test_bounds_gradient_at_zero_activation(self, setup):
        tree, tc, nodes, ys, pooled, w_eff, logits, rng = setup
        dead = np.zeros_like(pooled)  # every prototype silent: worst case

        def total(p, eps):
            return tanh_loss(tc, p, jnp.asarray(ys), eps=eps)[0]

        g_ref = jax.grad(lambda p: total(p, 1e-12))(jnp.asarray(dead))
        g_safe = jax.grad(lambda p: total(p, 1e-2))(jnp.asarray(dead))
        # reference epsilon: gradient magnitude ~1/eps per contributing term
        assert float(jnp.abs(g_ref).max()) > 1e8
        # override bounds it at ~1/eps = 100 (per term, pre-averaging)
        assert float(jnp.abs(g_safe).max()) <= 100.0 + 1e-3
        # and on healthy activations the LOSS is barely perturbed
        l_ref = float(total(jnp.asarray(pooled), 1e-12))
        l_safe = float(total(jnp.asarray(pooled), 1e-2))
        np.testing.assert_allclose(l_safe, l_ref, rtol=5e-2)


class TestAlignEpsOverride:
    """--align_eps: opt-in gradient bound for align_pf's -log(<pf1,pf2>+eps).

    The measured need: with tanh_eps already bounded, the 190-class
    full-phase run still collapsed at the backbone unfreeze with align_pf
    0.23 -> 19 (x5 weight) driving the loss (runs/full_phase_190 forensics)."""

    def test_flag_plumbing(self):
        from pipnet_tpu.config import from_reference_flags
        assert from_reference_flags({"align_eps": "0.01"}).train.loss.align_eps == 0.01
        assert from_reference_flags({}).train.loss.align_eps is None

    def test_bounds_gradient_on_decorrelated_views(self, setup):
        tree, tc, nodes, ys, pooled, w_eff, logits, rng = setup
        B = len(ys) // 2
        H = W = 2
        P = tree.num_protos_padded
        # Worst case: the two views put all softmax mass on DIFFERENT
        # prototypes of each node -> per-node inner product is exactly 0.
        pf = np.zeros((2 * B, H, W, P), np.float32)
        for ni in range(tree.num_nodes):
            sl = tree.node_proto_slice(ni)
            pf[:B, :, :, sl.start] = 1.0
            pf[B:, :, :, sl.start + 1] = 1.0

        def total(x, eps):
            return align_pf_loss(tc, x, jnp.asarray(ys), eps=eps)[0]

        g_ref = jax.grad(lambda x: total(x, 1e-12))(jnp.asarray(pf))
        g_safe = jax.grad(lambda x: total(x, 1e-2))(jnp.asarray(pf))
        assert float(jnp.abs(g_ref).max()) > 1e8
        # d/dip[-log(ip+eps)] <= 1/eps = 100 per patch term, pre-averaging
        assert float(jnp.abs(g_safe).max()) <= 100.0 + 1e-3
        # healthy (well-aligned) views: the LOSS is barely perturbed
        good = np.full((2 * B, H, W, P), 0.0, np.float32)
        for ni in range(tree.num_nodes):
            sl = tree.node_proto_slice(ni)
            good[:, :, :, sl.start] = 1.0
        l_ref = float(total(jnp.asarray(good), 1e-12))
        l_safe = float(total(jnp.asarray(good), 1e-2))
        np.testing.assert_allclose(l_safe, l_ref, atol=1e-2)

    def test_aggregate_plumbs_align_eps(self, setup):
        """cfg.align_eps must reach align_pf_loss through compute_total_loss."""
        from pipnet_tpu.config import LossConfig
        from pipnet_tpu.losses import LossWeights, compute_total_loss
        tree, tc, nodes, ys, pooled, w_eff, logits, rng = setup
        B = len(ys) // 2
        P = tree.num_protos_padded
        pf = np.zeros((2 * B, 2, 2, P), np.float32)
        for ni in range(tree.num_nodes):
            sl = tree.node_proto_slice(ni)
            pf[:B, :, :, sl.start] = 1.0          # views fully decorrelated:
            pf[B:, :, :, sl.start + 1] = 1.0      # align_pf saturates at -log(eps)
        outputs = {"features": jnp.zeros((2 * B, 2, 2, 4), jnp.float32),
                   "proto_features": jnp.asarray(pf),
                   "pooled": jnp.asarray(pooled), "logits": jnp.asarray(logits)}
        kw = dict(ys=jnp.asarray(ys), w_eff=jnp.asarray(w_eff),
                  add_on_kernel=jnp.zeros((4, P), jnp.float32),
                  proto_presence=jnp.zeros((P, 2), jnp.float32),
                  multiplier=jnp.asarray(2.0),
                  weights=LossWeights.pretrain(1, 2), pretrain=True,
                  finetune=False)
        base = dict(align=False, uni=False, align_pf=True, tanh=False, byol=False)
        t_ref, aux_ref = compute_total_loss(tc, outputs, cfg=LossConfig(**base), **kw)
        t_safe, aux_safe = compute_total_loss(
            tc, outputs, cfg=LossConfig(**base, align_eps=1e-2), **kw)
        # every in-batch patch term saturates at exactly -log(eps); nodes with
        # no in-batch descendants contribute 0
        frac = np.mean([len(node_rows(tree, nodes, nm, ys[:B])) > 0
                        for nm in tree.node_names])
        np.testing.assert_allclose(float(aux_ref["align_pf"]),
                                   frac * -np.log(1e-12), rtol=1e-5)
        np.testing.assert_allclose(float(aux_safe["align_pf"]),
                                   frac * -np.log(1e-2), rtol=1e-5)

    def test_default_is_reference_exact(self, setup):
        tree, tc, nodes, ys, pooled, w_eff, logits, rng = setup
        B = len(ys) // 2
        pf = np.abs(np.random.default_rng(7).normal(
            size=(2 * B, 2, 2, tree.num_protos_padded))).astype(np.float32)
        a = align_pf_loss(tc, jnp.asarray(pf), jnp.asarray(ys))[0]
        b = align_pf_loss(tc, jnp.asarray(pf), jnp.asarray(ys), eps=1e-12)[0]
        np.testing.assert_allclose(float(a), float(b), rtol=0, atol=0)
