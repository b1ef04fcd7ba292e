"""Model tests: segment ops vs naive per-node reference, forward shapes,
joint distribution vs recursive computation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pipnet_tpu.config import HeadConfig, ModelConfig
from pipnet_tpu.models import (PIPNet, build_pipnet, joint_leaf_distribution,
                               latent_shape)
from pipnet_tpu.ops import segment_max_to_nodes, segment_softmax, segment_sum_to_nodes
from pipnet_tpu.tree import compile_tree, flat_tree


def _budget(root, per_child=10, per_desc=0):
    for node in root.nodes_with_children():
        node.set_num_protos(num_protos_per_descendant=per_desc,
                            num_protos_per_child=per_child,
                            min_protos=0, split_protos=True)
    return root


def naive_segment_softmax(x, tree, tau):
    """Per-node softmax computed node-by-node, the way the reference loops."""
    out = np.zeros_like(x)
    for ni in range(tree.num_nodes):
        sl = tree.node_proto_slice(ni)
        z = x[..., sl] / tau
        z = z - z.max(axis=-1, keepdims=True)
        e = np.exp(z)
        out[..., sl] = e / e.sum(axis=-1, keepdims=True)
    return out


class TestSegmentOps:
    @pytest.mark.parametrize("per_child,per_desc", [(10, 0), (0, 4)])
    def test_segment_softmax_matches_naive(self, tiny_root, rng, per_child, per_desc):
        root = _budget(tiny_root, per_child, per_desc)
        tree = compile_tree(root, protopool=False)
        x = rng.standard_normal((3, 4, 4, tree.num_protos_padded)).astype(np.float32)
        got = np.asarray(segment_softmax(jnp.asarray(x), tree, tau=0.2))
        want = naive_segment_softmax(x, tree, 0.2)
        np.testing.assert_allclose(got[..., tree.proto_valid], want[..., tree.proto_valid],
                                   rtol=1e-5, atol=1e-6)
        # padded slots exactly zero
        assert (got[..., ~tree.proto_valid] == 0).all()

    def test_segment_sum_max(self, tiny_root, rng):
        root = _budget(tiny_root)
        tree = compile_tree(root, protopool=False)
        x = rng.standard_normal((5, tree.num_protos_padded)).astype(np.float32)
        x[..., ~tree.proto_valid] = 0.0
        s = np.asarray(segment_sum_to_nodes(jnp.asarray(x), tree))
        m = np.asarray(segment_max_to_nodes(jnp.asarray(x), tree))
        for ni in range(tree.num_nodes):
            sl = tree.node_proto_slice(ni)
            np.testing.assert_allclose(s[:, ni], x[:, sl].sum(-1), rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(m[:, ni], x[:, sl].max(-1), rtol=1e-5)


def _tiny_model(tiny_root, image_size=64, backbone="convnext_tiny_26", **head_kw):
    cfg = ModelConfig(backbone=backbone, image_size=image_size,
                      num_protos_per_child=10,
                      head=HeadConfig(softmax_tau=1.0, protopool=False, **head_kw))
    model, tree = build_pipnet(tiny_root, cfg, weighted=True)
    return model, tree, cfg


class TestForward:
    def test_forward_shapes_and_padding(self, tiny_root):
        model, tree, cfg = _tiny_model(tiny_root)
        xs = jnp.zeros((2, cfg.image_size, cfg.image_size, 3))
        params = model.init(jax.random.PRNGKey(0), xs)
        out = model.apply(params, xs)
        H, W = latent_shape(cfg)
        assert out["features"].shape == (2, H, W, 768)
        assert out["proto_features"].shape == (2, H, W, tree.num_protos_padded)
        assert out["pooled"].shape == (2, tree.num_protos_padded)
        assert out["logits"].shape == (2, tree.num_children_total)
        # softmax per node sums to one on every patch
        pf = np.asarray(out["proto_features"])
        for ni in range(tree.num_nodes):
            sl = tree.node_proto_slice(ni)
            np.testing.assert_allclose(pf[..., sl].sum(-1), 1.0, atol=1e-5)
        # padded prototype slots are inert
        assert (np.asarray(out["pooled"])[:, ~tree.proto_valid] == 0).all()

    def test_latent_shape_convnext26(self, tiny_root):
        model, tree, cfg = _tiny_model(tiny_root, image_size=224)
        # ref geometry: 26x26 at 224^2 (features/convnext_features.py:13)
        assert latent_shape(cfg) == (26, 26)

    def test_latent_shape_matches_runtime(self, tiny_root):
        model, tree, cfg = _tiny_model(tiny_root, image_size=96)
        xs = jnp.zeros((1, 96, 96, 3))
        params = model.init(jax.random.PRNGKey(0), xs)
        out = model.apply(params, xs)
        assert out["features"].shape[1:3] == latent_shape(cfg)

    def test_inference_threshold(self, tiny_root):
        model, tree, cfg = _tiny_model(tiny_root)
        xs = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
        params = model.init(jax.random.PRNGKey(0), xs)
        out = model.apply(params, xs, inference=True)
        pooled = np.asarray(out["pooled"])
        assert ((pooled == 0) | (pooled >= cfg.head.inference_threshold)).all()

    @pytest.mark.slow
    def test_resnet_backbone(self, tiny_root):
        model, tree, cfg = _tiny_model(tiny_root, image_size=64, backbone="resnet18")
        xs = jnp.zeros((2, 64, 64, 3))
        params = model.init(jax.random.PRNGKey(0), xs)
        out = model.apply(params, xs)
        assert out["features"].shape == (2, 8, 8, 512)

    def test_classifier_block_structure(self, tiny_root):
        """Logits only depend on the node's own prototypes."""
        model, tree, cfg = _tiny_model(tiny_root)
        xs = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
        params = model.init(jax.random.PRNGKey(0), xs)
        w = np.asarray(model.apply(params, method=lambda m: m.head.effective_cls_weight()))
        for ni in range(tree.num_nodes):
            cs = tree.node_child_slice(ni)
            ps = tree.node_proto_slice(ni)
            other = np.ones(tree.num_protos_padded, bool)
            other[ps] = False
            assert (w[cs][:, other] == 0).all()


class TestJointDistribution:
    def test_vs_recursive(self, tiny_root, rng):
        model, tree, cfg = _tiny_model(tiny_root)
        nodes = {n.name: n for n in tiny_root.nodes_with_children()}
        B = 4
        logits = rng.standard_normal((B, tree.num_children_total)).astype(np.float32)

        # recursive reference computation (util/node.py:300-395 semantics)
        def softmax(v):
            e = np.exp(v - v.max(-1, keepdims=True))
            return e / e.sum(-1, keepdims=True)

        def recurse(node):
            if node.is_leaf():
                return np.ones((B, 1)), [node.name]
            ni = tree.node_index(node.name)
            cs = tree.node_child_slice(ni)
            p = softmax(np.log1p(logits[:, cs] ** 2))
            cols, names = [], []
            slot_to_child = {node.children_to_labels[c.name]: c for c in node.children}
            for slot in range(node.num_children()):
                sub, subnames = recurse(slot_to_child[slot])
                cols.append(p[:, slot:slot + 1] * sub)
                names.extend(subnames)
            return np.concatenate(cols, axis=1), names

        want, names = recurse(tiny_root)
        order = np.argsort(names)
        want = want[:, order]

        got = np.asarray(joint_leaf_distribution(jnp.asarray(logits), tree))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)


class TestDegenerateFallback:
    def test_leaf_count_prior(self, tiny_root, rng):
        """Degenerate nodes fall back to leaf-count priors
        (ref util/node.py:336-361)."""
        from pipnet_tpu.models import joint_leaf_log_distribution
        from pipnet_tpu.tree import compile_tree
        for node in tiny_root.nodes_with_children():
            node.set_num_protos(0, 4, 0, True)
        tree = compile_tree(tiny_root, protopool=False, pad_total_to=8)
        logits = rng.standard_normal((2, tree.num_children_total)).astype(np.float32)
        deg = np.zeros(tree.num_nodes, bool)
        ni = tree.node_index("001+003")     # children: 2 and 1 leaves
        deg[ni] = True
        logp = np.asarray(joint_leaf_log_distribution(
            jnp.asarray(logits), tree, degenerate_nodes=deg))
        p = np.exp(logp)
        np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)
        # ratio of the two children's subtree masses == leaf-count ratio 2:1
        cs = tree.node_child_slice(ni)
        leaf_sets = []
        for col in range(cs.start, cs.stop):
            leaf_sets.append(np.nonzero(tree.child_leaf_matrix[:, col])[0])
        m0 = p[:, leaf_sets[0]].sum(-1)
        m1 = p[:, leaf_sets[1]].sum(-1)
        np.testing.assert_allclose(m0 / m1, len(leaf_sets[0]) / len(leaf_sets[1]),
                                   rtol=1e-4)
