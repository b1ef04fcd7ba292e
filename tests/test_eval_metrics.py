"""Unit tests for eval metrics, in particular the per-prediction
explanation-size stat (the hierarchical analog of the reference's
SimANZCC / local-size headline, pipnet/test.py:56-65)."""

import numpy as np

from pipnet_tpu.eval.metrics import (pred_path_explanation_size,
                                     sparsity_stats)
from pipnet_tpu.tree.compile import compile_tree


def _tree(tiny_root):
    for node in tiny_root.nodes_with_children():
        node.set_num_protos(num_protos_per_descendant=0,
                            num_protos_per_child=2, split_protos=True)
    return compile_tree(tiny_root, protopool=False, pad_total_to=8)


class TestPredPathExplanationSize:
    def test_counts_only_on_path_evidence(self, tiny_root):
        tree = _tree(tiny_root)
        P = tree.num_protos_padded
        C = tree.num_children_total
        # every prototype active everywhere, every connection live: the
        # per-image count must equal the number of (proto, child) pairs on
        # the predicted leaf's path, NOT global_size
        pooled = np.ones((3, P), np.float32)
        w_eff = np.asarray(tree.child_block_mask, np.float32)  # 1 on-block
        preds = np.asarray([0, 0, 1])
        out = pred_path_explanation_size(
            pooled, w_eff, tree.leaf_child_col, tree.leaf_under_node, preds)
        # expected: for each node on the path, the on-path child column's
        # block width (2 protos per child with this budget)
        for i, leaf in enumerate(preds):
            cols = tree.leaf_child_col[leaf][tree.leaf_under_node[leaf]]
            cols = cols[cols >= 0]
            expect = sum(int((w_eff[c] > 1e-3).sum()) for c in cols)
            counts = (pooled > 1e-3).astype(np.float32) @ \
                (w_eff > 1e-3).astype(np.float32).T
            assert counts.shape == (3, C)
            if i == 0:
                assert out["local_size_pred_path_mean"] <= sparsity_stats(
                    w_eff, pooled)["local_size_mean"]
            assert expect > 0
        # mean over identical-path images equals the per-leaf expectation
        cols0 = tree.leaf_child_col[0][tree.leaf_under_node[0]]
        cols0 = cols0[cols0 >= 0]
        expect0 = sum(int((w_eff[c] > 1e-3).sum()) for c in cols0)
        per_img0 = pred_path_explanation_size(
            pooled[:1], w_eff, tree.leaf_child_col, tree.leaf_under_node,
            preds[:1])["local_size_pred_path_mean"]
        assert per_img0 == expect0

    def test_zero_pooled_gives_zero(self, tiny_root):
        tree = _tree(tiny_root)
        pooled = np.zeros((2, tree.num_protos_padded), np.float32)
        w_eff = np.asarray(tree.child_block_mask, np.float32)
        out = pred_path_explanation_size(
            pooled, w_eff, tree.leaf_child_col, tree.leaf_under_node,
            np.asarray([0, 3]))
        assert out["local_size_pred_path_mean"] == 0.0
        assert out["almost_nonzeros_mean"] == 0.0

    def test_dead_connection_not_counted(self, tiny_root):
        tree = _tree(tiny_root)
        pooled = np.ones((1, tree.num_protos_padded), np.float32)
        w_eff = np.asarray(tree.child_block_mask, np.float32).copy()
        cols = tree.leaf_child_col[0][tree.leaf_under_node[0]]
        cols = cols[cols >= 0]
        before = pred_path_explanation_size(
            pooled, w_eff, tree.leaf_child_col, tree.leaf_under_node,
            np.asarray([0]))["local_size_pred_path_mean"]
        # kill one on-path connection (relu(W) absorbing boundary analog)
        c = int(cols[0])
        p = int(np.argmax(w_eff[c] > 1e-3))
        w_eff[c, p] = 0.0
        after = pred_path_explanation_size(
            pooled, w_eff, tree.leaf_child_col, tree.leaf_under_node,
            np.asarray([0]))["local_size_pred_path_mean"]
        assert after == before - 1
