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
        assert C == w_eff.shape[0]
        # per-image equality for EVERY prediction: run the stat on each
        # single-image slice and compare against the on-path pair count
        # (with pooled == w_eff == 1, product == factor thresholding)
        expects = []
        for i, leaf in enumerate(preds):
            cols = tree.leaf_child_col[leaf][tree.leaf_under_node[leaf]]
            cols = cols[cols >= 0]
            expect = sum(int((w_eff[c] > 1e-3).sum()) for c in cols)
            assert expect > 0
            per_img = pred_path_explanation_size(
                pooled[i:i + 1], w_eff, tree.leaf_child_col,
                tree.leaf_under_node, preds[i:i + 1])
            assert per_img["local_size_pred_path_mean"] == expect
            expects.append(expect)
        assert out["local_size_pred_path_mean"] == np.mean(expects)
        assert out["local_size_pred_path_mean"] <= sparsity_stats(
            w_eff, pooled)["local_size_mean"]

    def test_product_threshold_matches_reference(self, tiny_root):
        # the reference thresholds |pooled * weight| > 1e-3
        # (pipnet/test.py:56-58), NOT the factors: pooled 0.1 with weight
        # 0.005 has both factors above 1e-3 but product 5e-4 -> not counted
        tree = _tree(tiny_root)
        pooled = np.full((1, tree.num_protos_padded), 0.1, np.float32)
        w_eff = np.asarray(tree.child_block_mask, np.float32) * 0.005
        out = pred_path_explanation_size(
            pooled, w_eff, tree.leaf_child_col, tree.leaf_under_node,
            np.asarray([0]))
        assert out["local_size_pred_path_mean"] == 0.0
        # raise the weights so the product clears the threshold
        out2 = pred_path_explanation_size(
            pooled, w_eff * 10, tree.leaf_child_col, tree.leaf_under_node,
            np.asarray([0]))
        assert out2["local_size_pred_path_mean"] > 0.0

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
