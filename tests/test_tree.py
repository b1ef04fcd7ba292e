"""Tree subsystem tests: Newick parsing, Node semantics, tree compilation."""

import numpy as np
import pytest

from pipnet_tpu.tree import (Node, Phylogeny, TreeArrays, compile_tree,
                             construct_discretized_phylo_tree,
                             construct_phylo_tree, flat_tree, parse_newick,
                             split_value)


def test_parse_newick_roundtrip(tiny_newick):
    tree = parse_newick(tiny_newick)
    leaves = [l.name for l in tree.iter_leaves()]
    assert len(leaves) == 8
    assert leaves[0] == "cub_001_Sooty_Albatross"
    # distances
    d = tree.get_distance("cub_001_Sooty_Albatross", "cub_002_Laysan_Albatross")
    assert d == pytest.approx(2.0)
    d = tree.get_distance("cub_001_Sooty_Albatross", "cub_007_Indigo_Bunting")
    assert d == pytest.approx(1 + 1 + 2 + 1 + 3 + 2)


def test_phylogeny_groups(tiny_newick):
    phylo = Phylogeny(newick=tiny_newick)
    # max root-to-leaf distance: cub_007/008 path = 2+3 = 5; albatross = 1+1+2+1=5
    assert phylo.total_distance == pytest.approx(5.0)
    groups_all = phylo.get_species_groups(1.0)
    assert len(groups_all) == 1 and len(groups_all[0]) == 8
    groups_none = phylo.get_species_groups(0.0)
    assert len(groups_none) == 8


def test_construct_phylo_tree_names(tiny_root):
    root = tiny_root
    # internal node names are +-joined child id prefixes
    names = {n.name for n in root.nodes_with_children()}
    assert "root" in names
    assert "001+002" in names          # albatross pair
    assert "001+003" in names          # albatross clade + auklet
    # chains collapsed: every internal node has >= 2 children
    for node in root.nodes_with_children():
        assert node.num_children() >= 2


def test_node_descendants(tiny_root):
    root = tiny_root
    node = root.get_node("001+002")
    assert node.leaf_descendents == {"cub_001_Sooty_Albatross", "cub_002_Laysan_Albatross"}
    top = root.get_node("001+004")
    assert top.num_leaf_descendents() == 6
    child = top.closest_descendent_for("cub_006_Bobolink")
    assert "cub_006_Bobolink" in child.leaf_descendents | {child.name}


def test_add_children_sorts_and_labels():
    n = Node("root")
    n.add_children(["b", "a", "c"])
    assert n.children_names() == ["a", "b", "c"]
    assert n.children_to_labels == {"a": 0, "b": 1, "c": 2}
    n.add_children(["aa"])
    assert n.children_to_labels["aa"] == 3


def test_node_dict_roundtrip(tiny_root):
    """to_dict/from_dict preserve topology, child order, and labels — the
    contract RunLog.save_tree / run_io.load_run rely on to rebuild the exact
    trained tree without the phylogeny file."""
    d = tiny_root.to_dict()
    back = Node.from_dict(d)
    for orig, new in zip([tiny_root] + [tiny_root.get_node(n.name)
                                        for n in tiny_root.nodes_with_children()],
                         [back] + [back.get_node(n.name)
                                   for n in back.nodes_with_children()]):
        assert orig.name == new.name
        assert orig.children_names() == new.children_names()
        assert orig.children_to_labels == new.children_to_labels
    assert [l.name for l in back.leaves()] == [l.name
                                               for l in tiny_root.leaves()]
    # compiled arrays agree after re-budgeting
    for node in tiny_root.nodes_with_children():
        node.set_num_protos(num_protos_per_descendant=2,
                            num_protos_per_child=0, min_protos=0,
                            split_protos=True)
    for node in back.nodes_with_children():
        node.set_num_protos(num_protos_per_descendant=2,
                            num_protos_per_child=0, min_protos=0,
                            split_protos=True)
    ta, tb = compile_tree(tiny_root), compile_tree(back)
    assert ta.class_names == tb.class_names
    np.testing.assert_array_equal(ta.leaf_child_col, tb.leaf_child_col)
    np.testing.assert_array_equal(ta.node_num_protos, tb.node_num_protos)


def test_split_value():
    assert split_value(10, 3) == [4, 3, 3]
    assert split_value(9, 3) == [3, 3, 3]


def test_set_num_protos_per_child(tiny_root):
    root = tiny_root
    for node in root.nodes_with_children():
        node.set_num_protos(num_protos_per_descendant=0, num_protos_per_child=10,
                            min_protos=0, split_protos=True)
    pair = root.get_node("001+002")
    assert pair.num_protos == 20
    assert pair.num_protos_per_child == {c.name: 10 for c in pair.children}
    # per-descendant dominates when larger
    for node in root.nodes_with_children():
        node.set_num_protos(num_protos_per_descendant=6, num_protos_per_child=10,
                            min_protos=0, split_protos=True)
    clade = root.get_node("001+003")  # children: 001+002 (2 leaves), auklet (1 leaf)
    assert clade.num_protos == max(10, 6 * 2) + max(10, 6 * 1)


def test_discretized_tree(tiny_newick):
    phylo = Phylogeny(newick=tiny_newick)
    root = construct_discretized_phylo_tree(phylo_distances_string="0.5", phylo=phylo)
    root.assign_all_descendents()
    # two levels: groups at rd=0.5 then species
    for node in root.nodes_with_children():
        assert node.num_children() >= 2  # singular nodes collapsed
    leaves = {l.name for l in root.leaves()}
    assert len(leaves) == 8


def _budgeted(root, per_child=10, per_desc=0):
    for node in root.nodes_with_children():
        node.set_num_protos(num_protos_per_descendant=per_desc,
                            num_protos_per_child=per_child,
                            min_protos=0, split_protos=True)
    return root


class TestCompile:
    def test_basic_layout(self, tiny_root):
        root = _budgeted(tiny_root)
        ta = compile_tree(root, protopool=False, weighted=True)
        assert ta.num_classes == 8
        N = ta.num_nodes
        assert N == len(root.nodes_with_children())
        # every node slice is disjoint and within a bucket of its width
        seen = np.zeros(ta.num_protos_padded, bool)
        for ni in range(N):
            sl = ta.node_proto_slice(ni)
            assert not seen[sl].any()
            seen[sl] = True
            assert (ta.proto_node[sl] == ni).all()
        assert ta.proto_valid.sum() == sum(int(n.num_protos) for n in root.nodes_with_children())
        assert ta.num_protos_padded % 128 == 0

    def test_label_luts(self, tiny_root):
        root = _budgeted(tiny_root)
        ta = compile_tree(root, protopool=False)
        nodes = {n.name: n for n in root.nodes_with_children()}
        for li, cls in enumerate(ta.class_names):
            for ni, nname in enumerate(ta.node_names):
                node = nodes[nname]
                if cls in node.leaf_descendents:
                    slot = int(ta.leaf_child_slot[li, ni])
                    child = node.closest_descendent_for(cls)
                    assert node.children_to_labels[child.name] == slot
                    col = int(ta.leaf_child_col[li, ni])
                    assert ta.child_leaf_matrix[li, col] == 1.0
                else:
                    assert ta.leaf_child_slot[li, ni] == -1

    def test_block_masks(self, tiny_root):
        root = _budgeted(tiny_root)
        ta = compile_tree(root, protopool=False)
        # child_block_mask is finer than class_mask and partitions node blocks
        assert (ta.child_block_mask <= ta.class_mask).all()
        for ni in range(ta.num_nodes):
            ps = ta.node_proto_slice(ni)
            cs = ta.node_child_slice(ni)
            block = ta.child_block_mask[cs, ps]
            # each valid proto belongs to exactly one child
            assert (block.sum(axis=0) == 1).all()

    def test_weighted_node_weights(self, tiny_root):
        root = _budgeted(tiny_root)
        ta = compile_tree(root, protopool=False, weighted=True)
        ni = ta.node_index("001+003")  # children with 2 and 1 leaf descendants
        cs = ta.node_child_slice(ni)
        w = ta.node_weights[cs]
        counts = ta.child_num_leaves[cs]
        np.testing.assert_allclose(w, counts.min() / counts)

    def test_flat_tree(self):
        root = flat_tree([f"class_{i:02d}" for i in range(5)], num_protos=64)
        ta = compile_tree(root, protopool=True)
        assert ta.num_nodes == 1
        assert ta.num_classes == 5
        assert int(ta.node_num_protos[0]) == 64
        assert (ta.class_mask[:, :64] == 1).all()

    def test_bucketing_ragged(self, tiny_root):
        # per-descendant budgets make node widths ragged
        root = _budgeted(tiny_root, per_child=0, per_desc=4)
        for node in root.nodes_with_children():
            node.set_num_protos(num_protos_per_descendant=4, num_protos_per_child=0,
                                min_protos=0, split_protos=True)
        ta = compile_tree(root, protopool=False)
        widths = sorted({int(w) for w in ta.node_proto_width})
        assert len(ta.buckets) == len(widths)
        # waste bounded
        assert ta.num_protos_padded <= 2 * int(ta.proto_valid.sum()) + 128


def test_save_visualization(tiny_root, tmp_path):
    """Graphviz tree rendering artifact (ref util/node.py:470-482)."""
    import os
    out = tiny_root.save_visualization(str(tmp_path / "tree"))
    assert os.path.exists(out)
