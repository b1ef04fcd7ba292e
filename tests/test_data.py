"""Data pipeline tests: augmentation spaces, loader semantics, synthetic fixture."""

import numpy as np
import pytest
from PIL import Image

from pipnet_tpu.data import (Loader, TwoViewDataset, TwoViewTransform,
                             build_loaders, generate_synthetic_dataset,
                             reference_drop_last, scan_image_folder,
                             trivial_augment_no_color,
                             trivial_augment_no_shape)
from pipnet_tpu.data.augment import to_normalized_array


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthdata")
    train, test, phy = generate_synthetic_dataset(str(root), num_classes=4,
                                                  images_per_class=5, image_size=48)
    return train, test, phy


def test_augment_spaces_match_reference_tables():
    """The retuned op tables (ref util/data.py:904-952)."""
    geo = trivial_augment_no_color().space
    assert set(geo) == {"Identity", "ShearX", "ShearY", "TranslateX", "TranslateY", "Rotate"}
    assert geo["Rotate"][1].max() == pytest.approx(60.0)
    assert geo["TranslateX"][1].max() == pytest.approx(16.0)
    photo = trivial_augment_no_shape().space
    assert "Solarize" not in photo            # removed in the fork's table
    assert photo["Color"][2] is False         # unsigned over [-0.2, 1]
    assert photo["Color"][1].min() == pytest.approx(-0.2)
    assert photo["Posterize"][1].min() == 4   # range 8..4 (not 8..2)


def test_augment_ops_run():
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    ta = trivial_augment_no_shape()
    for _ in range(50):
        out = ta(img, rng)
        assert out.size == (64, 64)
    ta = trivial_augment_no_color()
    for _ in range(50):
        out = ta(img, rng)
        assert out.size == (64, 64)


def test_normalization():
    img = Image.new("RGB", (8, 8), (124, 116, 104))  # ~ImageNet mean * 255
    x = to_normalized_array(img)
    assert x.shape == (8, 8, 3)
    assert np.abs(x).max() < 0.05


def test_two_view_shared_geometry(synth):
    """The two views share geometry but differ photometrically."""
    train, test, phy = synth
    folder = scan_image_folder(train)
    tv = TwoViewTransform(image_size=48)
    ds = TwoViewDataset(folder, tv)
    rng = np.random.default_rng(0)
    v1, v2, t = ds.get(0, rng)
    assert v1.shape == (48, 48, 3) and v2.shape == (48, 48, 3)
    assert not np.array_equal(v1, v2)


def test_reference_drop_last_rule():
    # remainder 10 of batch 64 -> 15.6% < 20% -> drop
    assert reference_drop_last(1000 * 64 + 10, 64) is True
    # remainder 30 of 64 -> 46% -> keep
    assert reference_drop_last(64 + 30, 64) is False


def test_loader_epoch_determinism(synth):
    train, test, phy = synth
    folder = scan_image_folder(train)
    ds = TwoViewDataset(folder, TwoViewTransform(image_size=48))
    loader = Loader(ds, batch_size=4, seed=7, prefetch=0)
    b1 = list(loader.epoch(0))
    b2 = list(loader.epoch(0))
    assert all(np.array_equal(a.ys, b.ys) for a, b in zip(b1, b2))
    b3 = list(loader.epoch(1))
    assert any(not np.array_equal(a.ys, b.ys) for a, b in zip(b1, b3))


def test_loader_weighted_and_leaveout(synth):
    train, test, phy = synth
    folder = scan_image_folder(train)
    ds = TwoViewDataset(folder, TwoViewTransform(image_size=48))
    # leave out class 0
    loader = Loader(ds, batch_size=4, seed=1, keep_labels=[1, 2, 3], prefetch=0)
    ys = np.concatenate([b.ys for b in loader.epoch(0)])
    assert 0 not in ys
    wloader = Loader(ds, batch_size=4, seed=1, weighted=True, prefetch=0)
    ys = np.concatenate([b.ys for b in wloader.epoch(0)])
    assert len(ys) > 0


def test_host_sharding(synth):
    train, test, phy = synth
    folder = scan_image_folder(train)
    ds = TwoViewDataset(folder, TwoViewTransform(image_size=48))
    shards = []
    for host in range(2):
        loader = Loader(ds, batch_size=2, seed=3, num_hosts=2, host_id=host, prefetch=0)
        shards.append(np.concatenate([b.ys for b in loader.epoch(0)]))
    # together the shards cover the dataset (up to wrap padding)
    assert len(shards[0]) + len(shards[1]) >= len(ds)


def test_build_loaders_bundle(synth):
    train, test, phy = synth
    loaders = build_loaders(train, test, image_size=48, batch_size=4,
                            batch_size_pretrain=6, seed=1)
    assert len(loaders.classes) == 4
    assert loaders.project.batch_size == 1
    batch = next(loaders.train.epoch(0))
    assert batch.xs1.shape == (4, 48, 48, 3) and batch.xs2.shape == (4, 48, 48, 3)
    ev = next(loaders.test.epoch(0))
    assert ev.xs2 is None


def test_prefetch_thread(synth):
    train, test, phy = synth
    folder = scan_image_folder(train)
    ds = TwoViewDataset(folder, TwoViewTransform(image_size=48))
    loader = Loader(ds, batch_size=4, seed=7, prefetch=2)
    batches = list(loader.epoch(0))
    assert len(batches) == len(loader)


def test_multi_worker_determinism(synth):
    """num_workers > 1 yields identical batches in identical order (per-batch
    RNG seeding makes augmentation worker-count independent)."""
    train, test, phy = synth
    folder = scan_image_folder(train)
    ds = TwoViewDataset(folder, TwoViewTransform(image_size=48))
    seq = list(Loader(ds, batch_size=4, seed=7, prefetch=0).epoch(0))
    par = list(Loader(ds, batch_size=4, seed=7, prefetch=4,
                      num_workers=3).epoch(0))
    assert len(seq) == len(par)
    for a, b in zip(seq, par):
        np.testing.assert_array_equal(a.ys, b.ys)
        np.testing.assert_array_equal(a.xs1, b.xs1)
        np.testing.assert_array_equal(a.xs2, b.xs2)


def test_worker_exception_propagates(synth):
    """A crash inside a loader worker must surface in the consumer instead of
    hanging it (round-1 advisor finding: dead producer left q.get() blocked)."""
    import pytest

    train, test, phy = synth
    folder = scan_image_folder(train)
    ds = TwoViewDataset(folder, TwoViewTransform(image_size=48))

    class Exploding:
        def __init__(self, inner):
            self.inner = inner
            self.folder = inner.folder

        def __len__(self):
            return len(self.inner)

        def get(self, index, rng):
            if index % 5 == 1:
                raise OSError("truncated image file")
            return self.inner.get(index, rng)

    loader = Loader(Exploding(ds), batch_size=4, seed=7, shuffle=False,
                    prefetch=2, num_workers=2)
    with pytest.raises(OSError, match="truncated image"):
        list(loader.epoch(0))


def test_validation_size_split(synth):
    """--validation_size with no test dir: stratified split of the train
    folder, held-out part becomes the test set (ref util/data.py:663-668)."""
    from pipnet_tpu.data.loader import stratified_split

    train, test, phy = synth
    folder = scan_image_folder(train)
    tr, te = stratified_split(folder.targets, 0.25, seed=3)
    assert len(tr) + len(te) == len(folder)
    assert len(np.intersect1d(tr, te)) == 0
    # stratified: every class appears in both splits
    assert set(folder.targets[tr]) == set(folder.targets[te]) == set(folder.targets)
    # deterministic
    tr2, te2 = stratified_split(folder.targets, 0.25, seed=3)
    np.testing.assert_array_equal(tr, tr2)

    loaders = build_loaders(train, None, image_size=48, batch_size=4,
                            batch_size_pretrain=6, seed=1, validation_size=0.25)
    n_train = sum(len(b.ys) for b in loaders.train_normal.epoch(0))
    n_test = sum(len(b.ys) for b in loaders.test.epoch(0))
    assert n_train + n_test == len(folder)
    assert 0 < n_test < n_train
    # without a validation_size it must refuse
    import pytest
    with pytest.raises(ValueError, match="validation_size"):
        build_loaders(train, None, image_size=48, batch_size=4, seed=1)


def test_native_preprocess_matches_numpy():
    """The C++ normalizer is bit-compatible with the numpy path."""
    from pipnet_tpu.native import IMAGENET_MEAN, IMAGENET_STD, build, normalize_u8
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (40, 56, 3), dtype=np.uint8)
    out = normalize_u8(img)
    want = (img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_native_resize_matches_pil_half_pixel():
    """The C++ bilinear resize uses the PIL/torchvision half-pixel convention
    (round-1 advisor finding: the first version used align-corners scaling)."""
    from PIL import Image

    from pipnet_tpu.native import (IMAGENET_MEAN, IMAGENET_STD, lib,
                                   resize_crop_normalize)
    if lib() is None:
        import pytest
        pytest.skip("no C++ compiler available")
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (37, 51, 3), dtype=np.uint8)
    # PIL's downscale bilinear uses an area-adaptive (antialiasing) support,
    # not a plain 2-tap kernel, so the exact-equality check is the UPSCALE
    # (where both are 2-tap and only the sampling-grid convention matters);
    # downscale is compared loosely on a smooth gradient image.
    smooth = np.broadcast_to(
        np.linspace(0, 255, 51, dtype=np.float32)[None, :, None],
        (37, 51, 3)).astype(np.uint8)
    size = 24
    out = resize_crop_normalize(smooth, size, (0, 0), (size, size), False)
    ref = np.asarray(Image.fromarray(smooth).resize((size, size), Image.BILINEAR),
                     np.float32)
    ref = (ref / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    err = np.abs(out - ref).mean()
    assert err < 0.05, f"downscale mean abs err {err}"
    up = 64
    out_up = resize_crop_normalize(img, up, (0, 0), (up, up), False)
    ref_up = np.asarray(Image.fromarray(img).resize((up, up), Image.BILINEAR),
                        np.float32)
    ref_up = (ref_up / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(out_up, ref_up, atol=0.05)


def test_node_filtered_loader(synth):
    """NodeFilteredLoader restricts to a node's leaves and remaps labels
    (ref ModifiedLabelLoader, util/data.py:77-123)."""
    from pipnet_tpu.data.node_loader import NodeFilteredLoader
    from pipnet_tpu.data import EvalDataset, EvalTransform
    from pipnet_tpu.tree import build_tree_from_config, compile_tree
    train, test, phy = synth
    root = build_tree_from_config(phy, None)
    for n in root.nodes_with_children():
        n.set_num_protos(0, 2, 0, True)
    tree = compile_tree(root, protopool=False, pad_total_to=8)
    folder = scan_image_folder(train)
    loader = Loader(EvalDataset(folder, EvalTransform(48)), 4, shuffle=False,
                    drop_last=False, prefetch=0)
    # pick a non-root node
    ni = 1 if tree.num_nodes > 1 else 0
    nfl = NodeFilteredLoader(loader, tree, ni)
    seen = 0
    for batch, orig, slots in nfl:
        assert (tree.leaf_child_slot[orig, ni] == slots).all()
        assert (slots >= 0).all()
        seen += len(orig)
    expected = sum(int(tree.leaf_under_node[li, ni]) * 5
                   for li in range(tree.num_classes))
    assert seen == expected


def test_device_geometric_loader_ships_cached_bases(synth):
    """device_geometric mode: the train loader yields the deterministic
    resized uint8 BASE (image_size + 8)² with xs2 None, and caches it (the
    same array object returns on the second epoch)."""
    from pipnet_tpu.data import build_loaders
    train, test, _ = synth
    loaders = build_loaders(train, test, image_size=48, batch_size=4,
                            batch_size_pretrain=4, seed=1,
                            device_photometric=True, device_geometric=True)
    b1 = next(iter(loaders.train.epoch(0)))
    assert b1.xs1.dtype == np.uint8
    assert b1.xs1.shape[1:] == (56, 56, 3)          # 48 + 8
    assert b1.xs2 is None
    ds = loaders.train.dataset
    assert ds.device_geometric
    a = ds._base(0)
    b = ds._base(0)
    assert a is b                                    # cache hit
    # pretraining loader bases are larger (48 + 32)
    bp = next(iter(loaders.train_pretraining.epoch(0)))
    assert bp.xs1.shape[1:] == (80, 80, 3)


def test_device_geometric_cache_budget(synth, monkeypatch):
    """PIPNET_BASE_CACHE_MB=0 disables caching without breaking loading."""
    from pipnet_tpu.data import TwoViewDataset
    from pipnet_tpu.data.augment import TwoViewTransform
    train, _, _ = synth
    monkeypatch.setenv("PIPNET_BASE_CACHE_MB", "0")
    ds = TwoViewDataset(scan_image_folder(train), TwoViewTransform(48),
                        device_photometric=True, device_geometric=True)
    a = ds._base(0)
    b = ds._base(0)
    assert a is not b and np.array_equal(a, b)


class TestHierarchicalFixture:
    """The synthetic fixture carries NODE-ALIGNED visual traits: the
    phylogeny is generated first and every image is stamped with one
    marker per internal-node ancestor of its class — the data assumption
    behind tanh_desc / minimize_contrasting_set (pipnet/train.py:
    1089-1134, 1017-1060).  See data/synthetic.py for the measured
    collapse a non-hierarchical fixture causes."""

    def test_merge_topology_matches_parsed_tree(self):
        """Marker grouping (merge-node leaf sets) == the Node tree a run
        actually trains on (parsed from the emitted newick)."""
        from pipnet_tpu.data.synthetic import (_merge_topology,
                                               synthetic_class_names)
        from pipnet_tpu.tree import Phylogeny, construct_phylo_tree
        names = synthetic_class_names(12)
        newick, ancestors = _merge_topology(names, np.random.default_rng(3))
        merge_sets = {}
        for ci, anc in ancestors.items():
            for nid in anc:
                merge_sets.setdefault(nid, set()).add(names[ci])
        root = construct_phylo_tree(phylo=Phylogeny(newick=newick))
        root.assign_all_descendents()
        parsed_sets = [frozenset(n.leaf_descendents)
                       for n in root.nodes_with_children()]
        assert sorted(map(frozenset, merge_sets.values()), key=sorted) \
            == sorted(parsed_sets, key=sorted)
        # binary merge tree: every class has its full root->leaf path
        root_id = max(merge_sets)
        assert all(root_id in anc for anc in ancestors.values())

    def test_images_contain_ancestor_markers(self, tmp_path):
        """Every image carries a pixel of each ancestor marker's color
        (stamp noise is +-18 per channel)."""
        from pipnet_tpu.data.synthetic import (_marker_cues, _merge_topology,
                                               synthetic_class_names)
        train, test, phy = generate_synthetic_dataset(
            str(tmp_path), num_classes=6, images_per_class=2, image_size=96)
        names = synthetic_class_names(6)
        _, ancestors = _merge_topology(names, np.random.default_rng(0))
        for ci, name in enumerate(names):
            img = np.asarray(Image.open(
                f"{train}/{name}/img_000.png"), dtype=np.float64)
            flat = img.reshape(-1, 3)
            for nid in ancestors[ci] + [5 + ci]:     # internal + leaf marker
                color = _marker_cues(nid)[0]
                dist = np.abs(flat - color[None, :]).max(axis=1)
                # +-18 stamp noise plus uint8 quantization of the float color
                assert dist.min() <= 19.5, (name, nid)

    def test_sibling_share_non_sibling_differ(self, tmp_path):
        from pipnet_tpu.data.synthetic import (_merge_topology,
                                               synthetic_class_names)
        names = synthetic_class_names(8)
        _, ancestors = _merge_topology(names, np.random.default_rng(0))
        # all leaves share the root marker; sibling leaves legitimately
        # share their ENTIRE internal-ancestor set (the per-leaf marker is
        # what tells them apart), and ancestor counts equal each leaf's depth
        sets = [set(a) for a in ancestors.values()]
        assert set.intersection(*sets)               # root shared by all
        full = [frozenset(a) | {7 + ci} for ci, a in ancestors.items()]
        assert len(set(full)) == 8                   # leaf marker disambiguates


def test_resolve_dataset_synthetic_seed_override():
    """'synthetic:N:K:sS' pins the fixture seed: an --OOD_dataset fixture
    must be generated with a DIFFERENT seed than the in-distribution one so
    its class cues are disjoint (OOD_checking.ipynb uses a separate dataset;
    the synthetic analog is a separate seed)."""
    from pipnet_tpu.datasets import resolve_dataset

    tr_default, _, _, _ = resolve_dataset("synthetic:4:2", seed=1)
    tr_s7, _, _, kw = resolve_dataset("synthetic:4:2:s7", seed=1)
    assert tr_default != tr_s7
    assert tr_s7.split("_")[-1].startswith("7") or "_7_" in tr_s7 or tr_s7.endswith("7/train")
    import os
    assert os.path.isdir(tr_s7) and os.path.isfile(kw["phylo_path"])
