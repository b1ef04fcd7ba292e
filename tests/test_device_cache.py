"""Device-resident dataset cache (data/device_cache.py): the gathered batches
must be bit-identical (train) / float-rounding-identical (eval) to the
streamed loader path, and a trainer epoch over the cache must produce the
same parameters as one over the streamed batches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pipnet_tpu.config import (HeadConfig, LossConfig, ModelConfig,
                               OptimConfig, RunConfig, TrainConfig)
from pipnet_tpu.data import build_loaders, generate_synthetic_dataset
from pipnet_tpu.data.device_cache import build_device_cache, estimate_bytes


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_cache")
    train_dir, test_dir, phy = generate_synthetic_dataset(
        str(root), num_classes=4, images_per_class=6, image_size=48)
    return train_dir, test_dir, phy


def _loaders(synth, device_geometric=True):
    train_dir, test_dir, _ = synth
    return build_loaders(train_dir, test_dir, image_size=48,
                         batch_size=4, batch_size_pretrain=4, seed=1,
                         device_photometric=device_geometric,
                         device_geometric=device_geometric)


class TestGatherEquivalence:
    def test_train_bases_bit_identical(self, synth):
        loaders = _loaders(synth)
        loader = loaders.train
        cache = build_device_cache(loader)
        assert cache is not None and cache.kind == "u8base"
        assert estimate_bytes(loader.dataset) == cache.nbytes
        for epoch in (0, 3):
            stream = loader.epoch(epoch)
            for rows, ys in loader.epoch_index_batches(epoch):
                batch = next(stream)
                got = np.asarray(cache.fetch(rows))
                np.testing.assert_array_equal(got, batch.xs1)
                np.testing.assert_array_equal(ys, batch.ys)

    def test_weighted_sampling_order_matches(self, synth):
        train_dir, test_dir, _ = synth
        loaders = build_loaders(train_dir, test_dir, image_size=48,
                                batch_size=4, batch_size_pretrain=4, seed=1,
                                weighted=True, device_photometric=True,
                                device_geometric=True)
        loader = loaders.train
        cache = build_device_cache(loader)
        stream = loader.epoch(2)
        for rows, ys in loader.epoch_index_batches(2):
            batch = next(stream)
            np.testing.assert_array_equal(np.asarray(cache.fetch(rows)),
                                          batch.xs1)

    def test_eval_normalize_matches_host(self, synth):
        loaders = _loaders(synth)
        loader = loaders.test
        cache = build_device_cache(loader)
        assert cache is not None and cache.kind == "eval"
        stream = loader.epoch(0)
        for rows, ys in loader.epoch_index_batches(0):
            batch = next(stream)
            got = np.asarray(cache.fetch(rows))
            assert got.dtype == np.float32
            np.testing.assert_allclose(got, batch.xs1, atol=2e-6)

    def test_host_only_dataset_not_cacheable(self, synth):
        loaders = _loaders(synth, device_geometric=False)
        assert estimate_bytes(loaders.train.dataset) is None
        assert build_device_cache(loaders.train) is None


@pytest.mark.slow
class TestTrainerParity:
    def test_epoch_params_identical(self, synth, tmp_path, monkeypatch):
        """One train epoch via the device cache == one via streamed batches
        (same uint8 inputs, same step sequence => bit-equal params)."""
        from pipnet_tpu.models import build_pipnet
        from pipnet_tpu.train.trainer import Trainer
        from pipnet_tpu.tree import build_tree_from_config

        _, _, phy = synth
        root = build_tree_from_config(phy, None)
        mcfg = ModelConfig(backbone="convnext_tiny_26", image_size=48,
                           num_protos_per_child=3,
                           head=HeadConfig(softmax_tau=1.0, protopool=False))
        cfg = RunConfig(model=mcfg, train=TrainConfig(
            batch_size=4, batch_size_pretrain=4, epochs=1, epochs_pretrain=0,
            epochs_finetune=0, epochs_finetune_classifier=0, freeze_epochs=0,
            seed=1, optim=OptimConfig(),
            loss=LossConfig(align=True, uni=False, tanh=True,
                            weighted_ce=False)),
            log_dir=str(tmp_path / "run"))
        model, tree = build_pipnet(root, mcfg)

        results = {}
        for flag in ("0", "1"):
            monkeypatch.setenv("PIPNET_DEVICE_DATA", flag)
            loaders = _loaders(synth)
            trainer = Trainer(model, tree, cfg, loaders)
            trainer.init_state(48)
            info = trainer.run_epoch(1, pretrain=False, net_t0=0, net_T=6,
                                     loader=loaders.train)
            assert np.isfinite(info["loss"])
            results[flag] = (info["loss"],
                             jax.device_get(trainer.state.params))
        assert results["0"][0] == pytest.approx(results["1"][0], rel=1e-6)
        jax.tree.map(np.testing.assert_array_equal,
                     results["0"][1], results["1"][1])

    def test_multidevice_mesh_params_identical(self, synth, tmp_path,
                                               monkeypatch):
        """On a 4-device data mesh the cache replicates and each shard
        gathers locally — params must match the streamed 4-device run."""
        from pipnet_tpu.models import build_pipnet
        from pipnet_tpu.train.trainer import Trainer
        from pipnet_tpu.tree import build_tree_from_config

        _, _, phy = synth
        root = build_tree_from_config(phy, None)
        mcfg = ModelConfig(backbone="convnext_tiny_26", image_size=48,
                           num_protos_per_child=3,
                           head=HeadConfig(softmax_tau=1.0, protopool=False))
        cfg = RunConfig(model=mcfg, train=TrainConfig(
            batch_size=4, batch_size_pretrain=4, epochs=1, epochs_pretrain=0,
            epochs_finetune=0, epochs_finetune_classifier=0, freeze_epochs=0,
            seed=1, data_parallel=4, optim=OptimConfig(),
            loss=LossConfig(align=True, uni=False, tanh=True,
                            weighted_ce=False)),
            log_dir=str(tmp_path / "run"))
        model, tree = build_pipnet(root, mcfg)

        results = {}
        for flag in ("0", "1"):
            monkeypatch.setenv("PIPNET_DEVICE_DATA", flag)
            loaders = _loaders(synth)
            trainer = Trainer(model, tree, cfg, loaders)
            assert trainer.mesh.devices.size == 4
            trainer.init_state(48)
            info = trainer.run_epoch(1, pretrain=False, net_t0=0, net_T=6,
                                     loader=loaders.train)
            assert np.isfinite(info["loss"])
            results[flag] = (info["loss"],
                             jax.device_get(trainer.state.params))
        assert results["0"][0] == pytest.approx(results["1"][0], rel=1e-6)
        jax.tree.map(np.testing.assert_array_equal,
                     results["0"][1], results["1"][1])
