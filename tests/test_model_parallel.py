"""Prototype-axis model parallelism (runtime/mesh.py).

The stacked prototype axis P is this architecture's scaling axis (SURVEY
§5.7): every tree node adds a prototype bank, so large phylogenies outgrow a
chip through the head, not the backbone.  These tests validate the 2-D
("data", "model") mesh path on the 8 virtual CPU devices: the sharding specs
land on the right axes, a sharded train step reproduces the replicated-run
numbers, and the Trainer wires it end-to-end.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pipnet_tpu.config import (HeadConfig, LossConfig, ModelConfig,
                               OptimConfig, RunConfig, TrainConfig)
from pipnet_tpu.models import build_pipnet
from pipnet_tpu.runtime.mesh import dp_mp_mesh, state_shardings
from pipnet_tpu.train import (Scalars, StepStatics, init_train_state,
                              make_train_step, phase_for_epoch)


def _setup(tiny_root, **loss_kw):
    mcfg = ModelConfig(backbone="convnext_tiny_26", image_size=48,
                       num_protos_per_child=4,
                       head=HeadConfig(softmax_tau=1.0, protopool=False))
    model, tree = build_pipnet(tiny_root, mcfg)
    loss = LossConfig(align=True, uni=False, align_pf=True, tanh=True,
                      tanh_desc=True, kernel_orth=True, weighted_ce=False,
                      **loss_kw)
    cfg = RunConfig(model=mcfg, train=TrainConfig(
        batch_size=8, optim=OptimConfig(), loss=loss))
    return model, tree, cfg


class TestStateShardings:
    def test_head_params_shard_on_proto_axis(self, tiny_root):
        model, tree, cfg = _setup(tiny_root)
        mesh = dp_mp_mesh(4, 2)
        state = init_train_state(model, jax.random.PRNGKey(0),
                                 jnp.zeros((2, 48, 48, 3)))
        sh = state_shardings(mesh, state)
        head = sh.params["head"]
        assert head["add_on_kernel"].spec == P(None, "model")
        assert head["cls_weight"].spec == P(None, "model")
        assert head["proto_presence"].spec == P("model", None)
        assert head["multiplier"].spec == P()
        # optimizer mirrors carry the same leaf names -> same shardings
        assert sh.opt.mu["head"]["add_on_kernel"].spec == P(None, "model")
        assert sh.opt.nu["head"]["cls_weight"].spec == P(None, "model")
        # scalar Adam counts and backbone params stay replicated
        assert sh.opt.count["head"]["add_on_kernel"].spec == P()
        flat_bb = jax.tree_util.tree_leaves(
            jax.tree.map(lambda s: s.spec, sh.params["backbone"]))
        assert all(s == P() for s in flat_bb)

    def test_1d_mesh_replicates_everything(self, tiny_root):
        model, tree, cfg = _setup(tiny_root)
        mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=("data",))
        state = init_train_state(model, jax.random.PRNGKey(0),
                                 jnp.zeros((2, 48, 48, 3)))
        sh = state_shardings(mesh, state)
        assert all(s.spec == P() for s in jax.tree_util.tree_leaves(
            sh, is_leaf=lambda x: isinstance(x, NamedSharding)))


class TestModelParallelDeterminism:
    @pytest.mark.slow
    def test_replicated_vs_4x2_mesh(self, tiny_root):
        """Same batch through a 1-device run and a (4 data x 2 model) mesh:
        identical loss and identical updated head params — GSPMD's collectives
        around the one-hot segment reductions change the layout, not the
        math."""
        model, tree, cfg = _setup(tiny_root)
        phase = phase_for_epoch(12, cfg.train, pretrain=False)
        step = make_train_step(model, tree, cfg,
                               StepStatics(phase=phase, eta_min_net=5e-6))
        rng = np.random.default_rng(7)
        xs1 = rng.standard_normal((8, 48, 48, 3)).astype(np.float32)
        xs2 = rng.standard_normal((8, 48, 48, 3)).astype(np.float32)
        ys = rng.integers(0, tree.num_classes, 8)
        sc = Scalars.make(net_t=0, net_T=10, epoch_frac=0,
                          align_pf_weight=5.0, tanh_weight=2.0)

        results = {}
        for name, mesh in (("rep", Mesh(np.asarray(jax.devices()[:1]),
                                        axis_names=("data",))),
                           ("mp", dp_mp_mesh(4, 2))):
            state = init_train_state(model, jax.random.PRNGKey(0),
                                     jnp.zeros((2, 48, 48, 3)))
            state = jax.device_put(state, state_shardings(mesh, state))
            bsh = NamedSharding(mesh, P("data"))
            new_state, m = jax.jit(step)(
                state, jax.device_put(xs1, bsh), jax.device_put(xs2, bsh),
                jax.device_put(ys, bsh), sc)
            results[name] = (
                float(np.asarray(m["loss"])),
                np.asarray(new_state.params["head"]["add_on_kernel"]),
                np.asarray(new_state.params["head"]["cls_weight"]),
                np.asarray(new_state.params["head"]["proto_presence"]))
        assert results["rep"][0] == pytest.approx(results["mp"][0], rel=2e-5)
        for a, b in zip(results["rep"][1:], results["mp"][1:]):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6)

    @pytest.mark.slow
    def test_sharded_proto_maps_layout(self, tiny_root):
        """The forward actually computes with P sharded: the proto-map
        activation's sharding carries the model axis when the params do.

        Slow-bucketed (62 s on the 1-core host, all GSPMD compile): the
        fast suite keeps model-parallel coverage through the cheap spec
        assertions (TestStateShardings, TestZero1.test_zero1_specs)."""
        model, tree, cfg = _setup(tiny_root)
        mesh = dp_mp_mesh(4, 2)
        state = init_train_state(model, jax.random.PRNGKey(0),
                                 jnp.zeros((2, 48, 48, 3)))
        state = jax.device_put(state, state_shardings(mesh, state))
        bsh = NamedSharding(mesh, P("data"))
        xs = jax.device_put(np.zeros((8, 48, 48, 3), np.float32), bsh)

        @jax.jit
        def fwd(params, xs):
            return model.apply({"params": params}, xs)["pooled"]

        pooled = fwd(state.params, xs)
        assert np.asarray(pooled).shape[-1] == tree.num_protos_padded
        # the output sharding is whatever GSPMD decides; correctness is
        # checked above — here just assert the sharded matmul executed
        assert jnp.isfinite(np.asarray(pooled)).all()


class TestZero1:
    def test_zero1_specs(self, tiny_root):
        """ZeRO-1 shards the Adam moments over data (largest divisible dim)
        while params/grads stay replicated; scalar counts replicated."""
        model, tree, cfg = _setup(tiny_root)
        mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=("data",))
        state = init_train_state(model, jax.random.PRNGKey(0),
                                 jnp.zeros((2, 48, 48, 3)))
        sh = state_shardings(mesh, state, zero1=True)
        assert all(s.spec == P() for s in jax.tree_util.tree_leaves(
            sh.params, is_leaf=lambda x: isinstance(x, NamedSharding)))
        assert all(s.spec == P() for s in jax.tree_util.tree_leaves(
            sh.opt.count, is_leaf=lambda x: isinstance(x, NamedSharding)))
        mu_specs = jax.tree_util.tree_leaves(
            sh.opt.mu, is_leaf=lambda x: isinstance(x, NamedSharding))
        mu_leaves = jax.tree_util.tree_leaves(state.opt.mu)
        sharded_bytes = sum(l.size * l.dtype.itemsize
                            for l, s in zip(mu_leaves, mu_specs)
                            if s.spec != P())
        total_bytes = sum(l.size * l.dtype.itemsize for l in mu_leaves)
        # the bulk of the moments (dense kernels) must actually shard
        assert sharded_bytes / total_bytes > 0.5
        for l, s in zip(mu_leaves, mu_specs):
            if s.spec != P():
                (d,) = [i for i, ax in enumerate(s.spec) if ax == "data"]
                assert l.shape[d] % 8 == 0

    @pytest.mark.slow
    def test_zero1_matches_replicated(self, tiny_root):
        """One train step with ZeRO-1-sharded moments reproduces the
        replicated run bit-for-bit up to GSPMD reduction order."""
        model, tree, cfg = _setup(tiny_root)
        phase = phase_for_epoch(12, cfg.train, pretrain=False)
        step = make_train_step(model, tree, cfg,
                               StepStatics(phase=phase, eta_min_net=5e-6))
        rng = np.random.default_rng(3)
        xs1 = rng.standard_normal((8, 48, 48, 3)).astype(np.float32)
        xs2 = rng.standard_normal((8, 48, 48, 3)).astype(np.float32)
        ys = rng.integers(0, tree.num_classes, 8)
        sc = Scalars.make(net_t=0, net_T=10, epoch_frac=0,
                          align_pf_weight=5.0, tanh_weight=2.0)
        results = {}
        for name, mesh, z in (
                ("rep", Mesh(np.asarray(jax.devices()[:1]), ("data",)), False),
                ("z1", Mesh(np.asarray(jax.devices()[:8]), ("data",)), True)):
            state = init_train_state(model, jax.random.PRNGKey(0),
                                     jnp.zeros((2, 48, 48, 3)))
            state = jax.device_put(state,
                                   state_shardings(mesh, state, zero1=z))
            bsh = NamedSharding(mesh, P("data"))
            new_state, m = jax.jit(step)(
                state, jax.device_put(xs1, bsh), jax.device_put(xs2, bsh),
                jax.device_put(ys, bsh), sc)
            results[name] = (
                float(np.asarray(m["loss"])),
                np.asarray(new_state.params["head"]["add_on_kernel"]),
                np.asarray(jax.tree_util.tree_leaves(
                    new_state.opt.mu["head"])[0]))
        assert results["rep"][0] == pytest.approx(results["z1"][0], rel=2e-5)
        for a, b in zip(results["rep"][1:], results["z1"][1:]):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6)

    @pytest.mark.slow
    def test_trainer_zero1_epoch(self, tiny_root, tmp_path):
        """Trainer end-to-end with --zero1: moments stay in the ZeRO-1
        layout across steps (out_shardings pins it) and params replicated."""
        from pipnet_tpu.data.loader import build_loaders
        from pipnet_tpu.data.synthetic import generate_synthetic_dataset
        from pipnet_tpu.train.trainer import Trainer

        train_dir, test_dir, _ = generate_synthetic_dataset(
            str(tmp_path), num_classes=8, images_per_class=4, image_size=48)
        model, tree, cfg = _setup(tiny_root)
        cfg = dataclasses.replace(
            cfg, log_dir=str(tmp_path / "run"),
            train=dataclasses.replace(cfg.train, epochs=1, epochs_pretrain=0,
                                      epochs_finetune=0,
                                      epochs_finetune_classifier=0,
                                      batch_size=8, data_parallel=8,
                                      zero1=True))
        loaders = build_loaders(train_dir, test_dir, image_size=48,
                                batch_size=8, batch_size_pretrain=8, seed=0)
        trainer = Trainer(model, tree, cfg, loaders)
        trainer.init_state()
        mu0 = jax.tree_util.tree_leaves(trainer.state.opt.mu)
        assert any(l.sharding.spec != P() for l in mu0 if l.ndim)
        info = trainer.run_epoch(1, pretrain=False, net_t0=0, net_T=10,
                                 loader=loaders.train)
        assert np.isfinite(info["loss"])
        mu1 = [l for l in jax.tree_util.tree_leaves(trainer.state.opt.mu)
               if l.ndim]
        assert any(l.sharding.spec != P() for l in mu1)
        assert all(l.sharding.spec == P() for l in
                   jax.tree_util.tree_leaves(trainer.state.params))


class TestTrainerModelParallel:
    @pytest.mark.slow
    def test_trainer_builds_2d_mesh_and_steps(self, tiny_root, tmp_path):
        from pipnet_tpu.data.loader import build_loaders
        from pipnet_tpu.data.synthetic import generate_synthetic_dataset
        from pipnet_tpu.train.trainer import Trainer

        train_dir, test_dir, _ = generate_synthetic_dataset(
            str(tmp_path), num_classes=8, images_per_class=4, image_size=48)
        model, tree, cfg = _setup(tiny_root)
        cfg = dataclasses.replace(
            cfg, log_dir=str(tmp_path / "run"),
            train=dataclasses.replace(cfg.train, epochs=1, epochs_pretrain=0,
                                      epochs_finetune=0,
                                      epochs_finetune_classifier=0,
                                      batch_size=8, model_parallel=2,
                                      data_parallel=4))
        loaders = build_loaders(train_dir, test_dir, image_size=48,
                                batch_size=8, batch_size_pretrain=8, seed=0)
        trainer = Trainer(model, tree, cfg, loaders)
        assert trainer.mesh.axis_names == ("data", "model")
        state = trainer.init_state()
        spec = state.params["head"]["add_on_kernel"].sharding.spec
        assert spec == P(None, "model")
        info = trainer.run_epoch(1, pretrain=False, net_t0=0, net_T=10,
                                 loader=loaders.train)
        assert np.isfinite(info["loss"])

    def test_pallas_head_rejected(self, tiny_root, tmp_path):
        from pipnet_tpu.train.trainer import Trainer
        model, tree, cfg = _setup(tiny_root)
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, use_pallas_head=True),
            train=dataclasses.replace(cfg.train, model_parallel=2))
        model2, tree2 = build_pipnet(tiny_root, cfg.model)
        with pytest.raises(ValueError, match="Pallas"):
            Trainer(model2, tree2, cfg, loaders=None)
