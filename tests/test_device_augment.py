"""Device-side photometric augmentation vs PIL (the reference's transform2
engine).  Each op must reproduce PIL's output on the uint8 lattice to within
1 level (PIL uses several slightly different rounding modes internally; the
blend itself is matched exactly)."""

import numpy as np
import pytest
from PIL import Image, ImageEnhance, ImageFilter, ImageOps

import jax
import jax.numpy as jnp

from pipnet_tpu.ops import device_augment as da


@pytest.fixture(scope="module")
def img_u8(rng):
    # mix of smooth + noisy content so histograms aren't degenerate
    base = np.linspace(0, 255, 48, dtype=np.float32)
    smooth = np.broadcast_to(base[None, :, None], (40, 48, 3))
    noise = rng.integers(0, 256, (40, 48, 3)).astype(np.float32)
    return np.clip(0.6 * smooth + 0.4 * noise, 0, 255).astype(np.uint8)


def _pil(img_u8):
    return Image.fromarray(img_u8)


def _close(ours, theirs, tol=1.0):
    ours = np.asarray(ours)
    theirs = np.asarray(theirs, np.float32)
    bad = np.abs(ours - theirs) > tol
    assert not bad.any(), (
        f"{bad.sum()} / {bad.size} pixels differ by more than {tol}; "
        f"max {np.abs(ours - theirs).max()}")


class TestOpParity:
    @pytest.mark.parametrize("factor", [0.5, 0.8, 1.3, 2.0])
    def test_brightness(self, img_u8, factor):
        _close(da.brightness(jnp.asarray(img_u8, jnp.float32), factor),
                ImageEnhance.Brightness(_pil(img_u8)).enhance(factor))

    @pytest.mark.parametrize("factor", [0.8, 1.5, 2.0])
    def test_color(self, img_u8, factor):
        _close(da.color(jnp.asarray(img_u8, jnp.float32), factor),
                ImageEnhance.Color(_pil(img_u8)).enhance(factor))

    @pytest.mark.parametrize("factor", [0.5, 1.5])
    def test_contrast(self, img_u8, factor):
        _close(da.contrast(jnp.asarray(img_u8, jnp.float32), factor),
                ImageEnhance.Contrast(_pil(img_u8)).enhance(factor))

    @pytest.mark.parametrize("factor", [0.5, 1.5])
    def test_sharpness(self, img_u8, factor):
        _close(da.sharpness(jnp.asarray(img_u8, jnp.float32), factor),
                ImageEnhance.Sharpness(_pil(img_u8)).enhance(factor))

    @pytest.mark.parametrize("bits", [4, 5, 6, 7, 8])
    def test_posterize(self, img_u8, bits):
        _close(da.posterize(jnp.asarray(img_u8, jnp.float32), bits),
                ImageOps.posterize(_pil(img_u8), bits), tol=0.0)

    @pytest.mark.parametrize("thr", [64, 128, 255])
    def test_solarize(self, img_u8, thr):
        _close(da.solarize(jnp.asarray(img_u8, jnp.float32), float(thr)),
                ImageOps.solarize(_pil(img_u8), thr), tol=0.0)

    def test_autocontrast(self, img_u8):
        _close(da.autocontrast(jnp.asarray(img_u8, jnp.float32)),
                ImageOps.autocontrast(_pil(img_u8)))

    def test_equalize(self, img_u8):
        _close(da.equalize(jnp.asarray(img_u8, jnp.float32)),
                ImageOps.equalize(_pil(img_u8)))


class TestBatchTransform:
    def test_sampling_matches_space(self):
        """Sampled magnitudes stay within the host TrivialAugment space."""
        from pipnet_tpu.data.augment import _space_no_shape
        names = list(_space_no_shape().keys())
        op, mag = da.sample_photometric(jax.random.PRNGKey(0), 4096)
        op, mag = np.asarray(op), np.asarray(mag)
        assert set(np.unique(op)) <= set(range(len(names)))
        # all ops get picked
        assert len(np.unique(op)) == len(names)
        space = _space_no_shape()
        for i, n in enumerate(names):
            _, bins, signed = space[n]
            got = np.unique(mag[op == i])
            allowed = np.concatenate([bins, -bins] if signed else [bins])
            dist = np.abs(got[:, None] - allowed[None, :]).min(axis=1)
            assert (dist < 1e-4).all(), (n, got[dist >= 1e-4])

    def test_two_view_transform2(self, rng, img_u8):
        xb = jnp.asarray(np.stack([img_u8] * 6))
        v1, v2 = jax.jit(lambda x, r: da.two_view_transform2(x, r, 32))(
            xb, jax.random.PRNGKey(3))
        assert v1.shape == (6, 32, 32, 3) and v2.shape == v1.shape
        assert not np.allclose(np.asarray(v1), np.asarray(v2))
        # normalized range sanity
        assert float(jnp.abs(v1).max()) < 4.0
        # deterministic given the rng
        w1, _ = jax.jit(lambda x, r: da.two_view_transform2(x, r, 32))(
            xb, jax.random.PRNGKey(3))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(w1))

    def test_photometric_matches_pil_end_to_end(self, img_u8):
        """Force each op via a fixed op index and compare the whole batched
        path against PIL + numpy normalize."""
        from pipnet_tpu.data.augment import _space_no_shape
        space = _space_no_shape()
        names = list(space.keys())
        x = jnp.asarray(img_u8, jnp.float32)
        for i, n in enumerate(names):
            fn, bins, signed = space[n]
            mag = float(bins[len(bins) // 2])
            ours = np.asarray(da._apply_one(x, jnp.int32(i), jnp.float32(mag),
                                            cars=False))
            theirs = np.asarray(fn(_pil(img_u8), mag), np.float32)
            _close(ours, theirs, tol=1.0)


@pytest.mark.slow
class TestDeviceAugmentTraining:
    def test_train_epoch_u8_pipeline(self, tmp_path):
        """Full epoch through the uint8 device-augment pipeline: loader ships
        one shared geometric uint8 view, the jitted step derives both
        photometric views on device.  Loss finite, shapes stable."""
        import numpy as np
        from pipnet_tpu.config import (HeadConfig, LossConfig, ModelConfig,
                                       OptimConfig, RunConfig, TrainConfig)
        from pipnet_tpu.data import build_loaders, generate_synthetic_dataset
        from pipnet_tpu.models import build_pipnet
        from pipnet_tpu.train.trainer import Trainer
        from pipnet_tpu.tree import build_tree_from_config

        train_dir, test_dir, phy = generate_synthetic_dataset(
            str(tmp_path), num_classes=4, images_per_class=6, image_size=48)
        root = build_tree_from_config(phy, None)
        mcfg = ModelConfig(backbone="convnext_tiny_26", image_size=48,
                           num_protos_per_child=4,
                           head=HeadConfig(softmax_tau=1.0, protopool=False))
        cfg = RunConfig(model=mcfg, train=TrainConfig(
            batch_size=4, batch_size_pretrain=4, epochs=1, epochs_pretrain=0,
            epochs_finetune=0, epochs_finetune_classifier=0, freeze_epochs=0,
            seed=1, optim=OptimConfig(),
            loss=LossConfig(align=True, uni=False, tanh=True, weighted_ce=False)),
            log_dir=str(tmp_path / "run"))
        model, tree = build_pipnet(root, mcfg)
        loaders = build_loaders(train_dir, test_dir, image_size=48,
                                batch_size=4, batch_size_pretrain=4, seed=1,
                                device_photometric=True)
        b = next(loaders.train.epoch(0))
        assert b.xs1.dtype == np.uint8 and b.xs2 is None
        assert b.xs1.shape[1] == 48 + 4        # pre-crop geometric view
        trainer = Trainer(model, tree, cfg, loaders)
        trainer.init_state(48)
        info = trainer.run_epoch(1, pretrain=False, net_t0=0, net_T=6,
                                 loader=loaders.train)
        assert np.isfinite(info["loss"])
