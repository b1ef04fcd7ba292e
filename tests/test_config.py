"""Config compat tests: the reference flag DSLs resolve correctly."""

import pytest

from pipnet_tpu.config import from_reference_flags


def test_flagship_flags():
    """The run_pipnet.sh flagship flag set (ref run_pipnet.sh:47-103)."""
    cfg = from_reference_flags({
        "dataset": "INAT-BIRDS", "net": "convnext_tiny_26",
        "batch_size": 64, "batch_size_pretrain": 96,
        "epochs": 60, "epochs_pretrain": 3,
        "kernel_orth": "y", "num_protos_per_descendant": 0,
        "num_protos_per_child": 10,
        "align": "n", "uni": "n", "align_pf": "y", "tanh": "y",
        "tanh_desc": "y|0.05", "tanh_during_second_phase": "y",
        "softmax": "y|1", "weighted_ce_loss": "y", "protopool": "n",
        "minimize_contrasting_set": "y", "cl_weight": 2.0,
    })
    assert cfg.model.head.softmax_tau == 1.0
    assert not cfg.model.head.protopool
    assert cfg.train.loss.tanh_desc and cfg.train.loss.tanh_desc_weight == 0.05
    assert cfg.train.loss.align_pf and cfg.train.loss.tanh
    assert not cfg.train.loss.align and not cfg.train.loss.uni
    assert cfg.train.loss.kernel_orth and cfg.train.loss.minimize_contrasting_set
    assert cfg.train.loss.weighted_ce
    assert cfg.train.batch_size_pretrain == 96


def test_dsl_strings():
    cfg = from_reference_flags({
        "softmax": "y",                               # default tau 0.2
        "mask_prune_overspecific": "y|30|1.1",
        "minimize_contrasting_set": "y|3|0.25",
        "byol": "y|0.99|0.999",
        "stage4_reducer_net": "768,128,gelu|128,64",
        "basic_cnext_gaussian_multiplier": "3,4|2.0|25",
    })
    assert cfg.model.head.softmax_tau == pytest.approx(0.2)
    l = cfg.train.loss
    assert l.mask_prune_overspecific and l.mask_prune_start_epoch == 30
    assert l.mask_prune_boost == pytest.approx(1.1)
    assert l.min_contrast_topk == 3 and l.min_contrast_weight == 0.25
    assert l.byol and l.byol_tau_base == 0.99 and l.byol_tau_max == 0.999
    assert cfg.model.stage4_reducer == ((768, 128, True), (128, 64, False))
    assert cfg.model.gaussian_stages == (3, 4)
    assert cfg.model.gaussian_sigma == 2.0 and cfg.model.gaussian_factor == 25.0


def test_softmax_tau_int_quirk():
    """The reference int()s the tau field (pipnet/pipnet.py:132): 'y|2' -> 2.0."""
    cfg = from_reference_flags({"softmax": "y|2"})
    assert cfg.model.head.softmax_tau == 2.0


def test_add_on_variants():
    assert from_reference_flags({"unitconv2d": "y"}).model.head.add_on_type == "unit"
    assert from_reference_flags({"l2conv2d": "y"}).model.head.add_on_type == "l2"
    assert from_reference_flags({"projectconv2d": "y"}).model.head.add_on_type == "project"
    assert from_reference_flags({}).model.head.add_on_type == "conv"


class TestRunDirLock:
    def test_live_owner_blocks_second_writer(self, tmp_path):
        import os
        import pytest as _pytest
        from pipnet_tpu.runtime.log import RunLog
        d = str(tmp_path / "run")
        RunLog(d)                                   # locks with our pid
        # same pid may re-open (resume in-process)
        RunLog(d)
        # a different LIVE pid blocks
        with open(os.path.join(d, ".pipnet_lock"), "w") as f:
            f.write("1")                            # pid 1 is always alive
        with _pytest.raises(RuntimeError, match="in use"):
            RunLog(d)

    def test_stale_lock_reclaimed(self, tmp_path):
        import os
        from pipnet_tpu.runtime.log import RunLog
        d = str(tmp_path / "run")
        os.makedirs(d)
        with open(os.path.join(d, ".pipnet_lock"), "w") as f:
            f.write("999999999")                    # certainly dead
        RunLog(d)                                   # reclaims silently
