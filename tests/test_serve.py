"""Serving layer tests: run_io round-trip (the args.pickle analog,
ref test_nb.py:44-48) and the Predictor driver (ref test_nb.py +
util/visualize_prediction.py re-designed as a fixed-shape jitted single-view
forward)."""

import dataclasses
import json
import os

import numpy as np
import pytest

from pipnet_tpu.config import (HeadConfig, LossConfig, ModelConfig,
                               OptimConfig, RunConfig, TrainConfig)
from pipnet_tpu.run_io import config_from_dict, load_run_config


class TestConfigRoundtrip:
    def test_nested_dataclass_roundtrip(self, tmp_path):
        """config.json (asdict + JSON) -> RunConfig reproduces every field,
        including tuples that JSON flattens to lists."""
        cfg = RunConfig(
            model=ModelConfig(backbone="resnet50", image_size=64,
                              num_protos_per_child=3,
                              head=HeadConfig(softmax_tau=0.2,
                                              protopool=True,
                                              focal=True)),
            train=TrainConfig(batch_size=4, epochs=7, seed=9,
                              optim=OptimConfig(lr=0.01),
                              loss=LossConfig(align=False, tanh=True)),
            log_dir=str(tmp_path / "r"), dataset="synthetic:4:4",
            phylo_config="/tmp/x.phy")
        meta = tmp_path / "r" / "metadata"
        meta.mkdir(parents=True)
        with open(meta / "config.json", "w") as f:
            json.dump(dataclasses.asdict(cfg), f, default=str)
        cfg2 = load_run_config(str(tmp_path / "r"))
        assert cfg2.model == cfg.model
        assert cfg2.train == cfg.train
        assert cfg2.dataset == cfg.dataset
        assert cfg2.phylo_config == cfg.phylo_config

    def test_tuple_fields_restored(self):
        d = dataclasses.asdict(ModelConfig(backbone="convnext_tiny_26"))
        d2 = json.loads(json.dumps(d, default=str))
        m = config_from_dict(ModelConfig, d2)
        assert m == ModelConfig(backbone="convnext_tiny_26")


@pytest.fixture(scope="module")
def serve_run(tmp_path_factory):
    """A tiny trained-run directory with config.json + classes.json +
    checkpoint, built exactly as Trainer.fit persists them."""
    from pipnet_tpu.data import build_loaders, generate_synthetic_dataset
    from pipnet_tpu.models import build_pipnet
    from pipnet_tpu.runtime.log import RunLog
    from pipnet_tpu.train import save_checkpoint
    from pipnet_tpu.train.trainer import Trainer
    from pipnet_tpu.tree import build_tree_from_config

    root = tmp_path_factory.mktemp("serve")
    train_dir, test_dir, phy = generate_synthetic_dataset(
        str(root), num_classes=6, images_per_class=4, image_size=48)
    tree_root = build_tree_from_config(phy, None)
    run_dir = str(root / "run")
    cfg = RunConfig(
        model=ModelConfig(backbone="convnext_tiny_26", image_size=48,
                          num_protos_per_child=4,
                          head=HeadConfig(softmax_tau=1.0, protopool=False)),
        train=TrainConfig(batch_size=4, epochs=1, epochs_pretrain=0,
                          seed=1, optim=OptimConfig(lr=0.05),
                          loss=LossConfig()),
        log_dir=run_dir, phylo_config=phy,
        dataset=f"folder:{train_dir}:{test_dir}")
    model, tree = build_pipnet(tree_root, cfg.model)
    loaders = build_loaders(train_dir, test_dir, image_size=48, batch_size=4,
                            batch_size_pretrain=4, seed=1)
    trainer = Trainer(model, tree, cfg, loaders, log=RunLog(run_dir))
    trainer.init_state(48)
    trainer.log.save_config(cfg)
    trainer.log.save_classes(loaders.classes)
    trainer.log.save_tree(tree_root)
    save_checkpoint(trainer.log.checkpoint_dir, "net_trained_last",
                    trainer.state, epoch=1)
    return run_dir, train_dir, loaders.classes


@pytest.mark.slow
class TestRunIO:
    def test_load_run_without_dataset(self, serve_run, tmp_path):
        """metadata (classes.json + tree.json) is enough: the training
        dataset AND the phylogeny file can both be gone (the serving-host
        scenario; the reference's notebooks instead re-walk the
        ImageFolder)."""
        from pipnet_tpu.run_io import load_run

        run_dir, _train, classes = serve_run
        # point the stored dataset AND phylogeny somewhere nonexistent:
        # neither may be touched when tree.json is present
        with open(os.path.join(run_dir, "metadata", "config.json")) as f:
            saved = json.load(f)
        saved["dataset"] = "folder:/nonexistent/train:/nonexistent/test"
        saved["phylo_config"] = "/nonexistent/phylogeny.phy"
        broken = tmp_path / "relocated"
        (broken / "metadata").mkdir(parents=True)
        with open(broken / "metadata" / "config.json", "w") as f:
            json.dump(saved, f)
        for name in ("classes.json", "tree.json"):
            with open(os.path.join(run_dir, "metadata", name)) as f:
                data = f.read()
            with open(broken / "metadata" / name, "w") as f:
                f.write(data)
        os.symlink(os.path.join(run_dir, "checkpoints"),
                   broken / "checkpoints")
        bundle = load_run(str(broken))
        assert bundle.classes == list(classes)
        assert bundle.extra["epoch"] == 1
        assert bundle.tree.num_classes == len(classes)
        # and the restored head actually matches the persisted topology
        w = np.asarray(bundle.state.params["head"]["cls_weight"])
        assert np.isfinite(w).all()

    def test_load_run_missing_phylo_raises(self, serve_run, tmp_path):
        """Without tree.json, a recorded-but-missing phylogeny must raise a
        clear error, never silently rebuild a flat tree with mismatched
        checkpoint shapes."""
        from pipnet_tpu.run_io import load_run

        run_dir, _train, _classes = serve_run
        with open(os.path.join(run_dir, "metadata", "config.json")) as f:
            saved = json.load(f)
        saved["dataset"] = "folder:/nonexistent/train:/nonexistent/test"
        saved["phylo_config"] = "/nonexistent/phylogeny.phy"
        broken = tmp_path / "nophylo"
        (broken / "metadata").mkdir(parents=True)
        with open(broken / "metadata" / "config.json", "w") as f:
            json.dump(saved, f)
        with open(os.path.join(run_dir, "metadata", "classes.json")) as f:
            data = f.read()
        with open(broken / "metadata" / "classes.json", "w") as f:
            f.write(data)
        os.symlink(os.path.join(run_dir, "checkpoints"),
                   broken / "checkpoints")
        with pytest.raises(RuntimeError, match="phylogeny"):
            load_run(str(broken))

    def test_load_run_restores_weights(self, serve_run):
        from pipnet_tpu.run_io import load_run
        from pipnet_tpu.train import restore_checkpoint  # noqa: F401

        run_dir, _train, _classes = serve_run
        bundle = load_run(run_dir)
        w = np.asarray(bundle.state.params["head"]["cls_weight"])
        assert np.isfinite(w).all() and w.shape[0] > 0


@pytest.mark.slow
class TestPredictor:
    def test_predict_and_explain(self, serve_run, tmp_path):
        from pipnet_tpu.serve import Predictor

        run_dir, train_dir, classes = serve_run
        cls0 = sorted(os.listdir(train_dir))[0]
        img_dir = os.path.join(train_dir, cls0)
        paths = [os.path.join(img_dir, f)
                 for f in sorted(os.listdir(img_dir))[:3]]
        pred = Predictor(run_dir, batch_size=2)

        # mixed input kinds; len > batch_size forces the padded tail chunk
        arr = np.zeros((48, 48, 3), np.uint8)
        results = pred.predict(paths + [arr], topk=2)
        assert len(results) == 4
        for res in results:
            assert res["class"] in classes
            assert 0.0 <= res["prob"] <= 1.0
            assert len(res["topk"]) == 2
            assert isinstance(res["abstained"], bool)
            assert res["active_prototypes"] >= 0
            # joint distribution normalizes
            total = sum(t["prob"] for t in res["topk"])
            assert total <= 1.0 + 1e-4

        out = pred.explain(paths[0], str(tmp_path / "ev"), topk=2)
        assert os.path.isdir(tmp_path / "ev")
        assert "classes" in out or isinstance(out, dict)

    def test_masked_predict_deterministic(self, serve_run):
        """--apply_overspecificity_mask serves the pruned model: one fixed
        Gumbel draw per server (ref calc_acc_LOU_and_mask_pruned_model.ipynb
        loads ONE mask), so two servers with the same mask_seed agree."""
        from pipnet_tpu.serve import Predictor

        run_dir, train_dir, classes = serve_run
        cls0 = sorted(os.listdir(train_dir))[0]
        img_dir = os.path.join(train_dir, cls0)
        path = os.path.join(img_dir, sorted(os.listdir(img_dir))[0])
        pa = Predictor(run_dir, batch_size=1,
                       apply_overspecificity_mask=True, mask_seed=3)
        pb = Predictor(run_dir, batch_size=1,
                       apply_overspecificity_mask=True, mask_seed=3)
        ra, rb = pa.predict([path])[0], pb.predict([path])[0]
        assert ra["class"] in classes
        assert ra["class"] == rb["class"]
        assert ra["prob"] == pytest.approx(rb["prob"], rel=1e-6)
        assert 0.0 <= ra["prob"] <= 1.0

    def test_cli_json_lines(self, serve_run, capsys):
        """The CLI prints one parseable JSON line per image."""
        from pipnet_tpu import serve

        run_dir, train_dir, classes = serve_run
        cls0 = sorted(os.listdir(train_dir))[0]
        img_dir = os.path.join(train_dir, cls0)
        paths = [os.path.join(img_dir, f)
                 for f in sorted(os.listdir(img_dir))[:2]]
        rc = serve.run(["--run_dir", run_dir, "--batch_size", "2",
                        "--images"] + paths)
        assert rc == 0
        lines = [l for l in capsys.readouterr().out.splitlines()
                 if l.startswith("{")]
        assert len(lines) == 2
        for line, path in zip(lines, paths):
            rec = json.loads(line)
            assert rec["image"] == path
            assert rec["class"] in classes

    def test_http_server(self, serve_run):
        """GET /healthz, POST /predict (raw bytes), POST /predict_batch
        (JSON paths), and error paths over a real loopback socket."""
        import io
        import threading
        import urllib.error
        import urllib.request

        from PIL import Image

        from pipnet_tpu.serve import Predictor, serve_http

        run_dir, train_dir, classes = serve_run
        cls0 = sorted(os.listdir(train_dir))[0]
        img_dir = os.path.join(train_dir, cls0)
        paths = [os.path.join(img_dir, f)
                 for f in sorted(os.listdir(img_dir))[:2]]
        pred = Predictor(run_dir, batch_size=2)
        srv = serve_http(pred, port=0)          # ephemeral port
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        try:
            with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
                health = json.loads(r.read())
            assert health["ok"] and health["classes"] == len(classes)

            buf = io.BytesIO()
            Image.open(paths[0]).save(buf, format="PNG")
            req = urllib.request.Request(f"{base}/predict?topk=2",
                                         data=buf.getvalue(), method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                one = json.loads(r.read())
            assert one["class"] in classes and len(one["topk"]) == 2

            body = json.dumps({"paths": paths, "topk": 1}).encode()
            req = urllib.request.Request(f"{base}/predict_batch", data=body,
                                         method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                many = json.loads(r.read())
            assert len(many) == 2
            assert many[0]["class"] in classes

            # bad image bytes -> 400, unknown route -> 404
            req = urllib.request.Request(f"{base}/predict", data=b"not-an-img",
                                         method="POST")
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=30)
            assert ei.value.code == 400
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(f"{base}/nope", timeout=30)
            assert ei.value.code == 404
        finally:
            srv.shutdown()
            srv.server_close()

    def test_batch_padding_matches_unpadded(self, serve_run):
        """Padding rows must not change real rows' outputs."""
        from pipnet_tpu.serve import Predictor

        run_dir, train_dir, _classes = serve_run
        cls0 = sorted(os.listdir(train_dir))[0]
        img_dir = os.path.join(train_dir, cls0)
        path = os.path.join(img_dir, sorted(os.listdir(img_dir))[0])
        p1 = Predictor(run_dir, batch_size=1)
        p4 = Predictor(run_dir, batch_size=4)
        r1 = p1.predict([path])[0]
        r4 = p4.predict([path])[0]
        assert r1["class"] == r4["class"]
        assert r1["prob"] == pytest.approx(r4["prob"], rel=1e-4)
