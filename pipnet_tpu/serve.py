"""Production inference / serving driver.

Counterpart of the reference's de-facto serving surface — ``test_nb.py``
(checkpoint reload + eval forward) and ``util/visualize_prediction.py``
(per-image explanations) — redesigned as a TPU serving path:

* one jitted fixed-shape forward (batch padding, no recompiles) with the
  inference sparsification and the joint tree decode fused into the same
  program — and WITHOUT the reference's duplicated-view trick
  (``pipnet/train.py:644-645`` doubles the batch only to mirror train-time
  shapes; nothing in the eval forward couples samples, so serving runs the
  single view and saves 2x compute);
* host-side decode + PIL resize identical to the eval transform
  (``transform_no_augment``, ref util/data.py:762-766), device-side compute;
* ``Predictor.bench()`` reports single-image latency percentiles and batch
  throughput — the serving-side analog of bench.py's training numbers.

CLI::

    python -m pipnet_tpu.serve --run_dir runs/x --images a.png b.png
    python -m pipnet_tpu.serve --run_dir runs/x --images a.png --explain out/
    python -m pipnet_tpu.serve --run_dir runs/x --bench
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Dict, List, Optional, Sequence

import numpy as np


class Predictor:
    """Load a trained run and serve batched classifications.

    ``batch_size`` fixes the compiled shape; shorter requests are padded and
    the padding rows dropped before returning.  Results per image:
    ``class``/``prob`` (top-1 over the joint leaf distribution,
    ref util/node.py:300-395), ``topk`` list, ``abstained`` (no positive
    classifier evidence anywhere, ref pipnet/test.py:66-70), and the number
    of active prototypes (local explanation size, ref pipnet/test.py:90-96).
    """

    def __init__(self, run_dir: str, checkpoint: str = "net_trained_last",
                 batch_size: int = 8, dataset: Optional[str] = None,
                 classes: Optional[List[str]] = None,
                 path_prob_softmax_tau: float = 1.0,
                 apply_overspecificity_mask: bool = False,
                 mask_seed: int = 0):
        import jax
        import jax.numpy as jnp

        from .data.augment import EvalTransform
        from .models.pipnet import joint_leaf_log_distribution
        from .run_io import load_run
        from .runtime.profiling import enable_compilation_cache

        enable_compilation_cache()
        self.bundle = load_run(run_dir, checkpoint=checkpoint,
                               dataset=dataset, classes=classes)
        model, tree = self.bundle.model, self.bundle.tree
        self.classes = self.bundle.classes
        self.batch_size = batch_size
        self.image_size = self.bundle.cfg.model.image_size
        self._transform = EvalTransform(self.image_size)
        self._variables = {"params": self.bundle.state.params}
        if self.bundle.state.batch_stats:
            self._variables["batch_stats"] = self.bundle.state.batch_stats
        # one fixed Gumbel sample for the whole server lifetime: the pruned
        # model is a deterministic artifact, not a fresh draw per request
        # (ref calc_acc_LOU_and_mask_pruned_model.ipynb loads ONE mask)
        mask_rng = jax.random.PRNGKey(mask_seed)

        def fwd(variables, xs):
            out = model.apply(variables, xs, inference=True,
                              apply_overspecificity_mask=apply_overspecificity_mask,
                              mask_rng=mask_rng)
            degenerate = None
            if apply_overspecificity_mask:
                # same derivation as make_eval_step: the forward's mask
                # sample decides degeneracy (models/pipnet.py helper)
                from .models.pipnet import masked_decode_degenerates
                degenerate = masked_decode_degenerates(
                    model, variables["params"], tree, mask_rng)
            logp = joint_leaf_log_distribution(
                out["logits"], tree, softmax_tau=path_prob_softmax_tau,
                degenerate_nodes=degenerate)
            return out["logits"], out["pooled"], logp

        self._fwd = jax.jit(fwd)
        self._jnp = jnp

    # -- input handling ------------------------------------------------------
    def _prep(self, images: Sequence) -> np.ndarray:
        """PIL images / uint8 arrays / file paths -> normalized (N,S,S,3)."""
        from PIL import Image
        rows = []
        for im in images:
            if isinstance(im, (str, os.PathLike)):
                im = Image.open(im).convert("RGB")
            elif isinstance(im, np.ndarray):
                im = Image.fromarray(im.astype(np.uint8)).convert("RGB")
            rows.append(self._transform(im))
        return np.stack(rows)

    # -- serving -------------------------------------------------------------
    def predict(self, images: Sequence, topk: int = 3) -> List[Dict]:
        xs = self._prep(images)
        results: List[Dict] = []
        B = self.batch_size
        for start in range(0, len(xs), B):
            chunk = xs[start:start + B]
            n = len(chunk)
            if n < B:                       # pad to the compiled shape
                chunk = np.concatenate(
                    [chunk, np.zeros((B - n,) + chunk.shape[1:], chunk.dtype)])
            logits, pooled, logp = self._fwd(self._variables,
                                             self._jnp.asarray(chunk))
            logits = np.asarray(logits)[:n]
            pooled = np.asarray(pooled)[:n]
            logp = np.asarray(logp)[:n]
            probs = np.exp(logp)
            order = np.argsort(-logp, axis=-1)
            for i in range(n):
                top = [{"class": self.classes[j],
                        "prob": float(probs[i, j])}
                       for j in order[i, :topk]]
                results.append({
                    "class": top[0]["class"],
                    "prob": top[0]["prob"],
                    "topk": top,
                    # ref pipnet/test.py:66-70 (abstain) and :90-96 (local size)
                    "abstained": bool(logits[i].max() <= 0.0),
                    "active_prototypes": int((pooled[i] > 0).sum()),
                })
        return results

    def explain(self, image, out_dir: str, topk: int = 3) -> Dict:
        """Per-image evidence folder (util/visualize_prediction.py)."""
        from .interp.prediction import explain_image
        x = self._prep([image])[0]
        return explain_image(self.bundle.model, self.bundle.tree,
                             self.bundle.state.params,
                             self.bundle.state.batch_stats, x, out_dir,
                             image_size=self.image_size, top_classes=topk)

    # -- serving benchmark ---------------------------------------------------
    def bench(self, iters: int = 50) -> Dict:
        """Single-image latency percentiles + batch throughput (warm)."""
        import jax

        jnp = self._jnp
        r = np.random.default_rng(0)
        one = jnp.asarray(r.standard_normal(
            (1, self.image_size, self.image_size, 3)), jnp.float32)
        batch = jnp.asarray(r.standard_normal(
            (self.batch_size, self.image_size, self.image_size, 3)), jnp.float32)

        def fence(out):
            # scalar fetch: block_until_ready is unreliable over the tunnel
            float(np.asarray(out[2][0, 0]))

        fence(self._fwd(self._variables, one))          # compile bs=1
        lat = []
        for _ in range(iters):
            t0 = time.perf_counter()
            fence(self._fwd(self._variables, one))
            lat.append(time.perf_counter() - t0)
        fence(self._fwd(self._variables, batch))        # compile bs=B
        t0 = time.perf_counter()
        for _ in range(iters):
            out = self._fwd(self._variables, batch)
        fence(out)
        dt = time.perf_counter() - t0
        lat_ms = np.array(lat) * 1e3
        return {
            "latency_ms_p50": round(float(np.percentile(lat_ms, 50)), 2),
            "latency_ms_p95": round(float(np.percentile(lat_ms, 95)), 2),
            "batch_size": self.batch_size,
            "throughput_img_per_sec": round(iters * self.batch_size / dt, 2),
        }


def serve_http(pred: "Predictor", port: int = 8000, host: str = "127.0.0.1"):
    """Build (not start) a threading HTTP server around a Predictor.

    Routes:
      GET  /healthz            -> {"ok": true, "classes": N, ...}
      POST /predict?topk=K     -> body = raw image bytes (any PIL format);
                                  one result object
      POST /predict_batch      -> body = JSON {"paths": [...], "topk": K};
                                  list of result objects (server-local paths)

    Returns the ``ThreadingHTTPServer``; call ``serve_forever()`` (the CLI
    does) or drive it from a thread in tests.  Device work is serialized
    with a lock — one chip, one compiled program; concurrency buys nothing
    and interleaved jit dispatch over the tunnel measurably loses."""
    import io
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    from PIL import Image

    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):        # quiet; the caller owns logging
            pass

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if urlparse(self.path).path == "/healthz":
                self._json(200, {"ok": True,
                                 "classes": len(pred.classes),
                                 "image_size": pred.image_size,
                                 "batch_size": pred.batch_size})
            else:
                self._json(404, {"error": "unknown route"})

        def do_POST(self):
            route = urlparse(self.path).path
            try:
                # query/header parsing inside the try so a malformed topk or
                # Content-Length is a 400, not a dropped connection
                q = parse_qs(urlparse(self.path).query)
                topk = int(q.get("topk", ["3"])[0])
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                if route == "/predict":
                    img = Image.open(io.BytesIO(body)).convert("RGB")
                    # hold the device lock for the compute only — writing the
                    # response to a slow client must not serialize the server
                    with lock:
                        result = pred.predict([img], topk=topk)[0]
                    self._json(200, result)
                elif route == "/predict_batch":
                    req = json.loads(body)
                    with lock:
                        results = pred.predict(req["paths"],
                                               topk=req.get("topk", topk))
                    self._json(200, results)
                else:
                    self._json(404, {"error": "unknown route"})
            except Exception as e:      # surfaces bad images/paths as 400s
                self._json(400, {"error": str(e)})

    return ThreadingHTTPServer((host, port), Handler)


def run(argv=None) -> int:
    p = argparse.ArgumentParser("Serve a trained pipnet_tpu run")
    p.add_argument("--run_dir", required=True)
    p.add_argument("--checkpoint", default="net_trained_last")
    p.add_argument("--images", nargs="*", default=[])
    p.add_argument("--topk", type=int, default=3)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--dataset", default=None,
                   help="override the stored dataset when resolving class "
                        "names (unnecessary when metadata/classes.json exists)")
    p.add_argument("--path_prob_softmax_tau", type=float, default=1.0)
    p.add_argument("--apply_overspecificity_mask", action="store_true",
                   help="serve the mask-pruned model (hard-Gumbel presence "
                        "mask + degenerate-node decode fallback)")
    p.add_argument("--mask_seed", type=int, default=0)
    p.add_argument("--explain", default=None, metavar="OUT_DIR",
                   help="write per-image evidence folders here")
    p.add_argument("--bench", action="store_true",
                   help="serving latency/throughput JSON line")
    p.add_argument("--http", type=int, default=None, metavar="PORT",
                   help="serve over HTTP instead of the one-shot CLI "
                        "(GET /healthz, POST /predict, POST /predict_batch)")
    p.add_argument("--http_host", default="127.0.0.1")
    args = p.parse_args(argv)

    pred = Predictor(args.run_dir, checkpoint=args.checkpoint,
                     batch_size=args.batch_size, dataset=args.dataset,
                     path_prob_softmax_tau=args.path_prob_softmax_tau,
                     apply_overspecificity_mask=args.apply_overspecificity_mask,
                     mask_seed=args.mask_seed)
    if args.bench:
        print(json.dumps({"metric": "serving", **pred.bench()}))
        return 0
    if args.http is not None:
        srv = serve_http(pred, port=args.http, host=args.http_host)
        print(f"serving on http://{args.http_host}:{srv.server_address[1]} "
              f"(GET /healthz, POST /predict, POST /predict_batch)",
              flush=True)
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            srv.server_close()
        return 0
    if not args.images:
        p.error("pass --images, --bench, or --http")
    results = pred.predict(args.images, topk=args.topk)
    for idx, (path, res) in enumerate(zip(args.images, results)):
        if args.explain:
            # index prefix: distinct images often share a basename
            # (class_a/img_000.png vs class_b/img_000.png)
            out_dir = os.path.join(
                args.explain,
                f"{idx:03d}_{os.path.splitext(os.path.basename(path))[0]}")
            pred.explain(path, out_dir, topk=args.topk)
            res["explanation_dir"] = out_dir
        print(json.dumps({"image": path, **res}))
    return 0


if __name__ == "__main__":
    sys.exit(run())
