"""Serving process: request queue -> micro-batcher -> Predictor.

The reference has no serving surface; this is the production-deployment
entry (north star "large-scale production deployment and serving") around
``vog_tpu.serving.ServingLoop``.  Two modes:

Self-test (measures the loop under concurrent clients; numbers land in
BASELINE.md):

  python -m vog_tpu.cli.serve <uid> --ds.data_dir=data/asrl \
      --selftest=200 --concurrency=8 [--serve.batch=16] [--serve.wait_ms=2]

  Requests come from the valid split (vid_rows-mode when the device store
  is on); prints one JSON line with p50/p95/p99 latency and throughput.

HTTP endpoint (minimal JSON protocol; one POST /predict per query):

  python -m vog_tpu.cli.serve <uid> --ds.data_dir=data/asrl --port=8400

  Body: {"<field>": <nested list>, ...} with the single-query request
  schema (vid_rows (V,) int or props/seg_feats full features, prop_boxes,
  prop_mask, tokens, seq_len, verb_idx, srl_roles, srl_spans,
  srl_arg_mask, targets (zeros ok at inference), gt_* (zeros ok),
  pos_vid).  Response: {"pred_vid": [...], "pred_prop": [...],
  "pred_box": [...], "pred_score": [...]} per (arg, frame).

A checkpoint is loaded from ``tmp/models/<uid>/<tag>`` (``--tag=best``);
``--random_init`` serves fresh weights (benchmark mode).
"""

from __future__ import annotations

import json
import sys
import threading
import time
from typing import Dict, List

import numpy as np

from vog_tpu.cli.train import parse_argv
from vog_tpu.config import (
    apply_matmul_precision,
    get_default_cfg,
    post_proc_config,
    update_from_dict,
)


def _build_predictor(cfg, uid: str, tag: str, random_init: bool):
    import jax

    from vog_tpu.data import get_data
    from vog_tpu.serve import Predictor
    from vog_tpu.train.state import init_state

    data = get_data(cfg, cfg.train.bs)
    glove = data.vocab.vectors

    tables = None
    if cfg.ds.device_store != "off":
        from vog_tpu.data.device_store import (
            DeviceFeatureTables,
            fits_device_store,
        )

        store = data.valid_dl.ds.store
        n_videos = len(store.videos())
        if cfg.ds.device_store == "on" or (
            jax.default_backend() == "tpu" and fits_device_store(cfg, n_videos)
        ):
            dft = DeviceFeatureTables(
                cfg, store, half=cfg.misc.half_feats, int8=cfg.misc.int8_feats
            )
            tables = dft.tables
            for dl in (data.train_dl, data.valid_dl, data.test_dl):
                if dl is not None:
                    dl.ds.device_rows = dft.rows
            print(f"device store: {n_videos} videos resident", flush=True)

    if random_init:
        state = init_state(cfg, glove, jax.random.PRNGKey(0), cfg.train.bs)
        pred = Predictor(cfg, state.params, glove, tables=tables)
    else:
        from pathlib import Path

        ckpt = Path(cfg.misc.tmp_path) / "models" / uid / tag
        pred = Predictor.from_checkpoint(cfg, glove, ckpt, tables=tables)
    return pred, data


def _selftest(loop, data, n_requests: int, concurrency: int) -> Dict:
    """Concurrent clients hammer the loop; per-request e2e latency."""
    from vog_tpu.serving import batch_to_requests

    reqs: List[Dict] = []
    for batch in data.valid_dl:
        reqs.extend(batch_to_requests(batch))
        if len(reqs) >= min(n_requests, 256):
            break
    lat: List[float] = []
    lock = threading.Lock()

    def client(worker_idx: int):
        rng = np.random.default_rng(worker_idx)
        per = n_requests // concurrency
        for _ in range(per):
            r = reqs[int(rng.integers(len(reqs)))]
            t0 = time.perf_counter()
            loop(r)  # submit + wait
            dt = time.perf_counter() - t0
            with lock:
                lat.append(dt)

    # warmup (compile) outside the timed window
    loop(reqs[0])
    t0 = time.perf_counter()
    threads = [
        threading.Thread(target=client, args=(i,)) for i in range(concurrency)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    arr = np.asarray(lat) * 1e3
    return {
        "metric": "serving_request_latency",
        "n_requests": len(lat),
        "concurrency": concurrency,
        "p50_ms": round(float(np.percentile(arr, 50)), 2),
        "p95_ms": round(float(np.percentile(arr, 95)), 2),
        "p99_ms": round(float(np.percentile(arr, 99)), 2),
        "mean_ms": round(float(arr.mean()), 2),
        "requests_per_sec": round(len(lat) / wall, 1),
    }


def _serve_http(loop, port: int) -> None:
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802 (stdlib API name)
            if self.path != "/predict":
                self.send_error(404)
                return
            try:
                body = self.rfile.read(int(self.headers["Content-Length"]))
                req = {
                    k: np.asarray(v) for k, v in json.loads(body).items()
                }
                out = loop(req)
                resp = json.dumps(
                    {
                        k: np.asarray(v).tolist()
                        for k, v in out.items()
                        if k != "scores"  # full grid on request only
                    }
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(resp)))
                self.end_headers()
                self.wfile.write(resp)
            except Exception as e:  # surface the error to the client
                self.send_error(400, str(e))

        def log_message(self, *a):  # quiet access log
            pass

    srv = ThreadingHTTPServer(("0.0.0.0", port), Handler)
    print(f"serving on :{port} (POST /predict)", flush=True)
    srv.serve_forever()


def main(argv=None) -> Dict:
    uid, overrides, flags = parse_argv(
        argv if argv is not None else sys.argv[1:]
    )
    tag = overrides.pop("tag", "last")
    port = int(overrides.pop("port", 0))
    selftest = int(overrides.pop("selftest", 0))
    concurrency = int(overrides.pop("concurrency", 8))
    max_batch = int(overrides.pop("serve.batch", 0))
    wait_ms = float(overrides.pop("serve.wait_ms", 2.0))
    pipeline_depth = int(overrides.pop("serve.pipeline", 2))
    buckets_raw = str(overrides.pop("serve.buckets", "true")).lower()
    if buckets_raw in ("true", "1", "yes", "on"):
        buckets = True
    elif buckets_raw in ("false", "0", "no", "off"):
        buckets = False
    else:
        raise SystemExit(f"--serve.buckets: unrecognized value {buckets_raw!r}")
    artifact = overrides.pop("artifact", None)  # serve a .vogx AOT export
    yml = overrides.pop("cfg", None)
    cfg = get_default_cfg(yml)
    update_from_dict(cfg, overrides)
    post_proc_config(cfg)
    if cfg.misc.platform:
        import jax

        jax.config.update("jax_platforms", cfg.misc.platform)
    apply_matmul_precision(cfg)

    from vog_tpu.serving import ServingLoop

    if artifact:
        # AOT deployment mode: serve the exported .vogx (no model code,
        # no checkpoint; batch size is fixed by the artifact).  The data
        # splits still load for --selftest request sourcing.
        from vog_tpu.data import get_data
        from vog_tpu.export import ExportedPredictor

        pred = ExportedPredictor(artifact)
        data = get_data(cfg, cfg.train.bs)
        if pred.manifest.get("with_tables") and pred.rows:
            # requests carry vid_rows; source them via the artifact's own
            # vid->row mapping (round-5: previously only a live store's
            # mapping worked, so standalone artifacts couldn't selftest)
            for dl in (data.train_dl, data.valid_dl, data.test_dl):
                if dl is not None:
                    dl.ds.device_rows = pred.rows
        max_batch = pred.batch_size
        buckets = False  # .vogx artifacts are fixed-shape StableHLO
        print(f"serving exported artifact {artifact}", flush=True)
    else:
        pred, data = _build_predictor(cfg, uid, tag, "random_init" in flags)
    max_batch = max_batch or cfg.train.bs
    # powers of two up to max_batch: light load pads to a small bucket
    # instead of the full batch shape (one cached executable per bucket)
    bucket_sizes = None
    if buckets:
        bucket_sizes, b = [], 1
        while b < max_batch:
            bucket_sizes.append(b)
            b *= 2
    loop = ServingLoop(
        pred,
        max_batch=max_batch,
        max_wait_ms=wait_ms,
        pipeline_depth=pipeline_depth,
        bucket_sizes=bucket_sizes,
    )
    if bucket_sizes:
        from vog_tpu.serving import batch_to_requests

        first = next(iter(data.valid_dl), None)
        if first is None:
            print("valid split is empty; skipping bucket prewarm", flush=True)
        else:
            sample = batch_to_requests(first)[0]
            t0 = time.perf_counter()
            loop.prewarm(sample)
            print(
                f"prewarmed buckets {loop.bucket_sizes} "
                f"in {time.perf_counter() - t0:.1f}s",
                flush=True,
            )
    try:
        if selftest:
            out = _selftest(loop, data, selftest, concurrency)
            print(json.dumps(out), flush=True)
            return out
        if port:
            _serve_http(loop, port)
        raise SystemExit("pass --selftest=N or --port=P")
    finally:
        loop.close()


if __name__ == "__main__":
    main()
