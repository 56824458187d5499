"""Serving request latency: full-feature requests vs device-store vid_rows
vs the compact .vogx artifact modes (VERDICT r3 item #8).

A GT5 grounding request carries ~34 MB of RoI/TSN features per batch-16;
with the device-resident tables the request carries vid_rows (KBs) and
the gather runs inside the jitted call.  The round-4 artifact modes close
the standalone-deployment gap: int8 request encoding ships the features
4x smaller (quantized client-side, dequantized inside the exported
StableHLO), and ``with_tables`` artifacts carry the packed tables inside
the .vogx so requests shrink to vid_rows.

Measures all modes end-to-end (host batch -> encode -> device -> predict
-> fetch) on real data.

Usage: python tools/bench_serve_store.py [data_dir] [batch]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax
    import numpy as np

    from __graft_entry__ import _cfg, _glove
    from vog_tpu.config import post_proc_config
    from vog_tpu.data.device_store import DeviceFeatureTables
    from vog_tpu.data.loader import get_data
    from vog_tpu.export import (
        ExportedPredictor,
        encode_features,
        export_predictor,
    )
    from vog_tpu.serve import Predictor
    from vog_tpu.train.state import init_state

    data_dir = sys.argv[1] if len(sys.argv) > 1 else "data/asrl"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    jax.config.update("jax_default_matmul_precision", "default")
    cfg = _cfg(tiny=False)
    cfg.ds.data_dir = data_dir
    post_proc_config(cfg)
    data = get_data(cfg, B)
    glove = data.vocab.vectors
    state = init_state(cfg, glove, jax.random.PRNGKey(0), B)

    ds = data.valid_dl.ds
    full_batch = next(iter(data.valid_dl))
    tables = DeviceFeatureTables(cfg, ds.store)
    ds.device_rows = tables.rows
    data.valid_dl.epoch = 0
    rows_batch = next(iter(data.valid_dl))

    pred_full = Predictor(cfg, state.params, glove)
    pred_rows = Predictor(cfg, state.params, glove, tables=tables.tables)

    results = {}

    def run(pred, batch, label, encode=None):
        def req():
            return encode_features(batch, encode) if encode else batch

        for _ in range(3):
            out = pred(req())  # __call__ fetches host outputs (e2e)
        N = 20
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(N):
                out = pred(req())
            dt = min(dt, time.perf_counter() - t0)
        mb = sum(v.nbytes for v in req().values() if hasattr(v, "nbytes")) / 1e6
        ms = dt / N * 1e3
        results[label] = ms
        print(
            f"{label}: {ms:.2f} ms/request e2e "
            f"(payload {mb:.1f} MB, B={B}, {B / (dt / N):.1f} req/s single-query-eq)",
            flush=True,
        )

    run(pred_full, full_batch, "live full-feature request")
    run(pred_rows, rows_batch, "live vid_rows request (device store)")

    tmp = tempfile.mkdtemp(prefix="vogx_bench_")
    print("exporting artifacts (3 modes)...", flush=True)
    art_f32 = ExportedPredictor(
        export_predictor(pred_full, B, os.path.join(tmp, "f32.vogx"))
    )
    art_int8 = ExportedPredictor(
        export_predictor(
            pred_full, B, os.path.join(tmp, "q.vogx"), feature_encoding="int8"
        )
    )
    art_rows = ExportedPredictor(
        export_predictor(
            pred_rows, B, os.path.join(tmp, "t.vogx"), with_tables=True
        )
    )
    run(art_f32, full_batch, "artifact f32 request (.vogx)")
    # encode client-side so the timed path pays quantize + small H2D,
    # exactly what a remote client would
    run(art_int8, full_batch, "artifact int8 request (.vogx)", encode="int8")
    run(art_rows, rows_batch, "artifact vid_rows request (.vogx with_tables)")

    base = results.get("live vid_rows request (device store)")
    for k, v in results.items():
        if "artifact" in k and base:
            print(f"  {k}: {v / base:.2f}x the device-store latency", flush=True)


if __name__ == "__main__":
    main()
