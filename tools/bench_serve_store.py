"""Serving request latency: full-feature requests vs device-store vid_rows.

A GT5 grounding request carries ~34 MB of RoI/TSN features per batch-16;
with the device-resident tables the request carries vid_rows (KBs) and
the gather runs inside the jitted call.  This measures both end-to-end
(host batch -> device -> predict -> fetch choices) on real data.

Usage: python tools/bench_serve_store.py [data_dir] [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import numpy as np

    from __graft_entry__ import _cfg, _glove
    from vog_tpu.config import post_proc_config
    from vog_tpu.data.device_store import DeviceFeatureTables
    from vog_tpu.data.loader import get_data
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

    def run(pred, batch, label):
        for _ in range(3):
            out = pred(batch)  # __call__ fetches host outputs (e2e)
        N = 20
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(N):
                out = pred(batch)
            dt = min(dt, time.perf_counter() - t0)
        mb = sum(
            v.nbytes for v in batch.values() if hasattr(v, "nbytes")
        ) / 1e6
        print(
            f"{label}: {dt / N * 1e3:.2f} ms/request e2e "
            f"(payload {mb:.1f} MB, B={B})",
            flush=True,
        )

    run(pred_full, full_batch, "full-feature request")
    run(pred_rows, rows_batch, "vid_rows request (device store)")


if __name__ == "__main__":
    main()
