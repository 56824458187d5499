"""Serving-path latency/throughput benchmark (vog_tpu/serve.py Predictor).

The reference has no serving surface (research code); serve.py is our
production path.  This times the jitted Predictor call — forward + argmax
+ box select, no grads — at eval batch shapes, under both precision
modes:

  highest  = strict-parity fp32 (multi-pass MXU emulation)
  default  = bf16 MXU passes (production serving mode)

Usage:  python tools/bench_serve.py [gt5|p100] [batch]

Axon-tunnel sync discipline as in bench.py: chained calls closed by one
value fetch, min over bursts.  Results recorded in BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import numpy as np

    from __graft_entry__ import _cfg, _glove, _random_batch
    from vog_tpu.config import post_proc_config
    from vog_tpu.serve import Predictor
    from vog_tpu.train.state import init_state

    exp = sys.argv[1] if len(sys.argv) > 1 else "gt5"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else (16 if exp == "gt5" else 2)

    cfg = _cfg(tiny=False)
    cfg.ds.exp_setting = exp
    post_proc_config(cfg)

    for precision in ("highest", "default"):
        jax.config.update("jax_default_matmul_precision", precision)
        glove = _glove(cfg)
        state = init_state(cfg, glove, jax.random.PRNGKey(0), B)
        pred = Predictor(cfg, state.params, glove)
        batch = {
            k: jax.numpy.asarray(v) for k, v in _random_batch(cfg, B).items()
        }

        out = None
        for _ in range(3):  # compile + upload settle
            out = pred._predict(pred.params, batch)
            float(out["pred_score"][0, 0, 0])
        dt = float("inf")
        N = 30
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(N):
                out = pred._predict(pred.params, batch)
            float(out["pred_score"][0, 0, 0])
            dt = min(dt, time.perf_counter() - t0)
        per_call = dt / N
        pairs = B * cfg.ds.num_cmp
        print(
            f"serve {exp} B={B} precision={precision}: "
            f"{per_call * 1e3:.2f} ms/call, "
            f"{pairs / per_call:.0f} pairs/s/chip",
            flush=True,
        )


if __name__ == "__main__":
    main()
