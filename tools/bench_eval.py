"""Eval-pass benchmark: per-batch vs fused multi-batch eval dispatch.

_run_eval pays two tunnel costs per eval batch: the dispatch round-trip
and the bulk fetch of the (compact) eval outputs.
``train.eval_batches_per_dispatch=E`` amortizes both (lax.scan over E
stacked batches + ONE stacked fetch).  This tool times a full
validate() pass at the production GT5 config for E in {1, 8} on a
real-dims dataset and records wall/batch.

Usage: python tools/bench_eval.py [data_dir] [batch] [E...]
       (defaults: data/asrl_5k 16 1 8)
Results go to BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_one(E: int, data_dir: str, B: int) -> None:
    import jax

    from __graft_entry__ import _cfg
    from vog_tpu.config import apply_matmul_precision, post_proc_config
    from vog_tpu.data.loader import get_data
    from vog_tpu.train import Learner, make_mesh

    cfg = _cfg(tiny=False)
    cfg.ds.data_dir = data_dir
    post_proc_config(cfg)
    cfg.misc.mesh_data = 1
    cfg.misc.mesh_model = 1
    cfg.misc.matmul_precision = "default"
    cfg.misc.half_feats = True
    cfg.ds.device_store = "on"
    cfg.train.bs = B
    cfg.train.eval_batches_per_dispatch = E
    cfg.misc.tmp_path = "/tmp/bench_eval"
    apply_matmul_precision(cfg)
    mesh = make_mesh(cfg)
    data = get_data(cfg, global_batch_size=B)
    lrn = Learner(f"be{E}", data, cfg, mesh=mesh)
    n_batches = len(data.valid_dl)

    lrn.validate()  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        lrn.validate()
        best = min(best, time.perf_counter() - t0)
    print(
        f"E={E}: {best * 1e3:.1f} ms / eval pass "
        f"({n_batches} batches of {B} -> {best * 1e3 / n_batches:.1f} ms/batch)"
    )


def main() -> None:
    data_dir = sys.argv[1] if len(sys.argv) > 1 else "data/asrl_5k"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    Es = [int(x) for x in sys.argv[3:]] or [1, 8]
    for E in Es:
        run_one(E, data_dir, B)


if __name__ == "__main__":
    main()
