"""GT5 batch-size MFU sweep (VERDICT r3 item #5a).

BASELINE.md's bf16 GT5 profile shows the production step "broadly
fusion-bound — no dominant op family", i.e. small-matmul-limited: at
B=16 the per-(query,video) matmuls are (64, d) x (d, d') with d<=512,
far below full MXU tile occupancy.  The lever is batch: SPAT folds the
4-video group into the token axis, so doubling B doubles every matmul's
leading dim without touching the model.

This tool runs tools/bench_input.py §measure at the production config
(bf16 tables + default precision, device+ann index-only stores, fused
K-step dispatch, real host input path) for a sweep of batch sizes and
emits one JSON line per point:

  {"B": 32, "ms_per_step": ..., "pairs_per_sec": ..., "mfu": ...,
   "achieved_tflops": ..., "stall_pct": ...}

plus a final {"sweep": "done", "best_B": ..., "best_mfu": ...} line.
MFU = XLA-cost-analysis FLOPs of the compiled step / compute-floor
time / v5e bf16 peak (197 TFLOP/s) — the same definition bench.py uses,
so the numbers are comparable with BENCH_r*.json.

Usage:  python tools/mfu_sweep.py [data_dir] [B ...]
        (default: auto-detect dataset, B in 16 32 64 128)

Per-step pairs/s is throughput truth; MFU is the efficiency lens.  Both
are recorded in BASELINE.md §reference-scale alongside the sweep.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

PEAK_BF16_TFLOPS = 197.0


def main() -> None:
    args = sys.argv[1:]
    data_dir = None
    if args and not args[0].isdigit():
        data_dir, args = args[0], args[1:]
    if data_dir is None:
        data_dir = next(
            (d for d in ("data/asrl", "data/asrl_40k", "data/asrl_1k6")
             if os.path.isdir(d)),
            None,
        )
    if data_dir is None:
        raise SystemExit("no real-dims dataset on disk (run rehearsal gen-gt5)")
    batches = [int(a) for a in args] or [16, 32, 64, 128]

    from bench_input import measure

    best = (0, 0.0)
    for B in batches:
        # keep the dispatch-group product bounded: at B=128 a K=16 scan
        # stacks 2048 samples of int32 indices — fine — but the fused
        # scan's per-dispatch latency grows linearly, so scale K down to
        # hold ~256 samples/dispatch (same tail-group-free property).
        K = max(1, 256 // B)
        N = 6 * K  # 6 full dispatch groups, no short tail
        try:
            r = measure(
                "gt5", B, data_dir, "index", "default", K=K, N=N,
                verbose=False,
            )
        except Exception as e:  # OOM at large B is a finding, not a crash
            print(json.dumps(
                {"B": B, "error": f"{type(e).__name__}: {e}"[:200]}
            ), flush=True)
            continue
        row = {
            "B": B,
            "K": K,
            "ms_per_step": round(r["t_e2e"] * 1e3, 2),
            "ms_compute": round(r["t_compute"] * 1e3, 2),
            "stall_pct": round(r["stall_pct"], 1),
            "pairs_per_sec": round(r["pairs_per_sec"], 1),
        }
        if r["flops_per_step"]:
            tflops = r["flops_per_step"] / r["t_compute"] / 1e12
            row["achieved_tflops"] = round(tflops, 2)
            row["mfu"] = round(tflops / PEAK_BF16_TFLOPS, 4)
            if row["mfu"] > best[1]:
                best = (B, row["mfu"])
        print(json.dumps(row), flush=True)
    print(json.dumps(
        {"sweep": "done", "best_B": best[0], "best_mfu": best[1]}
    ), flush=True)


if __name__ == "__main__":
    main()
