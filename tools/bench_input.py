"""Epoch-style input-pipeline benchmark (round-1 verdict item 7).

bench.py measures steady-state compute on ONE resident batch; this tool
measures the same train step fed by the REAL host path — dataset
__getitem__ (feature gather through FeatureStore / the C++ featpack store
if packed), collate, prefetch thread, shard_batch H2D — and reports the
host overhead over the compute-only floor:

  host_stall_pct = (t_e2e - t_compute) / t_e2e

Usage:  python tools/bench_input.py [gt5|p100] [batch] [data_dir] [host|device|index] [highest|default]

The 5th arg selects matmul precision; ``default`` additionally stores the
device tables bf16 (misc.half_feats) — the production configuration.

``device`` benches the device-resident feature-table path
(data/device_store.py): batches carry vid_rows and the feature gather
runs inside the jitted step, so per-batch H2D drops from ~34 MB to KBs.
``index`` adds the index-only ann store (data/ann_store.py).

Env: BENCH_INPUT_N (steps), BENCH_INPUT_K (fused steps/dispatch),
BENCH_INPUT_INLINE=1 (inline H2D instead of prefetch-worker H2D).

Needs a dataset at real dims (``bash data/download_data.sh --synthetic``
writes data/asrl).  Results are recorded in BASELINE.md.

``measure()`` is the callable core — bench.py uses it to emit the
real-data ``e2e_pairs_per_sec`` + ``mfu`` fields next to the synthetic
headline (VERDICT r3 item #4).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def measure(
    exp: str = "gt5",
    B: int = 16,
    data_dir: str = "data/asrl",
    mode: str = "index",
    precision: str = "default",
    K: int = 1,
    N: int = 0,
    inline: bool = False,
    verbose: bool = True,
    act_dtype: str = "",
) -> dict:
    """Measure the real-data train path.  Returns a dict with
    t_compute / t_e2e (s/step), stall_pct, pairs_per_sec, flops_per_step
    (XLA cost analysis of the compiled step; None if the backend won't
    report it), store_kind."""
    import jax
    import numpy as np

    from __graft_entry__ import _cfg, _glove
    from vog_tpu.config import apply_matmul_precision, post_proc_config
    from vog_tpu.data.loader import get_data
    from vog_tpu.train.dist import make_mesh, shard_batch
    from vog_tpu.train.state import init_state, make_train_step

    say = (lambda *a: print(*a, flush=True)) if verbose else (lambda *a: None)

    cfg = _cfg(tiny=False)
    cfg.ds.exp_setting = exp
    cfg.ds.data_dir = data_dir
    post_proc_config(cfg)
    cfg.misc.mesh_data = 1
    cfg.misc.mesh_model = 1
    cfg.misc.matmul_precision = precision
    if precision == "default":
        cfg.misc.half_feats = True  # bf16 tables + transfers (production)
    # BENCH_ACT_DTYPE=bfloat16 (or act_dtype=) turns on the bf16
    # activation policy (cfg.mdl.dtype, model/dtypes.py)
    cfg.mdl.dtype = act_dtype or os.environ.get("BENCH_ACT_DTYPE", cfg.mdl.dtype)
    apply_matmul_precision(cfg)
    mesh = make_mesh(cfg)

    data = get_data(cfg, B)
    store_kind = type(data.train_dl.ds.store).__name__
    state = init_state(cfg, _glove(cfg), jax.random.PRNGKey(0), B)
    tables = None
    dstore = mode in ("device", "index")
    if dstore:
        from vog_tpu.data.device_store import DeviceFeatureTables

        dft = DeviceFeatureTables(
            cfg, data.train_dl.ds.store, mesh, half=cfg.misc.half_feats
        )
        data.train_dl.ds.device_rows = dft.rows
        tables = dft.tables
        store_kind += "+device"
    if mode == "index":
        # index-only input path: annotation statics also device-resident,
        # batches shrink to 4 int32 fields/sample (data/ann_store.py)
        from vog_tpu.data.ann_store import DeviceAnnTables

        dat = DeviceAnnTables(cfg, {"train": data.train_dl.ds}, dft.rows, mesh)
        data.train_dl.ds.index_only = True
        data.train_dl.ds.ann_row_offset = 0
        tables = {**tables, **dat.tables}
        store_kind += "+ann"
    raw = make_train_step(cfg, device_store=dstore)
    jstep = jax.jit(raw, donate_argnums=(0,))
    step = lambda s, b, r: jstep(s, b, r, tables)
    rng = jax.random.PRNGKey(1)

    # compile + one resident batch for the compute floor
    say("building first batch...")
    it = iter(data.train_dl)
    first = shard_batch(next(it), mesh, cfg.misc.half_feats)
    say("compiling...")
    flops = None
    try:
        # per-step FLOPs as compiled (feeds the bench.py mfu field); the
        # lowering shares the jit cache so this does not recompile
        cost = jstep.lower(state, first, rng, tables).compile().cost_analysis()
        if cost:
            ca = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass
    for _ in range(3):
        state, aux = step(state, first, rng)
        float(aux["loss"])
    N = N or int(os.environ.get("BENCH_INPUT_N", "0")) or max(20, len(data.train_dl))
    say(f"timing compute floor ({N} steps)...")
    t0 = time.perf_counter()
    for _ in range(N):
        state, aux = step(state, first, rng)
    float(aux["loss"])
    t_compute = (time.perf_counter() - t0) / N

    # epoch-style: real batches through getitem + prefetch + shard_batch.
    # Default: shard_batch runs in the prefetch worker (loader.transform)
    # exactly as the Learner wires it, so H2D overlaps the previous step;
    # inline=True A/Bs the inline-transfer variant.  Loops epochs until N
    # steps and takes the best of 2 passes (first pass warms the
    # memoization caches + prefetch thread).
    say(
        f"timing e2e epoch loop ({'inline' if inline else 'worker'} H2D"
        + (f", K={K} steps/dispatch" if K > 1 else "")
        + ")..."
    )
    del it
    if K > 1:
        from vog_tpu.train.dist import stack_shard_batches
        from vog_tpu.train.state import make_multi_train_step

        data.train_dl.group = K
        data.train_dl.transform = lambda bs: stack_shard_batches(
            bs, mesh, cfg.misc.half_feats
        )
        jmulti = jax.jit(
            make_multi_train_step(cfg, device_store=dstore),
            donate_argnums=(0,),
        )
        step = lambda s, b, r: jmulti(s, b, r, tables)
    elif not inline:
        data.train_dl.transform = lambda b: shard_batch(
            b, mesh, cfg.misc.half_feats
        )

    def one_pass():
        t0 = time.perf_counter()
        n = 0
        aux = None
        while n < N:
            for b in data.train_dl:
                if inline:
                    b = shard_batch(b, mesh, cfg.misc.half_feats)
                nonlocal_state[0], aux = step(nonlocal_state[0], b, rng)
                n += int(b["batch_mask"].shape[0]) if K > 1 else 1
                if n >= N:
                    break
        float(np.asarray(aux["loss"]).reshape(-1)[-1])
        return (time.perf_counter() - t0) / n

    nonlocal_state = [state]
    t_e2e = min(one_pass(), one_pass())

    stall = max(0.0, (t_e2e - t_compute) / t_e2e * 100.0)
    pairs = B * cfg.ds.num_cmp
    return {
        "exp": exp,
        "B": B,
        "mode": mode,
        "precision": precision,
        "act_dtype": cfg.mdl.dtype,
        "K": K,
        "store_kind": store_kind,
        "t_compute": t_compute,
        "t_e2e": t_e2e,
        "stall_pct": stall,
        "pairs_per_sec": pairs / t_e2e,
        "flops_per_step": flops,
    }


def main():
    exp = sys.argv[1] if len(sys.argv) > 1 else "gt5"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else (16 if exp == "gt5" else 2)
    data_dir = sys.argv[3] if len(sys.argv) > 3 else "data/asrl"
    mode = sys.argv[4] if len(sys.argv) > 4 else "host"
    precision = sys.argv[5] if len(sys.argv) > 5 else "highest"
    r = measure(
        exp,
        B,
        data_dir,
        mode,
        precision,
        K=int(os.environ.get("BENCH_INPUT_K", "1")),
        inline=os.environ.get("BENCH_INPUT_INLINE") == "1",
    )
    print(
        f"{r['exp']} B={r['B']} store={r['store_kind']}: "
        f"compute {r['t_compute'] * 1e3:.1f} ms/step, "
        f"e2e {r['t_e2e'] * 1e3:.1f} ms/step, "
        f"host_stall {r['stall_pct']:.1f}%, "
        f"e2e throughput {r['pairs_per_sec']:.1f} pairs/s"
        + (
            f", {r['flops_per_step'] / 1e9:.1f} GF/step"
            if r["flops_per_step"]
            else ""
        )
    )


if __name__ == "__main__":
    main()
