"""A/B the bf16 activation policy (cfg.mdl.dtype) on the real chip.

Builds the device+ann stores ONCE (the dominant setup cost at the
reference-scale dataset), then for each (B, act_dtype) combination jits
the production train step and times the resident-batch compute floor —
the quantity the activation dtype actually moves (the host input path is
dtype-independent).  One JSON line per point.

Usage: python tools/bench_act_dtype.py [data_dir] [B ...]
       (default: auto dataset, B in 16 64)
"""

from __future__ import annotations

import json
import os
import sys
import time

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
    batches = [int(a) for a in args] or [16, 64]

    import jax
    import numpy as np

    from __graft_entry__ import _cfg, _glove
    from vog_tpu.config import apply_matmul_precision, post_proc_config
    from vog_tpu.data.ann_store import DeviceAnnTables
    from vog_tpu.data.device_store import DeviceFeatureTables
    from vog_tpu.data.loader import get_data
    from vog_tpu.train.dist import make_mesh, shard_batch
    from vog_tpu.train.state import init_state, make_train_step

    def base_cfg(act):
        cfg = _cfg(tiny=False)
        cfg.ds.exp_setting = "gt5"
        cfg.ds.data_dir = data_dir
        post_proc_config(cfg)
        cfg.misc.mesh_data = 1
        cfg.misc.mesh_model = 1
        cfg.misc.matmul_precision = "default"
        cfg.misc.half_feats = True
        cfg.mdl.dtype = act
        apply_matmul_precision(cfg)
        return cfg

    cfg0 = base_cfg("float32")
    mesh = make_mesh(cfg0)
    data = get_data(cfg0, max(batches))
    dft = DeviceFeatureTables(cfg0, data.train_dl.ds.store, mesh, half=True)
    data.train_dl.ds.device_rows = dft.rows
    dat = DeviceAnnTables(cfg0, {"train": data.train_dl.ds}, dft.rows, mesh)
    data.train_dl.ds.index_only = True
    data.train_dl.ds.ann_row_offset = 0
    tables = {**dft.tables, **dat.tables}

    it = iter(data.train_dl)
    big = next(it)
    del it

    for B in batches:
        batch = shard_batch(
            {k: v[:B] for k, v in big.items()}, mesh, True
        )
        for act in ("float32", "bfloat16"):
            cfg = base_cfg(act)
            state = init_state(cfg, _glove(cfg), jax.random.PRNGKey(0), B)
            jstep = jax.jit(make_train_step(cfg, device_store=True),
                            donate_argnums=(0,))
            rng = jax.random.PRNGKey(1)
            flops = None
            try:
                cost = jstep.lower(state, batch, rng, tables).compile(
                ).cost_analysis()
                ca = cost[0] if isinstance(cost, (list, tuple)) else cost
                flops = float(ca.get("flops", 0.0)) or None
            except Exception:
                pass
            for _ in range(5):
                state, aux = jstep(state, batch, rng, tables)
                loss = float(np.asarray(aux["loss"]))
            N = 30
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(N):
                    state, aux = jstep(state, batch, rng, tables)
                float(np.asarray(aux["loss"]))
                best = min(best, (time.perf_counter() - t0) / N)
            row = {
                "B": B,
                "act_dtype": act,
                "ms_per_step": round(best * 1e3, 2),
                "pairs_per_sec": round(B * cfg.ds.num_cmp / best, 1),
                "loss": round(loss, 5),
            }
            if flops:
                tf = flops / best / 1e12
                row["achieved_tflops"] = round(tf, 2)
                row["mfu"] = round(tf / PEAK_BF16_TFLOPS, 4)
            print(json.dumps(row), flush=True)
            del state, jstep


if __name__ == "__main__":
    main()
