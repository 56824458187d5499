"""Reference-scale dress rehearsal (VERDICT r3 item #2).

SURVEY §0 puts the real ASRL at ~15k segments / ~40k queries and SURVEY
§7 hard-part #5 at a ~100 GB-class P100 feature table; every run to date
used ≤5.6k synthetic videos.  This tool generates a full-cardinality
synthetic ASRL (data/fixtures.py §generate_scaled) and drives the whole
production pipeline at that scale, one phase per invocation (each prints
one JSON line; results land in BASELINE.md §reference-scale):

  python tools/rehearsal.py gen-gt5        # data/asrl_40k     (~4 GB f16)
  python tools/rehearsal.py gen-p100       # data/asrl_40k_p100 (~62 GB f16)
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/rehearsal.py store      # streamed int8 row-sharded build
                                           # of the P100 table on the 8-dev
                                           # mesh + sharded-gather train step
  python tools/rehearsal.py train [epochs] # single-chip GT5 production
                                           # config, real epochs at 28k
                                           # queries (bf16 + index store + K)
  python tools/rehearsal.py eval           # 10k-query valid split wall time
  python tools/rehearsal.py resume         # ckpt save/restore at scale +
                                           # param bit-identity

The GT5 phases run on whatever backend is live (the real chip under
axon); `store` MUST run on the virtual CPU mesh — the 31 GB int8 P100
table exceeds one chip's HBM by design (that's what row-sharding is for).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

GT5_DIR = "data/asrl_40k"
P100_DIR = "data/asrl_40k_p100"


def _emit(phase: str, **kw) -> None:
    print(json.dumps({"phase": phase, **kw}), flush=True)


def _cfg_scaled(data_dir: str, exp: str):
    from __graft_entry__ import _cfg
    from vog_tpu.config import apply_matmul_precision, post_proc_config

    cfg = _cfg(tiny=False)
    cfg.ds.exp_setting = exp
    cfg.ds.data_dir = data_dir
    post_proc_config(cfg)
    cfg.misc.mesh_data = 1
    cfg.misc.mesh_model = 1
    cfg.misc.matmul_precision = "default"
    cfg.misc.half_feats = True
    apply_matmul_precision(cfg)
    return cfg


def gen(num_props: int, out: str) -> None:
    from vog_tpu.data.fixtures import generate_scaled

    t0 = time.perf_counter()
    generate_scaled(out, num_props=num_props)
    dt = time.perf_counter() - t0
    n_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(out)
        for f in fs
    )
    _emit(
        f"gen-{'gt5' if num_props == 5 else 'p100'}",
        out=out,
        gen_s=round(dt, 1),
        disk_gb=round(n_bytes / 1e9, 2),
    )


def store() -> None:
    """Streamed int8 row-sharded P100 table build on the 8-device mesh +
    one sharded-gather train step for correctness at full cardinality."""
    # env JAX_PLATFORMS alone does not stick (the axon site hook re-pins
    # it); the config update is authoritative.  XLA_FLAGS must still be in
    # the environment before backend init — set it if the caller forgot.
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    if jax.device_count() < 8:
        raise SystemExit("CPU mesh bootstrap failed (need 8 virtual devices)")
    import numpy as np

    from __graft_entry__ import _glove
    from vog_tpu.data.device_store import DeviceFeatureTables, table_bytes
    from vog_tpu.data.loader import get_data
    from vog_tpu.train.dist import make_mesh, shard_batch
    from vog_tpu.train.state import init_state, make_train_step

    cfg = _cfg_scaled(P100_DIR, "p100")
    cfg.misc.mesh_data = 8
    cfg.misc.int8_feats = True
    cfg.train.bs = 8  # global batch over the 8-way data mesh
    mesh = make_mesh(cfg)
    data = get_data(cfg, cfg.train.bs)
    n_videos = len(data.train_dl.ds.store.videos())

    t0 = time.perf_counter()
    dft = DeviceFeatureTables(
        cfg, data.train_dl.ds.store, mesh, int8=True, shard=True
    )
    build_s = time.perf_counter() - t0
    tbytes = sum(int(np.prod(t.shape)) * t.dtype.itemsize for t in dft.tables.values())

    data.train_dl.ds.device_rows = dft.rows
    state = init_state(cfg, _glove(cfg), jax.random.PRNGKey(0), cfg.train.bs)
    step = jax.jit(make_train_step(cfg, device_store=True), donate_argnums=(0,))
    batch = shard_batch(next(iter(data.train_dl)), mesh, cfg.misc.half_feats)
    t0 = time.perf_counter()
    state, aux = step(state, batch, jax.random.PRNGKey(1), dft.tables)
    loss = float(aux["loss"])
    step_s = time.perf_counter() - t0
    _emit(
        "store",
        n_videos=n_videos,
        table_gb=round(tbytes / 1e9, 2),
        logical_f32_gb=round(table_bytes(cfg, n_videos) * 0 + n_videos * (
            cfg.ds.num_frms * cfg.ds.num_prop_per_frm * cfg.ds.prop_dim
            + cfg.ds.num_frms * cfg.ds.seg_dim) * 4 / 1e9, 2),
        build_s=round(build_s, 1),
        sharded=True,
        int8=True,
        first_step_loss=round(loss, 4),
        finite=bool(np.isfinite(loss)),
        step_compile_s=round(step_s, 1),
    )


def train(epochs: int = 1) -> None:
    from vog_tpu.data.loader import get_data
    from vog_tpu.train import Learner, make_mesh

    cfg = _cfg_scaled(GT5_DIR, "gt5")
    cfg.ds.device_store = "on"
    cfg.train.bs = 16
    cfg.train.epochs = epochs
    cfg.train.steps_per_dispatch = 8
    cfg.train.log_every = 200
    cfg.misc.tmp_path = "tmp/rehearsal"
    mesh = make_mesh(cfg)
    data = get_data(cfg, cfg.train.bs)
    n_steps = len(data.train_dl)
    lrn = Learner("reh40k", data, cfg, mesh=mesh)
    t0 = time.perf_counter()
    res = lrn.fit()
    wall = time.perf_counter() - t0
    # fit() returns the last epoch's validation metrics (val_loss etc.),
    # not a 'loss' key; the wall above includes jit compile + the
    # epoch-end 10k-query eval, so also report the steady-state step
    # time from the Learner's own counters when available.
    per_step = wall / max(n_steps * epochs, 1)
    final_loss = None
    if isinstance(res, dict):
        v = res.get("val_loss", res.get("loss"))
        if v is not None:
            final_loss = round(float(v), 4)
    _emit(
        "train",
        queries=n_steps * cfg.train.bs,
        steps_per_epoch=n_steps,
        epochs=epochs,
        epoch_wall_s=round(wall / epochs, 1),
        ms_per_step_incl_compile_and_eval=round(per_step * 1e3, 2),
        pairs_per_sec=round(cfg.train.bs * cfg.ds.num_cmp / per_step, 1),
        final_val_loss=final_loss,
    )


def eval_phase() -> None:
    from vog_tpu.data.loader import get_data
    from vog_tpu.train import Learner, make_mesh

    cfg = _cfg_scaled(GT5_DIR, "gt5")
    cfg.ds.device_store = "on"
    cfg.train.bs = 16
    cfg.train.eval_batches_per_dispatch = 10
    cfg.misc.tmp_path = "tmp/rehearsal"
    mesh = make_mesh(cfg)
    data = get_data(cfg, cfg.train.bs)
    lrn = Learner("reh40k_ev", data, cfg, mesh=mesh)
    n = len(data.valid_dl)
    lrn.validate()  # compile + warm
    t0 = time.perf_counter()
    metrics = lrn.validate()
    wall = time.perf_counter() - t0
    _emit(
        "eval",
        valid_queries=n * cfg.train.bs,
        batches=n,
        eval_wall_s=round(wall, 1),
        ms_per_batch=round(wall / n * 1e3, 2),
        metrics={k: round(float(v), 4) for k, v in metrics.items()},
    )


def resume() -> None:
    """Mid-training checkpoint publish + restore at 40k-query scale:
    restore wall time and param bit-identity."""
    import numpy as np

    import jax

    from vog_tpu.data.loader import get_data
    from vog_tpu.train import Learner, make_mesh

    cfg = _cfg_scaled(GT5_DIR, "gt5")
    cfg.ds.device_store = "on"
    cfg.train.bs = 16
    cfg.train.epochs = 1
    cfg.train.steps_per_dispatch = 8
    cfg.train.log_every = 10_000
    cfg.misc.tmp_path = "tmp/rehearsal"
    mesh = make_mesh(cfg)
    data = get_data(cfg, cfg.train.bs)
    lrn = Learner("reh40k_ck", data, cfg, mesh=mesh)
    lrn.fit()  # one epoch, publishes 'last'
    leaves = jax.tree_util.tree_leaves(lrn.state.params)
    want = [np.asarray(x) for x in leaves]

    data2 = get_data(cfg, cfg.train.bs)
    lrn2 = Learner("reh40k_ck", data2, cfg, mesh=mesh)
    t0 = time.perf_counter()
    lrn2.restore("last")
    restore_s = time.perf_counter() - t0
    got = [np.asarray(x) for x in jax.tree_util.tree_leaves(lrn2.state.params)]
    identical = all(np.array_equal(a, b) for a, b in zip(want, got))
    _emit(
        "resume",
        restore_s=round(restore_s, 2),
        n_param_leaves=len(got),
        bit_identical=bool(identical),
    )


def main() -> None:
    phase = sys.argv[1] if len(sys.argv) > 1 else "gen-gt5"
    if phase == "gen-gt5":
        gen(5, GT5_DIR)
    elif phase == "gen-p100":
        gen(100, P100_DIR)
    elif phase == "store":
        store()
    elif phase == "train":
        train(int(sys.argv[2]) if len(sys.argv) > 2 else 1)
    elif phase == "eval":
        eval_phase()
    elif phase == "resume":
        resume()
    else:
        raise SystemExit(f"unknown phase {phase!r}")


if __name__ == "__main__":
    main()
