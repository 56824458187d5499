"""Export a trained checkpoint to a standalone ``.vogx`` serving artifact.

  python -m vog_tpu.cli.export <uid> [--tag=best] [--batch=8] \
      [--out=tmp/exports/<uid>.vogx] [--platforms=tpu,cpu] [--random_init] \
      [overrides...]

The artifact (vog_tpu/export.py) embeds the weights as constants in
serialized StableHLO and replays without the model code or a checkpoint —
load it anywhere with::

    from vog_tpu.export import ExportedPredictor
    pred = ExportedPredictor("tmp/exports/<uid>.vogx")
    out = pred(request_batch)        # same contract as the live Predictor

After exporting, the CLI self-checks the artifact against the live
Predictor on one random request batch (max |Δscore| printed; bitwise on
the export platform).  The reference has no serving/deployment surface
(research code) — this is part of the production story (BASELINE.json
north star; docs/PRODUCTION.md).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

from vog_tpu.cli.train import parse_argv
from vog_tpu.config import (
    apply_matmul_precision,
    get_default_cfg,
    post_proc_config,
    update_from_dict,
)


def main(argv=None):
    uid, overrides, flags = parse_argv(argv if argv is not None else sys.argv[1:])
    tag = overrides.pop("tag", "last")
    batch = int(overrides.pop("batch", 8))
    out = overrides.pop("out", None)
    platforms = overrides.pop("platforms", None)
    # request compaction (VERDICT r3 #8): --encoding=bf16|int8 ships the
    # request features 2-4x smaller; --with_tables embeds the device-store
    # feature tables in the artifact and requests carry vid_rows only
    encoding = overrides.pop("encoding", "f32")
    yml = overrides.pop("cfg", None)
    cfg = get_default_cfg(yml)
    update_from_dict(cfg, overrides)
    post_proc_config(cfg)
    if cfg.misc.platform:
        import jax

        jax.config.update("jax_platforms", cfg.misc.platform)
    apply_matmul_precision(cfg)

    import jax

    from vog_tpu.data import get_data
    from vog_tpu.export import ExportedPredictor, export_predictor, request_spec
    from vog_tpu.serve import Predictor
    from vog_tpu.train.state import init_state

    data = get_data(cfg, cfg.train.bs)
    glove = data.vocab.vectors
    with_tables = "with_tables" in flags
    tables = None
    if with_tables:
        from vog_tpu.data.device_store import DeviceFeatureTables
        from vog_tpu.train.dist import make_mesh

        dft = DeviceFeatureTables(
            cfg,
            data.train_dl.ds.store,
            make_mesh(cfg),
            half=cfg.misc.half_feats,
            int8=cfg.misc.int8_feats,
        )
        tables = dft.tables
    if "random_init" in flags:
        state = init_state(cfg, glove, jax.random.PRNGKey(0), batch)
        pred = Predictor(cfg, state.params, glove, tables=tables)
    else:
        ckpt = Path(cfg.misc.tmp_path) / "models" / uid / tag
        pred = Predictor.from_checkpoint(cfg, glove, ckpt, tables=tables)

    out = Path(out) if out else Path(cfg.misc.tmp_path) / "exports" / f"{uid}.vogx"
    plats = tuple(platforms.split(",")) if platforms else None
    path = export_predictor(
        pred,
        batch,
        out,
        platforms=plats,
        feature_encoding=encoding,
        with_tables=with_tables,
        rows=dft.rows if with_tables else None,
    )
    size = sum(f.stat().st_size for f in path.rglob("*") if f.is_file())
    print(f"exported {path} ({size / 1e6:.1f} MB, batch={batch})", flush=True)

    # self-check: artifact vs live predictor on one random request (built
    # at the canonical f32 schema; ExportedPredictor auto-encodes, so any
    # residual diff is the quantization error of the chosen encoding)
    rng = np.random.default_rng(0)
    spec = request_spec(cfg, batch, vid_rows=with_tables)
    req = {}
    for k, s in spec.items():
        if k == "vid_rows":
            n_rows = int(next(iter(tables.values())).shape[0])
            req[k] = (
                rng.integers(0, n_rows, s.shape).astype(s.dtype)
                if n_rows
                else np.zeros(s.shape, s.dtype)
            )
        elif np.issubdtype(s.dtype, np.floating):
            req[k] = rng.normal(scale=0.3, size=s.shape).astype(s.dtype)
        elif k == "tokens":
            req[k] = rng.integers(1, len(glove), s.shape).astype(s.dtype)
        elif k in ("srl_arg_mask", "prop_mask"):
            req[k] = np.ones(s.shape, s.dtype)
        elif k == "seq_len":
            req[k] = np.full(s.shape, 4, s.dtype)
        elif k == "srl_spans":
            req[k] = np.tile(np.array([0, 1], s.dtype), s.shape[:-1] + (1,))
        else:
            req[k] = np.ones(s.shape, s.dtype)
    live = pred(req)
    loaded = ExportedPredictor(path)
    replay = loaded(req)
    d = float(np.max(np.abs(live["scores"] - replay["scores"])))
    print(f"self-check vs live predictor: max |dscore| = {d:.3g}", flush=True)
    return {"path": str(path), "max_abs_diff": d}


if __name__ == "__main__":
    main()
