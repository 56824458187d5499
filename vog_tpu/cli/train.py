"""Training/eval entry point.

Reference parity: ``code/main_dist.py §main_dist`` — fire-style CLI taking
a uid + dotted config overrides, building data/model/loss/eval, wrapping a
Learner and calling fit (or validate-only).  Usage:

  python -m vog_tpu.cli.train <uid> [--cfg=configs/anet_srl_cfg.yml]
      [--ds.conc_type=spat] [--mdl.name=vog] [--train.epochs=5]
      [--only_val] [--only_test]

Distributed: instead of ``torch.distributed.launch`` + NCCL process groups,
a single process drives all local TPU chips through a pjit mesh (SPMD);
multi-host would add ``jax.distributed.initialize`` here.
"""

from __future__ import annotations

import sys
from typing import Dict

from vog_tpu.config import (
    apply_matmul_precision,
    get_default_cfg,
    post_proc_config,
    update_from_dict,
)
from vog_tpu.data import get_data
from vog_tpu.train import Learner, make_mesh


def parse_argv(argv) -> tuple:
    uid, overrides, flags = None, {}, set()
    for a in argv:
        if a.startswith("--"):
            if "=" in a:
                k, v = a[2:].split("=", 1)
                overrides[k] = v
            else:
                flags.add(a[2:])
        elif uid is None:
            uid = a
        else:
            raise SystemExit(f"unexpected positional arg: {a}")
    return uid or "dbg", overrides, flags


def main(argv=None) -> Dict:
    uid, overrides, flags = parse_argv(argv if argv is not None else sys.argv[1:])
    yml = overrides.pop("cfg", None)
    cfg = get_default_cfg(yml)
    update_from_dict(cfg, overrides)
    post_proc_config(cfg)
    if cfg.misc.platform:
        # must precede any backend touch; env JAX_PLATFORMS alone is not
        # authoritative (site hooks re-pin it)
        import jax

        jax.config.update("jax_platforms", cfg.misc.platform)
    apply_matmul_precision(cfg)

    if cfg.misc.multihost:
        # multi-host SPMD (the reference's torch.distributed.launch analog)
        import jax

        jax.distributed.initialize()

    mesh = make_mesh(cfg)
    data = get_data(cfg, global_batch_size=cfg.train.bs * mesh.shape["data"])
    learner = Learner(uid, data, cfg, mesh=mesh)
    learner.log(f"uid={uid} cfg={cfg.to_json()}")

    if "only_val" in flags:
        m = learner.validate()
    elif "only_test" in flags:
        m = learner.testing()
    else:
        m = learner.fit()
    learner.log(f"final metrics: {m}")
    return m


if __name__ == "__main__":
    main()
