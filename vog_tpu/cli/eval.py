"""Eval-only entry point (reference ``--only_val`` path of main_dist.py).

  python -m vog_tpu.cli.eval <uid> [--split=valid|test] [overrides...]
  python -m vog_tpu.cli.eval <uid> --pred_file=tmp/predictions/...pkl \
      [--split=valid] [overrides...]

First form loads the uid's last checkpoint when present, scores the split,
writes the predictions pickle, prints the metric dict.  Second form
re-scores a saved predictions file offline (reference
``eval_fn_corr.py §eval_fun(predictions_file, split)``) — no model, no
checkpoint, no device step.
"""

from __future__ import annotations

import sys
from pathlib import Path

from vog_tpu.cli.train import parse_argv
from vog_tpu.config import (
    apply_matmul_precision,
    get_default_cfg,
    post_proc_config,
    update_from_dict,
)
from vog_tpu.data import get_data
from vog_tpu.train import Learner, make_mesh


def main(argv=None):
    uid, overrides, flags = parse_argv(argv if argv is not None else sys.argv[1:])
    split = overrides.pop("split", "valid")
    tag = overrides.pop("tag", "last")  # e.g. --tag=best
    pred_file = overrides.pop("pred_file", None)
    yml = overrides.pop("cfg", None)
    cfg = get_default_cfg(yml)
    update_from_dict(cfg, overrides)
    post_proc_config(cfg)
    if cfg.misc.platform:
        # same authoritative pin as cli/train.py (env alone is overridden
        # by site hooks)
        import jax

        jax.config.update("jax_platforms", cfg.misc.platform)
    apply_matmul_precision(cfg)

    if pred_file:
        from vog_tpu.evaluation import eval_fun

        m = eval_fun(pred_file, split, cfg)
        print(f"rescored {pred_file} [{split}]: {m}")
        return m

    mesh = make_mesh(cfg)
    data = get_data(cfg, global_batch_size=cfg.train.bs * mesh.shape["data"])
    learner = Learner(uid, data, cfg, mesh=mesh)
    ckpt = Path(cfg.misc.tmp_path) / "models" / uid / tag
    if ckpt.exists():
        learner.load(tag=tag)
    else:
        learner.log(f"no checkpoint at {ckpt}; evaluating fresh init")
    m = learner.testing() if split == "test" else learner.validate()
    learner.log(f"{split} metrics: {m}")
    return m


if __name__ == "__main__":
    main()
