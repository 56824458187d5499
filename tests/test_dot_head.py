"""Opt-in factorized dot-product grounding head: runs, learns."""

import numpy as np

from tests.conftest import small_cfg
from vog_tpu.data import get_data
from vog_tpu.train import Learner, make_mesh


def test_dot_head_learns(fixture_dir, tmp_path):
    cfg = small_cfg(
        fixture_dir,
        **{
            "mdl.name": "img_grnd",
            "mdl.head_type": "dot",
            "ds.conc_type": "svsq",
            "train.lr": 3e-3,
            "train.epochs": 20,
            "train.bs": 4,
            "misc.mesh_data": 1,
            "train.log_every": 1000,
        },
    )
    cfg.misc.tmp_path = str(tmp_path / "tmp")
    mesh = make_mesh(cfg)
    data = get_data(cfg, global_batch_size=4)
    lrn = Learner("dot", data, cfg, mesh=mesh)
    lrn.fit()
    tm = lrn._run_eval(data.train_dl, "train")
    assert tm["acc"] > 0.6, tm  # chance = ~0.2
