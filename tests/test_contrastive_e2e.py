"""Contrastive SPAT end-to-end learnability: after a short train, VOGNet
must beat chance at picking the right VIDEO (VAcc chance = 1/ncmp) — the
whole point of the 4-video concatenation (SURVEY §0)."""

import numpy as np
import pytest

from tests.conftest import small_cfg
from vog_tpu.data import get_data
from vog_tpu.train import Learner, make_mesh


@pytest.mark.slow
def test_spat_vog_learns_video_discrimination(fixture_dir, tmp_path):
    cfg = small_cfg(
        fixture_dir,
        **{
            "mdl.name": "vog",
            "ds.conc_type": "spat",
            "train.lr": 3e-3,
            "train.bs": 4,
            "train.epochs": 28,
            "train.pos_weight": 10.0,  # SPAT dilutes positives to ~1%
            "train.log_every": 1000,
            "misc.mesh_data": 1,
        },
    )
    cfg.misc.tmp_path = str(tmp_path / "tmp")
    mesh = make_mesh(cfg)
    data = get_data(cfg, global_batch_size=4)
    lrn = Learner("spat_e2e", data, cfg, mesh=mesh)
    lrn.fit()
    tm = lrn._run_eval(data.train_dl, "train")
    # video discrimination on the training data must clearly beat the
    # 1/4 chance level, grounding acc must beat 1/(4*P) candidates chance
    assert tm["vacc"] > 0.65, tm
    assert tm["acc"] > 0.55, tm  # chance: vacc 1/4, acc < 1/20
    # generalization above chance on the tiny val split (chance: vacc 1/4,
    # acc well under 0.1); kept loose — the tiny fixture makes exact val
    # numbers trajectory-sensitive
    m = lrn.validate()
    assert m["vacc"] > 0.3, m
    assert m["acc"] > 0.12, m
