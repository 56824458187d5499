"""Offline re-scoring interface (reference eval_fn_corr.py §eval_fun):
inline on-device metrics must equal the metrics recomputed from the saved
predictions pickle (VERDICT round 1, item 6)."""

from pathlib import Path

import numpy as np
import pytest

from tests.conftest import small_cfg
from vog_tpu.data import get_data
from vog_tpu.evaluation import eval_fun
from vog_tpu.train import Learner, make_mesh

METRIC_KEYS = ("acc", "vacc", "strict_acc", "cons", "num_pairs", "num_queries")


def _learner(fixture_dir, tmp_path, uid, **over):
    over.setdefault("mdl.name", "img_grnd")
    over.setdefault("ds.conc_type", "spat")
    over.setdefault("train.bs", 4)
    over.setdefault("misc.mesh_data", 1)
    over.setdefault("train.log_every", 1000)
    cfg = small_cfg(fixture_dir, **over)
    cfg.misc.tmp_path = str(tmp_path / "tmp")
    mesh = make_mesh(cfg)
    data = get_data(cfg, global_batch_size=cfg.train.bs * mesh.shape["data"])
    return Learner(uid, data, cfg, mesh=mesh), data, cfg


@pytest.mark.parametrize("conc_type", ["spat", "sep"])
def test_rescored_metrics_match_inline(fixture_dir, tmp_path, conc_type):
    lrn, data, cfg = _learner(
        fixture_dir, tmp_path, f"off_{conc_type}", **{"ds.conc_type": conc_type}
    )
    inline = lrn.validate()
    pred_file = (
        Path(cfg.misc.tmp_path) / "predictions" / f"off_{conc_type}_valid_0.pkl"
    )
    assert pred_file.exists()
    rescored = eval_fun(pred_file, "valid", cfg)
    for k in METRIC_KEYS:
        assert np.isclose(inline[k], rescored[k], atol=1e-7), (
            k, inline[k], rescored[k],
        )


def test_rescore_train_split_rejected(fixture_dir, tmp_path):
    lrn, data, cfg = _learner(fixture_dir, tmp_path, "off_tr")
    lrn._run_eval(data.valid_dl, "valid")
    pred_file = Path(cfg.misc.tmp_path) / "predictions" / "off_tr_valid_0.pkl"
    with pytest.raises(ValueError, match="deterministic"):
        eval_fun(pred_file, "train", cfg)


def test_rescore_cli(fixture_dir, tmp_path):
    lrn, data, cfg = _learner(fixture_dir, tmp_path, "off_cli")
    inline = lrn.validate()
    pred_file = Path(cfg.misc.tmp_path) / "predictions" / "off_cli_valid_0.pkl"

    from vog_tpu.cli.eval import main

    m = main(
        [
            "off_cli",
            f"--pred_file={pred_file}",
            "--split=valid",
            f"--ds.data_dir={cfg.ds.data_dir}",
            f"--ds.prop_dim={cfg.ds.prop_dim}",
            f"--ds.seg_dim={cfg.ds.seg_dim}",
            f"--ds.glove_dim={cfg.ds.glove_dim}",
            "--ds.conc_type=spat",
        ]
    )
    assert np.isclose(m["acc"], inline["acc"], atol=1e-7)
