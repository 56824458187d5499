"""Sanitizer mode (misc.checkify): compiled NaN guards fire on bad input."""

import numpy as np
import pytest

from tests.conftest import small_cfg
from vog_tpu.data import get_data
from vog_tpu.train import Learner, make_mesh
from vog_tpu.train.dist import shard_batch


def test_checkify_clean_and_nan(fixture_dir, tmp_path):
    cfg = small_cfg(
        fixture_dir,
        **{"mdl.name": "img_grnd", "misc.checkify": True, "misc.mesh_data": 1},
    )
    cfg.misc.tmp_path = str(tmp_path / "tmp")
    mesh = make_mesh(cfg)
    data = get_data(cfg, global_batch_size=cfg.train.bs)
    lrn = Learner("ck", data, cfg, mesh=mesh)
    # host batches: the Learner installs a device_put transform on
    # train_dl; this test needs to mutate the numpy batch first
    data.train_dl.transform = None
    batch = next(iter(data.train_dl))
    state, aux = lrn._train_step(lrn.state, shard_batch(batch, mesh), lrn.rng)
    assert np.isfinite(float(aux["loss"]))

    bad = dict(batch)
    bad["props"] = batch["props"].copy()
    bad["props"][0, 0, 0, 0, 0] = np.nan
    with pytest.raises(Exception):  # checkify JaxRuntimeError
        state, aux = lrn._train_step(lrn.state, shard_batch(bad, mesh), lrn.rng)
        float(aux["loss"])
