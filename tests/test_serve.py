"""Predictor: checkpoint restore + jitted inference, consistent with the
evaluator's argmax semantics."""

import numpy as np

from tests.conftest import small_cfg
from vog_tpu.data import get_data
from vog_tpu.serve import Predictor
from vog_tpu.train import Learner, make_mesh


def test_predictor_from_checkpoint(fixture_dir, tmp_path):
    cfg = small_cfg(
        fixture_dir,
        **{
            "mdl.name": "img_grnd",
            "train.epochs": 2,
            "train.bs": 4,
            "misc.mesh_data": 1,
            "train.log_every": 1000,
        },
    )
    cfg.misc.tmp_path = str(tmp_path / "tmp")
    mesh = make_mesh(cfg)
    data = get_data(cfg, global_batch_size=4)
    lrn = Learner("srv", data, cfg, mesh=mesh)
    lrn.fit()

    ckpt = tmp_path / "tmp" / "models" / "srv" / "last"
    pred = Predictor.from_checkpoint(cfg, data.vocab.vectors, ckpt)

    batch = next(iter(data.valid_dl))
    out = pred(batch)
    B, V, F, P = batch["prop_mask"].shape
    A = batch["srl_arg_mask"].shape[1]
    assert out["scores"].shape == (B, A, V, F, P)
    assert out["pred_vid"].shape == (B, A, F)
    assert out["pred_box"].shape == (B, A, F, 4)
    assert np.isfinite(out["pred_score"]).all()

    # prediction argmax must agree with the evaluator's candidate argmax
    cand = out["scores"].transpose(0, 1, 3, 2, 4).reshape(B, A, F, V * P)
    choice = cand.argmax(-1)
    np.testing.assert_array_equal(out["pred_vid"], choice // P)
    np.testing.assert_array_equal(out["pred_prop"], choice % P)

    # determinism
    out2 = pred(batch)
    np.testing.assert_allclose(out["scores"], out2["scores"])


def test_predictor_device_store(fixture_dir):
    """Predictor with device-resident tables: a vid_rows request scores
    identically to the same request carrying the full feature arrays."""
    import jax

    from vog_tpu.data.device_store import DeviceFeatureTables
    from vog_tpu.train.state import init_state

    cfg = small_cfg(
        fixture_dir,
        **{"mdl.name": "img_grnd", "ds.conc_type": "spat", "misc.mesh_data": 1},
    )
    data = get_data(cfg, global_batch_size=2)
    state = init_state(cfg, data.vocab.vectors, jax.random.PRNGKey(0), 2)

    ds = data.valid_dl.ds
    full_batch = next(iter(data.valid_dl))  # carries props/seg_feats

    tables = DeviceFeatureTables(cfg, ds.store)
    ds.device_rows = tables.rows
    data.valid_dl.epoch = 0  # replay the same deterministic eval groups
    rows_batch = next(iter(data.valid_dl))  # carries vid_rows
    assert "vid_rows" in rows_batch and "props" not in rows_batch

    pred_full = Predictor(cfg, state.params, data.vocab.vectors)
    pred_rows = Predictor(
        cfg, state.params, data.vocab.vectors, tables=tables.tables
    )
    out_full = pred_full(full_batch)
    out_rows = pred_rows(rows_batch)
    np.testing.assert_array_equal(out_full["scores"], out_rows["scores"])
    np.testing.assert_array_equal(out_full["pred_vid"], out_rows["pred_vid"])
