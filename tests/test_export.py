"""AOT serving export (vog_tpu/export.py): the deserialized .vogx
artifact must reproduce the live Predictor's outputs and enforce the
request schema."""

import numpy as np

import jax
import pytest

from tests.conftest import small_cfg
from vog_tpu.data.loader import get_data
from vog_tpu.export import ExportedPredictor, export_predictor, request_spec
from vog_tpu.serve import Predictor
from vog_tpu.train.state import init_state


def _predictor(fixture_dir, conc="spat"):
    cfg = small_cfg(fixture_dir, **{"ds.conc_type": conc})
    data = get_data(cfg, cfg.train.bs)
    glove = data.vocab.vectors
    state = init_state(cfg, glove, jax.random.PRNGKey(0), 2)
    return cfg, Predictor(cfg, state.params, glove), glove


def _request(cfg, glove, B=2, seed=0):
    rng = np.random.default_rng(seed)
    req = {}
    for k, s in request_spec(cfg, B).items():
        if np.issubdtype(s.dtype, np.floating):
            req[k] = rng.normal(scale=0.3, size=s.shape).astype(s.dtype)
        elif k == "tokens":
            req[k] = rng.integers(1, len(glove), s.shape).astype(s.dtype)
        elif k == "seq_len":
            req[k] = np.full(s.shape, 4, s.dtype)
        elif k == "srl_spans":
            req[k] = np.tile(np.array([0, 1], s.dtype), s.shape[:-1] + (1,))
        else:
            req[k] = np.ones(s.shape, s.dtype)
    return req


def test_export_roundtrip_matches_live(fixture_dir, tmp_path):
    cfg, pred, glove = _predictor(fixture_dir)
    path = export_predictor(pred, 2, tmp_path / "m.vogx")
    assert (path / "fn.bin").exists() and (path / "manifest.json").exists()
    loaded = ExportedPredictor(path)
    req = _request(cfg, glove)
    live, replay = pred(req), loaded(req)
    assert set(replay) == set(live)
    np.testing.assert_allclose(
        replay["scores"], live["scores"], rtol=1e-6, atol=1e-6
    )
    np.testing.assert_array_equal(replay["pred_vid"], live["pred_vid"])
    np.testing.assert_array_equal(replay["pred_prop"], live["pred_prop"])


def test_export_schema_enforced(fixture_dir, tmp_path):
    cfg, pred, glove = _predictor(fixture_dir, conc="temp")
    loaded = ExportedPredictor(export_predictor(pred, 2, tmp_path / "t.vogx"))
    req = _request(cfg, glove)
    bad = dict(req)
    del bad["tokens"]
    with pytest.raises(KeyError):
        loaded(bad)
    bad = dict(req)
    bad["props"] = bad["props"][:1]  # wrong batch size
    with pytest.raises(ValueError):
        loaded(bad)


def test_export_serving_loop_drop_in(fixture_dir, tmp_path):
    """ExportedPredictor serves through ServingLoop unchanged."""
    from vog_tpu.serving import ServingLoop

    cfg, pred, glove = _predictor(fixture_dir)
    loaded = ExportedPredictor(export_predictor(pred, 2, tmp_path / "s.vogx"))
    req0 = {k: v[0] for k, v in _request(cfg, glove).items() if k != "batch_mask"}
    loop = ServingLoop(loaded, max_batch=2, max_wait_ms=1)
    try:
        out = loop(req0)
        assert "pred_vid" in out and np.isfinite(out["pred_score"]).all()
    finally:
        loop.close()
