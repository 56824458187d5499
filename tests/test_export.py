"""AOT serving export (vog_tpu/export.py): the deserialized .vogx
artifact must reproduce the live Predictor's outputs and enforce the
request schema."""

import numpy as np

import jax
import jax.numpy as jnp
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


def _dequant_host(req):
    """Host-side inverse of encode_features(int8) — the exact contract the
    compact artifact implements: artifact(encoded) == live(dequant(encoded))."""
    out = {k: v for k, v in req.items()}
    out["props"] = out["props"].astype(np.float32) * out.pop("props_scale")[..., None]
    out["seg_feats"] = (
        out["seg_feats"].astype(np.float32) * out.pop("seg_scale")[..., None]
    )
    return out


def test_export_int8_encoding(fixture_dir, tmp_path):
    """Compact int8 request artifact: payload 4x smaller, outputs equal
    the live predictor fed the dequantized features."""
    from vog_tpu.export import encode_features

    cfg, pred, glove = _predictor(fixture_dir)
    path = export_predictor(pred, 2, tmp_path / "q.vogx", feature_encoding="int8")
    loaded = ExportedPredictor(path)
    req = _request(cfg, glove)

    enc = encode_features(req, "int8")
    assert enc["props"].dtype == np.int8
    assert enc["props"].nbytes == req["props"].nbytes // 4
    assert enc["seg_feats"].nbytes == req["seg_feats"].nbytes // 4

    replay = loaded(enc)  # pre-encoded (wire-compact) request
    live_dq = pred(_dequant_host(enc))
    np.testing.assert_allclose(
        replay["scores"], live_dq["scores"], rtol=1e-5, atol=1e-5
    )
    # auto-encode convenience: raw f32 request gives the identical result
    auto = loaded(req)
    np.testing.assert_array_equal(auto["scores"], replay["scores"])
    # and quantization error stays small end-to-end vs the f32 live path
    live = pred(req)
    scale = np.abs(live["scores"]).max() + 1e-9
    assert np.abs(replay["scores"] - live["scores"]).max() / scale < 0.05


def test_export_bf16_encoding(fixture_dir, tmp_path):
    from vog_tpu.export import encode_features

    cfg, pred, glove = _predictor(fixture_dir, conc="temp")
    path = export_predictor(pred, 2, tmp_path / "h.vogx", feature_encoding="bf16")
    loaded = ExportedPredictor(path)
    req = _request(cfg, glove)
    enc = encode_features(req, "bf16")
    assert enc["props"].nbytes == req["props"].nbytes // 2
    replay = loaded(enc)
    # live fed the bf16-rounded features must match the artifact tightly
    dq = dict(req)
    dq["props"] = enc["props"].astype(np.float32)
    dq["seg_feats"] = enc["seg_feats"].astype(np.float32)
    live_dq = pred(dq)
    np.testing.assert_allclose(
        replay["scores"], live_dq["scores"], rtol=1e-5, atol=1e-5
    )


def test_export_with_tables_vid_rows(fixture_dir, tmp_path):
    """with_tables artifact: feature tables ship inside the .vogx, the
    request carries vid_rows only, outputs match the live device-store
    predictor exactly."""
    from vog_tpu.data.device_store import DeviceFeatureTables

    cfg = small_cfg(fixture_dir, **{"ds.conc_type": "spat", "misc.mesh_data": 1})
    data = get_data(cfg, cfg.train.bs)
    glove = data.vocab.vectors
    state = init_state(cfg, glove, jax.random.PRNGKey(0), 2)
    ds = data.valid_dl.ds
    tables = DeviceFeatureTables(cfg, ds.store)
    ds.device_rows = tables.rows
    rows_batch = next(iter(data.valid_dl))  # carries vid_rows, B=2
    assert "vid_rows" in rows_batch

    pred = Predictor(cfg, state.params, glove, tables=tables.tables)
    path = export_predictor(pred, 2, tmp_path / "t.vogx", with_tables=True)
    assert (path / "tables.npz").exists()
    loaded = ExportedPredictor(path)
    live, replay = pred(rows_batch), loaded(rows_batch)
    np.testing.assert_allclose(
        replay["scores"], live["scores"], rtol=1e-6, atol=1e-6
    )
    np.testing.assert_array_equal(replay["pred_vid"], live["pred_vid"])
    # feature-free request: payload is the metadata only
    assert "props" not in loaded.manifest["schema"]
    assert "vid_rows" in loaded.manifest["schema"]


def test_export_with_tables_requires_tables(fixture_dir, tmp_path):
    cfg, pred, glove = _predictor(fixture_dir)
    with pytest.raises(ValueError):
        export_predictor(pred, 2, tmp_path / "x.vogx", with_tables=True)


def test_export_with_tables_bf16(fixture_dir, tmp_path):
    """bf16 (half_feats) tables roundtrip through the artifact: np.savez
    writes ml_dtypes.bfloat16 as a void dtype np.load can't hand back to
    jax (round-5 bug — the with_tables artifact failed to LOAD); the
    exporter now ships bf16 as uint16 + manifest dtype and the loader
    views it back."""
    from vog_tpu.data.device_store import DeviceFeatureTables

    cfg = small_cfg(
        fixture_dir,
        **{"ds.conc_type": "spat", "misc.mesh_data": 1,
           "misc.half_feats": True},
    )
    data = get_data(cfg, cfg.train.bs)
    glove = data.vocab.vectors
    state = init_state(cfg, glove, jax.random.PRNGKey(0), 2)
    ds = data.valid_dl.ds
    tables = DeviceFeatureTables(cfg, ds.store, half=True)
    assert any(
        v.dtype == jnp.bfloat16 for v in tables.tables.values()
    ), "half_feats should give bf16 tables"
    ds.device_rows = tables.rows
    rows_batch = next(iter(data.valid_dl))

    pred = Predictor(cfg, state.params, glove, tables=tables.tables)
    path = export_predictor(pred, 2, tmp_path / "tb.vogx", with_tables=True)
    loaded = ExportedPredictor(path)
    for k, v in loaded._tables.items():
        assert v.dtype == tables.tables[k].dtype, k
    live, replay = pred(rows_batch), loaded(rows_batch)
    np.testing.assert_allclose(
        replay["scores"], live["scores"], rtol=1e-5, atol=1e-5
    )
