"""int8-quantized device feature tables (misc.int8_feats): 4x less HBM
than f32, per-proposal-vector symmetric scales, dequantized inside the
jitted gather.  Quantization error must stay ≲1% relative per vector and
the trained pipeline must run end-to-end."""

import numpy as np

import jax

from tests.conftest import small_cfg
from vog_tpu.data.device_store import (
    DeviceFeatureTables,
    _pack_rows,
    gather_from_tables,
    store_elem_bytes,
    table_bytes,
)
from vog_tpu.data.loader import get_data


def test_pack_rows_int8_error_bound(rng):
    # fc6-like activations: non-negative, heavy-tailed
    feats = np.abs(rng.normal(size=(6, 3, 4, 32))).astype(np.float32) ** 2
    packed = _pack_rows({"feats": feats}, np.float32, int8=True)
    assert packed["feats"].dtype == np.int8
    # width 3*4*32 = 384 is lane-aligned -> 3-D row-contiguous layout
    assert packed["feats"].shape == (6, 3, 128)
    assert packed["feats_scale"].shape == (6, 3 * 4)
    deq = (
        packed["feats"].reshape(6, 3, 4, 32).astype(np.float32)
        * packed["feats_scale"].reshape(6, 3, 4, 1)
    )
    err = np.abs(deq - feats)
    # per-vector bound: half a quantization bin = scale/2
    bound = packed["feats_scale"].reshape(6, 3, 4, 1) * 0.5 + 1e-9
    assert np.all(err <= bound)
    # relative error vs vector magnitude small
    rel = np.linalg.norm(deq - feats) / np.linalg.norm(feats)
    assert rel < 0.01, rel


def test_pack_rows_zero_vector_safe():
    feats = np.zeros((2, 1, 2, 8), np.float32)
    packed = _pack_rows({"feats": feats}, np.float32, int8=True)
    assert np.all(packed["feats"] == 0)
    assert np.all(packed["feats_scale"] == 1.0)  # no div-by-zero


def test_gather_int8_matches_host_within_tolerance(fixture_dir):
    cfg = small_cfg(fixture_dir, **{"ds.conc_type": "spat"})
    data = get_data(cfg, cfg.train.bs)
    ds = data.train_dl.ds
    host = ds.__getitem__(2, np.random.default_rng(123))
    tables = DeviceFeatureTables(cfg, ds.store, int8=True)
    assert tables.tables["feats"].dtype == jax.numpy.int8
    ds.device_rows = tables.rows
    dev = ds.__getitem__(2, np.random.default_rng(123))
    gathered = gather_from_tables(
        {k: jax.numpy.asarray(v)[None] for k, v in dev.items()}, tables.tables
    )
    got = np.asarray(gathered["props"][0])
    ref = host["props"]
    # elementwise bounded by half a bin of that vector's scale
    rel = np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1e-9)
    assert rel < 0.01, rel
    assert gathered["props"].dtype == jax.numpy.float32


def test_sharded_gather_int8(fixture_dir):
    """Row-sharded int8 tables through the psum_scatter collective must
    dequantize identically to the replicated int8 gather."""
    import pytest

    from vog_tpu.train.dist import make_mesh
    from vog_tpu.data.device_store import sharded_gather_from_tables

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    cfg = small_cfg(fixture_dir, **{"ds.conc_type": "spat", "misc.mesh_data": 4})
    mesh = make_mesh(cfg)
    data = get_data(cfg, cfg.train.bs * 4)
    ds = data.train_dl.ds
    rep = DeviceFeatureTables(cfg, ds.store, int8=True)
    shd = DeviceFeatureTables(cfg, ds.store, mesh, shard=True, int8=True)
    assert shd.sharded and shd.tables["feats"].dtype == jax.numpy.int8
    ds.device_rows = shd.rows
    from vog_tpu.train.dist import shard_batch

    batch = shard_batch(next(iter(data.train_dl)), mesh)
    out_s = jax.jit(lambda b, t: sharded_gather_from_tables(b, t, mesh))(
        batch, shd.tables
    )
    out_r = gather_from_tables(batch, rep.tables)
    np.testing.assert_allclose(
        np.asarray(out_s["props"]), np.asarray(out_r["props"]), rtol=0, atol=0
    )
    np.testing.assert_allclose(
        np.asarray(out_s["seg_feats"]),
        np.asarray(out_r["seg_feats"]),
        rtol=0,
        atol=0,
    )


def test_learner_int8_store_e2e(fixture_dir, tmp_path):
    from vog_tpu.train.learner import Learner

    cfg = small_cfg(
        fixture_dir,
        **{
            "ds.conc_type": "spat",
            "ds.device_store": "on",
            "misc.int8_feats": True,
            "train.epochs": 1,
            "misc.tmp_path": str(tmp_path),
            "misc.mesh_data": 1,
        },
    )
    data = get_data(cfg, cfg.train.bs)
    learner = Learner("int8store", data, cfg)
    assert learner._device_store
    assert learner._tables["feats"].dtype == jax.numpy.int8
    metrics = learner.fit(epochs=1)
    assert np.isfinite(metrics["val_loss"])
    assert 0.0 <= metrics["acc"] <= 1.0


def test_store_sizing_accounts_dtype():
    cfg = small_cfg("/tmp")
    b4 = table_bytes(cfg, 100)
    cfg.misc.half_feats = True
    assert table_bytes(cfg, 100) == b4 // 2
    cfg.misc.int8_feats = True
    assert store_elem_bytes(cfg) == 1
    assert table_bytes(cfg, 100) == b4 // 4
