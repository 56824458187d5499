"""Device-resident feature tables (vog_tpu/data/device_store.py):
vid_rows batches + in-step gather must be numerically identical to the
host props/seg_feats path."""

import numpy as np

import jax

from tests.conftest import small_cfg
from vog_tpu.data.device_store import (
    DeviceFeatureTables,
    fits_device_store,
    gather_from_tables,
)
from vog_tpu.data.loader import get_data
from vog_tpu.train.dist import make_mesh, shard_batch
from vog_tpu.train.state import init_state, make_train_step


def _data(fixture_dir, **over):
    cfg = small_cfg(fixture_dir, **over)
    return cfg, get_data(cfg, cfg.train.bs)


def test_vid_rows_batch_schema(fixture_dir):
    cfg, data = _data(fixture_dir, **{"ds.conc_type": "spat"})
    ds = data.train_dl.ds
    tables = DeviceFeatureTables(cfg, ds.store)
    ds.device_rows = tables.rows
    s = ds.__getitem__(0, np.random.default_rng(0))
    assert "vid_rows" in s and "props" not in s and "seg_feats" not in s
    assert s["vid_rows"].shape == (cfg.ds.num_cmp,)
    # boxes/targets path unchanged
    assert s["prop_boxes"].shape[-1] == 5
    assert s["targets"].sum() >= 0


def test_gather_matches_host_path(fixture_dir):
    cfg, data = _data(fixture_dir, **{"ds.conc_type": "spat"})
    ds = data.train_dl.ds
    rng = np.random.default_rng(3)
    host = ds.__getitem__(2, np.random.default_rng(123))
    tables = DeviceFeatureTables(cfg, ds.store)
    ds.device_rows = tables.rows
    dev = ds.__getitem__(2, np.random.default_rng(123))  # same group sample
    gathered = gather_from_tables(
        {k: jax.numpy.asarray(v)[None] for k, v in dev.items()}, tables.tables
    )
    np.testing.assert_array_equal(np.asarray(gathered["props"][0]), host["props"])
    np.testing.assert_array_equal(
        np.asarray(gathered["seg_feats"][0]), host["seg_feats"]
    )


def test_train_step_loss_identical(fixture_dir):
    cfg, data = _data(
        fixture_dir, **{"ds.conc_type": "spat", "misc.mesh_data": 1}
    )
    mesh = make_mesh(cfg)
    glove = data.vocab.vectors
    state = init_state(cfg, glove, jax.random.PRNGKey(0), cfg.train.bs)
    rng = jax.random.PRNGKey(1)

    ds = data.train_dl.ds
    host_batch = next(iter(data.train_dl))
    step_h = jax.jit(make_train_step(cfg))
    _, aux_h = step_h(state, shard_batch(host_batch, mesh), rng)

    tables = DeviceFeatureTables(cfg, ds.store, mesh)
    ds.device_rows = tables.rows
    data.train_dl.epoch = 0  # replay the same epoch ordering + group RNG
    dev_batch = next(iter(data.train_dl))
    step_d = jax.jit(make_train_step(cfg, device_store=True))
    _, aux_d = step_d(state, shard_batch(dev_batch, mesh), rng, tables.tables)

    assert float(aux_h["loss"]) == float(aux_d["loss"])


def test_fits_budget_gate():
    cfg = small_cfg("/tmp")  # dims tiny
    assert fits_device_store(cfg, 100)
    cfg.ds.prop_dim = 2048
    cfg.ds.num_prop_per_frm = 100  # P100 at real scale
    assert not fits_device_store(cfg, 15000)


def test_learner_device_store_e2e(fixture_dir, tmp_path):
    """Learner with ds.device_store=on trains + evals on the fixture."""
    from vog_tpu.train.learner import Learner

    cfg = small_cfg(
        fixture_dir,
        **{
            "ds.conc_type": "spat",
            "ds.device_store": "on",
            "train.epochs": 1,
            "misc.tmp_path": str(tmp_path),
            "misc.mesh_data": 1,
        },
    )
    data = get_data(cfg, cfg.train.bs)
    learner = Learner("devstore", data, cfg)
    assert learner._device_store
    metrics = learner.fit(epochs=1)
    assert np.isfinite(metrics["val_loss"])
    assert 0.0 <= metrics["acc"] <= 1.0


def test_sharded_gather_matches_dense():
    """Row-sharded tables + psum_scatter collective gather == local take
    (8-device virtual mesh, rows deliberately non-divisible pre-padding)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from vog_tpu.data.device_store import sharded_gather_from_tables

    if len(jax.devices()) < 4:
        import pytest

        pytest.skip("needs >=4 devices")
    devs = np.asarray(jax.devices()[:4]).reshape(4, 1)
    mesh = Mesh(devs, ("data", "model"))
    rng = np.random.default_rng(0)
    N, F, Pp, D, Dv = 8, 3, 2, 4, 5  # N divisible by data=4 (pre-padded)
    feats = rng.normal(size=(N, F, Pp, D)).astype(np.float32)
    seg = rng.normal(size=(N, F, Dv)).astype(np.float32)
    # tables are stored 2-D (rows flattened) — see DeviceFeatureTables
    tables = {
        "feats": jax.device_put(
            feats.reshape(N, -1), NamedSharding(mesh, P("data"))
        ),
        "seg": jax.device_put(
            seg.reshape(N, -1), NamedSharding(mesh, P("data"))
        ),
    }
    B, V = 8, 3
    rows = rng.integers(0, N, size=(B, V)).astype(np.int32)
    batch = {
        "vid_rows": jax.device_put(rows, NamedSharding(mesh, P("data"))),
        "prop_mask": jax.device_put(
            np.ones((B, V, F, Pp), np.float32), NamedSharding(mesh, P("data"))
        ),
        "other": jax.device_put(
            np.arange(B, dtype=np.float32), NamedSharding(mesh, P("data"))
        ),
    }
    out = jax.jit(
        lambda b, t: sharded_gather_from_tables(b, t, mesh)
    )(batch, tables)
    np.testing.assert_allclose(np.asarray(out["props"]), feats[rows], rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(out["seg_feats"]), seg[rows], rtol=0, atol=0)
    assert "vid_rows" not in out and "other" in out


def test_sharded_train_step_loss_identical(fixture_dir):
    """Full train step with row-sharded tables on a ('data'=4) mesh matches
    the host props/seg_feats path bit-for-bit in loss."""
    cfg, data = _data(
        fixture_dir, **{"ds.conc_type": "spat", "misc.mesh_data": 4}
    )
    if len(jax.devices()) < 4:
        import pytest

        pytest.skip("needs >=4 devices")
    mesh = make_mesh(cfg)
    glove = data.vocab.vectors
    gbs = cfg.train.bs * 4
    data = get_data(cfg, gbs)
    state = init_state(cfg, glove, jax.random.PRNGKey(0), gbs)
    rng = jax.random.PRNGKey(1)

    ds = data.train_dl.ds
    host_batch = next(iter(data.train_dl))
    step_h = jax.jit(make_train_step(cfg))
    _, aux_h = step_h(state, shard_batch(host_batch, mesh), rng)

    tables = DeviceFeatureTables(cfg, ds.store, mesh, shard=True)
    assert tables.sharded
    assert tables.tables["feats"].shape[0] % 4 == 0  # padded rows
    ds.device_rows = tables.rows
    data.train_dl.epoch = 0
    dev_batch = next(iter(data.train_dl))
    step_d = jax.jit(make_train_step(cfg, device_store=True, store_mesh=mesh))
    _, aux_d = step_d(state, shard_batch(dev_batch, mesh), rng, tables.tables)

    assert float(aux_h["loss"]) == float(aux_d["loss"])


def test_learner_sharded_store_e2e(fixture_dir, tmp_path):
    """Learner with ds.device_store=shard on a ('data'=4) mesh: tables
    row-shard over the mesh and the collective gather drives a real
    train + eval epoch (the P100-at-100GB code path at fixture scale)."""
    import pytest

    from vog_tpu.train.learner import Learner

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    cfg = small_cfg(
        fixture_dir,
        **{
            "ds.conc_type": "spat",
            "ds.device_store": "shard",
            "train.epochs": 1,
            "misc.tmp_path": str(tmp_path),
            "misc.mesh_data": 4,
        },
    )
    data = get_data(cfg, cfg.train.bs * 4)
    learner = Learner("shardstore", data, cfg)
    assert learner._device_store and learner._store_mesh is not None
    assert learner._tables["feats"].sharding.spec == ("data",)
    metrics = learner.fit(epochs=1)
    assert np.isfinite(metrics["val_loss"])
    assert 0.0 <= metrics["acc"] <= 1.0


def test_half_tables_roundtrip():
    """half=True stores bf16 tables; gather casts back to f32 with at
    most bf16 quantization error."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.asarray(jax.devices()[:1]).reshape(1, 1)
    mesh = Mesh(devs, ("data", "model"))
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(4, 2, 3, 8)).astype(np.float32)
    seg = rng.normal(size=(4, 2, 6)).astype(np.float32)
    tables = {
        "feats": jax.device_put(
            feats.reshape(4, -1).astype(jax.numpy.bfloat16),
            NamedSharding(mesh, P()),
        ),
        "seg": jax.device_put(
            seg.reshape(4, -1).astype(jax.numpy.bfloat16),
            NamedSharding(mesh, P()),
        ),
    }
    rows = np.asarray([[0, 3], [2, 1]], np.int32)
    out = gather_from_tables(
        {
            "vid_rows": jax.numpy.asarray(rows),
            "prop_mask": jax.numpy.ones((2, 2, 2, 3)),
        },
        tables,
    )
    assert out["props"].dtype == jax.numpy.float32
    np.testing.assert_allclose(
        np.asarray(out["props"]), feats[rows], rtol=8e-3, atol=8e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["seg_feats"]), seg[rows], rtol=8e-3, atol=8e-3
    )
