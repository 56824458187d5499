"""Index-only input path (vog_tpu/data/ann_store.py): the in-jit
expansion of an index-only batch must be field-for-field bit-identical to
the host ``__getitem__`` path, and Learner training/eval through the
annotation store must match the vid_rows-only path exactly."""

import numpy as np

import jax

from tests.conftest import small_cfg
from vog_tpu.data.ann_store import DeviceAnnTables, expand_index_batch
from vog_tpu.data.device_store import DeviceFeatureTables
from vog_tpu.data.loader import get_data
from vog_tpu.train.dist import make_mesh, shard_batch
from vog_tpu.train.state import init_state, make_train_step


def _data(fixture_dir, **over):
    cfg = small_cfg(fixture_dir, **over)
    return cfg, get_data(cfg, cfg.train.bs)


def _install_ann_store(cfg, data):
    """Feature tables + annotation tables on all three splits; returns the
    merged tables dict (what the Learner passes to the step)."""
    dft = DeviceFeatureTables(cfg, data.train_dl.ds.store)
    dsets = {
        "train": data.train_dl.ds,
        "valid": data.valid_dl.ds,
        "test": data.test_dl.ds,
    }
    dat = DeviceAnnTables(cfg, dsets, dft.rows)
    for s, d in dsets.items():
        d.device_rows = dft.rows
        d.index_only = True
        d.ann_row_offset = dat.split_offset[s]
    return {**dft.tables, **dat.tables}


def test_index_only_sample_schema(fixture_dir):
    cfg, data = _data(fixture_dir, **{"ds.conc_type": "spat"})
    tables = _install_ann_store(cfg, data)
    assert "ann_i32" in tables and "vid_box" in tables
    s = data.train_dl.ds.__getitem__(0, np.random.default_rng(0))
    assert set(s.keys()) == {"vid_rows", "ann_row", "pos_vid", "ann_idx"}
    # valid split rows are offset past the train split
    sv = data.valid_dl.ds.__getitem__(0, np.random.default_rng(0))
    assert int(sv["ann_row"]) == len(data.train_dl.ds)


def test_expand_matches_host_batch(fixture_dir):
    cfg, data = _data(fixture_dir, **{"ds.conc_type": "spat"})
    ds = data.train_dl.ds
    # host reference batch (no stores installed yet)
    host = [ds.__getitem__(i, np.random.default_rng([7, i])) for i in (0, 3, 5)]
    tables = _install_ann_store(cfg, data)
    idx = [
        ds.__getitem__(i, np.random.default_rng([7, i])) for i in (0, 3, 5)
    ]
    batch = {
        k: jax.numpy.asarray(np.stack([s[k] for s in idx])) for k in idx[0]
    }
    out = jax.jit(lambda b: expand_index_batch(b, tables, cfg))(batch)
    for k in (
        "tokens",
        "seq_len",
        "verb_idx",
        "srl_roles",
        "srl_spans",
        "srl_arg_mask",
        "gt_boxes",
        "gt_frame_mask",
        "prop_boxes",
        "prop_mask",
        "targets",
        "pos_vid",
    ):
        ref = np.stack([s[k] for s in host])
        got = np.asarray(out[k])
        assert got.dtype == ref.dtype, k
        np.testing.assert_array_equal(got, ref, err_msg=k)


def test_train_step_loss_identical(fixture_dir):
    cfg, data = _data(fixture_dir, **{"ds.conc_type": "spat", "misc.mesh_data": 1})
    mesh = make_mesh(cfg)
    glove = data.vocab.vectors
    state = init_state(cfg, glove, jax.random.PRNGKey(0), cfg.train.bs)
    rng = jax.random.PRNGKey(1)

    host_batch = next(iter(data.train_dl))
    step_h = jax.jit(make_train_step(cfg))
    _, aux_h = step_h(state, shard_batch(host_batch, mesh), rng)

    tables = _install_ann_store(cfg, data)
    data.train_dl.epoch = 0  # replay the same epoch ordering + group RNG
    idx_batch = next(iter(data.train_dl))
    assert "ann_row" in idx_batch and "tokens" not in idx_batch
    step_i = jax.jit(make_train_step(cfg, device_store=True))
    _, aux_i = step_i(state, shard_batch(idx_batch, mesh), rng, tables)

    assert float(aux_h["loss"]) == float(aux_i["loss"])


def _fit(fixture_dir, tmp_path, uid, ann_store, conc="spat"):
    from vog_tpu.train.learner import Learner

    cfg, data = _data(
        fixture_dir,
        **{
            "ds.conc_type": conc,
            "ds.device_store": "on",
            "ds.ann_store": ann_store,
            "train.epochs": 1,
            "misc.mesh_data": 1,
        },
    )
    cfg.misc.tmp_path = str(tmp_path / uid)
    learner = Learner(uid, data, cfg)
    assert learner._ann_store == (ann_store == "auto")
    metrics = learner.fit()
    params = jax.device_get(learner.state.params)
    return metrics, params


def test_learner_fit_identical_with_ann_store(fixture_dir, tmp_path):
    m_off, p_off = _fit(fixture_dir, tmp_path, "ann_off", "off")
    m_on, p_on = _fit(fixture_dir, tmp_path, "ann_on", "auto")
    assert m_off["acc"] == m_on["acc"]
    assert m_off["val_loss"] == m_on["val_loss"]
    jax.tree.map(np.testing.assert_array_equal, p_off, p_on)


def test_multi_dispatch_with_ann_store(fixture_dir, tmp_path):
    """Fused K-step dispatch over index-only batches: params identical to
    single-step dispatch with the same stores."""
    from vog_tpu.train.learner import Learner

    params = []
    for uid, k in (("ann_k1", 1), ("ann_k3", 3)):
        cfg, data = _data(
            fixture_dir,
            **{
                "ds.conc_type": "temp",
                "ds.device_store": "on",
                "train.epochs": 1,
                "train.steps_per_dispatch": k,
                "misc.mesh_data": 1,
            },
        )
        cfg.misc.tmp_path = str(tmp_path / uid)
        learner = Learner(uid, data, cfg)
        assert learner._ann_store
        learner.fit()
        params.append(jax.device_get(learner.state.params))
    jax.tree.map(np.testing.assert_array_equal, *params)
