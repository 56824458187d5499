"""Graceful preemption (train.save_on_preempt): SIGTERM mid-epoch ->
batch-granular blocking checkpoint -> fit() returns; resume reproduces
the uninterrupted run bit-for-bit.  TensorBoard mirroring
(misc.tensorboard_dir) is covered here too (both SURVEY §5 aux rows)."""

import os
import signal

import numpy as np

from tests.conftest import small_cfg
from vog_tpu.data import get_data
from vog_tpu.train import Learner, make_mesh


def _learner(fixture_dir, tmp_path, uid, **over):
    over.setdefault("mdl.name", "img_grnd")
    over.setdefault("ds.conc_type", "svsq")
    over.setdefault("train.bs", 4)
    over.setdefault("misc.mesh_data", 1)
    cfg = small_cfg(fixture_dir, **over)
    cfg.misc.tmp_path = str(tmp_path / "tmp" / uid)
    mesh = make_mesh(cfg)
    data = get_data(cfg, global_batch_size=cfg.train.bs * mesh.shape["data"])
    return Learner(uid, data, cfg, mesh=mesh)


def _params(lrn):
    import jax

    return jax.tree.leaves(jax.device_get(lrn.state.params))


def test_sigterm_handler_wiring(fixture_dir, tmp_path):
    lrn = _learner(fixture_dir, tmp_path, "pw")
    prev = lrn._install_preempt()
    assert prev is not None and not lrn._preempted
    os.kill(os.getpid(), signal.SIGTERM)  # handled at next bytecode
    assert lrn._preempted
    lrn._restore_preempt(prev)
    # previous disposition restored (pytest default = TERM kills; just
    # check our handler is no longer installed)
    assert signal.getsignal(signal.SIGTERM) is prev[signal.SIGTERM]


def test_preempt_mid_epoch_resume_bit_identical(fixture_dir, tmp_path):
    """SIGTERM lands after dispatch 3 of epoch 0 (deterministic: raised
    from the main thread between dispatches); the preempted run saves at
    batch 3, and resume + the remaining epochs match an uninterrupted
    2-epoch run exactly."""
    over = {"train.epochs": 2}
    full = _learner(fixture_dir, tmp_path, "ppA", **over)
    full.fit()
    want = _params(full)

    pre = _learner(fixture_dir, tmp_path, "ppB", **over)
    orig = pre._train_step
    calls = {"n": 0}

    def step(*a, **kw):
        out = orig(*a, **kw)
        calls["n"] += 1
        if calls["n"] == 3:
            os.kill(os.getpid(), signal.SIGTERM)
        return out

    pre._train_step = step
    pre.fit()
    assert pre._preempted
    assert pre.epoch == 0 and pre.batch_in_epoch == 3
    meta = (pre.ckpt_dir / "last.meta.json").read_text()
    assert '"batch_in_epoch": 3' in meta

    res = _learner(
        fixture_dir, tmp_path, "ppB", **{**over, "train.resume": True}
    )
    assert res.epoch == 0 and res.batch_in_epoch == 3
    res.fit(epochs=2)  # rest of epoch 0 + epoch 1
    got = _params(res)
    for a, b in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(res.state.step) == int(full.state.step)


def test_preempt_disabled(fixture_dir, tmp_path):
    lrn = _learner(
        fixture_dir, tmp_path, "pd", **{"train.save_on_preempt": False}
    )
    assert lrn._install_preempt() is None


def test_tensorboard_mirror(fixture_dir, tmp_path):
    import pytest

    tf = pytest.importorskip("tensorflow")
    tb_dir = tmp_path / "tb"
    lrn = _learner(
        fixture_dir,
        tmp_path,
        "tb1",
        **{"train.epochs": 1, "misc.tensorboard_dir": str(tb_dir)},
    )
    lrn.fit()
    event_files = list((tb_dir / "tb1").glob("events.out.tfevents.*"))
    assert event_files, "no TB event file written"
    tags = set()
    for ev in tf.compat.v1.train.summary_iterator(str(event_files[0])):
        for v in ev.summary.value:
            tags.add(v.tag)
    assert "train/loss" in tags and "valid/acc" in tags, tags
