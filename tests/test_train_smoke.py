"""End-to-end smoke: short train on the fixture must learn (SURVEY §4 item 5),
checkpoints must round-trip, artifacts must land in the reference layout."""

import json
import pickle
from pathlib import Path

import jax
import numpy as np
import pytest

from tests.conftest import small_cfg
from vog_tpu.data import get_data
from vog_tpu.train import Learner, make_mesh


def _learner(fixture_dir, tmp_path, uid, **over):
    over.setdefault("mdl.name", "img_grnd")
    over.setdefault("ds.conc_type", "svsq")
    over.setdefault("train.lr", 3e-3)
    over.setdefault("train.bs", 4)
    over.setdefault("misc.mesh_data", 1)
    over.setdefault("train.log_every", 1000)
    cfg = small_cfg(fixture_dir, **over)
    cfg.misc.tmp_path = str(tmp_path / "tmp")
    mesh = make_mesh(cfg)
    data = get_data(cfg, global_batch_size=cfg.train.bs * mesh.shape["data"])
    return Learner(uid, data, cfg, mesh=mesh), data, cfg


def test_train_learns_and_writes_artifacts(fixture_dir_big, tmp_path):
    # the big fixture (160 train samples) is the one where generalization
    # is learnable — see conftest.fixture_dir_big; measured valid acc
    # 0.70–0.83 across seeds, chance level 1/P = 0.2
    lrn, data, cfg = _learner(
        fixture_dir_big, tmp_path, "smoke", **{"train.epochs": 15}
    )
    m = lrn.fit()
    # metric dict schema (reference eval_fn metric names)
    for k in ("acc", "vacc", "strict_acc", "cons", "val_loss"):
        assert k in m, k
    # learning happened: train-split accuracy far above the 1/P chance level
    tm = lrn._run_eval(data.train_dl, "train")
    assert tm["acc"] > 0.7, tm
    # and it generalized: held-out accuracy well above chance
    assert m["acc"] > 0.45, m

    # artifact layout: tmp/{txt_logs,models,predictions,ext_logs}/uid…
    tmp = Path(cfg.misc.tmp_path)
    assert (tmp / "txt_logs" / "smoke.txt").exists()
    assert (tmp / "ext_logs" / "smoke.jsonl").exists()
    preds = sorted((tmp / "predictions").glob("smoke_valid_*.pkl"))
    assert preds
    with open(preds[-1], "rb") as f:
        p = pickle.load(f)
    assert len(p) == len(data.valid_dl.ds)
    assert {"ann_idx", "pred_vid", "pred_prop", "iou"} <= set(p[0])
    # json log lines parse and carry metrics
    lines = (tmp / "ext_logs" / "smoke.jsonl").read_text().strip().split("\n")
    rec = json.loads(lines[-1])
    assert "acc" in rec and "epoch" in rec


def test_checkpoint_roundtrip_and_resume(fixture_dir, tmp_path):
    lrn, data, cfg = _learner(fixture_dir, tmp_path, "ck", **{"train.epochs": 2})
    lrn.fit()
    step0 = int(lrn.state.step)
    params0 = jax.tree.map(np.asarray, lrn.state.params)

    lrn2, _, _ = _learner(fixture_dir, tmp_path, "ck", **{"train.epochs": 2})
    lrn2.load()
    assert int(lrn2.state.step) == step0
    params1 = jax.tree.map(np.asarray, lrn2.state.params)
    jax.tree.map(np.testing.assert_array_equal, params0, params1)
    assert lrn2.epoch == lrn.epoch

    # validate-only path reproduces metrics from the restored state
    m1 = lrn.validate()
    m2 = lrn2.validate()
    assert abs(m1["acc"] - m2["acc"]) < 1e-9


def test_best_checkpoint_tracked(fixture_dir, tmp_path):
    lrn, _, cfg = _learner(fixture_dir, tmp_path, "best", **{"train.epochs": 3})
    lrn.fit()
    assert (Path(cfg.misc.tmp_path) / "models" / "best" / "best").exists()
    assert lrn.best_metric > 0


def test_mid_epoch_resume_skips_batches(fixture_dir, tmp_path):
    """Iterator state (epoch + batch position) round-trips through the
    checkpoint; resume fast-forwards past consumed batches."""
    lrn, data, cfg = _learner(fixture_dir, tmp_path, "mid", **{"train.epochs": 1})
    n_batches = len(data.train_dl)
    lrn.batch_in_epoch = 3  # simulate a crash after 3 batches
    lrn.save("last")

    lrn2, data2, _ = _learner(fixture_dir, tmp_path, "mid", **{"train.epochs": 1})
    lrn2.load()
    assert lrn2.batch_in_epoch == 3
    step0 = int(lrn2.state.step)
    lrn2.fit(epochs=1)
    # only the remaining batches of the epoch ran
    assert int(lrn2.state.step) - step0 == n_batches - 3
    assert lrn2.batch_in_epoch == 0  # reset at epoch end


def test_cosine_schedule_derives_total_steps(fixture_dir, tmp_path):
    """With lr_schedule=cosine and total_steps=0 the Learner must derive
    the horizon from the data (round-1 advisor finding: LR collapsed to ~0
    right after warmup because decay_steps fell back to warmup_steps+1)."""
    lrn, data, cfg = _learner(
        fixture_dir,
        tmp_path,
        "cos",
        **{"train.epochs": 4, "train.lr_schedule": "cosine", "train.warmup_steps": 2},
    )
    assert cfg.train.total_steps == 4 * len(data.train_dl)
    assert cfg.train.total_steps > cfg.train.warmup_steps + 1
    # the schedule at step warmup+1 must still be near peak LR, not ~0
    import optax

    sched = optax.warmup_cosine_decay_schedule(
        0.0, cfg.train.lr, cfg.train.warmup_steps, cfg.train.total_steps
    )
    assert float(sched(cfg.train.warmup_steps + 1)) > 0.5 * cfg.train.lr


def test_rank_loss_training_runs(fixture_dir, tmp_path):
    """loss_type=rank (SEP cross-video ranking) trains without NaNs."""
    lrn, data, cfg = _learner(
        fixture_dir,
        tmp_path,
        "rank",
        **{
            "train.epochs": 2,
            "ds.conc_type": "sep",
            "mdl.name": "img_grnd",
            "train.loss_type": "rank",
        },
    )
    m = lrn.fit()
    assert np.isfinite(m["val_loss"])
    assert 0.0 <= m["acc"] <= 1.0


def test_async_checkpoint_roundtrip(fixture_dir, tmp_path):
    """Non-blocking saves (async orbax commit thread) are durable after
    the wait barrier and round-trip through a fresh Learner."""
    lrn, data, cfg = _learner(
        fixture_dir,
        tmp_path,
        "async",
        **{"train.epochs": 1, "train.ckpt_every_steps": 1},
    )
    assert cfg.train.async_ckpt  # default on
    lrn.fit()  # every step issues a non-blocking save; fit() ends with a barrier
    step0 = int(lrn.state.step)
    params0 = jax.tree.map(np.asarray, lrn.state.params)

    lrn2, _, _ = _learner(
        fixture_dir, tmp_path, "async", **{"train.epochs": 1}
    )
    lrn2.load()
    assert int(lrn2.state.step) == step0
    jax.tree.map(
        np.testing.assert_array_equal,
        params0,
        jax.tree.map(np.asarray, lrn2.state.params),
    )


def test_crash_resume_equals_uninterrupted(fixture_dir, tmp_path):
    """Failure-recovery equivalence: epoch-boundary crash + resume must
    reproduce the uninterrupted run bit-for-bit (deterministic data
    stream keyed on (seed, epoch, idx); dropout rng folded from step)."""
    lrn_a, _, _ = _learner(fixture_dir, tmp_path / "a", "full", **{"train.epochs": 2})
    lrn_a.fit()
    params_a = jax.tree.map(np.asarray, lrn_a.state.params)

    lrn_b1, _, _ = _learner(fixture_dir, tmp_path / "b", "crash", **{"train.epochs": 2})
    lrn_b1.fit(epochs=1)  # "crash" after epoch 1 (ckpt written at epoch end)
    lrn_b2, _, _ = _learner(fixture_dir, tmp_path / "b", "crash", **{"train.epochs": 2})
    lrn_b2.load()
    lrn_b2.fit(epochs=1)  # resume runs the remaining epoch
    params_b = jax.tree.map(np.asarray, lrn_b2.state.params)

    assert int(lrn_a.state.step) == int(lrn_b2.state.step)
    jax.tree.map(np.testing.assert_array_equal, params_a, params_b)


def test_load_across_optimizer_structures(fixture_dir, tmp_path):
    """A checkpoint trained WITH train.skip_nonfinite (wrapped opt state)
    restores into a Learner WITHOUT it: params+step recovered exactly,
    opt state reinitialized (eval/serving exactness)."""
    lrn, data, _ = _learner(
        fixture_dir, tmp_path, "xopt",
        **{"train.epochs": 1, "train.skip_nonfinite": 5},
    )
    lrn.fit()
    params0 = jax.tree.map(np.asarray, lrn.state.params)
    step0 = int(lrn.state.step)
    m0 = lrn.validate()

    lrn2, _, _ = _learner(fixture_dir, tmp_path, "xopt", **{"train.epochs": 1})
    lrn2.load()
    assert int(lrn2.state.step) == step0
    jax.tree.map(
        np.testing.assert_array_equal,
        params0,
        jax.tree.map(np.asarray, lrn2.state.params),
    )
    m1 = lrn2.validate()
    assert abs(m0["acc"] - m1["acc"]) < 1e-9


def test_load_drops_stale_checkpoint_params(fixture_dir, tmp_path):
    """A checkpoint carrying a param the current model no longer has
    (e.g. the removed dead lang/q_proj) restores through the load()
    fallback: the stale leaf is dropped with a log notice, everything
    else recovers exactly.  Missing NEW params must still raise."""
    import orbax.checkpoint as ocp

    lrn, data, _ = _learner(
        fixture_dir, tmp_path, "stale", **{"train.epochs": 1}
    )
    lrn.fit()
    params0 = jax.tree.map(np.asarray, lrn.state.params)
    step0 = int(lrn.state.step)

    # re-save the checkpoint with an injected stale leaf (simulates a
    # ckpt written before a param was removed from the model)
    aug = jax.tree.map(np.asarray, lrn.state.params)
    aug["lang"]["q_proj"] = {
        "kernel": np.zeros((4, 4), np.float32),
        "bias": np.zeros((4,), np.float32),
    }
    path = tmp_path / "stale_ckpt"
    ocp.StandardCheckpointer().save(
        path,
        {
            "params": aug,
            "opt_state": jax.tree.map(np.asarray, lrn.state.opt_state),
            "step": np.asarray(step0),
        },
    )

    lrn2, _, _ = _learner(fixture_dir, tmp_path, "stale2", **{"train.epochs": 1})
    lrn2.load(path=str(path))
    assert int(lrn2.state.step) == step0
    jax.tree.map(
        np.testing.assert_array_equal,
        params0,
        jax.tree.map(np.asarray, lrn2.state.params),
    )
    log_txt = (lrn2.dirs["txt_logs"] / "stale2.txt").read_text()
    assert "stale param leaves" in log_txt and "lang/q_proj" in log_txt
