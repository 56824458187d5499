"""Smaller runtime flags: bf16 feature storage, profiler trace, vocab npz."""

from pathlib import Path

import jax
import numpy as np

from tests.conftest import small_cfg
from vog_tpu.data import get_data
from vog_tpu.data.vocab import Vocab
from vog_tpu.train import Learner, make_mesh
from vog_tpu.train.dist import shard_batch


def test_half_feats_step_runs(fixture_dir, tmp_path):
    cfg = small_cfg(
        fixture_dir,
        **{"mdl.name": "img_grnd", "misc.half_feats": True, "misc.mesh_data": 1},
    )
    cfg.misc.tmp_path = str(tmp_path / "tmp")
    mesh = make_mesh(cfg)
    data = get_data(cfg, global_batch_size=cfg.train.bs)
    lrn = Learner("hf", data, cfg, mesh=mesh)
    batch = next(iter(data.train_dl))
    sb = shard_batch(batch, mesh, half_feats=True)
    assert str(sb["props"].dtype) == "bfloat16"
    assert str(sb["prop_boxes"].dtype) == "float32"  # geometry stays fp32
    state, aux = lrn._train_step(lrn.state, sb, lrn.rng)
    assert np.isfinite(float(aux["loss"]))


def test_profiler_trace_written(fixture_dir, tmp_path):
    cfg = small_cfg(
        fixture_dir,
        **{
            "mdl.name": "img_grnd",
            "train.epochs": 1,
            "misc.mesh_data": 1,
            "misc.profile_steps": 2,
            "train.log_every": 1000,
        },
    )
    cfg.misc.tmp_path = str(tmp_path / "tmp")
    cfg.misc.profile_dir = str(tmp_path / "trace")
    mesh = make_mesh(cfg)
    data = get_data(cfg, global_batch_size=cfg.train.bs)
    lrn = Learner("prof", data, cfg, mesh=mesh)
    lrn.fit()
    traces = list(Path(cfg.misc.profile_dir).rglob("*.trace.json.gz"))
    assert traces, "no profiler trace written"


def test_vocab_npz_roundtrip(tmp_path, rng):
    words = ["alpha", "beta", "gamma"]
    vecs = rng.normal(size=(3, 8)).astype(np.float32)
    v = Vocab(words, vecs)
    v.save_npz(tmp_path / "v.npz")
    v2 = Vocab.from_npz(tmp_path / "v.npz")
    assert v2.itos == v.itos
    np.testing.assert_array_equal(v2.vectors, v.vectors)
    assert v2.encode(["beta", "zzz"]) == [v.stoi["beta"], 1]


def test_eval_every_skips_intermediate_evals(fixture_dir, tmp_path, monkeypatch):
    """train.eval_every=3: only epochs 0 and the final epoch validate in a
    4-epoch fit; metric jsonl carries exactly those records."""
    import json as _json
    from pathlib import Path

    from tests.conftest import small_cfg
    from vog_tpu.data import get_data
    from vog_tpu.train import Learner, make_mesh

    cfg = small_cfg(
        fixture_dir,
        **{
            "mdl.name": "img_grnd",
            "ds.conc_type": "svsq",
            "train.bs": 4,
            "train.epochs": 4,
            "train.eval_every": 3,
            "misc.mesh_data": 1,
            "train.log_every": 1000,
        },
    )
    cfg.misc.tmp_path = str(tmp_path / "tmp")
    mesh = make_mesh(cfg)
    data = get_data(cfg, cfg.train.bs)
    lrn = Learner("evev", data, cfg, mesh=mesh)
    m = lrn.fit()
    assert "acc" in m  # final epoch always evaluated
    recs = [
        _json.loads(l)
        for l in (Path(cfg.misc.tmp_path) / "ext_logs" / "evev.jsonl")
        .read_text()
        .strip()
        .split("\n")
    ]
    assert [r["epoch"] for r in recs] == [0, 3]


def test_skip_nonfinite_updates(fixture_dir):
    """train.skip_nonfinite: a batch that produces non-finite grads leaves
    params and step-progress usable (update dropped), and a following good
    batch trains normally."""
    import jax.numpy as jnp

    from tests.conftest import small_cfg
    from vog_tpu.data import get_data
    from vog_tpu.train.dist import make_mesh, shard_batch
    from vog_tpu.train.state import init_state, make_train_step

    cfg = small_cfg(
        fixture_dir,
        **{
            "mdl.name": "img_grnd",
            "ds.conc_type": "svsq",
            "train.bs": 2,
            "train.skip_nonfinite": 5,
            "misc.mesh_data": 1,
        },
    )
    mesh = make_mesh(cfg)
    data = get_data(cfg, cfg.train.bs)
    state = init_state(cfg, data.vocab.vectors, jax.random.PRNGKey(0), cfg.train.bs)
    step = jax.jit(make_train_step(cfg))
    rng = jax.random.PRNGKey(1)

    good = next(iter(data.train_dl))
    bad = {k: np.copy(v) for k, v in good.items()}
    bad["props"] = np.full_like(bad["props"], np.inf)

    p0 = jax.tree.map(np.asarray, state.params)
    state, aux = step(state, shard_batch(bad, mesh), rng)
    assert not np.isfinite(float(aux["loss"]))  # loss reports the blow-up
    p1 = jax.tree.map(np.asarray, state.params)
    jax.tree.map(np.testing.assert_array_equal, p0, p1)  # update dropped

    state, aux = step(state, shard_batch(good, mesh), rng)
    assert np.isfinite(float(aux["loss"]))
    p2 = jax.tree.map(np.asarray, state.params)
    # good step actually updated
    changed = jax.tree.leaves(
        jax.tree.map(lambda a, b: float(np.abs(a - b).max()), p1, p2)
    )
    assert max(changed) > 0


def test_skip_nonfinite_learner_run_continues(fixture_dir, tmp_path):
    """A poisoned sample (inf features) under train.skip_nonfinite: the
    Learner logs the dropped update instead of raising (check_nans stays
    on) and finishes the epoch with finite eval metrics."""
    from tests.conftest import small_cfg
    from vog_tpu.data import get_data
    from vog_tpu.train import Learner, make_mesh

    cfg = small_cfg(
        fixture_dir,
        **{
            "mdl.name": "img_grnd",
            "ds.conc_type": "svsq",
            "train.bs": 4,
            "train.epochs": 1,
            "train.skip_nonfinite": 100,
            "train.log_every": 1,  # log every step so NaN losses are seen
            "misc.mesh_data": 1,
        },
    )
    cfg.misc.tmp_path = str(tmp_path / "tmp")
    assert cfg.misc.check_nans
    mesh = make_mesh(cfg)
    data = get_data(cfg, cfg.train.bs)
    store = data.train_dl.ds.store
    vid = next(v for v in store.videos() if v.startswith("tr"))
    feats, boxes, scores, seg = store._cache[vid]
    store._cache[vid] = (np.full_like(feats, np.inf), boxes, scores, seg)

    lrn = Learner("nfr", data, cfg, mesh=mesh)
    m = lrn.fit()  # must not raise FloatingPointError
    assert np.isfinite(m["val_loss"])
    log = (tmp_path / "tmp" / "txt_logs" / "nfr.txt").read_text()
    assert "update dropped by skip_nonfinite" in log


def test_compile_cache_config(tmp_path):
    """misc.compile_cache routes the persistent XLA compilation cache to
    the given dir (and creates it); "" leaves the jax default alone."""
    from vog_tpu.config import apply_matmul_precision
    from tests.conftest import small_cfg as _sc

    cfg = _sc(str(tmp_path))
    cache = tmp_path / "jc"
    cfg.misc.compile_cache = str(cache)
    apply_matmul_precision(cfg)
    assert cache.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(cache)
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 1.0
