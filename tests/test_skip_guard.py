"""skip_nonfinite_guard — cond-free replacement for optax.apply_if_finite.

VERDICT r2 item 3: the guard must keep apply_if_finite's semantics (drop
bad updates, params + inner opt state untouched; give up after
max_consecutive_errors consecutive bad steps so the NaN propagates)
WITHOUT the lax.cond that doubles the traced step graph.  These tests
assert step-for-step equivalence against optax.apply_if_finite itself on
forced-NaN gradient sequences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vog_tpu.train.state import skip_nonfinite_guard


def _params():
    return {
        "w": jnp.asarray(np.random.default_rng(0).normal(size=(4, 3)), jnp.float32),
        "b": jnp.zeros((3,), jnp.float32),
    }


def _inner():
    return optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-2))


def _grad(kind: str, rng):
    g = {
        "w": jnp.asarray(rng.normal(size=(4, 3)), jnp.float32),
        "b": jnp.asarray(rng.normal(size=(3,)), jnp.float32),
    }
    if kind == "nan":
        g["w"] = g["w"].at[0, 0].set(jnp.nan)
    elif kind == "inf":
        g["b"] = g["b"].at[1].set(jnp.inf)
    return g


@pytest.mark.parametrize(
    "sequence",
    [
        ["ok", "nan", "ok", "inf", "nan", "ok"],
        ["nan", "nan", "ok"],
        ["ok", "ok", "ok"],
    ],
)
def test_guard_matches_apply_if_finite(sequence):
    params0 = _params()
    k = 5
    ours = skip_nonfinite_guard(_inner(), k)
    ref = optax.apply_if_finite(_inner(), max_consecutive_errors=k)

    def run(tx):
        params = params0
        st = tx.init(params)
        outs = []
        step = jax.jit(tx.update)
        rng = np.random.default_rng(7)
        for kind in sequence:
            upd, st = step(_grad(kind, rng), st, params)
            params = optax.apply_updates(params, upd)
            outs.append(params)
        return outs, st

    p_ours, st_ours = run(ours)
    p_ref, st_ref = run(ref)
    for a, b in zip(p_ours, p_ref):
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            # not bit-identical: the two graphs fuse differently in XLA
            # (where-select vs cond branch) — allow ~1 ulp
            np.testing.assert_allclose(
                np.asarray(la), np.asarray(lb), rtol=1e-5, atol=1e-8
            )
    assert int(st_ours.notfinite_count) == int(st_ref.notfinite_count)
    assert int(st_ours.total_notfinite) == int(st_ref.total_notfinite)


def test_guard_gives_up_after_max_consecutive():
    """After > max_consecutive_errors consecutive bad steps both the guard
    and apply_if_finite let the NaN through (run aborts downstream)."""
    params0 = _params()
    k = 2
    ours = skip_nonfinite_guard(_inner(), k)
    ref = optax.apply_if_finite(_inner(), max_consecutive_errors=k)
    rng = np.random.default_rng(1)
    seq = ["nan"] * (k + 1)

    def run(tx):
        params = params0
        st = tx.init(params)
        for kind in seq:
            upd, st = tx.update(_grad(kind, rng), st, params)
            params = optax.apply_updates(params, upd)
        return params

    p_ours, p_ref = run(ours), run(ref)
    # the (k+1)-th bad step is applied -> params are poisoned in BOTH
    assert not np.isfinite(np.asarray(p_ours["w"])).all()
    assert not np.isfinite(np.asarray(p_ref["w"])).all()


def test_guard_dropped_step_leaves_state_untouched():
    params0 = _params()
    tx = skip_nonfinite_guard(_inner(), 10)
    st0 = tx.init(params0)
    rng = np.random.default_rng(2)
    upd, st1 = tx.update(_grad("nan", rng), st0, params0)
    for u in jax.tree.leaves(upd):
        np.testing.assert_array_equal(np.asarray(u), 0.0)
    for a, b in zip(
        jax.tree.leaves(st0.inner_state), jax.tree.leaves(st1.inner_state)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(st1.notfinite_count) == 1
    assert int(st1.total_notfinite) == 1


def test_learner_aborts_when_guard_gives_up(fixture_dir, tmp_path):
    """Round-5 regression: a burst of > skip_nonfinite consecutive
    non-finite steps makes the guard give up (the bad update flows
    through, poisoning params — apply_if_finite semantics), after which
    a real run "trained" 10 NaN epochs while logging "update dropped".
    The Learner must abort via the step's guard_notfinite counter
    instead of continuing."""
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
            "train.skip_nonfinite": 2,
            "train.log_every": 1,
            "misc.mesh_data": 1,
        },
    )
    cfg.misc.tmp_path = str(tmp_path / "tmp")
    data = get_data(cfg, cfg.train.bs)
    store = data.train_dl.ds.store
    # poison EVERY train video -> every batch's grads are non-finite, so
    # the guard's consecutive count passes the budget at batch 3
    for vid in store.videos():
        if vid.startswith("tr"):
            feats, boxes, scores, seg = store._cache[vid]
            store._cache[vid] = (
                np.full_like(feats, np.inf), boxes, scores, seg
            )

    lrn = Learner("giveup", data, cfg, mesh=make_mesh(cfg))
    with pytest.raises(FloatingPointError, match="gave up"):
        lrn.fit()
