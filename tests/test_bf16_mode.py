"""bf16 activation policy (cfg.mdl.dtype="bfloat16", model/dtypes.py).

Contract: params + optimizer state + logits + loss stay fp32 (checkpoints
and eval are unaffected); only activations drop to bf16.  The mode must
track fp32 closely (loose bf16-scale tolerances) and run end-to-end
through the train step and the Learner's validate path."""

import numpy as np

import jax
import jax.numpy as jnp

from tests.conftest import small_cfg
from vog_tpu.data.loader import get_data
from vog_tpu.sampling import assemble_batch
from vog_tpu.train.dist import make_mesh, shard_batch
from vog_tpu.train.state import init_state, make_train_step


def _setup(fixture_dir, dtype, **over):
    cfg = small_cfg(fixture_dir, **{"mdl.dtype": dtype, **over})
    cfg.misc.mesh_data = 1
    cfg.misc.mesh_model = 1
    mesh = make_mesh(cfg)
    data = get_data(cfg, cfg.train.bs)
    glove = data.vocab.vectors
    state = init_state(cfg, glove, jax.random.PRNGKey(0), cfg.train.bs)
    return cfg, mesh, data, state


def test_params_fp32_and_logits_fp32_and_close(fixture_dir):
    logits = {}
    for dtype in ("float32", "bfloat16"):
        cfg, mesh, data, state = _setup(fixture_dir, dtype)
        dtypes = {
            str(jnp.asarray(x).dtype)
            for x in jax.tree_util.tree_leaves(state.params)
        }
        assert dtypes == {"float32"}
        batch = shard_batch(next(iter(data.train_dl)), mesh, False)
        clip = assemble_batch(batch, cfg.ds.conc_type)
        out = state.apply_fn({"params": state.params}, clip, deterministic=True)
        assert out.dtype == jnp.float32
        logits[dtype] = np.asarray(out)
    a, b = logits["bfloat16"], logits["float32"]
    # bf16 activations: ~8 mantissa bits; logits track within ~1e-2 of
    # the logit scale at init
    scale = max(float(np.abs(b).max()), 1e-6)
    assert float(np.abs(a - b).max()) <= 3e-2 * scale


def test_bf16_step_tracks_fp32(fixture_dir):
    losses = {}
    updates = {}
    for dtype in ("float32", "bfloat16"):
        cfg, mesh, data, state = _setup(fixture_dir, dtype)
        step = jax.jit(make_train_step(cfg))
        batch = shard_batch(next(iter(data.train_dl)), mesh, False)
        before = jax.tree_util.tree_leaves(state.params)
        new_state, aux = step(state, batch, jax.random.PRNGKey(1))
        after = jax.tree_util.tree_leaves(new_state.params)
        losses[dtype] = float(aux["loss"])
        updates[dtype] = np.concatenate(
            [np.asarray(a - b).ravel() for a, b in zip(after, before)]
        )
    assert np.isfinite(losses["bfloat16"])
    # bf16 has ~3 decimal digits; the scalar loss should still agree ~1%
    assert abs(losses["bfloat16"] - losses["float32"]) <= (
        2e-2 * abs(losses["float32"])
    )
    # the Adam update direction must broadly agree (not a bitwise check:
    # Adam divides out the grad magnitude, so eps-region elements flip
    # freely under bf16 rounding — measured cosine at these dims ≈0.989;
    # a systematically wrong backward lands near 0)
    a, b = updates["bfloat16"], updates["float32"]
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))
    assert cos > 0.97, cos
    assert np.all(np.isfinite(a))


def test_bf16_learner_validate_end_to_end(fixture_dir, tmp_path):
    from vog_tpu.train import Learner

    cfg, mesh, data, _ = _setup(fixture_dir, "bfloat16")
    cfg.misc.tmp_path = str(tmp_path)
    lrn = Learner("bf16ev", data, cfg, mesh=mesh)
    metrics = lrn.validate()
    for k in ("acc", "vacc", "strict_acc", "cons", "val_loss"):
        assert np.isfinite(float(metrics[k])), k


def test_bf16_with_rank_loss_and_sep(fixture_dir):
    cfg, mesh, data, state = _setup(
        fixture_dir, "bfloat16",
        **{"ds.conc_type": "sep", "train.loss_type": "rank"},
    )
    step = jax.jit(make_train_step(cfg))
    batch = shard_batch(next(iter(data.train_dl)), mesh, False)
    _, aux = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(aux["loss"]))
