import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import small_cfg
from vog_tpu.model import compute_loss
from vog_tpu.sampling import assemble_batch, view_dims
from vog_tpu.train.state import build_model, example_batch


def _clip(cfg, batch_size=2, seed=0):
    rng = np.random.default_rng(seed)
    b = example_batch(cfg, batch_size)
    # randomize so outputs are nontrivial
    for k in ("props", "prop_boxes", "seg_feats"):
        b[k] = rng.normal(size=b[k].shape).astype(np.float32)
    b["targets"] = (rng.uniform(size=b["targets"].shape) > 0.9).astype(np.float32)
    b["tokens"] = rng.integers(1, 20, b["tokens"].shape).astype(np.int32)
    b = {k: jnp.asarray(v) for k, v in b.items()}
    return assemble_batch(b, cfg.ds.conc_type)


def _glove(cfg, vocab_size=32):
    rng = np.random.default_rng(1)
    return rng.normal(size=(vocab_size, cfg.mdl.emb_dim)).astype(np.float32)


@pytest.mark.parametrize("name", ["img_grnd", "vid_grnd", "vog"])
@pytest.mark.parametrize("conc_type", ["svsq", "spat"])
def test_forward_shapes(fixture_dir, name, conc_type):
    cfg = small_cfg(fixture_dir, **{"mdl.name": name, "ds.conc_type": conc_type})
    model = build_model(cfg, _glove(cfg))
    clip = _clip(cfg)
    variables = model.init(jax.random.PRNGKey(0), clip, deterministic=True)
    logits = model.apply(variables, clip, deterministic=True)
    Bm, Fp, Pp = view_dims(
        conc_type, cfg.ds.num_cmp, cfg.ds.num_frms, cfg.ds.num_prop_per_frm
    )
    assert logits.shape == (2 * Bm, cfg.ds.max_srl_args, Fp * Pp)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize("name", ["img_grnd", "vid_grnd", "vog"])
def test_grads_finite_and_nonzero(fixture_dir, name):
    cfg = small_cfg(fixture_dir, **{"mdl.name": name, "ds.conc_type": "temp"})
    model = build_model(cfg, _glove(cfg))
    clip = _clip(cfg)
    variables = model.init(jax.random.PRNGKey(0), clip, deterministic=True)

    def loss_fn(params):
        logits = model.apply({"params": params}, clip, deterministic=True)
        loss, _ = compute_loss(logits, clip)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    total = sum(float(jnp.abs(g).sum()) for g in flat)
    assert total > 0


def test_frozen_glove_gets_no_grad(fixture_dir):
    cfg = small_cfg(fixture_dir, **{"mdl.name": "img_grnd"})
    assert not cfg.mdl.train_embeddings
    model = build_model(cfg, _glove(cfg))
    clip = _clip(cfg)
    variables = model.init(jax.random.PRNGKey(0), clip, deterministic=True)

    def loss_fn(params):
        logits = model.apply({"params": params}, clip, deterministic=True)
        return compute_loss(logits, clip)[0]

    grads = jax.grad(loss_fn)(variables["params"])
    g = np.asarray(grads["lang"]["embed"])
    assert np.abs(g).max() == 0.0


def test_dropout_changes_train_forward(fixture_dir):
    cfg = small_cfg(fixture_dir, **{"mdl.name": "vog", "mdl.dropout": 0.5})
    model = build_model(cfg, _glove(cfg))
    clip = _clip(cfg)
    variables = model.init(jax.random.PRNGKey(0), clip, deterministic=True)
    l1 = model.apply(
        variables, clip, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    l2 = model.apply(
        variables, clip, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)}
    )
    assert np.abs(np.asarray(l1) - np.asarray(l2)).max() > 0


def test_arg_mask_invariance(fixture_dir):
    """Scores of valid args must not depend on padded args' content."""
    cfg = small_cfg(fixture_dir, **{"mdl.name": "vog"})
    model = build_model(cfg, _glove(cfg))
    clip = dict(_clip(cfg))
    clip["srl_arg_mask"] = clip["srl_arg_mask"].at[:, -1].set(0.0)
    variables = model.init(jax.random.PRNGKey(0), clip, deterministic=True)
    l1 = model.apply(variables, clip, deterministic=True)

    clip2 = dict(clip)
    clip2["srl_spans"] = clip["srl_spans"].at[:, -1].set(3)
    clip2["srl_roles"] = clip["srl_roles"].at[:, -1].set(5)
    l2 = model.apply(variables, clip2, deterministic=True)
    # valid args unchanged
    np.testing.assert_allclose(
        np.asarray(l1[:, :-1]), np.asarray(l2[:, :-1]), atol=1e-5
    )
