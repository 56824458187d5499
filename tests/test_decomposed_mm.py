"""Arg-decomposed first mm layer == materialized path, with shared params
(the variable trees are name-compatible by construction)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import small_cfg
from vog_tpu.model.transformer import RelTransformer, RelTransformerDecomposed


@pytest.mark.parametrize("layers", [1, 2])
def test_decomposed_equals_materialized(fixture_dir, rng, layers):
    cfg = small_cfg(fixture_dir, **{"mdl.mm_tx_layers": layers})
    B, A, T, D, F = 2, 3, 20, cfg.mdl.vis_dim, 10
    m = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(B, A, D)).astype(np.float32))
    mask = jnp.asarray((rng.uniform(size=(B, T)) > 0.2).astype(np.float32))
    mask = mask.at[:, 0].set(1.0)
    fids = jnp.asarray((np.arange(T) // 2).astype(np.int32))

    dec = RelTransformerDecomposed(cfg, n_frames=F)
    variables = dec.init(jax.random.PRNGKey(0), m, g, mask, fids, True)
    out_dec = dec.apply(variables, m, g, mask, fids, True)  # (B*A,T,D)

    # materialized path with the SAME params
    std = RelTransformer(cfg, n_frames=F)
    tokens = (m[:, None] + g[:, :, None]).reshape(B * A, T, D)
    mask_a = jnp.repeat(mask, A, axis=0)
    out_std = std.apply(variables, tokens, mask_a, fids, True)

    np.testing.assert_allclose(
        np.asarray(out_dec), np.asarray(out_std), atol=3e-5, rtol=1e-4
    )


def test_vognet_decomposed_forward_and_grads(fixture_dir, rng):
    from vog_tpu.model import compute_loss
    from vog_tpu.sampling import assemble_batch
    from vog_tpu.train.state import build_model, example_batch

    cfg = small_cfg(fixture_dir, **{"mdl.name": "vog", "ds.conc_type": "spat"})
    assert cfg.mdl.decomposed_mm
    model = build_model(cfg, rng.normal(size=(32, cfg.mdl.emb_dim)).astype(np.float32))
    b = example_batch(cfg, 2)
    b["props"] = rng.normal(size=b["props"].shape).astype(np.float32)
    clip = assemble_batch({k: jnp.asarray(v) for k, v in b.items()}, "spat")
    variables = model.init(jax.random.PRNGKey(0), clip, deterministic=True)

    def loss_fn(p):
        return compute_loss(
            model.apply({"params": p}, clip, deterministic=True), clip
        )[0]

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))
