"""Ring attention (sequence-parallel) parity vs the dense XLA path.

Runs on the virtual 8-device CPU mesh (conftest forces
--xla_force_host_platform_device_count=8): full fwd + grad parity of
``ring_attention`` against ``xla_attention`` over the whole token axis,
with and without the factored relative-frame bias, under a ragged key
mask.  The ring result must match a *full-sequence* softmax — any
block-local normalization bug shows up immediately.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from vog_tpu.kernels.ring_attention import ring_attention
from vog_tpu.model.transformer import xla_attention


def _mesh(n_model: int) -> Mesh:
    devs = np.asarray(jax.devices()[: 2 * n_model]).reshape(2, n_model)
    return Mesh(devs, ("data", "model"))


def _inputs(B=2, H=2, F=8, Pn=8, dh=16, seed=0):
    rng = np.random.default_rng(seed)
    T = F * Pn
    q, k, v = (
        rng.normal(size=(B, H, T, dh)).astype(np.float32) for _ in range(3)
    )
    # ragged key mask; frame 0 always valid (the model invariant)
    mask = (rng.uniform(size=(B, T)) > 0.3).astype(np.float32)
    mask[:, :Pn] = 1.0
    frame_ids = np.repeat(np.arange(F), Pn).astype(np.int32)
    bias = (0.1 * rng.normal(size=(H, F, F))).astype(np.float32)
    return map(jnp.asarray, (q, k, v, mask, bias, frame_ids))


@pytest.mark.parametrize("n_model", [2, 4])
@pytest.mark.parametrize("use_bias", [False, True])
def test_ring_matches_dense_forward(n_model, use_bias):
    q, k, v, mask, bias, fids = _inputs()
    mesh = _mesh(n_model)
    fb = bias if use_bias else None
    fi = fids if use_bias else None
    ref = xla_attention(q, k, v, mask, fb, fi)
    out = jax.jit(
        lambda *a: ring_attention(*a, mesh=mesh, axis="model")
    )(q, k, v, mask, fb, fi)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_matches_dense_grads():
    q, k, v, mask, bias, fids = _inputs(seed=3)
    mesh = _mesh(4)

    def loss_ring(q, k, v, bias):
        o = ring_attention(q, k, v, mask, bias, fids, mesh=mesh)
        return jnp.sum(o * jnp.cos(o))

    def loss_dense(q, k, v, bias):
        o = xla_attention(q, k, v, mask, bias, fids)
        return jnp.sum(o * jnp.cos(o))

    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2, 3)))(q, k, v, bias)
    g_dense = jax.jit(jax.grad(loss_dense, argnums=(0, 1, 2, 3)))(q, k, v, bias)
    for a, b in zip(g_ring, g_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_vognet_forward_and_grads_sp_parity(fixture_dir):
    """Full VOGNet fwd + grads with mdl.sp_attention on a (2,2) mesh must
    match the single-device path (the ring only re-schedules the same
    softmax)."""
    from tests.conftest import small_cfg
    from tests.test_models import _clip, _glove
    from vog_tpu.model import compute_loss
    from vog_tpu.train.dist import set_sequence_parallel
    from vog_tpu.train.state import build_model

    # decomposed_mm off so the materialized RelMultiHeadAttention (bias
    # SP path) runs alongside the object transformer's plain MHA (no-bias
    # SP path); the decomposed/pallas mm layer stays single-chip by design
    cfg = small_cfg(
        fixture_dir,
        **{
            "mdl.name": "vog",
            "ds.conc_type": "spat",
            "mdl.decomposed_mm": False,
        },
    )
    model = build_model(cfg, _glove(cfg))
    clip = _clip(cfg)
    variables = model.init(jax.random.PRNGKey(0), clip, deterministic=True)

    def loss_fn(params):
        logits = model.apply({"params": params}, clip, deterministic=True)
        loss, _ = compute_loss(logits, clip)
        return loss

    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(variables["params"])

    cfg.mdl.sp_attention = True
    set_sequence_parallel(_mesh(2))
    try:
        sp_loss, sp_grads = jax.value_and_grad(loss_fn)(variables["params"])
    finally:
        set_sequence_parallel(None)
        cfg.mdl.sp_attention = False
    np.testing.assert_allclose(float(sp_loss), float(ref_loss), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(sp_grads), jax.tree.leaves(ref_grads)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3
        )


def test_ring_inside_pjit_with_sharded_batch():
    """ring_attention composes under jit with batch-sharded inputs
    (the serving/train integration shape: B over 'data', T over 'model')."""
    from jax.sharding import NamedSharding

    q, k, v, mask, bias, fids = _inputs(B=4, seed=5)
    mesh = _mesh(4)
    bsh = NamedSharding(mesh, P("data"))
    q, k, v = (jax.device_put(t, bsh) for t in (q, k, v))
    mask = jax.device_put(mask, bsh)
    out = jax.jit(
        lambda *a: ring_attention(*a, mesh=mesh, axis="model")
    )(q, k, v, mask, bias, fids)
    ref = xla_attention(q, k, v, mask, bias, fids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
