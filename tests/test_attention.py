"""Pallas fused attention vs the XLA reference (SURVEY §4 item 3): forward
and backward parity on random shapes incl. padded/masked rows and the
relative-frame bias, in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vog_tpu.kernels.attention import flash_attention
from vog_tpu.model.transformer import xla_attention


def _mk(seed, B=2, H=2, T=50, dh=16, F=10, with_bias=True, with_mask=True):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(B, H, T, dh)).astype(np.float32)
    k = rng.normal(size=(B, H, T, dh)).astype(np.float32)
    v = rng.normal(size=(B, H, T, dh)).astype(np.float32)
    if with_mask:
        mask = (rng.uniform(size=(B, T)) > 0.2).astype(np.float32)
        mask[:, 0] = 1.0  # at least one valid key
    else:
        mask = np.ones((B, T), np.float32)
    P = T // F
    fids = (np.arange(T) // max(P, 1)).clip(0, F - 1).astype(np.int32)
    fb = rng.normal(scale=0.5, size=(H, F, F)).astype(np.float32) if with_bias else None
    return (
        jnp.asarray(q),
        jnp.asarray(k),
        jnp.asarray(v),
        jnp.asarray(mask),
        None if fb is None else jnp.asarray(fb),
        jnp.asarray(fids),
    )


@pytest.mark.parametrize("with_bias", [True, False])
@pytest.mark.parametrize("shape", [(2, 2, 50, 16, 10), (1, 3, 200, 24, 10), (2, 2, 130, 8, 13)])
def test_fwd_parity(with_bias, shape):
    B, H, T, dh, F = shape
    q, k, v, mask, fb, fids = _mk(0, B, H, T, dh, F, with_bias=with_bias)
    ref = xla_attention(q, k, v, mask, fb, fids)
    got = flash_attention(q, k, v, mask, fb, fids, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_bwd_parity():
    q, k, v, mask, fb, fids = _mk(1, B=2, H=2, T=60, dh=12, F=10)
    g = np.random.default_rng(2).normal(size=(2, 2, 60, 12)).astype(np.float32)
    g = jnp.asarray(g)

    def loss_ref(q, k, v, fb):
        return jnp.sum(xla_attention(q, k, v, mask, fb, fids) * g)

    def loss_flash(q, k, v, fb):
        return jnp.sum(flash_attention(q, k, v, mask, fb, fids, interpret=True) * g)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, fb)
    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, fb)
    for a, b, name in zip(gf, gr, ("dq", "dk", "dv", "dbias")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3, err_msg=name
        )


def test_bwd_parity_multiblock():
    """T > 128 exercises the blocked dkv path (v must be k-blocked)."""
    q, k, v, mask, fb, fids = _mk(7, B=1, H=2, T=300, dh=16, F=10)
    g = jnp.asarray(
        np.random.default_rng(8).normal(size=(1, 2, 300, 16)).astype(np.float32)
    )

    def loss_ref(q, k, v, fb):
        return jnp.sum(xla_attention(q, k, v, mask, fb, fids) * g)

    def loss_flash(q, k, v, fb):
        return jnp.sum(flash_attention(q, k, v, mask, fb, fids, interpret=True) * g)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, fb)
    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, fb)
    for a, b, name in zip(gf, gr, ("dq", "dk", "dv", "dbias")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3, err_msg=name
        )


def test_bwd_no_bias():
    q, k, v, mask, _, _ = _mk(3, B=1, H=2, T=40, dh=8, F=10, with_bias=False)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask, None, None, interpret=True) ** 2)

    gf = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v, mask) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3)


def test_fully_masked_rows_are_finite():
    q, k, v, mask, fb, fids = _mk(4, B=1, H=1, T=30, dh=8, F=10)
    mask = mask.at[0, :].set(0.0)  # everything masked
    out = flash_attention(q, k, v, mask, fb, fids, interpret=True)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("mode", ["emit", "recompute"])
def test_bwd_mode_parity(mode):
    """Both backward strategies (emit the (T,T) score-grad to HBM vs the
    recompute-in-VMEM second kernel) produce the same gradients, incl. the
    multiblock path and the frame-bias grad."""
    q, k, v, mask, fb, fids = _mk(11, B=1, H=2, T=300, dh=16, F=10)
    g = jnp.asarray(
        np.random.default_rng(12).normal(size=(1, 2, 300, 16)).astype(np.float32)
    )

    def loss_ref(q, k, v, fb):
        return jnp.sum(xla_attention(q, k, v, mask, fb, fids) * g)

    def loss_flash(q, k, v, fb):
        return jnp.sum(
            flash_attention(q, k, v, mask, fb, fids, interpret=True, bwd_mode=mode)
            * g
        )

    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, fb)
    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, fb)
    for a, b, name in zip(gf, gr, ("dq", "dk", "dv", "dbias")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3, err_msg=name
        )
