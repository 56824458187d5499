"""Shared-QK multi-arg kernel vs XLA reference math (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vog_tpu.kernels.mm_attention import mm_shared_qk_attention

NEG = -1e30


def xla_ref(qm, km, vm, cn, mask, fb, fids):
    # combined-logit reference: softmax_j(shared + cn_a) @ vm per arg —
    # same formulation the kernel implements (round-5; the former w·e
    # product form underflows f32 in sharp regimes)
    tok_bias = fb[:, fids][:, :, fids]  # (H,T,T)
    shared = jnp.einsum("bhid,bhjd->bhij", qm, km) + tok_bias[None]
    shared = jnp.where(mask[:, None, None, :] > 0, shared, NEG)
    t = shared[:, :, None] + cn[:, :, :, None, :]  # (B,H,A,T,T)
    p = jnp.exp(t - t.max(-1, keepdims=True))
    return jnp.einsum("bhaij,bhjd->bhaid", p, vm) / p.sum(-1, keepdims=True)


def _mk(seed, B=1, H=2, A=3, T=40, dh=16, F=10):
    # `e` below is the log-domain per-arg key weighting cn (<= 0)
    rng = np.random.default_rng(seed)
    qm, km, vm = (
        jnp.asarray(rng.normal(size=(B, H, T, dh)).astype(np.float32))
        for _ in range(3)
    )
    e = jnp.asarray(rng.uniform(-3.0, 0.0, (B, H, A, T)).astype(np.float32))
    mask = jnp.asarray((rng.uniform(size=(B, T)) > 0.2).astype(np.float32))
    mask = mask.at[:, 0].set(1.0)
    fb = jnp.asarray(rng.normal(scale=0.5, size=(H, F, F)).astype(np.float32))
    fids = jnp.asarray((np.arange(T) // max(T // F, 1)).clip(0, F - 1).astype(np.int32))
    return qm, km, vm, e, mask, fb, fids


@pytest.mark.parametrize("shape", [(1, 2, 3, 40, 16), (2, 2, 5, 150, 8)])
def test_fwd_parity(shape):
    B, H, A, T, dh = shape
    qm, km, vm, e, mask, fb, fids = _mk(0, B, H, A, T, dh)
    got = mm_shared_qk_attention(qm, km, vm, e, mask, fb, fids, interpret=True)
    ref = xla_ref(qm, km, vm, e, mask, fb, fids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_bwd_parity():
    qm, km, vm, e, mask, fb, fids = _mk(1, B=1, H=2, A=3, T=60, dh=8)
    g = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, 2, 3, 60, 8)).astype(np.float32)
    )

    def lk(qm, km, vm, e, fb):
        return jnp.sum(
            mm_shared_qk_attention(qm, km, vm, e, mask, fb, fids, interpret=True) * g
        )

    def lr(qm, km, vm, e, fb):
        return jnp.sum(xla_ref(qm, km, vm, e, mask, fb, fids) * g)

    gk = jax.grad(lk, argnums=(0, 1, 2, 3, 4))(qm, km, vm, e, fb)
    gr = jax.grad(lr, argnums=(0, 1, 2, 3, 4))(qm, km, vm, e, fb)
    for a, b, name in zip(gk, gr, ("dqm", "dkm", "dvm", "de", "dfb")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3, err_msg=name
        )


def test_bwd_parity_multiblock():
    """T > 128 exercises the blocked bwd grids."""
    qm, km, vm, e, mask, fb, fids = _mk(3, B=1, H=1, A=2, T=300, dh=8)
    g = jnp.asarray(
        np.random.default_rng(4).normal(size=(1, 1, 2, 300, 8)).astype(np.float32)
    )

    def lk(qm, km, vm, e, fb):
        return jnp.sum(
            mm_shared_qk_attention(qm, km, vm, e, mask, fb, fids, interpret=True) * g
        )

    def lr(qm, km, vm, e, fb):
        return jnp.sum(xla_ref(qm, km, vm, e, mask, fb, fids) * g)

    gk = jax.grad(lk, argnums=(0, 1, 2, 3, 4))(qm, km, vm, e, fb)
    gr = jax.grad(lr, argnums=(0, 1, 2, 3, 4))(qm, km, vm, e, fb)
    for a, b, name in zip(gk, gr, ("dqm", "dkm", "dvm", "de", "dfb")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3, err_msg=name
        )


@pytest.mark.parametrize("mode", ["emit", "recompute"])
def test_bwd_mode_parity(mode):
    """Both backward strategies (emit ds to HBM vs recompute-in-VMEM dq+dfb
    kernel) match the XLA math, incl. the multiblock path."""
    qm, km, vm, e, mask, fb, fids = _mk(9, B=1, H=1, A=2, T=300, dh=8)
    g = jnp.asarray(
        np.random.default_rng(10).normal(size=(1, 1, 2, 300, 8)).astype(np.float32)
    )

    def lk(qm, km, vm, e, fb):
        return jnp.sum(
            mm_shared_qk_attention(
                qm, km, vm, e, mask, fb, fids, interpret=True, bwd_mode=mode
            )
            * g
        )

    def lr(qm, km, vm, e, fb):
        return jnp.sum(xla_ref(qm, km, vm, e, mask, fb, fids) * g)

    gk = jax.grad(lk, argnums=(0, 1, 2, 3, 4))(qm, km, vm, e, fb)
    gr = jax.grad(lr, argnums=(0, 1, 2, 3, 4))(qm, km, vm, e, fb)
    for a, b, name in zip(gk, gr, ("dqm", "dkm", "dvm", "de", "dfb")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3, err_msg=name
        )
