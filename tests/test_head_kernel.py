"""Parity of the fused grounding-head Pallas kernel vs the XLA math
(interpret mode on CPU) — fwd and all 9 gradients."""

import numpy as np

import jax
import jax.numpy as jnp

from vog_tpu.kernels.grounding_head import fused_grounding_head


def _xla_head(vis, arg, wv, wl, wx, w1, b1, w2, b2):
    cross = jnp.einsum("btd,bad->batd", vis, arg)
    h = jax.nn.relu(wv[:, None] + wl[:, :, None] + cross @ wx)
    h1 = jax.nn.relu(h @ w1 + b1)
    return h1 @ w2 + b2


def _inputs(rng, B=2, T=70, A=3, D=256):
    Dh = D // 2
    r = lambda *s: rng.normal(size=s, scale=0.5).astype(np.float32)
    return dict(
        vis=jnp.asarray(r(B, T, D)),
        arg=jnp.asarray(r(B, A, D)),
        wv=jnp.asarray(r(B, T, D)),
        wl=jnp.asarray(r(B, A, D)),
        wx=jnp.asarray(r(D, D) / np.sqrt(D)),
        w1=jnp.asarray(r(D, Dh) / np.sqrt(D)),
        b1=jnp.asarray(r(Dh)),
        w2=jnp.asarray(r(Dh) / np.sqrt(Dh)),
        b2=jnp.asarray(np.float32(0.3)),
    )


def test_head_kernel_forward_parity(rng):
    kw = _inputs(rng)
    ours = fused_grounding_head(**kw, interpret=True)
    ref = _xla_head(**kw)
    assert ours.shape == ref.shape == (2, 3, 70)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-4)


def test_head_kernel_grad_parity(rng):
    kw = _inputs(rng, B=1, T=40, A=2, D=128)
    names = list(kw)
    proj = jnp.asarray(rng.normal(size=(1, 2, 40)).astype(np.float32))

    def loss_k(*args):
        return jnp.sum(fused_grounding_head(*args, interpret=True) * proj)

    def loss_x(*args):
        return jnp.sum(_xla_head(*args) * proj)

    args = tuple(kw[n] for n in names)
    gk = jax.grad(loss_k, argnums=tuple(range(9)))(*args)
    gx = jax.grad(loss_x, argnums=tuple(range(9)))(*args)
    for name, a, b in zip(names, gk, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3,
            err_msg=f"grad mismatch for {name}",
        )


def _head_cfg(vis_dim):
    from vog_tpu.config import Cfg, post_proc_config

    cfg = Cfg()
    cfg.mdl.vis_dim = vis_dim
    return post_proc_config(cfg)


def test_head_module_kernel_matches_xla(rng):
    """GroundingHead(use_kernel=True) in interpret mode == XLA path with
    the same params (D=256 is lane-aligned so the kernel engages)."""
    from vog_tpu.model.grounding import GroundingHead

    cfg = _head_cfg(256)
    # T >= HEAD_KERNEL_MIN_T so the size gate lets the kernel engage
    D, B, T, A = 256, 1, 1024, 3
    vis = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    arg = jnp.asarray(rng.normal(size=(B, A, D)).astype(np.float32))

    mod_x = GroundingHead(cfg, use_kernel=False)
    params = mod_x.init(jax.random.PRNGKey(0), vis, arg)
    ref = mod_x.apply(params, vis, arg)
    ours = GroundingHead(cfg, use_kernel=True).apply(params, vis, arg)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-4)


def test_head_module_unaligned_falls_back(rng):
    """Unaligned vis_dim must silently use the XLA path (bitwise equal)."""
    from vog_tpu.model.grounding import GroundingHead

    cfg = _head_cfg(32)
    vis = jnp.asarray(rng.normal(size=(1, 1030, 32)).astype(np.float32))
    arg = jnp.asarray(rng.normal(size=(1, 2, 32)).astype(np.float32))
    params = GroundingHead(cfg, use_kernel=False).init(
        jax.random.PRNGKey(0), vis, arg
    )
    a = GroundingHead(cfg, use_kernel=False).apply(params, vis, arg)
    b = GroundingHead(cfg, use_kernel=True).apply(params, vis, arg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
