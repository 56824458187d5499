"""Fused Pallas TPU kernel for the reference-style grounding head.

The reference scores each (arg, proposal) pair with a cross-product MLP
(SURVEY §2 ImgGrnd row, ``do_cross``-style fusion [C-MED]):

  h   = relu(W_v vis_t + W_l arg_a + W_x (vis_t ⊙ arg_a))
  y   = w2 · relu(W_1 h + b_1) + b_2

The XLA implementation materializes four (B, A, T, D) intermediates in HBM
(cross, wx, h, h1 — ~33 MB each at GT5-SPAT fp32), which round-1 profiling
attributed 9.2 of the 17 ms GT5 step to (docs/ROUND1_NOTES.md §2).  This
kernel streams T in blocks and keeps every (A·bt, D) intermediate in VMEM:
HBM sees only vis/wv reads and the (B, A, T) logits.

Layout: the A=5 args are folded into the matmul M-dimension — the per-arg
cross tiles stack into one (A·bt, D) matrix so the MXU runs one large GEMM
per weight instead of A small ones.  The backward is a single kernel over
the same grid that recomputes the forward tiles (recompute is cheaper than
HBM round-trips on TPU: 2·D FLOPs/elem ≪ the ~500 FLOP/byte machine
balance) and accumulates the weight gradients in VMEM-resident blocks
across the whole grid.

The affine stems wv = W_v vis + b_v and wl = W_l arg are computed by the
caller (their params stay ordinary flax Denses); the kernel takes them as
diff inputs so their cotangents flow back through the usual autodiff.

Parity vs the XLA math: tests/test_head_kernel.py (interpret mode, fwd +
all 9 gradients).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vog_tpu.kernels.attention import _precision, _round_up

LANE = 128


def _dot(a, b, contract=((1,), (0,))):
    return jax.lax.dot_general(
        a, b, (contract, ((), ())),
        preferred_element_type=jnp.float32, precision=_precision(),
    )


# below this token count the XLA head (saved (B,A,T,D) residuals, no
# recompute) is at parity or slightly faster — measured on v5e: GT5 T=200
# 16.6 ms/step XLA vs 17.0 kernel; P100 T=4000 80.0 XLA vs 76.1 kernel
HEAD_KERNEL_MIN_T = 1024


def head_kernel_supported(din: int, d: int, t: int = HEAD_KERNEL_MIN_T) -> bool:
    """The kernel wants lane-aligned feature dims (D and D//2) and a long
    enough token axis for the VMEM streaming to beat XLA."""
    return (
        din % LANE == 0
        and d % LANE == 0
        and (d // 2) % LANE == 0
        and t >= HEAD_KERNEL_MIN_T
    )


def _block_t(T: int) -> int:
    return 256 if T >= 1024 else 128


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------
def _fwd_kernel(vis_ref, arg_ref, wv_ref, wl_ref, wx_ref, w1_ref, b1_ref,
                w2_ref, b2_ref, o_ref, *, n_args, bt):
    A = n_args
    vis = vis_ref[0]  # (bt, D)
    wv = wv_ref[0]  # (bt, D)
    argm = arg_ref[0]  # (A, D)
    wl = wl_ref[0]  # (A, D)
    D = vis.shape[-1]

    cross = (vis[None, :, :] * argm[:, None, :]).reshape(A * bt, D)
    z0 = _dot(cross, wx_ref[:]).reshape(A, bt, D) + wv[None] + wl[:, None, :]
    h = jnp.maximum(z0, 0.0).reshape(A * bt, D)
    z1 = _dot(h, w1_ref[:]) + b1_ref[0][None, :]  # (A*bt, Dh)
    h1 = jnp.maximum(z1, 0.0)
    z2 = jnp.sum(h1 * w2_ref[0][None, :], axis=-1) + b2_ref[0, 0]
    o_ref[0] = z2.reshape(A, bt)


# --------------------------------------------------------------------------
# backward (single pass; weight grads accumulate across the whole grid)
# --------------------------------------------------------------------------
def _bwd_kernel(vis_ref, arg_ref, wv_ref, wl_ref, wx_ref, w1_ref, b1_ref,
                w2_ref, b2_ref, gt_ref,
                dvis_ref, darg_ref, dwv_ref, dwl_ref, dwx_ref, dw1_ref,
                db1_ref, dw2_ref, db2_ref, *, n_args, bt):
    # gt is the upstream grad TRANSPOSED to (B, Tp, A): per-arg columns are
    # natural (bt, 1) sublane tiles (lane→sublane reshapes are not
    # supported by Mosaic).  The A args run as a static loop with (bt, D)
    # temporaries so VMEM stays bounded at D=512, A=5.
    b = pl.program_id(0)
    t = pl.program_id(1)
    A = n_args
    vis = vis_ref[0]
    wv = wv_ref[0]
    argm = arg_ref[0]
    wl = wl_ref[0]
    gt = gt_ref[0]  # (bt, A)

    # per-b accumulators (resident across the t sweep)
    @pl.when(t == 0)
    def _():
        darg_ref[0] = jnp.zeros_like(darg_ref[0])
        dwl_ref[0] = jnp.zeros_like(dwl_ref[0])

    # global weight-grad accumulators (resident across the whole grid)
    @pl.when((b == 0) & (t == 0))
    def _():
        dwx_ref[:] = jnp.zeros_like(dwx_ref[:])
        dw1_ref[:] = jnp.zeros_like(dw1_ref[:])
        db1_ref[0] = jnp.zeros_like(db1_ref[0])
        dw2_ref[0] = jnp.zeros_like(dw2_ref[0])
        db2_ref[:] = jnp.zeros_like(db2_ref[:])

    dvis = jnp.zeros_like(vis)
    dwv = jnp.zeros_like(wv)
    for a in range(A):
        arg_a = argm[a][None, :]  # (1, D)
        # recompute the forward tiles for this arg (VMEM only)
        cross = vis * arg_a  # (bt, D)
        z0 = _dot(cross, wx_ref[:]) + wv + wl[a][None, :]
        h = jnp.maximum(z0, 0.0)
        z1 = _dot(h, w1_ref[:]) + b1_ref[0][None, :]  # (bt, Dh)
        h1 = jnp.maximum(z1, 0.0)

        g_a = gt[:, a : a + 1]  # (bt, 1)
        dh1 = g_a * w2_ref[0][None, :]  # (bt, Dh)
        dz1 = jnp.where(z1 > 0, dh1, 0.0)
        dh = _dot(dz1, w1_ref[:], contract=((1,), (1,)))  # (bt, D)
        dz0 = jnp.where(z0 > 0, dh, 0.0)
        dcross = _dot(dz0, wx_ref[:], contract=((1,), (1,)))  # (bt, D)

        dvis += dcross * arg_a
        dwv += dz0
        darg_ref[0, a] += jnp.sum(dcross * vis, axis=0)  # (D,)
        dwl_ref[0, a] += jnp.sum(dz0, axis=0)  # (D,)
        dwx_ref[:] += _dot(cross, dz0, contract=((0,), (0,)))  # (D, D)
        dw1_ref[:] += _dot(h, dz1, contract=((0,), (0,)))  # (D, Dh)
        db1_ref[0] += jnp.sum(dz1, axis=0)  # (Dh,)
        dw2_ref[0] += jnp.sum(h1 * g_a, axis=0)  # (Dh,)

    dvis_ref[0] = dvis
    dwv_ref[0] = dwv
    db2_ref[:] += jnp.sum(gt).reshape(1, 1)


# --------------------------------------------------------------------------
# plumbing
# --------------------------------------------------------------------------
def _prep(vis, arg, wv, wl):
    B, T, D = vis.shape
    A = arg.shape[1]
    bt = _block_t(T)
    Tp = _round_up(T, bt)
    padt = ((0, 0), (0, Tp - T), (0, 0))
    return jnp.pad(vis, padt), jnp.pad(wv, padt), (B, A, T, D, Tp, bt)


def _common_specs(dims, Dh):
    B, A, T, D, Tp, bt = dims
    V = pltpu.VMEM
    return [
        pl.BlockSpec((1, bt, D), lambda b, t: (b, t, 0), memory_space=V),  # vis
        pl.BlockSpec((1, A, D), lambda b, t: (b, 0, 0), memory_space=V),  # arg
        pl.BlockSpec((1, bt, D), lambda b, t: (b, t, 0), memory_space=V),  # wv
        pl.BlockSpec((1, A, D), lambda b, t: (b, 0, 0), memory_space=V),  # wl
        pl.BlockSpec((D, D), lambda b, t: (0, 0), memory_space=V),  # Wx
        pl.BlockSpec((D, Dh), lambda b, t: (0, 0), memory_space=V),  # W1
        pl.BlockSpec((1, Dh), lambda b, t: (0, 0), memory_space=V),  # b1
        pl.BlockSpec((1, Dh), lambda b, t: (0, 0), memory_space=V),  # w2
        pl.BlockSpec((1, 1), lambda b, t: (0, 0), memory_space=V),  # b2
    ]


def _fwd_call(visp, argm, wvp, wl, wx, w1, b1, w2, b2, dims, interpret):
    B, A, T, D, Tp, bt = dims
    Dh = w1.shape[1]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n_args=A, bt=bt),
        grid=(B, Tp // bt),
        in_specs=_common_specs(dims, Dh),
        out_specs=pl.BlockSpec(
            (1, A, bt), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, A, Tp), jnp.float32),
        interpret=interpret,
    )(visp, argm, wvp, wl, wx, w1, b1.reshape(1, Dh), w2.reshape(1, Dh),
      b2.reshape(1, 1))
    return out[:, :, :T]


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def _fused_head(vis, arg, wv, wl, wx, w1, b1, w2, b2, interpret):
    visp, wvp, dims = _prep(vis, arg, wv, wl)
    return _fwd_call(visp, arg, wvp, wl, wx, w1, b1, w2, b2, dims, interpret)


def _fused_head_fwd(vis, arg, wv, wl, wx, w1, b1, w2, b2, interpret):
    out = _fused_head(vis, arg, wv, wl, wx, w1, b1, w2, b2, interpret)
    return out, (vis, arg, wv, wl, wx, w1, b1, w2, b2)


def _fused_head_bwd(interpret, res, g):
    vis, arg, wv, wl, wx, w1, b1, w2, b2 = res
    visp, wvp, dims = _prep(vis, arg, wv, wl)
    B, A, T, D, Tp, bt = dims
    Dh = w1.shape[1]
    # transpose the upstream grad to (B, Tp, A): the kernel reads per-arg
    # (bt, 1) columns, which lane→sublane reshapes could not produce
    gt = jnp.pad(
        g.astype(jnp.float32), ((0, 0), (0, 0), (0, Tp - T))
    ).transpose(0, 2, 1)
    V = pltpu.VMEM

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, n_args=A, bt=bt),
        grid=(B, Tp // bt),
        in_specs=_common_specs(dims, Dh)
        + [pl.BlockSpec((1, bt, A), lambda b, t: (b, t, 0), memory_space=V)],
        out_specs=[
            pl.BlockSpec((1, bt, D), lambda b, t: (b, t, 0), memory_space=V),
            pl.BlockSpec((1, A, D), lambda b, t: (b, 0, 0), memory_space=V),
            pl.BlockSpec((1, bt, D), lambda b, t: (b, t, 0), memory_space=V),
            pl.BlockSpec((1, A, D), lambda b, t: (b, 0, 0), memory_space=V),
            pl.BlockSpec((D, D), lambda b, t: (0, 0), memory_space=V),
            pl.BlockSpec((D, Dh), lambda b, t: (0, 0), memory_space=V),
            pl.BlockSpec((1, Dh), lambda b, t: (0, 0), memory_space=V),
            pl.BlockSpec((1, Dh), lambda b, t: (0, 0), memory_space=V),
            pl.BlockSpec((1, 1), lambda b, t: (0, 0), memory_space=V),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tp, D), jnp.float32),  # dvis
            jax.ShapeDtypeStruct((B, A, D), jnp.float32),  # darg
            jax.ShapeDtypeStruct((B, Tp, D), jnp.float32),  # dwv
            jax.ShapeDtypeStruct((B, A, D), jnp.float32),  # dwl
            jax.ShapeDtypeStruct((D, D), jnp.float32),  # dWx
            jax.ShapeDtypeStruct((D, Dh), jnp.float32),  # dW1
            jax.ShapeDtypeStruct((1, Dh), jnp.float32),  # db1
            jax.ShapeDtypeStruct((1, Dh), jnp.float32),  # dw2
            jax.ShapeDtypeStruct((1, 1), jnp.float32),  # db2
        ],
        interpret=interpret,
        # Mosaic's default 16 MB scoped-vmem budget rejects this kernel at
        # exactly block-aligned T (measured on v5e: T=1024/2048 fail at
        # 18.4 MB scoped while padded shapes like T=4000->4096 compile —
        # the unpadded operands change the scheduler's buffering); the
        # working set genuinely fits, so raise the budget instead of
        # distorting the tiling
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(visp, arg, wvp, wl, wx, w1, b1.reshape(1, Dh), w2.reshape(1, Dh),
      b2.reshape(1, 1), gt)
    dvis, darg, dwv, dwl, dwx, dw1, db1, dw2, db2 = outs
    return (
        dvis[:, :T],
        darg,
        dwv[:, :T],
        dwl,
        dwx,
        dw1,
        db1.reshape(b1.shape),
        dw2.reshape(w2.shape),
        db2.reshape(b2.shape),
    )


_fused_head.defvjp(_fused_head_fwd, _fused_head_bwd)


def fused_grounding_head(
    vis: jnp.ndarray,  # (B, T, D)
    arg: jnp.ndarray,  # (B, A, D)
    wv: jnp.ndarray,  # (B, T, D) = W_v vis + b_v (caller-computed stem)
    wl: jnp.ndarray,  # (B, A, D) = W_l arg (caller-computed stem)
    wx: jnp.ndarray,  # (D, D) cross-term kernel
    w1: jnp.ndarray,  # (D, Dh) first head layer
    b1: jnp.ndarray,  # (Dh,)
    w2: jnp.ndarray,  # (Dh,) final projection (column of the (Dh,1) Dense)
    b2: jnp.ndarray,  # () scalar bias
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """-> logits (B, A, T); exact same math as the XLA GroundingHead."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _fused_head(vis, arg, wv, wl, wx, w1, b1, w2, b2, interpret)
