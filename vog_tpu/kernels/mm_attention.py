"""Fused shared-QK multi-arg attention (VOGNet's decomposed mm layer).

The arg-decomposed first multimodal layer (see
``model/transformer.py §DecomposedRelAttention``) computes, per head:

  out_a = [w @ (e_a ∘ vm)] / [w @ e_a],   w = exp(qm km^T + bias - m)

The XLA implementation materializes w (B,H,T,T) in HBM (~536MB at P100
B=2) — measured as the top cost of the P100 step.  This kernel keeps w in
VMEM blocks: the shared scores are computed once per q-block and the A=5
per-arg outputs come from a static loop, so the (T,T) tensor never hits
HBM.  The relative-frame bias uses the same factored per-column form
(fbc = fb[:, :, frame_ids]) and frame-pure fast path as
``kernels/attention.py``, and the backward recomputes w tiles from the
saved row-max (softmax shift-invariance makes treating the max as a
constant exact) and the saved per-arg denominators.

Verified against the XLA math in tests/test_mm_attention.py (interpret
mode, fwd + all grads).  Wired behind ``mdl.mm_kernel`` (TPU only).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vog_tpu.kernels.attention import (
    NEG,
    _bias_block,
    _block_size,
    _precision,
    _round_up,
)

LANE = 128


def _dot(a, b, contract=((1,), (1,))):
    return jax.lax.dot_general(
        a, b, (contract, ((), ())),
        preferred_element_type=jnp.float32, precision=_precision(),
    )


# --------------------------------------------------------------------------
# forward: grid (BH, nq); k/v/e full in VMEM (T <= ~4096)
# --------------------------------------------------------------------------
def _fwd_kernel(qm_ref, km_ref, vm_ref, e_ref, mask_ref, fbc_ref, fid_ref,
                o_ref, mrow_ref, den_ref, *, n_args, n_frames, bq):
    qi = pl.program_id(1)
    qb = qm_ref[0]  # (bq, dh)
    kb = km_ref[0]  # (T, dh)
    Tp = kb.shape[0]
    s = _dot(qb, kb)  # (bq, T); caller pre-scales qm
    s = s + _bias_block(fbc_ref, fid_ref, qi, bq, 0, Tp, n_frames)
    mask = mask_ref[0, 0]
    s = jnp.where(mask[None, :] > 0, s, NEG)
    m = jnp.max(s, axis=-1, keepdims=True)  # (bq, 1)
    w = jnp.exp(s - m)
    mrow_ref[0] = m
    for a in range(n_args):
        ea = e_ref[0, a]  # (T,)
        we = w * ea[None, :]
        numer = _dot(we, vm_ref[0], contract=((1,), (0,)))  # (bq, dh)
        den = jnp.sum(we, axis=-1, keepdims=True)  # (bq, 1)
        o_ref[0, a] = numer / jnp.maximum(den, 1e-30)
        den_ref[0, a] = den


# --------------------------------------------------------------------------
# backward tiles
# --------------------------------------------------------------------------
def _tile_w(qm_blk, km_blk, bias_t, mask_k, m_blk):
    s = _dot(qm_blk, km_blk) + bias_t
    s = jnp.where(mask_k[None, :] > 0, s, NEG)
    return jnp.exp(s - m_blk)  # (bq, bk)


def _bwd_dq_kernel(qm_ref, km_ref, vm_ref, e_ref, mask_ref, fbc_ref, fid_ref,
                   g_ref, m_ref, den_ref, delta_ref,
                   dq_ref, dfb_ref, *, n_args, n_frames, blk):
    # grid (BH, nq, nk); j innermost: dq accumulates over j, dfb over all
    qi = pl.program_id(1)
    j = pl.program_id(2)
    mask_k = mask_ref[0, 0, pl.ds(j * blk, blk)]
    bias_t = _bias_block(fbc_ref, fid_ref, qi, blk, j * blk, blk, n_frames)
    w = _tile_w(qm_ref[0], km_ref[0], bias_t, mask_k, m_ref[0])
    ds = jnp.zeros_like(w)
    for a in range(n_args):
        gv = _dot(g_ref[0, a], vm_ref[0])  # (bq, bk) = g_a @ vm_blk^T
        pa = w * e_ref[0, a][None, :] / jnp.maximum(den_ref[0, a], 1e-30)
        ds = ds + pa * (gv - delta_ref[0, a])
    ds = jnp.where(mask_k[None, :] > 0, ds, 0.0)

    @pl.when(j == 0)
    def _():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    dq_ref[0] += _dot(ds, km_ref[0], contract=((1,), (0,)))

    # frame-bias grad (same accumulation as kernels/attention.py)
    F = n_frames
    f_range = jax.lax.broadcasted_iota(jnp.int32, (1, F), 1)
    fq = fid_ref[pl.ds(qi * blk, blk), 0]
    fk = fid_ref[pl.ds(j * blk, blk), 0]
    oq = (fq[:, None] == f_range).astype(jnp.float32)
    okb = (fk[:, None] == f_range).astype(jnp.float32)

    @pl.when((qi == 0) & (j == 0))
    def _():
        dfb_ref[0] = jnp.zeros_like(dfb_ref[0])

    dfb_ref[0] += jnp.dot(
        _dot(oq, ds, contract=((0,), (0,))), okb,
        preferred_element_type=jnp.float32, precision=_precision(),
    )


def _bwd_dkv_kernel(qm_ref, km_ref, vm_ref, e_ref, mask_ref, fbc_ref, fid_ref,
                    g_ref, m_ref, den_ref, delta_ref,
                    dk_ref, dv_ref, de_ref, *, n_args, n_frames, blk):
    # grid (BH, nk, nq); i innermost: dk/dv/de accumulate over i
    j = pl.program_id(1)
    i = pl.program_id(2)
    mask_k = mask_ref[0, 0, pl.ds(j * blk, blk)]
    bias_t = _bias_block(fbc_ref, fid_ref, i, blk, j * blk, blk, n_frames)
    w = _tile_w(qm_ref[0], km_ref[0], bias_t, mask_k, m_ref[0])

    @pl.when(i == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])
        de_ref[0] = jnp.zeros_like(de_ref[0])

    ds = jnp.zeros_like(w)
    for a in range(n_args):
        inv_d = 1.0 / jnp.maximum(den_ref[0, a], 1e-30)  # (bq,1)
        gv = _dot(g_ref[0, a], vm_ref[0])  # (bq, bk)
        pa = w * e_ref[0, a][None, :] * inv_d
        term = gv - delta_ref[0, a]
        ds = ds + pa * term
        dv_ref[0] += _dot(pa, g_ref[0, a], contract=((0,), (0,)))  # (bk, dh)
        de_ref[0, a] += jnp.sum(w * inv_d * term, axis=0)  # (bk,)
    ds = jnp.where(mask_k[None, :] > 0, ds, 0.0)
    dk_ref[0] += _dot(ds, qm_ref[0], contract=((0,), (0,)))


# --------------------------------------------------------------------------
# plumbing
# --------------------------------------------------------------------------
def _prep(qm, km, vm, e, key_mask, frame_bias, frame_ids):
    B, H, T, dh = qm.shape
    A = e.shape[2]
    Fn = frame_bias.shape[-1]
    blk = _block_size(T)
    Tp = _round_up(T, blk)
    dp = _round_up(dh, LANE)
    BH = B * H

    def padtd(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, Tp - T), (0, dp - dh))).reshape(
            BH, Tp, dp
        )

    qf, kf, vf = padtd(qm), padtd(km), padtd(vm)
    ef = jnp.pad(e, ((0, 0), (0, 0), (0, 0), (0, Tp - T))).reshape(BH, A, Tp)
    mk = jnp.pad(key_mask.astype(jnp.float32), ((0, 0), (0, Tp - T)))[:, None, :]
    fid_flat = jnp.pad(frame_ids.astype(jnp.int32), (0, Tp - T), mode="edge")
    fid = fid_flat[:, None]
    fbc = frame_bias.astype(jnp.float32)[:, :, fid_flat]  # (H, F, Tp)
    return qf, kf, vf, ef, mk, fbc, fid, (B, H, A, T, dh, Tp, dp, blk, Fn)


def _fwd(qf, kf, vf, ef, mk, fbc, fid, dims, interpret):
    B, H, A, T, dh, Tp, dp, blk, Fn = dims
    BH = B * H
    bq = 64  # full-key fwd: small q block (VMEM headroom at T=4096)
    grid = (BH, Tp // bq)
    out, mrow, den = pl.pallas_call(
        functools.partial(_fwd_kernel, n_args=A, n_frames=Fn, bq=bq),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A, Tp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tp), lambda b, i: (b // H, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Fn, Tp), lambda b, i: (b % H, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Tp, 1), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, A, bq, dp), lambda b, i: (b, 0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A, bq, 1), lambda b, i: (b, 0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, A, Tp, dp), jnp.float32),
            jax.ShapeDtypeStruct((BH, Tp, 1), jnp.float32),
            jax.ShapeDtypeStruct((BH, A, Tp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, ef, mk, fbc, fid)
    return out, mrow, den


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _mm_attn(qm, km, vm, e, key_mask, frame_bias, frame_ids_f, interpret):
    out, _ = _mm_attn_fwd(qm, km, vm, e, key_mask, frame_bias, frame_ids_f, interpret)
    return out


def _mm_attn_fwd(qm, km, vm, e, key_mask, frame_bias, frame_ids_f, interpret):
    qf, kf, vf, ef, mk, fbc, fid, dims = _prep(
        qm, km, vm, e, key_mask, frame_bias, frame_ids_f.astype(jnp.int32)
    )
    B, H, A, T, dh, Tp, dp, blk, Fn = dims
    out, mrow, den = _fwd(qf, kf, vf, ef, mk, fbc, fid, dims, interpret)
    o = out.reshape(B, H, A, Tp, dp)[:, :, :, :T, :dh]
    res = (qf, kf, vf, ef, mk, fbc, fid, out, mrow, den, dims, key_mask, frame_ids_f)
    return o, res


def _mm_attn_bwd(interpret, res, g):
    (qf, kf, vf, ef, mk, fbc, fid, out, mrow, den, dims,
     key_mask_in, frame_ids_f) = res
    B, H, A, T, dh, Tp, dp, blk, Fn = dims
    BH = B * H
    gf = jnp.pad(
        g.astype(jnp.float32), ((0, 0), (0, 0), (0, 0), (0, Tp - T), (0, dp - dh))
    ).reshape(BH, A, Tp, dp)
    delta = jnp.sum(gf * out, axis=-1, keepdims=True)  # (BH, A, Tp, 1)

    # the unrolled A-loop keeps per-arg tile temporaries live; smaller bwd
    # tiles keep the total under the 16MB VMEM budget
    blk = min(blk, 256)
    nq = nk = Tp // blk
    V = pltpu.VMEM

    dq, dfb_per = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, n_args=A, n_frames=Fn, blk=blk),
        grid=(BH, nq, nk),
        in_specs=[
            pl.BlockSpec((1, blk, dp), lambda b, i, j: (b, i, 0), memory_space=V),
            pl.BlockSpec((1, blk, dp), lambda b, i, j: (b, j, 0), memory_space=V),
            pl.BlockSpec((1, blk, dp), lambda b, i, j: (b, j, 0), memory_space=V),
            pl.BlockSpec((1, A, blk), lambda b, i, j: (b, 0, j), memory_space=V),
            pl.BlockSpec((1, 1, Tp), lambda b, i, j: (b // H, 0, 0), memory_space=V),
            pl.BlockSpec((1, Fn, Tp), lambda b, i, j: (b % H, 0, 0), memory_space=V),
            pl.BlockSpec((Tp, 1), lambda b, i, j: (0, 0), memory_space=V),
            pl.BlockSpec((1, A, blk, dp), lambda b, i, j: (b, 0, i, 0), memory_space=V),
            pl.BlockSpec((1, blk, 1), lambda b, i, j: (b, i, 0), memory_space=V),
            pl.BlockSpec((1, A, blk, 1), lambda b, i, j: (b, 0, i, 0), memory_space=V),
            pl.BlockSpec((1, A, blk, 1), lambda b, i, j: (b, 0, i, 0), memory_space=V),
        ],
        out_specs=[
            pl.BlockSpec((1, blk, dp), lambda b, i, j: (b, i, 0), memory_space=V),
            pl.BlockSpec((1, Fn, Fn), lambda b, i, j: (b, 0, 0), memory_space=V),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Tp, dp), jnp.float32),
            jax.ShapeDtypeStruct((BH, Fn, Fn), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, ef, mk, fbc, fid, gf, mrow, den, delta)

    dk, dv, de = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, n_args=A, n_frames=Fn, blk=blk),
        grid=(BH, nk, nq),
        in_specs=[
            pl.BlockSpec((1, blk, dp), lambda b, j, i: (b, i, 0), memory_space=V),
            pl.BlockSpec((1, blk, dp), lambda b, j, i: (b, j, 0), memory_space=V),
            pl.BlockSpec((1, blk, dp), lambda b, j, i: (b, j, 0), memory_space=V),
            pl.BlockSpec((1, A, blk), lambda b, j, i: (b, 0, j), memory_space=V),
            pl.BlockSpec((1, 1, Tp), lambda b, j, i: (b // H, 0, 0), memory_space=V),
            pl.BlockSpec((1, Fn, Tp), lambda b, j, i: (b % H, 0, 0), memory_space=V),
            pl.BlockSpec((Tp, 1), lambda b, j, i: (0, 0), memory_space=V),
            pl.BlockSpec((1, A, blk, dp), lambda b, j, i: (b, 0, i, 0), memory_space=V),
            pl.BlockSpec((1, blk, 1), lambda b, j, i: (b, i, 0), memory_space=V),
            pl.BlockSpec((1, A, blk, 1), lambda b, j, i: (b, 0, i, 0), memory_space=V),
            pl.BlockSpec((1, A, blk, 1), lambda b, j, i: (b, 0, i, 0), memory_space=V),
        ],
        out_specs=[
            pl.BlockSpec((1, blk, dp), lambda b, j, i: (b, j, 0), memory_space=V),
            pl.BlockSpec((1, blk, dp), lambda b, j, i: (b, j, 0), memory_space=V),
            pl.BlockSpec((1, A, blk), lambda b, j, i: (b, 0, j), memory_space=V),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Tp, dp), jnp.float32),
            jax.ShapeDtypeStruct((BH, Tp, dp), jnp.float32),
            jax.ShapeDtypeStruct((BH, A, Tp), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, ef, mk, fbc, fid, gf, mrow, den, delta)

    def unpad3(x):
        return x.reshape(B, H, Tp, dp)[:, :, :T, :dh]

    dfb = dfb_per.reshape(B, H, Fn, Fn).sum(axis=0)  # (H,F,F)
    de_out = de.reshape(B, H, A, Tp)[:, :, :, :T]
    return (
        unpad3(dq),
        unpad3(dk),
        unpad3(dv),
        de_out,
        jnp.zeros_like(key_mask_in),
        dfb,
        jnp.zeros_like(frame_ids_f),
    )


_mm_attn.defvjp(_mm_attn_fwd, _mm_attn_bwd)


def mm_shared_qk_attention(
    qm: jnp.ndarray,  # (B,H,T,dh) — caller folds the 1/sqrt(dh) scale in
    km: jnp.ndarray,
    vm: jnp.ndarray,
    e: jnp.ndarray,  # (B,H,A,T) per-arg key weights (exp-normalized)
    key_mask: jnp.ndarray,  # (B,T)
    frame_bias: jnp.ndarray,  # (H,F,F) relative-frame bias table
    frame_ids: jnp.ndarray,  # (T,)
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """-> (B,H,A,T,dh)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _mm_attn(
        qm,
        km,
        vm,
        e,
        key_mask.astype(jnp.float32),
        frame_bias.astype(jnp.float32),
        jnp.asarray(frame_ids).astype(jnp.float32),
        interpret,
    )
