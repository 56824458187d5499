"""Fused shared-QK multi-arg attention (VOGNet's decomposed mm layer).

The arg-decomposed first multimodal layer (see
``model/transformer.py §DecomposedRelAttention``) computes, per head and
arg, the combined-logit softmax

  out_a = softmax_j(s_ij + cn_aj) @ vm,   s = qm km^T + bias (masked)

where ``cn`` is the per-arg log-domain key weighting (qg_a·km, max-
normalized).  Round-5 change: the original product form
w·e_a / Σ w·e_a (one shared exp, per-arg key reweighting) is exact in
real arithmetic but its denominator underflows f32 once training
sharpens w and e onto disjoint keys (measured 1e-26; the division
backward's denom² then underflows to 0 -> inf -> NaN).  The per-arg
combined row max keeps every denominator >= 1 by construction; cost is
A exps per tile (VPU) while every MXU contraction stays batched.

The XLA implementation materializes w (B,H,T,T) and the per-arg value
streams e∘vm (B,H,A,T,dh) in HBM (~27 ms of the 80 ms P100 step in the
round-1 profile).  This kernel is a flash-style rewrite:

  * **Online softmax over k-tiles** — running row max + rescaling, so the
    whole key axis never needs to sit in VMEM and T is unbounded.
  * **Batched A streams** (round-1 backlog item): per k-tile the A
    per-arg probability tiles stack into ONE (A·bq, bk) matrix, so the
    value contraction is a single (A·bq, bk) @ (bk, dh) MXU matmul
    instead of A small ones.  The backward batches the same way: the
    per-arg g @ vm^T products run as one (A·bq, dh) @ (dh, bk) GEMM,
    and dv as one (bk, A·bq) @ (A·bq, dh).
  * cn, m, den, delta travel TRANSPOSED as (BH, T, A) so per-arg columns
    are natural (rows, 1) sublane tiles (Mosaic cannot reshape lanes
    into sublanes).
  * The relative-frame bias uses the same factored per-key-column form
    (fbc = fb[:, :, frame_ids]) and frame-pure fast path as
    ``kernels/attention.py``; the backward recomputes p tiles from the
    saved per-arg row max (softmax shift invariance makes treating the
    max as a constant exact) and the saved per-arg denominators.
  * The backward default is ONE kernel (dk/dv/dcn) that also EMITS the
    summed score-grad tiles comb = Σ_a ds_a; dq (= comb @ km) and the
    frame-bias grad (= onehot^T comb onehot) then run as plain XLA
    GEMMs.  A "recompute"
    mode (VOG_MM_BWD / bwd_mode=) adds a second dq+dfb kernel instead,
    keeping the (T,T) score-grad out of HBM — measured SLOWER here at
    both precisions (unlike kernels/attention.py, whose recompute only
    re-derives 2 cheap passes: the mm tile recompute must redo the
    (A·bq, dh) gv stack), so it exists for memory-capped batch sizes;
    numbers in BASELINE.md §recompute-vs-emit.  (Pallas cannot express
    the single-pass merge: output blocks must not be revisited
    non-consecutively.)

Measured (TPU v5e, P100 shapes B=2 H=4 A=5 T=4000, fp32-highest):
isolated op fwd+bwd 28.98 ms vs 28.73 XLA materialized; in-model P100
step 81.1 ms vs 84.3 — and fwd HBM drops by the ~700 MB w/ev tensors.
Verified against the XLA math in tests/test_mm_attention.py (interpret
mode, fwd + all grads) and on-chip (maxdiff ≤ 7e-7 all grads).  Default
ON for TPU + T >= PALLAS_MIN_T (``mdl.mm_kernel``).
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
# forward: grid (BH, nq, nk) — online softmax, k innermost
# --------------------------------------------------------------------------
def _fwd_kernel(qm_ref, km_ref, vm_ref, ct_ref, mask_ref, fbc_ref, fid_ref,
                o_ref, mrow_ref, den_ref, num_acc, den_acc, m_run,
                *, n_args, n_frames, bq, bk, nk):
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    A = n_args

    @pl.when(ki == 0)
    def _():
        num_acc[:] = jnp.zeros_like(num_acc[:])
        den_acc[:] = jnp.zeros_like(den_acc[:])
        m_run[:] = jnp.full_like(m_run[:], NEG)

    qb = qm_ref[0]  # (bq, dh) — caller pre-scales qm
    kb = km_ref[0]  # (bk, dh)
    vb = vm_ref[0]  # (bk, dh)
    ct = ct_ref[0]  # (bk, A) — per-arg log-domain key weights cn
    dh = qb.shape[-1]

    s = _dot(qb, kb)  # (bq, bk)
    s = s + _bias_block(fbc_ref, fid_ref, qi, bq, 0, bk, n_frames)
    mask_k = mask_ref[0, 0]  # (bk,)
    s = jnp.where(mask_k[None, :] > 0, s, NEG)

    # per-arg COMBINED-logit online softmax: t_a = s + cn_a, with a
    # per-arg running row max, so every final denominator is >= 1
    # (exp(0)=1 at the row max).  The round-4 product form
    # w·e / Σ w·e underflowed f32 once training sharpened both factors
    # onto disjoint keys (denominators hit 1e-26 and the division
    # backward's denom² underflowed to 0 -> inf -> NaN; see
    # model/transformer.py §DecomposedRelAttention for the full story).
    # Cost vs the shared-exp form: A exps/maxes per tile (VPU); the
    # value contraction stays ONE MXU GEMM via the (A·bq, bk) stack.
    ps = []
    for a in range(A):
        t = s + ct[:, a][None, :]  # (bq, bk)
        m_prev = m_run[:, a : a + 1]
        m_new = jnp.maximum(m_prev, jnp.max(t, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)  # (bq, 1)
        p = jnp.exp(t - m_new)
        ps.append(p)
        den_acc[:, a : a + 1] = den_acc[:, a : a + 1] * alpha + jnp.sum(
            p, axis=-1, keepdims=True
        )
        num_acc[:, a * dh : (a + 1) * dh] = (
            num_acc[:, a * dh : (a + 1) * dh] * alpha
        )
        m_run[:, a : a + 1] = m_new
    # one batched (A·bq, bk) @ (bk, dh) GEMM for all A value streams
    nu = _dot(jnp.concatenate(ps, axis=0), vb, contract=((1,), (0,)))
    for a in range(A):
        num_acc[:, a * dh : (a + 1) * dh] += nu[a * bq : (a + 1) * bq]

    @pl.when(ki == nk - 1)
    def _():
        mrow_ref[0] = m_run[:]
        den_ref[0] = den_acc[:]
        for a in range(A):
            # den >= 1 by construction — no epsilon clamp needed
            o_ref[0, a] = num_acc[:, a * dh : (a + 1) * dh] / den_acc[
                :, a : a + 1
            ]


# --------------------------------------------------------------------------
# backward tiles
# --------------------------------------------------------------------------
def _tile_s(qm_blk, km_blk, bias_t, mask_k):
    s = _dot(qm_blk, km_blk) + bias_t
    return jnp.where(mask_k[None, :] > 0, s, NEG)  # (bq, bk)


def _gv_stack(g_blk, vm_blk, A, bq):
    """All A per-arg g_a @ vm^T products as one batched GEMM.

    g_blk (A, bq, dh) -> (A*bq, dh); result (A*bq, bk)."""
    dh = g_blk.shape[-1]
    gf = g_blk.reshape(A * bq, dh)
    return _dot(gf, vm_blk)  # (A*bq, bk)


def _make_bwd_dkv_kernel(emit_ds: bool):
    """dk/dv/dcn backward kernel over grid (BH, nk, nq), i innermost.

    Per-arg combined-logit form (see _fwd_kernel): p_a = exp(s + cn_a -
    m_a) with saved per-arg row max m and denominator den >= 1, so every
    inv_d is bounded by 1 — no epsilon clamps, no underflow singularity.
    Standard softmax backward per arg: ds_a = p_a ∘ (gv_a - delta_a)/den;
    comb = Σ_a ds_a serves dk (and dq/dfb downstream).

    emit_ds=True: comb is ALSO written to HBM; dq (= comb @ km) and the
    frame-bias grad (= onehot^T comb onehot) then run as plain XLA
    GEMMs.  emit_ds=False ("recompute"): a second kernel
    (`_bwd_dq_kernel`) re-derives the tiles in VMEM — no (T,T) tensor in
    HBM.  Mode choice + measurements: BASELINE.md §recompute-vs-emit."""

    def kernel(qm_ref, km_ref, vm_ref, cf_ref, mask_ref, fbc_ref,
               fid_ref, g_ref, m_ref, den_ref, delta_ref,
               *out_refs, n_args, n_frames, blk):
        dk_ref, dv_ref, dc_ref = out_refs[0], out_refs[1], out_refs[2]
        j = pl.program_id(1)
        i = pl.program_id(2)
        A = n_args
        mask_k = mask_ref[0, 0, pl.ds(j * blk, blk)]
        bias_t = _bias_block(fbc_ref, fid_ref, i, blk, j * blk, blk, n_frames)
        s = _tile_s(qm_ref[0], km_ref[0], bias_t, mask_k)
        gv = _gv_stack(g_ref[0], vm_ref[0], A, blk)  # (A*bq, bk)
        cf = cf_ref[0]  # (A, bk) — per-arg log-domain key weights
        m = m_ref[0]  # (bq, A) — per-arg row max
        den = den_ref[0]  # (bq, A)
        delta = delta_ref[0]  # (bq, A)

        @pl.when(i == 0)
        def _():
            dk_ref[0] = jnp.zeros_like(dk_ref[0])
            dv_ref[0] = jnp.zeros_like(dv_ref[0])
            dc_ref[0] = jnp.zeros_like(dc_ref[0])

        comb = jnp.zeros_like(s)
        ps, gs = [], []
        for a in range(A):
            inv_d = 1.0 / den[:, a : a + 1]  # den >= 1 by construction
            p = jnp.exp(s + cf[a][None, :] - m[:, a : a + 1])  # (bq, bk)
            term = gv[a * blk : (a + 1) * blk] - delta[:, a : a + 1]
            ds_a = p * (term * inv_d)
            comb = comb + ds_a
            dc_ref[0, a] += jnp.sum(ds_a, axis=0)  # (bk,)
            ps.append(p * inv_d)
            gs.append(g_ref[0, a])  # (bq, dh)
        comb = jnp.where(mask_k[None, :] > 0, comb, 0.0)

        # dv = Σ_a (p_a/den_a)^T g_a: ONE (bk, A·bq) @ (A·bq, dh) GEMM
        # over the stacked streams
        pstack = jnp.concatenate(ps, axis=0)  # (A*bq, bk)
        gstack = jnp.concatenate(gs, axis=0)  # (A*bq, dh)
        dv_ref[0] += _dot(pstack, gstack, contract=((0,), (0,)))
        dk_ref[0] += _dot(comb, qm_ref[0], contract=((0,), (0,)))
        if emit_ds:
            # DS layout (BH, Tq, Tk); the out index_map swaps (j, i) -> (i, j)
            out_refs[3][0] = comb.astype(out_refs[3].dtype)

    return kernel


_bwd_dkv_kernel = _make_bwd_dkv_kernel(True)
_bwd_dkv_noemit_kernel = _make_bwd_dkv_kernel(False)


def _bwd_dq_kernel(qm_ref, km_ref, vm_ref, cf_ref, mask_ref, fbc_ref, fid_ref,
                   g_ref, m_ref, den_ref, delta_ref,
                   dq_ref, dfb_ref, *, n_args, n_frames, blk, fp_r, fp_c):
    # Recompute-mode companion (grid (BH, nq, nk), j innermost): re-derives
    # the per-arg p/gv/ds tiles in VMEM to accumulate dq over j and the
    # per-(B·H) frame-bias grad over all (i, j) — the (T,T) score-grad
    # never touches HBM.  Output-block revisits are consecutive (b
    # outermost), as Pallas requires.
    i = pl.program_id(1)
    j = pl.program_id(2)
    A = n_args
    mask_k = mask_ref[0, 0, pl.ds(j * blk, blk)]
    bias_t = _bias_block(fbc_ref, fid_ref, i, blk, j * blk, blk, n_frames)
    s = _tile_s(qm_ref[0], km_ref[0], bias_t, mask_k)
    gv = _gv_stack(g_ref[0], vm_ref[0], A, blk)  # (A*bq, bk)
    cf = cf_ref[0]  # (A, bk)
    m = m_ref[0]  # (bq, A)
    den = den_ref[0]  # (bq, A)
    delta = delta_ref[0]  # (bq, A)
    comb = jnp.zeros_like(s)
    for a in range(A):
        inv_d = 1.0 / den[:, a : a + 1]  # den >= 1 by construction
        p = jnp.exp(s + cf[a][None, :] - m[:, a : a + 1])
        term = gv[a * blk : (a + 1) * blk] - delta[:, a : a + 1]
        comb = comb + p * (term * inv_d)
    ds = jnp.where(mask_k[None, :] > 0, comb, 0.0)

    @pl.when(j == 0)
    def _():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    @pl.when((i == 0) & (j == 0))
    def _():
        dfb_ref[0] = jnp.zeros_like(dfb_ref[0])

    dq_ref[0] += _dot(ds, km_ref[0], contract=((1,), (0,)))  # (bq, dh)
    fq = fid_ref[pl.ds(i * blk, blk), 0]
    fk = fid_ref[pl.ds(j * blk, blk), 0]
    f_r = jax.lax.broadcasted_iota(jnp.int32, (1, fp_r), 1)
    f_c = jax.lax.broadcasted_iota(jnp.int32, (1, fp_c), 1)
    oq = (fq[:, None] == f_r).astype(jnp.float32)  # (bq, fp_r)
    ok = (fk[:, None] == f_c).astype(jnp.float32)  # (bk, fp_c)
    t = _dot(ds, ok, contract=((1,), (0,)))  # (bq, fp_c)
    dfb_ref[0] += _dot(oq, t, contract=((0,), (0,)))  # (fp_r, fp_c)


# --------------------------------------------------------------------------
# plumbing
# --------------------------------------------------------------------------
def _prep(qm, km, vm, cn, key_mask, frame_bias, frame_ids):
    B, H, T, dh = qm.shape
    A = cn.shape[2]
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
    # cn transposed to (BH, Tp, A): per-arg columns are natural sublane
    # tiles.  Padded key positions get cn=0 — harmless, the padded s is
    # NEG there.
    ct = jnp.pad(cn, ((0, 0), (0, 0), (0, 0), (0, Tp - T))).reshape(
        BH, A, Tp
    ).transpose(0, 2, 1)
    mk = jnp.pad(key_mask.astype(jnp.float32), ((0, 0), (0, Tp - T)))[:, None, :]
    fid_flat = jnp.pad(frame_ids.astype(jnp.int32), (0, Tp - T), mode="edge")
    fid = fid_flat[:, None]
    fbc = frame_bias.astype(jnp.float32)[:, :, fid_flat]  # (H, F, Tp)
    return qf, kf, vf, ct, mk, fbc, fid, (B, H, A, T, dh, Tp, dp, blk, Fn)


def _fwd(qf, kf, vf, ct, mk, fbc, fid, dims, interpret):
    B, H, A, T, dh, Tp, dp, blk, Fn = dims
    BH = B * H
    bq = bk = blk
    nk = Tp // bk
    grid = (BH, Tp // bq, nk)
    V = pltpu.VMEM
    out, mrow, den = pl.pallas_call(
        functools.partial(
            _fwd_kernel, n_args=A, n_frames=Fn, bq=bq, bk=bk, nk=nk
        ),
        # the A per-arg probability tiles + their (A·bq, bk) stack live
        # simultaneously: 20.4 MB scoped at P100 blk=512 vs the 16 MB
        # default budget (caught by the on-chip gate, round 5 — same fix
        # as kernels/grounding_head.py)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda b, i, k: (b, i, 0), memory_space=V),
            pl.BlockSpec((1, bk, dp), lambda b, i, k: (b, k, 0), memory_space=V),
            pl.BlockSpec((1, bk, dp), lambda b, i, k: (b, k, 0), memory_space=V),
            pl.BlockSpec((1, bk, A), lambda b, i, k: (b, k, 0), memory_space=V),
            pl.BlockSpec((1, 1, bk), lambda b, i, k: (b // H, 0, k), memory_space=V),
            pl.BlockSpec((1, Fn, bk), lambda b, i, k: (b % H, 0, k), memory_space=V),
            pl.BlockSpec((Tp, 1), lambda b, i, k: (0, 0), memory_space=V),
        ],
        out_specs=[
            pl.BlockSpec((1, A, bq, dp), lambda b, i, k: (b, 0, i, 0), memory_space=V),
            pl.BlockSpec((1, bq, A), lambda b, i, k: (b, i, 0), memory_space=V),
            pl.BlockSpec((1, bq, A), lambda b, i, k: (b, i, 0), memory_space=V),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, A, Tp, dp), jnp.float32),
            jax.ShapeDtypeStruct((BH, Tp, A), jnp.float32),  # per-arg row max
            jax.ShapeDtypeStruct((BH, Tp, A), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, A * dp), jnp.float32),  # num_acc
            pltpu.VMEM((bq, A), jnp.float32),  # den_acc
            pltpu.VMEM((bq, A), jnp.float32),  # m_run (per-arg)
        ],
        interpret=interpret,
    )(qf, kf, vf, ct, mk, fbc, fid)
    return out, mrow, den


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _mm_attn(qm, km, vm, cn, key_mask, frame_bias, frame_ids_f, interpret, bwd_mode):
    out, _ = _mm_attn_fwd(
        qm, km, vm, cn, key_mask, frame_bias, frame_ids_f, interpret, bwd_mode
    )
    return out


def _mm_attn_fwd(qm, km, vm, cn, key_mask, frame_bias, frame_ids_f, interpret,
                 bwd_mode):
    qf, kf, vf, ct, mk, fbc, fid, dims = _prep(
        qm, km, vm, cn, key_mask, frame_bias, frame_ids_f.astype(jnp.int32)
    )
    B, H, A, T, dh, Tp, dp, blk, Fn = dims
    out, mrow, den = _fwd(qf, kf, vf, ct, mk, fbc, fid, dims, interpret)
    o = out.reshape(B, H, A, Tp, dp)[:, :, :, :T, :dh]
    res = (qf, kf, vf, ct, mk, fbc, fid, out, mrow, den, dims, key_mask, frame_ids_f)
    return o, res


def _mm_attn_bwd(interpret, bwd_mode, res, g):
    (qf, kf, vf, ct, mk, fbc, fid, out, mrow, den, dims,
     key_mask_in, frame_ids_f) = res
    B, H, A, T, dh, Tp, dp, blk, Fn = dims
    BH = B * H
    gf = jnp.pad(
        g.astype(jnp.float32), ((0, 0), (0, 0), (0, 0), (0, Tp - T), (0, dp - dh))
    ).reshape(BH, A, Tp, dp)
    # delta transposed to (BH, Tp, A) like den (q-side columns); cn back to
    # row-major (BH, A, Tp) for the key-side lane broadcasts
    delta = jnp.sum(gf * out, axis=-1).transpose(0, 2, 1)  # (BH, Tp, A)
    cf = ct.transpose(0, 2, 1)  # (BH, A, Tp)

    # the batched (A*blk, ·) stacks cap the useful tile size; 256 keeps the
    # A=5 stacks (~0.65 MB each) and the weight tiles within VMEM
    blk = min(blk, 256)
    nq = nk = Tp // blk
    V = pltpu.VMEM
    emit = bwd_mode != "recompute"

    dkv_out_specs = [
        pl.BlockSpec((1, blk, dp), lambda b, j, i: (b, j, 0), memory_space=V),
        pl.BlockSpec((1, blk, dp), lambda b, j, i: (b, j, 0), memory_space=V),
        pl.BlockSpec((1, A, blk), lambda b, j, i: (b, 0, j), memory_space=V),
    ]
    dkv_out_shape = [
        jax.ShapeDtypeStruct((BH, Tp, dp), jnp.float32),
        jax.ShapeDtypeStruct((BH, Tp, dp), jnp.float32),
        jax.ShapeDtypeStruct((BH, A, Tp), jnp.float32),
    ]
    if emit:
        dkv_out_specs.append(
            pl.BlockSpec((1, blk, blk), lambda b, j, i: (b, i, j), memory_space=V)
        )
        # bf16 ds emit at on-chip default precision (same rationale as
        # kernels/attention.py: the consuming GEMMs round to bf16 on the
        # MXU anyway; halves the (T,T) HBM round-trip).  f32 at highest
        # precision and in interpret-mode parity tests.
        dkv_out_shape.append(
            jax.ShapeDtypeStruct(
                (BH, Tp, Tp),
                jnp.float32
                if interpret or _precision() == jax.lax.Precision.HIGHEST
                else jnp.bfloat16,
            )
        )

    dkv_out = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel if emit else _bwd_dkv_noemit_kernel,
            n_args=A, n_frames=Fn, blk=blk,
        ),
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
            pl.BlockSpec((1, blk, A), lambda b, j, i: (b, i, 0), memory_space=V),
            pl.BlockSpec((1, blk, A), lambda b, j, i: (b, i, 0), memory_space=V),
            pl.BlockSpec((1, blk, A), lambda b, j, i: (b, i, 0), memory_space=V),
        ],
        out_specs=dkv_out_specs,
        out_shape=dkv_out_shape,
        interpret=interpret,
    )(qf, kf, vf, cf, mk, fbc, fid, gf, mrow, den, delta)

    def unpad3(x):
        return x.reshape(B, H, Tp, dp)[:, :, :T, :dh]

    fid_flat = fid[:, 0]  # (Tp,)
    if emit:
        dk, dv, dc, ds = dkv_out
        # dq and the frame-bias grad from the emitted ds tiles — plain GEMMs
        # (precision matches the kernels so parity holds at 'highest')
        prec = _precision()
        dq = jnp.einsum("bij,bjd->bid", ds, kf, precision=prec)
        onehot = (
            fid_flat[:, None] == jnp.arange(Fn, dtype=fid_flat.dtype)[None, :]
        ).astype(jnp.float32)  # (Tp, F)
        dfb_per = jnp.einsum(
            "fi,bij,jg->bfg", onehot.T, ds, onehot, precision=prec
        )  # (BH, F, F)
        dfb = dfb_per.reshape(B, H, Fn, Fn).sum(axis=0)  # (H,F,F)
        dq = unpad3(dq)
    else:
        dk, dv, dc = dkv_out
        fp_r = _round_up(Fn, 8)
        fp_c = _round_up(Fn, LANE)
        dq_f, dfb_per = pl.pallas_call(
            functools.partial(
                _bwd_dq_kernel, n_args=A, n_frames=Fn, blk=blk,
                fp_r=fp_r, fp_c=fp_c,
            ),
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
                pl.BlockSpec((1, blk, A), lambda b, i, j: (b, i, 0), memory_space=V),
                pl.BlockSpec((1, blk, A), lambda b, i, j: (b, i, 0), memory_space=V),
                pl.BlockSpec((1, blk, A), lambda b, i, j: (b, i, 0), memory_space=V),
            ],
            out_specs=[
                pl.BlockSpec((1, blk, dp), lambda b, i, j: (b, i, 0), memory_space=V),
                pl.BlockSpec((1, fp_r, fp_c), lambda b, i, j: (b, 0, 0), memory_space=V),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((BH, Tp, dp), jnp.float32),
                jax.ShapeDtypeStruct((BH, fp_r, fp_c), jnp.float32),
            ],
            interpret=interpret,
        )(qf, kf, vf, cf, mk, fbc, fid, gf, mrow, den, delta)
        dq = unpad3(dq_f)
        dfb = dfb_per[:, :Fn, :Fn].reshape(B, H, Fn, Fn).sum(axis=0)

    dcn = dc.reshape(B, H, A, Tp)[:, :, :, :T]
    return (
        dq,
        unpad3(dk),
        unpad3(dv),
        dcn,
        jnp.zeros_like(key_mask_in),
        dfb,
        jnp.zeros_like(frame_ids_f),
    )


_mm_attn.defvjp(_mm_attn_fwd, _mm_attn_bwd)


def _resolve_mm_bwd_mode(mode: Optional[str]) -> str:
    """Backward strategy (see `_make_bwd_dkv_kernel`): "emit" vs
    "recompute", default via VOG_MM_BWD / auto.  Auto = EMIT — the
    opposite of kernels/attention.py, and for a measured reason
    (BASELINE.md §recompute-vs-emit): the mm recompute must redo the
    (A·bq, dh) @ (dh, bk) gv stack per tile (A+1 extra MXU passes per
    (T,T) element vs flash's 2), which costs more than the ds HBM
    round-trip at every precision — full P100 step 31.3 ms emit vs
    33.9 ms recompute at default, 85.2 vs 92.7 at highest.  Recompute
    stays available for memory-capped cases: it frees the (BH,Tp,Tp)
    HBM buffer (537 MB f32 / 268 MB bf16 at P100 B=2)."""
    import os

    if mode is None or mode == "auto":
        mode = os.environ.get("VOG_MM_BWD", "auto")
    if mode == "auto":
        mode = "emit"
    if mode not in ("emit", "recompute"):
        raise ValueError(f"bad mm bwd_mode {mode!r}")
    return mode


def mm_shared_qk_attention(
    qm: jnp.ndarray,  # (B,H,T,dh) — caller folds the 1/sqrt(dh) scale in
    km: jnp.ndarray,
    vm: jnp.ndarray,
    cn: jnp.ndarray,  # (B,H,A,T) per-arg log-domain key weights (c max-normalized)
    key_mask: jnp.ndarray,  # (B,T)
    frame_bias: jnp.ndarray,  # (H,F,F) relative-frame bias table
    frame_ids: jnp.ndarray,  # (T,)
    interpret: Optional[bool] = None,
    bwd_mode: Optional[str] = None,
) -> jnp.ndarray:
    """-> (B,H,A,T,dh)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _mm_attn(
        qm,
        km,
        vm,
        cn,
        key_mask.astype(jnp.float32),
        frame_bias.astype(jnp.float32),
        jnp.asarray(frame_ids).astype(jnp.float32),
        interpret,
        _resolve_mm_bwd_mode(bwd_mode),
    )
