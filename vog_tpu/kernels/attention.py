"""Fused Pallas TPU attention with factored relative-frame bias.

The hottest op in the framework (SURVEY §3.1 "hottest"): VidGrnd's object
transformer and VOGNet's relative-position multimodal transformer
(reference ``code/transformer_code.py``), at up to T = 4000 proposal tokens
in the P100 SPAT regime (SURVEY §5 long-context row).

Design (SURVEY §7 hard part #2):
  * Flash-style: the (T, T) score matrix lives only in VMEM, one q-block
    at a time; softmax is computed in-block (the whole key dimension fits
    VMEM at T<=4096, so no online rescaling pass is needed).
  * Relative-position bias is *factored through frames*: the learned
    (H, F, F) table is expanded once in XLA to a per-key-column bias
    fbc (H, F, T); inside the kernel a bias tile is either a single
    frame row of fbc broadcast over the q block (fast path — every block
    whose q rows share one frame, e.g. 3/4 of P100-SPAT blocks) or a
    one-hot (bq,F)·(F,bk) matmul for frame-crossing blocks.  The (T, T)
    token-level bias never exists anywhere.
  * Backward is TWO fully-blocked Pallas kernels by default ("recompute"
    mode): dk/dv over grid (BH, nk, nq), then a dq+dfb kernel over
    (BH, nq, nk) that re-derives the probability/score-grad tiles from
    the forward logsumexp in VMEM — the (T, T) score-grad never touches
    HBM.  The alternative "emit" mode (VOG_FLASH_BWD=emit / bwd_mode=)
    writes masked ds tiles and finishes dq/dfb as XLA GEMMs; measured
    slower at both precisions with this kernel split (BASELINE.md
    §recompute-vs-emit) and it allocates a (BH,Tp,Tp) HBM buffer.
  * Padding: T is padded to the block (128 fwd / 512 bwd long-seq), head
    dim to the 128-lane tile; masked lanes use a finite -1e30 so
    fully-masked rows stay NaN free; frame ids are edge-padded to keep
    the pure-block test monotone.
  * Dispatch: ``model/transformer.py §attention`` routes T >= 1024 here
    and shorter sequences to XLA (measured crossover on v5e).

The XLA fallback (``model/transformer.py §xla_attention``) computes the
same math; ``tests/test_attention.py`` checks fwd+bwd parity in interpret
mode.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
LANE = 128


def _precision():
    """Kernel matmul precision follows jax_default_matmul_precision so the
    Pallas path and the XLA path stay comparable (the parity default is
    'highest'; 'default' trades fp32 exactness for ~4x MXU speed)."""
    cfg = jax.config.jax_default_matmul_precision
    if cfg in ("highest", "float32"):
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def _block_size(T: int) -> int:
    """Tile edge: bigger tiles amortize per-program overhead on long
    sequences; 128 keeps padding waste low on short ones."""
    return 512 if T > 1024 else 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------
def _bias_block(fbc_ref, fid_ref, qi, bq, k_lo, bk, n_frames):
    """(bq, bk) relative-frame bias tile from the precomputed per-column
    bias fbc (F, Tp).

    Fast path: when the whole q block lies in ONE frame (true for 3/4 of
    blocks in the P100-SPAT layout where a frame spans 400 tokens), the
    tile is a single dynamically-indexed row of fbc broadcast over rows —
    no matmul.  Mixed blocks fall back to a one-hot (bq,F)@(F,bk) matmul.
    """
    fq = fid_ref[pl.ds(qi * bq, bq), 0]  # (bq,)
    pure = fq[0] == fq[bq - 1]  # frame ids are monotone

    def pure_fn(_):
        # select the single frame row without dynamic indexing (Mosaic
        # rejects unaligned dynamic sublane loads): one-hot VPU reduction
        # over the F (<=40) rows
        fbc_tile = fbc_ref[0, :, pl.ds(k_lo, bk)]  # (F, bk)
        f_col = jax.lax.broadcasted_iota(jnp.int32, (n_frames, 1), 0)
        sel = (f_col == fq[0]).astype(jnp.float32)  # (F, 1)
        row = jnp.sum(fbc_tile * sel, axis=0, keepdims=True)  # (1, bk)
        return jnp.broadcast_to(row, (bq, bk))

    def mixed_fn(_):
        fbc_tile = fbc_ref[0, :, pl.ds(k_lo, bk)]  # (F, bk)
        f_range = jax.lax.broadcasted_iota(jnp.int32, (1, n_frames), 1)
        oq = (fq[:, None] == f_range).astype(jnp.float32)  # (bq, F)
        return jnp.dot(
            oq, fbc_tile, preferred_element_type=jnp.float32,
            precision=_precision(),
        )

    return jax.lax.cond(pure, pure_fn, mixed_fn, None)


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, fbc_ref, fid_ref, o_ref, lse_ref, *, scale, n_frames, bq):
    qi = pl.program_id(1)
    qb = q_ref[0]  # (bq, dh)
    kb = k_ref[0]  # (T, dh)
    s = jax.lax.dot_general(
        qb, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=_precision(),
    ) * scale  # (bq, T)

    Tp = kb.shape[0]
    bias = _bias_block(fbc_ref, fid_ref, qi, bq, 0, Tp, n_frames)  # (bq, T)

    mask = mask_ref[0, 0]  # (T,)
    s = jnp.where(mask[None, :] > 0, s + bias, NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(
        p / denom,
        v_ref[0],
        preferred_element_type=jnp.float32,
        precision=_precision(),
    )
    lse_ref[0] = m + jnp.log(denom)  # (bq, 1)


# --------------------------------------------------------------------------
# backward kernels
# --------------------------------------------------------------------------
def _dot(a, b, contract=((1,), (1,))):
    return jax.lax.dot_general(
        a,
        b,
        (contract, ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision(),
    )


def _block_tile(fid_ref, mask_ref, fbc_ref, qi, ki, scale, n_frames, bq, bk,
                q_blk, k_blk, lse_blk, do_blk, v_blk, delta_blk):
    """Shared recompute of the (bq, bk) probability tile + dS tile."""
    F = n_frames
    bias = _bias_block(fbc_ref, fid_ref, qi, bq, ki * bk, bk, F)

    s = _dot(q_blk, k_blk) * scale  # (bq, bk)
    mask_k = mask_ref[0, 0, pl.ds(ki * bk, bk)]  # (bk,)
    s = jnp.where(mask_k[None, :] > 0, s + bias, NEG)
    p = jnp.exp(s - lse_blk)  # (bq, bk)
    dp = _dot(do_blk, v_blk)  # (bq, bk)
    ds = p * (dp - delta_blk)
    ds_m = jnp.where(mask_k[None, :] > 0, ds, 0.0)
    return p, ds, ds_m


def _make_bwd_dkv_kernel(emit_ds: bool):
    """dk/dv backward kernel over grid (BH, nk, nq), i innermost.

    emit_ds=True ("emit" mode): the masked score-grad tile ds is ALSO
    written to HBM; dq (= scale · ds @ k) and the frame-bias grad
    (= onehot_f^T ds onehot_f) then run as plain XLA GEMMs over ds.

    emit_ds=False ("recompute" mode, the default at every precision): only
    dk/dv are produced here and a second kernel (`_bwd_dq_kernel`)
    recomputes the tiles to accumulate dq and the frame-bias grad in
    VMEM — no (T,T) tensor ever touches HBM.  Measured faster than emit
    at both bf16 and fp32-highest on-chip (VERDICT r3 weak #6 / item
    #5b; table in BASELINE.md §recompute-vs-emit) and it frees the
    (BH,Tp,Tp) HBM buffer that capped P100 batch headroom.
    """

    def kernel(
        q_ref, k_ref, v_ref, mask_ref, fbc_ref, fid_ref, do_ref, lse_ref,
        delta_ref, *out_refs, scale, n_frames, bq, bk
    ):
        dk_ref, dv_ref = out_refs[0], out_refs[1]
        ki = pl.program_id(1)
        i = pl.program_id(2)
        p, ds, ds_m = _block_tile(
            fid_ref, mask_ref, fbc_ref, i, ki, scale, n_frames, bq, bk,
            q_ref[0], k_ref[0], lse_ref[0], do_ref[0], v_ref[0], delta_ref[0],
        )

        @pl.when(i == 0)
        def _():
            dk_ref[0] = jnp.zeros_like(dk_ref[0])
            dv_ref[0] = jnp.zeros_like(dv_ref[0])

        dv_ref[0] += _dot(p, do_ref[0], contract=((0,), (0,)))  # (bk, dh)
        dk_ref[0] += _dot(ds, q_ref[0], contract=((0,), (0,))) * scale  # (bk, dh)
        if emit_ds:
            # DS layout is (BH, Tq, Tk); the out index_map swaps
            # (ki, i) -> (i, ki).  ds_m == ds wherever p > 0 (masked keys
            # have p = 0), so dq from ds_m is exact; dfb needs the masked
            # form.  At default precision ds is emitted bf16 (the ref
            # dtype): the consuming GEMMs round operands to bf16 on the
            # MXU anyway, so this halves the (T, T) HBM round-trip for
            # free (at highest precision the ref stays f32).
            out_refs[2][0] = ds_m.astype(out_refs[2].dtype)

    return kernel


_bwd_dkv_kernel = _make_bwd_dkv_kernel(True)
_bwd_dkv_noemit_kernel = _make_bwd_dkv_kernel(False)


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, mask_ref, fbc_ref, fid_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dfb_ref, *, scale, n_frames, bq, bk, fp_r, fp_c
):
    # Recompute-mode companion of the no-emit dkv kernel: grid (BH, nq, nk)
    # with j innermost; dq accumulates over j and the per-(B·H) frame-bias
    # grad accumulates over all (i, j) — its output block is revisited only
    # consecutively (b is the outermost grid axis), which Pallas allows.
    i = pl.program_id(1)
    j = pl.program_id(2)
    p, ds, ds_m = _block_tile(
        fid_ref, mask_ref, fbc_ref, i, j, scale, n_frames, bq, bk,
        q_ref[0], k_ref[0], lse_ref[0], do_ref[0], v_ref[0], delta_ref[0],
    )

    @pl.when(j == 0)
    def _():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    @pl.when((i == 0) & (j == 0))
    def _():
        dfb_ref[0] = jnp.zeros_like(dfb_ref[0])

    dq_ref[0] += _dot(ds_m, k_ref[0], contract=((1,), (0,))) * scale  # (bq, dh)
    # frame-bias grad tile: onehot_q^T @ ds_m @ onehot_k, padded to the
    # (fp_r, fp_c) register tile (rows %8, lanes %128); sliced back in XLA
    fq = fid_ref[pl.ds(i * bq, bq), 0]  # (bq,)
    fk = fid_ref[pl.ds(j * bk, bk), 0]  # (bk,)
    f_r = jax.lax.broadcasted_iota(jnp.int32, (1, fp_r), 1)
    f_c = jax.lax.broadcasted_iota(jnp.int32, (1, fp_c), 1)
    oq = (fq[:, None] == f_r).astype(jnp.float32)  # (bq, fp_r)
    ok = (fk[:, None] == f_c).astype(jnp.float32)  # (bk, fp_c)
    t = _dot(ds_m, ok, contract=((1,), (0,)))  # (bq, fp_c)
    dfb_ref[0] += _dot(oq, t, contract=((0,), (0,)))  # (fp_r, fp_c)


# --------------------------------------------------------------------------
# host-side padding + pallas_call plumbing
# --------------------------------------------------------------------------
def _pad_inputs(q, k, v, key_mask, frame_bias, frame_ids):
    B, H, T, dh = q.shape
    if frame_bias is None:
        frame_bias = jnp.zeros((H, 1, 1), jnp.float32)
        frame_ids = jnp.zeros((T,), jnp.int32)
    Fn = frame_bias.shape[-1]
    blk = _block_size(T)
    Tp = _round_up(T, blk)
    dp = _round_up(dh, LANE)

    def pad(x, t_axis, d_axis=None):
        cfg = [(0, 0)] * x.ndim
        cfg[t_axis] = (0, Tp - T)
        if d_axis is not None:
            cfg[d_axis] = (0, dp - dh)
        return jnp.pad(x, cfg)

    qf = pad(q, 2, 3).reshape(B * H, Tp, dp)
    kf = pad(k, 2, 3).reshape(B * H, Tp, dp)
    vf = pad(v, 2, 3).reshape(B * H, Tp, dp)
    mk = jnp.pad(key_mask.astype(jnp.float32), ((0, 0), (0, Tp - T)))[:, None, :]
    # edge-pad the frame ids: keeps them monotone so the pure-block fast
    # path test (first==last) stays valid across the padded tail
    fid_flat = jnp.pad(frame_ids.astype(jnp.int32), (0, Tp - T), mode="edge")
    fid = fid_flat[:, None]  # (Tp,1)
    # per-key-column bias, expanded once in XLA: fbc[h, f, j] = fb[h, f, f_j]
    fbc = frame_bias.astype(jnp.float32)[:, :, fid_flat]  # (H, F, Tp)
    return qf, kf, vf, mk, fbc, fid, (B, H, T, dh, Tp, dp, Fn)


def _fwd_call(qf, kf, vf, mk, fb, fid, dims, interpret):
    B, H, T, dh, Tp, dp, Fn = dims
    BH = B * H
    scale = 1.0 / (dh**0.5)
    # fwd keeps the full key dim in VMEM, so the q block stays small
    blk = 128
    grid = (BH, Tp // blk)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, n_frames=Fn, bq=blk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk, dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tp), lambda b, i: (b // H, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Fn, Tp), lambda b, i: (b % H, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Tp, 1), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, blk, dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Tp, dp), jnp.float32),
            jax.ShapeDtypeStruct((BH, Tp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, mk, fb, fid)
    return out, lse


def _flash_impl(q, k, v, key_mask, frame_bias, frame_ids, interpret):
    qf, kf, vf, mk, fb, fid, dims = _pad_inputs(q, k, v, key_mask, frame_bias, frame_ids)
    B, H, T, dh, Tp, dp, Fn = dims
    out, lse = _fwd_call(qf, kf, vf, mk, fb, fid, dims, interpret)
    o = out.reshape(B, H, Tp, dp)[:, :, :T, :dh]
    return o, (qf, kf, vf, mk, fb, fid, out, lse, dims)


# key_mask and frame_ids are data (can be tracers) so they must be regular
# diff args with zero cotangents; frame_ids travels as float32 to avoid
# float0 int-cotangent plumbing.  `interpret` (a static bool) and
# `bwd_mode` ("emit" | "recompute") are nondiff argnums.
@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _flash(q, k, v, key_mask, frame_bias, frame_ids_f, interpret, bwd_mode):
    o, _ = _flash_impl(
        q, k, v, key_mask, frame_bias, frame_ids_f.astype(jnp.int32), interpret
    )
    return o


def _flash_fwd(q, k, v, key_mask, frame_bias, frame_ids_f, interpret, bwd_mode):
    o, res = _flash_impl(
        q, k, v, key_mask, frame_bias, frame_ids_f.astype(jnp.int32), interpret
    )
    return o, res + (key_mask, frame_ids_f)


def _flash_bwd(interpret, bwd_mode, res, g):
    *res, key_mask_in, frame_ids_f = res
    res = tuple(res)
    qf, kf, vf, mk, fb, fid, out, lse, dims = res
    B, H, T, dh, Tp, dp, Fn = dims
    BH = B * H
    scale = 1.0 / (dh**0.5)

    do = jnp.pad(
        g.astype(jnp.float32), ((0, 0), (0, 0), (0, Tp - T), (0, dp - dh))
    ).reshape(BH, Tp, dp)
    delta = jnp.sum(do * out, axis=-1, keepdims=True)  # (BH, Tp, 1)

    blk = _block_size(T)
    nq = nk = Tp // blk
    fullm3 = lambda b, i, j: (b // H, 0, 0)
    fullb = lambda b, i, j: (b % H, 0, 0)
    fullfid = lambda b, i, j: (0, 0)
    emit = bwd_mode != "recompute"

    in_specs = [
        pl.BlockSpec((1, blk, dp), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk, dp), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk, dp), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Tp), fullm3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Fn, Tp), fullb, memory_space=pltpu.VMEM),
        pl.BlockSpec((Tp, 1), fullfid, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk, dp), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk, 1), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk, 1), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM),
    ]
    dkv_out_specs = [
        pl.BlockSpec((1, blk, dp), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk, dp), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
    ]
    dkv_out_shape = [
        jax.ShapeDtypeStruct((BH, Tp, dp), jnp.float32),
        jax.ShapeDtypeStruct((BH, Tp, dp), jnp.float32),
    ]
    if emit:
        # DS layout (BH, Tq, Tk); the out index_map swaps (ki, i) -> (i, ki).
        dkv_out_specs.append(
            pl.BlockSpec((1, blk, blk), lambda b, j, i: (b, i, j), memory_space=pltpu.VMEM)
        )
        # bf16 ds at default precision on-chip: 2x less HBM traffic for the
        # emit + the two consuming GEMMs, no extra rounding vs what the bf16
        # MXU already does to its operands (VERDICT r3 weak #6 revisit;
        # parity: verify_kernels default thresholds).  Interpret mode keeps
        # f32 — it exists to check exact math (CPU matmuls are true f32
        # there, so bf16 would only blur the parity tests).
        dkv_out_shape.append(
            jax.ShapeDtypeStruct(
                (BH, Tp, Tp),
                jnp.float32
                if interpret or _precision() == jax.lax.Precision.HIGHEST
                else jnp.bfloat16,
            )
        )

    # grid (BH, nk, nq): i innermost; dk/dv accumulate over i
    dkv_out = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel if emit else _bwd_dkv_noemit_kernel,
            scale=scale, n_frames=Fn, bq=blk, bk=blk,
        ),
        grid=(BH, nk, nq),
        in_specs=in_specs,
        out_specs=dkv_out_specs,
        out_shape=dkv_out_shape,
        interpret=interpret,
    )(qf, kf, vf, mk, fb, fid, do, lse, delta)

    def unpad(x):
        return x.reshape(B, H, Tp, dp)[:, :, :T, :dh]

    fid_flat = fid[:, 0]  # (Tp,)
    if emit:
        dk, dv, ds = dkv_out
        # dq and the frame-bias grad from the emitted ds tiles (plain GEMMs)
        prec = _precision()
        dq = jnp.einsum("bij,bjd->bid", ds, kf, precision=prec) * scale
        onehot = (
            fid_flat[:, None] == jnp.arange(Fn, dtype=fid_flat.dtype)[None, :]
        ).astype(jnp.float32)  # (Tp, F)
        dfb_per = jnp.einsum(
            "fi,bij,jg->bfg", onehot.T, ds, onehot, precision=prec
        )  # (BH, F, F)
        dfb = dfb_per.reshape(B, H, Fn, Fn).sum(axis=0)  # (H,F,F)
        dq = unpad(dq)
    else:
        dk, dv = dkv_out
        # second kernel recomputes the tiles for dq + dfb — the (T,T)
        # score-grad never leaves VMEM (wins at bf16 where matmul passes
        # are cheap and HBM bytes are not; see BASELINE.md)
        fp_r = _round_up(Fn, 8)
        fp_c = _round_up(Fn, LANE)
        dq_f, dfb_per = pl.pallas_call(
            functools.partial(
                _bwd_dq_kernel, scale=scale, n_frames=Fn, bq=blk, bk=blk,
                fp_r=fp_r, fp_c=fp_c,
            ),
            grid=(BH, nq, nk),
            in_specs=[
                pl.BlockSpec((1, blk, dp), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, blk, dp), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, blk, dp), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Tp), fullm3, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Fn, Tp), fullb, memory_space=pltpu.VMEM),
                pl.BlockSpec((Tp, 1), fullfid, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, blk, dp), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, blk, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, blk, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, blk, dp), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, fp_r, fp_c), lambda b, i, j: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((BH, Tp, dp), jnp.float32),
                jax.ShapeDtypeStruct((BH, fp_r, fp_c), jnp.float32),
            ],
            interpret=interpret,
        )(qf, kf, vf, mk, fb, fid, do, lse, delta)
        dq = unpad(dq_f)
        dfb = dfb_per[:, :Fn, :Fn].reshape(B, H, Fn, Fn).sum(axis=0)

    return (
        dq,
        unpad(dk),
        unpad(dv),
        jnp.zeros_like(key_mask_in),
        dfb,
        jnp.zeros_like(frame_ids_f),
    )


_flash.defvjp(_flash_fwd, _flash_bwd)


def _resolve_bwd_mode(mode: Optional[str]) -> str:
    """Backward strategy: "emit" writes the (T,T) score-grad to HBM and
    finishes dq/dfb as XLA GEMMs; "recompute" runs a second kernel that
    re-derives the tiles in VMEM.  Default ("auto", overridable via
    VOG_FLASH_BWD): recompute at BOTH precisions — measured on-chip at
    P100 shape (T=4000, BH=8; BASELINE.md §recompute-vs-emit): 3.53 vs
    4.02 ms at default/bf16 and 9.95 vs 11.08 ms at highest, and it
    removes the (BH,Tp,Tp) HBM allocation (537 MB f32 / 268 MB bf16 at
    P100) that capped batch headroom.  Round-1's opposite finding was an
    artifact of the old two-kernel design: its dq kernel duplicated the
    full tile recompute AND the emit mode's consuming GEMMs are
    themselves 6-pass at highest — the shared-tile dq+dfb kernel flips
    the tradeoff at every precision."""
    import os

    if mode is None or mode == "auto":
        mode = os.environ.get("VOG_FLASH_BWD", "auto")
    if mode == "auto":
        mode = "recompute"
    if mode not in ("emit", "recompute"):
        raise ValueError(f"bad flash bwd_mode {mode!r}")
    return mode


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: jnp.ndarray,
    frame_bias: Optional[jnp.ndarray] = None,
    frame_ids: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
    bwd_mode: Optional[str] = None,
) -> jnp.ndarray:
    """Fused attention.  q,k,v (B,H,T,dh); key_mask (B,T);
    frame_bias (H,F,F) or None; frame_ids (T,) token->frame map."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H, T = q.shape[1], q.shape[2]
    if frame_bias is None:
        # constant-zero bias through the same code path; its grad is
        # discarded because the zeros constant has no upstream users
        frame_bias = jnp.zeros((H, 1, 1), jnp.float32)
        frame_ids = jnp.zeros((T,), jnp.int32)
    return _flash(
        q,
        k,
        v,
        key_mask.astype(jnp.float32),
        frame_bias,
        jnp.asarray(frame_ids).astype(jnp.float32),
        interpret,
        _resolve_bwd_mode(bwd_mode),
    )
