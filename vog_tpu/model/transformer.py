"""Transformers: object self-attention + relative-position multimodal.

Reference parity: ``code/transformer_code.py`` — the reference implements a
small post-LN transformer (``Transformer``/``MultiHeadAttention``) used by
VidGrnd as the *object transformer* (self-attention over all proposals
across frames + temporal position encoding, grounded-video-description
lineage) and a relative-position variant (``RelTransformer`` /
``RelativeAttention`` [C-MED symbols]) used by VOGNet's multimodal
transformer, where the attention logits get a bias that depends on the
relative frame index of the two proposals.

TPU-first design: attention is computed per head as (B,H,T,dh) batched
matmuls (MXU); the relative-position bias is factored through the *frame*
axis — a tiny learned table (H, 2K+1) -> per-frame-pair bias (H,F',F') ->
expanded to tokens by static gather — instead of materializing a (T,T)
embedding lookup per pair as a torch implementation would.  The fused
Pallas flash-attention path (``vog_tpu/kernels/attention.py``) consumes the
same (H,F',F') factored bias so the (T,T) score matrix never hits HBM.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vog_tpu.config import Cfg
from vog_tpu.model.dtypes import act_dtype


def sinusoidal_pe(positions: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sinusoidal position encoding of integer positions -> (len(pos), dim)."""
    pos = positions.astype(jnp.float32)[:, None]
    half = dim // 2
    freq = jnp.exp(-np.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    ang = pos * freq[None, :]
    pe = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    if pe.shape[-1] < dim:
        pe = jnp.pad(pe, ((0, 0), (0, dim - pe.shape[-1])))
    return pe


def xla_attention(
    q: jnp.ndarray,  # (B,H,T,dh)
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: jnp.ndarray,  # (B,T) 1=valid key
    frame_bias: Optional[jnp.ndarray] = None,  # (H,F,F)
    frame_ids: Optional[jnp.ndarray] = None,  # (T,)
) -> jnp.ndarray:
    dh = q.shape[-1]
    # logits + softmax stay fp32 under the bf16 activation policy (the QK
    # matmul accumulates fp32; only the probability matrix is cast back
    # for the PV matmul) — exact no-op when q/k/v are already fp32
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(dh))
    if frame_bias is not None:
        tok_bias = frame_bias[:, frame_ids][:, :, frame_ids]  # (H,T,T)
        logits = logits + tok_bias[None]
    neg = jnp.finfo(logits.dtype).min
    logits = jnp.where(key_mask[:, None, None, :] > 0, logits, neg)
    w = jax.nn.softmax(logits, axis=-1)
    # fully-masked query rows would softmax over all -inf; key_mask always
    # has >=1 valid key in practice (frame 0 props), so no NaN guard needed
    return jnp.einsum(
        "bhqk,bhkd->bhqd", w.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)


# below this sequence length XLA's fused attention wins (kernel setup
# overhead dominates; measured on v5e: T=200 XLA 15% faster, T=4000 the
# Pallas kernel is 25% faster fwd and avoids the (H,T,T) HBM bias).
# Env-overridable (VOG_PALLAS_MIN_T) for A/B at other shapes: the
# round-5 combined-logit mm fallback materializes A (B,H,T,T) exps in
# HBM, so the mm KERNEL threshold may want to differ — see
# MM_PALLAS_MIN_T below.
import os as _os

PALLAS_MIN_T = int(_os.environ.get("VOG_PALLAS_MIN_T", "1024"))
# the mm kernel's own gate: measured round-5 after the combined-logit
# change (BASELINE §Round-5 sweep) — the fallback's A per-arg (B,H,T,T)
# exp tensors grow HBM traffic with B, while the kernel keeps tiles in
# VMEM, so the kernel can win at GT5 T=200 for larger batches
MM_PALLAS_MIN_T = int(_os.environ.get("VOG_MM_PALLAS_MIN_T", "1024"))


def attention(
    q,
    k,
    v,
    key_mask,
    frame_bias=None,
    frame_ids=None,
    use_pallas: bool = False,
    sequence_parallel: bool = False,
):
    """Dispatch: sequence-parallel ring attention when an SP mesh is
    installed (token axis sharded over the mesh 'model' axis), else the
    fused Pallas kernel on TPU for long sequences, else plain XLA."""
    T = q.shape[2]
    dt = q.dtype
    if sequence_parallel:
        from vog_tpu.train.dist import sequence_parallel as _sp

        sp = _sp()
        if sp is not None and T % sp[0].shape[sp[1]] == 0:
            from vog_tpu.kernels.ring_attention import ring_attention

            # kernel operands stay fp32 (see model/dtypes.py)
            return ring_attention(
                q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32), key_mask, frame_bias, frame_ids,
                mesh=sp[0], axis=sp[1],
            ).astype(dt)
    if use_pallas and T >= PALLAS_MIN_T and jax.default_backend() == "tpu":
        from vog_tpu.kernels.attention import flash_attention

        return flash_attention(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32), key_mask, frame_bias, frame_ids,
        ).astype(dt)
    return xla_attention(q, k, v, key_mask, frame_bias, frame_ids)


class MultiHeadAttention(nn.Module):
    """Post-LN MHA block (reference ``transformer_code.py
    §MultiHeadAttention``); no positional bias (VidGrnd adds sinusoidal
    temporal PE to the inputs instead — see ObjectTransformer)."""

    cfg: Cfg

    @nn.compact
    def __call__(self, x, key_mask, frame_ids=None, deterministic=True):
        m = self.cfg.mdl
        dt = act_dtype(self.cfg)
        B, T, D = x.shape
        H = m.n_heads
        dh = D // H
        qkv = nn.Dense(3 * D, dtype=dt, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, T, H, dh).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        out = attention(
            q,
            k,
            v,
            key_mask,
            None,
            frame_ids,
            use_pallas=m.use_pallas_attn,
            sequence_parallel=m.sp_attention,
        )
        out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
        out = nn.Dense(D, dtype=dt, name="out")(out)
        return nn.Dropout(m.dropout)(out, deterministic=deterministic)


class RelMultiHeadAttention(nn.Module):
    """MHA with learned relative-frame-distance bias (VOGNet's
    ``RelativeAttention``).  ``n_frames`` is static (tokens per frame =
    T // n_frames)."""

    cfg: Cfg
    n_frames: int

    @nn.compact
    def __call__(self, x, key_mask, frame_ids, deterministic=True):
        m = self.cfg.mdl
        dt = act_dtype(self.cfg)
        B, T, D = x.shape
        H, K = m.n_heads, m.rpe_max_dist
        dh = D // H
        qkv = nn.Dense(3 * D, dtype=dt, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, H, dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, H, dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, H, dh).transpose(0, 2, 1, 3)

        table = self.param(
            "rpe_table", nn.initializers.normal(0.02), (H, 2 * K + 1)
        )
        f = np.arange(self.n_frames)
        dist = np.clip(f[:, None] - f[None, :], -K, K) + K  # (F,F) static
        frame_bias = table[:, jnp.asarray(dist)]  # (H,F,F)

        out = attention(
            q,
            k,
            v,
            key_mask,
            frame_bias,
            frame_ids,
            use_pallas=m.use_pallas_attn,
            sequence_parallel=m.sp_attention,
        )
        out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
        out = nn.Dense(D, dtype=dt, name="out")(out)
        return nn.Dropout(m.dropout)(out, deterministic=deterministic)


class DecomposedRelAttention(nn.Module):
    """Arg-decomposed relative-position attention for VOGNet's FIRST
    multimodal layer.

    The layer-1 multimodal tokens are x_{a,t} = m_t + g_a (proposal part +
    per-arg language part).  Then for every head:

      logits_a[i,j] = (qm_i+qg_a)·(km_j+kg_a)
                    = qm_i·km_j  +  qg_a·km_j  + (terms constant over j)

    and the j-constant terms cancel in the softmax.  So ONE shared
    (T,T) logit matrix (with the relative-frame bias and key mask, both
    arg-independent) serves all A args; each arg only contributes a
    key-side reweighting e^{c_a_j}, folded into the value matmul:

      P_a @ v  =  (w ∘ e^{c_a}) @ (vm + vg_a) / (w @ e^{c_a})
               =  [w @ (e^{c_a} ∘ vm)] / [w @ e^{c_a}]  +  vg_a

    This computes the QK matmul and the qkv projections of the T-token
    stream once instead of A times (A=5 -> ~40% of the attention FLOPs in
    the P100 regime).  Exact — parity-tested against the materialized
    path in tests/test_models.py.
    """

    cfg: Cfg
    n_frames: int

    @nn.compact
    def __call__(self, m, g, key_mask, frame_ids, deterministic=True):
        cfgm = self.cfg.mdl
        dt = act_dtype(self.cfg)
        B, T, D = m.shape
        A = g.shape[1]
        H, K = cfgm.n_heads, cfgm.rpe_max_dist
        dh = D // H

        qkv = nn.Dense(3 * D, dtype=dt, name="qkv")
        qm, km, vm = jnp.split(qkv(m), 3, axis=-1)  # (B,T,D)
        # the affine bias lives in the m-part; the g-part must be linear-only
        # so that qkv(m) + qkv_linear(g) == qkv(m + g)
        g_affine = qkv(g) - qkv(jnp.zeros((1, 1, D), g.dtype))
        qg, kg, vg = jnp.split(g_affine, 3, axis=-1)  # (B,A,D)

        def heads(t, L):
            return t.reshape(B, L, H, dh).transpose(0, 2, 1, 3)

        qm, km, vm = heads(qm, T), heads(km, T), heads(vm, T)
        qg, kg, vg = heads(qg, A), heads(kg, A), heads(vg, A)

        table = self.param("rpe_table", nn.initializers.normal(0.02), (H, 2 * K + 1))
        f = np.arange(self.n_frames)
        dist = np.clip(f[:, None] - f[None, :], -K, K) + K
        fbias = table[:, jnp.asarray(dist)]  # (H,F,F)

        scale = 1.0 / jnp.sqrt(jnp.float32(dh))
        # per-arg key reweighting: c_a[j] = qg_a·km_j (the only arg term
        # that survives the softmax — the others are j-constant).  All
        # softmax-adjacent statistics run fp32 regardless of the
        # activation dtype (preferred_element_type upcasts the matmuls)
        c = jnp.einsum(
            "bhad,bhjd->bhaj", qg, km, preferred_element_type=jnp.float32
        ) * scale  # (B,H,A,T)
        c = jnp.where(key_mask[:, None, None, :] > 0, c, 0.0)

        use_kernel = (
            cfgm.mm_kernel and T >= MM_PALLAS_MIN_T and jax.default_backend() == "tpu"
        )
        if use_kernel:
            # fused kernel: score tiles never materialize in HBM.  Kernel
            # operands stay fp32 (see model/dtypes.py); cn is the
            # log-domain per-arg key weighting — the kernel forms the
            # combined-logit softmax softmax_j(s + cn_a) per arg (see
            # kernels/mm_attention.py for why NOT the w·e product form)
            from vog_tpu.kernels.mm_attention import mm_shared_qk_attention

            cn = c - c.max(-1, keepdims=True)  # (B,H,A,T) fp32, <= 0
            pv = mm_shared_qk_attention(
                (qm * scale).astype(jnp.float32), km.astype(jnp.float32),
                vm.astype(jnp.float32), cn, key_mask, fbias, frame_ids,
            )  # (B,H,A,T,dh)
        else:
            tok_bias = fbias[:, frame_ids][:, :, frame_ids]  # (H,T,T)
            shared = jnp.einsum(
                "bhid,bhjd->bhij", qm, km, preferred_element_type=jnp.float32
            ) * scale + tok_bias[None]
            neg = jnp.finfo(shared.dtype).min
            shared = jnp.where(key_mask[:, None, None, :] > 0, shared, neg)
            # per-arg COMBINED-logit softmax: p_a = softmax_j(shared + c_a).
            # The earlier product form w·e (separately-normalized
            # exponentials, shared exp) is exact in ℝ but not in f32: once
            # training sharpens both distributions onto disjoint keys the
            # denominator Σ_j w_j e_aj reached 1e-26 (measured, round-5
            # learnability run) and the division backward's denom²
            # underflowed f32 to 0 → inf → NaN, poisoning every grad
            # upstream of this layer while the loss stayed finite.  The
            # combined max keeps every denominator ≥ 1 by construction
            # (exp(0)=1 at the row max); cost is A exps instead of one
            # (VPU-bound, A=5).  The j-constant-term cancellation argument
            # is unchanged, so this still equals the materialized path.
            vm32 = vm.astype(jnp.float32)
            per_arg = []
            for a in range(A):
                t = shared + c[:, :, a, None, :]  # (B,H,T,T)
                p = jnp.exp(t - t.max(-1, keepdims=True))
                per_arg.append(
                    jnp.einsum("bhij,bhjd->bhid", p, vm32)
                    / p.sum(-1, keepdims=True)
                )
            pv = jnp.stack(per_arg, axis=2)  # (B,H,A,T,dh)

        # kg enters logits only via qm_i·kg_a, constant over j -> cancels in
        # the softmax (exactly as in the materialized path); vg shifts every
        # attention output by the arg's value part since rows of P sum to 1
        out = (pv + vg[:, :, :, None].astype(pv.dtype)).astype(dt)
        out = out.transpose(0, 2, 3, 1, 4).reshape(B, A, T, D)
        out = nn.Dense(D, dtype=dt, name="out")(out)
        return nn.Dropout(cfgm.dropout)(out, deterministic=deterministic)


class TxLayer(nn.Module):
    """Post-LN encoder layer: MHA -> add&norm -> FFN -> add&norm
    (reference ``transformer_code.py §Transformer`` layer)."""

    cfg: Cfg
    relative: bool = False
    n_frames: int = 0

    @nn.compact
    def __call__(self, x, key_mask, frame_ids=None, deterministic=True):
        m = self.cfg.mdl
        dt = act_dtype(self.cfg)
        if self.relative:
            attn = RelMultiHeadAttention(self.cfg, self.n_frames, name="attn")(
                x, key_mask, frame_ids, deterministic
            )
        else:
            attn = MultiHeadAttention(self.cfg, name="attn")(
                x, key_mask, frame_ids, deterministic
            )
        x = nn.LayerNorm(dtype=dt, name="ln1")(x + attn)
        D = x.shape[-1]
        h = nn.Dense(m.ff_mult * D, dtype=dt, name="ff1")(x)
        h = nn.relu(h)
        h = nn.Dropout(m.dropout)(h, deterministic=deterministic)
        h = nn.Dense(D, dtype=dt, name="ff2")(h)
        return nn.LayerNorm(dtype=dt, name="ln2")(x + h)


class ObjectTransformer(nn.Module):
    """VidGrnd's object transformer: self-attention over all (frame, prop)
    tokens with sinusoidal temporal PE added on the frame index."""

    cfg: Cfg

    @nn.compact
    def __call__(self, vis, key_mask, frame_ids, deterministic=True):
        D = vis.shape[-1]
        pe = sinusoidal_pe(frame_ids, D)  # (T,D)
        x = vis + pe[None].astype(vis.dtype)
        for i in range(self.cfg.mdl.obj_tx_layers):
            x = TxLayer(self.cfg, relative=False, name=f"layer{i}")(
                x, key_mask, frame_ids, deterministic
            )
        return x


class RelTransformer(nn.Module):
    """VOGNet's multimodal transformer with relative position encoding."""

    cfg: Cfg
    n_frames: int

    @nn.compact
    def __call__(self, x, key_mask, frame_ids, deterministic=True):
        for i in range(self.cfg.mdl.mm_tx_layers):
            x = TxLayer(
                self.cfg, relative=True, n_frames=self.n_frames, name=f"layer{i}"
            )(x, key_mask, frame_ids, deterministic)
        return x


class DecomposedRelTxLayer(nn.Module):
    """First multimodal layer operating on the (m, g) decomposition;
    param names mirror TxLayer/RelMultiHeadAttention so the same variable
    tree serves both paths."""

    cfg: Cfg
    n_frames: int

    @nn.compact
    def __call__(self, m, g, key_mask, frame_ids, deterministic=True):
        cfgm = self.cfg.mdl
        dt = act_dtype(self.cfg)
        B, T, D = m.shape
        A = g.shape[1]
        attn = DecomposedRelAttention(self.cfg, self.n_frames, name="attn")(
            m, g, key_mask, frame_ids, deterministic
        )  # (B,A,T,D)
        x = (m[:, None] + g[:, :, None] + attn).reshape(B * A, T, D)
        x = nn.LayerNorm(dtype=dt, name="ln1")(x)
        h = nn.Dense(cfgm.ff_mult * D, dtype=dt, name="ff1")(x)
        h = nn.relu(h)
        h = nn.Dropout(cfgm.dropout)(h, deterministic=deterministic)
        h = nn.Dense(D, dtype=dt, name="ff2")(h)
        return nn.LayerNorm(dtype=dt, name="ln2")(x + h)  # (B*A, T, D)


class RelTransformerDecomposed(nn.Module):
    """RelTransformer whose first layer consumes the (m, g) decomposition
    (exact; see DecomposedRelAttention); later layers run materialized."""

    cfg: Cfg
    n_frames: int

    @nn.compact
    def __call__(self, m, g, key_mask, frame_ids, deterministic=True):
        A = g.shape[1]
        x = DecomposedRelTxLayer(self.cfg, self.n_frames, name="layer0")(
            m, g, key_mask, frame_ids, deterministic
        )
        key_mask_a = jnp.repeat(key_mask, A, axis=0)
        for i in range(1, self.cfg.mdl.mm_tx_layers):
            x = TxLayer(
                self.cfg, relative=True, n_frames=self.n_frames, name=f"layer{i}"
            )(x, key_mask_a, frame_ids, deterministic)
        return x
