"""Sequence-parallel ring attention over the mesh (SPMD long-context).

Reference parity note: the reference has no sequence parallelism — its
distributed story is DDP data parallelism only (``code/main_dist.py``,
SURVEY §2 distributed row).  This module is a TPU-native *extension* for
the P100 long-context regime (T = F·P = 4000 tokens): the token axis of
one example's self-attention is sharded over the mesh ``'model'`` axis so
per-chip attention memory and FLOPs drop by the axis size — the lever
that matters for serving latency (P100 fwd is attention-dominated) and
for any future regime where (H, T, T) score tiles stop fitting.

Design (ring schedule, the standard TPU long-context recipe):
  * every device holds its (B, H, T/n, dh) block of q, k, v and the
    matching slices of the key mask / frame ids;
  * n ring steps: attend q_local x current (k, v) block with a running
    online-softmax state (m, l, acc) — exactly the flash-attention merge,
    so the result is bit-wise a softmax over the full T keys — then
    rotate the (k, v, mask, ids) block to the next device with
    ``lax.ppermute`` over ICI;
  * the factored relative-frame bias rides along: the tiny (H, F, F)
    table is replicated, and each step gathers bias[q_frames, k_frames]
    for the current block pair — the (T, T) token bias never exists.

After n steps the k/v blocks have rotated full circle (state is back in
place) and ``acc / l`` equals full-sequence attention.  Communication per
layer: (n-1)/n of the K+V bytes over ICI, overlapped with the per-block
matmuls by XLA's async collective scheduling.

Differentiable end-to-end (scan + ppermute both have transpose rules), so
the same code serves train and serve paths.  Parity vs the dense path is
tested on the virtual 8-device CPU mesh in tests/test_ring_attention.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P


def _block_attend(q, kb, vb, maskb, bias_qk, state):
    """One ring step: merge block (kb, vb) into the online-softmax state.

    q: (B,H,Tq,dh)   kb/vb: (B,H,Tk,dh)   maskb: (B,Tk) 1=valid
    bias_qk: (H,Tq,Tk) or None            state: (m, l, acc)
    """
    m, l, acc = state
    dh = q.shape[-1]
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, kb, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(dh))
    if bias_qk is not None:
        logits = logits + bias_qk[None]
    # finite mask value (not -inf): keeps exp()/max() arithmetic NaN-free
    # in blocks whose keys are all padding
    neg = jnp.float32(-0.5) * jnp.finfo(jnp.float32).max
    logits = jnp.where(maskb[:, None, None, :] > 0, logits, neg)
    m_new = jnp.maximum(m, logits.max(axis=-1))
    p = jnp.exp(logits - m_new[..., None])
    corr = jnp.exp(m - m_new)
    l_new = l * corr + p.sum(axis=-1)
    acc_new = acc * corr[..., None] + jnp.einsum(
        "bhqk,bhkd->bhqd", p, vb, preferred_element_type=jnp.float32
    )
    return m_new, l_new, acc_new


def _ring_local(q, k, v, key_mask, frame_ids, frame_bias, axis: str, n: int):
    """Per-device body (inside shard_map): q/k/v (B,H,Tl,dh) local blocks."""
    B, H, Tl, dh = q.shape
    neg = jnp.float32(-0.5) * jnp.finfo(jnp.float32).max
    # initial state is device-varying (each shard accumulates its own q
    # block) — mark it so scan's carry typing matches the loop outputs
    m0 = lax.pcast(jnp.full((B, H, Tl), neg, jnp.float32), (axis,), to="varying")
    l0 = lax.pcast(jnp.zeros((B, H, Tl), jnp.float32), (axis,), to="varying")
    a0 = lax.pcast(jnp.zeros((B, H, Tl, dh), jnp.float32), (axis,), to="varying")
    perm = [(j, (j + 1) % n) for j in range(n)]

    def step(carry, _):
        state, kb, vb, mb, fb = carry
        bias_qk = None
        if frame_bias is not None:
            # (H, Tl_q, Tl_k) for this block pair — tiny gathers on the
            # replicated (H, F, F) factored table
            bias_qk = frame_bias[:, frame_ids][:, :, fb]
        state = _block_attend(q, kb, vb, mb, bias_qk, state)
        kb = lax.ppermute(kb, axis, perm)
        vb = lax.ppermute(vb, axis, perm)
        mb = lax.ppermute(mb, axis, perm)
        fb = lax.ppermute(fb, axis, perm)
        return (state, kb, vb, mb, fb), None

    (state, _, _, _, _), _ = lax.scan(
        step, ((m0, l0, a0), k, v, key_mask, frame_ids), None, length=n
    )
    m, l, acc = state
    return (acc / l[..., None]).astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,  # (B,H,T,dh)
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: jnp.ndarray,  # (B,T) 1=valid key
    frame_bias: Optional[jnp.ndarray],  # (H,F,F) or None
    frame_ids: Optional[jnp.ndarray],  # (T,) int32 (required if bias given)
    mesh: Mesh,
    axis: str = "model",
) -> jnp.ndarray:
    """Full-sequence attention with T sharded over ``mesh.shape[axis]``.

    Inputs arrive replicated (or T-sharded) under the surrounding pjit;
    shard_map splits the token axis, runs the ring, and the output comes
    back T-sharded (XLA re-gathers it lazily where downstream ops need
    it).  Requires T % axis_size == 0 (T = F·P is a static multiple of
    the supported axis sizes; callers guard).
    """
    n = mesh.shape[axis]
    T = q.shape[2]
    assert T % n == 0, f"T={T} not divisible by {axis} axis size {n}"
    if frame_ids is None:
        frame_ids = jnp.zeros((T,), jnp.int32)
        frame_bias = None
    qkv_spec = P(None, None, axis, None)
    if frame_bias is None:
        fn = shard_map(
            lambda q_, k_, v_, km_, fi_: _ring_local(
                q_, k_, v_, km_, fi_, None, axis, n
            ),
            mesh=mesh,
            in_specs=(qkv_spec, qkv_spec, qkv_spec, P(None, axis), P(axis)),
            out_specs=qkv_spec,
        )
        return fn(q, k, v, key_mask, frame_ids.astype(jnp.int32))
    fn = shard_map(
        lambda q_, k_, v_, km_, fi_, fb_: _ring_local(
            q_, k_, v_, km_, fi_, fb_, axis, n
        ),
        mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, P(None, axis), P(axis), P()),
        out_specs=qkv_spec,
    )
    return fn(q, k, v, key_mask, frame_ids.astype(jnp.int32), frame_bias)
