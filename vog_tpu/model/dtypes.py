"""Activation-dtype policy (cfg.mdl.dtype).

One switch: "float32" (parity default) or "bfloat16" (mixed precision).
What stays fp32 under bf16 — the numerics-sensitive set:

  * params + optimizer state (flax param_dtype default) — checkpoints
    and the torch-twin parity oracle are unaffected;
  * the BiLSTM language encoder (tiny: L≈20 tokens; torch-ATen parity
    tested at fp32 tolerances in tests/test_lstm_parity.py);
  * attention logits + softmax (QK matmuls request
    preferred_element_type=f32, the probability matrix is cast back to
    the activation dtype only for the PV matmul);
  * the loss (logits are upcast on entry to compute_loss);
  * Pallas kernel operands (cast at the dispatch sites — the kernels
    accumulate in fp32 regardless, bf16 operands are a later step).

Everything else — every Dense / LayerNorm / FFN / fusion intermediate
in the visual + multimodal path — computes and stores bf16, halving the
HBM bytes of the fusion-bound GT5 production step.
"""

from __future__ import annotations

import jax.numpy as jnp


def act_dtype(cfg) -> jnp.dtype:
    """The activation dtype the model computes in (params stay fp32)."""
    return jnp.bfloat16 if cfg.mdl.dtype == "bfloat16" else jnp.float32
