"""Fused attention kernel dispatch (placeholder — Pallas kernel lands in the
kernel milestone; this module keeps the interface stable).

Target design (SURVEY §7 hard part #2): flash-style blocked attention with
the factored relative-frame bias (H,F,F) expanded to token blocks inside
the kernel via two small one-hot matmuls, so the (T,T) score matrix never
leaves VMEM.  Until then this delegates to the XLA path, which XLA already
fuses acceptably at GT5 scale.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: jnp.ndarray,
    frame_bias: Optional[jnp.ndarray] = None,
    frame_ids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    from vog_tpu.model.transformer import xla_attention

    return xla_attention(q, k, v, key_mask, frame_bias, frame_ids)
