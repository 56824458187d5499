"""Losses.

Reference parity: BCE-with-logits per (arg, proposal) against IoU>=0.5
targets, masked over padded args/proposals, as in the reference loss
classes (SURVEY §2 "Loss" row; location ``code/loss_fn.py`` or inside the
conc model files [C-LOW]).  Normalization: mean over valid (arg, proposal)
entries.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def masked_bce_loss(
    logits: jnp.ndarray, targets: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Numerically-stable sigmoid BCE, averaged over mask>0 entries."""
    per = optax.sigmoid_binary_cross_entropy(logits, targets)
    denom = jnp.maximum(mask.sum(), 1.0)
    return (per * mask).sum() / denom
