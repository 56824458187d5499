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
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    mask: jnp.ndarray,
    pos_weight: float = 1.0,
) -> jnp.ndarray:
    """Numerically-stable sigmoid BCE, averaged over mask>0 entries.

    pos_weight upweights the sparse positives (SPAT/P100 dilute positives
    to <1% of the (arg, proposal) grid; torch's BCEWithLogitsLoss exposes
    the same knob).  pos_weight=1 is the plain reference loss.
    """
    per = optax.sigmoid_binary_cross_entropy(logits, targets)
    if pos_weight != 1.0:
        per = per * jnp.where(targets > 0, pos_weight, 1.0)
    denom = jnp.maximum(mask.sum(), 1.0)
    return (per * mask).sum() / denom
