"""Losses.

Reference parity: BCE-with-logits per (arg, proposal) against IoU>=0.5
targets, masked over padded args/proposals, as in the reference loss
classes (SURVEY §2 "Loss" row; location ``code/loss_fn.py`` or inside the
conc model files [C-LOW]).  Normalization: mean over valid (arg, proposal)
entries.
"""

from __future__ import annotations

import jax
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


def masked_rank_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    mask: jnp.ndarray,
    num_cmp: int = 1,
) -> jnp.ndarray:
    """Listwise ranking loss over each arg's candidate axis.

    Reference parity: the SEP strategy "ranks proposals across the 4 score
    sets" (SURVEY §2 SVSQ/SEP row; cross-video ranking normalization
    [C-MED]).  Implemented as softmax cross-entropy over the candidate axis
    with the IoU>=0.5 positives as a normalized soft target — pushes the
    positive video's matching proposals above ALL other videos' candidates
    instead of scoring each independently.

    logits/targets/mask: (B', A, T).  For conc_type=sep the V videos of a
    group arrive folded into the batch axis (B'=B·V, T=F·P); pass
    ``num_cmp=V`` so the group's rows are re-joined to (B, A, V·T) before
    the softmax — otherwise normalization stays within one video and the
    cross-video calibration never happens (TEMP/SPAT already span all
    videos along T).
    """
    if num_cmp > 1:
        Bp, A, T = logits.shape
        B = Bp // num_cmp

        def regroup(x):
            return x.reshape(B, num_cmp, A, T).transpose(0, 2, 1, 3).reshape(
                B, A, num_cmp * T
            )

        logits, targets, mask = regroup(logits), regroup(targets), regroup(mask)
    neg = -1e30
    masked_logits = jnp.where(mask > 0, logits, neg)
    logp = jax.nn.log_softmax(masked_logits, axis=-1)  # (B,A,T)
    pos = targets * mask
    pos_count = pos.sum(-1)  # (B,A)
    soft = pos / jnp.maximum(pos_count[..., None], 1.0)
    per_arg = -(soft * logp).sum(-1)  # (B,A)
    has_pos = (pos_count > 0).astype(logits.dtype)
    return (per_arg * has_pos).sum() / jnp.maximum(has_pos.sum(), 1.0)
