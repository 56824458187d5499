"""On-device contrastive concatenation (SVSQ / SEP / TEMP / SPAT).

Reference parity: ``code/mdl_conc_single.py`` (SVSQ/SEP) and
``code/mdl_conc.py`` (TEMP/SPAT) — the reference fuses the 4-video group
with ragged Python/torch ops on the host/GPU inside the model.  Here the
dataset always ships the uniform stacked layout ``(B, V, F, P, …)`` and the
fusion is a handful of *static-shape* reshapes/transposes under jit, so XLA
fuses it into the surrounding compute and the host stays off the hot path
(BASELINE.json north-star: "batch assembly for contrastive sampling … done
on-device").

Strategies (SURVEY.md §2):
  SVSQ  1 video/query — plain flatten of the V=1 axis.
  SEP   score-level: each video is run separately with the same query;
        implemented by folding V into the batch axis (B'=B·V) and tiling
        the language tensors — proposals are then ranked across the 4
        score sets at eval.
  TEMP  temporal concat: frame axis F -> V·F; temporal position ids keep
        counting across video boundaries (the reference shifts temporal
        position encodings).
  SPAT  spatial concat: proposal axis P -> V·P per frame; x-coordinates of
        the 5-d box feature are shifted by the video slot so the videos sit
        side-by-side (x' = x + v, widths preserved) [C-MED exact shift
        convention — to verify against mdl_conc.py when the mount is live].

Unified "clip view" consumed by every model (T = tokens = F'·P'):
  props (B',T,D)  boxes (B',T,5)  mask (B',T)  seg (B',F',seg_dim)
  frame_ids (T,) i32   token -> frame index (for temporal PE / RPE)
plus language tensors tiled to B' and targets flattened to (B',A,T).

``scores_to_canonical`` maps model logits (B',A,T) back to the canonical
``(B,A,V,F,P)`` grid shared by the loss bookkeeping and the evaluator.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

LANG_KEYS = ("tokens", "seq_len", "verb_idx", "srl_roles", "srl_spans", "srl_arg_mask")


def view_dims(conc_type: str, V: int, F: int, P: int) -> Tuple[int, int, int]:
    """-> (B_mult, F', P') of the clip view."""
    if conc_type == "svsq":
        return 1, F, P
    if conc_type == "sep":
        return V, F, P
    if conc_type == "temp":
        return 1, V * F, P
    if conc_type == "spat":
        return 1, F, V * P
    raise ValueError(conc_type)


def frame_ids(conc_type: str, V: int, F: int, P: int) -> jnp.ndarray:
    """Per-token frame index in the clip view (static)."""
    _, Fp, Pp = view_dims(conc_type, V, F, P)
    return jnp.repeat(jnp.arange(Fp, dtype=jnp.int32), Pp)


def video_ids(conc_type: str, V: int, F: int, P: int) -> jnp.ndarray:
    """Per-token source-video slot in the clip view (static)."""
    if conc_type == "svsq":
        return jnp.zeros((F * P,), jnp.int32)
    if conc_type == "sep":
        return jnp.zeros((F * P,), jnp.int32)  # video axis folded into batch
    if conc_type == "temp":
        t = jnp.arange(V * F * P, dtype=jnp.int32)
        return t // (F * P)
    if conc_type == "spat":
        t = jnp.arange(F * V * P, dtype=jnp.int32)
        return (t % (V * P)) // P
    raise ValueError(conc_type)


def _spat_shift_boxes(boxes: jnp.ndarray) -> jnp.ndarray:
    """Shift x1/x2 by the video slot: boxes (B,V,F,P,5) -> shifted."""
    V = boxes.shape[1]
    shift = jnp.arange(V, dtype=boxes.dtype).reshape(1, V, 1, 1)
    return boxes.at[..., 0].add(shift).at[..., 2].add(shift)


def assemble_batch(batch: Dict[str, jnp.ndarray], conc_type: str) -> Dict[str, jnp.ndarray]:
    """Fuse the stacked (B,V,…) group into the clip view. Pure + jittable."""
    props, boxes = batch["props"], batch["prop_boxes"]
    pmask, seg = batch["prop_mask"], batch["seg_feats"]
    targets = batch["targets"]  # (B,V,A,F,P)
    B, V, F, P, D = props.shape
    A = targets.shape[2]
    out: Dict[str, jnp.ndarray] = {}

    if conc_type == "svsq":
        assert V == 1
        out["props"] = props.reshape(B, F * P, D)
        out["boxes"] = boxes.reshape(B, F * P, 5)
        out["mask"] = pmask.reshape(B, F * P)
        out["seg"] = seg.reshape(B, F, -1)
        out["targets"] = targets.reshape(B, A, F * P)
        for k in LANG_KEYS:
            out[k] = batch[k]
        out["batch_mask"] = batch["batch_mask"]
    elif conc_type == "sep":
        # fold V into batch; tile language per video
        out["props"] = props.reshape(B * V, F * P, D)
        out["boxes"] = boxes.reshape(B * V, F * P, 5)
        out["mask"] = pmask.reshape(B * V, F * P)
        out["seg"] = seg.reshape(B * V, F, -1)
        out["targets"] = targets.reshape(B * V, A, F * P)
        for k in LANG_KEYS:
            x = batch[k]
            out[k] = jnp.repeat(x, V, axis=0)
        out["batch_mask"] = jnp.repeat(batch["batch_mask"], V, axis=0)
    elif conc_type == "temp":
        out["props"] = props.reshape(B, V * F * P, D)
        out["boxes"] = boxes.reshape(B, V * F * P, 5)
        out["mask"] = pmask.reshape(B, V * F * P)
        out["seg"] = seg.reshape(B, V * F, -1)
        # targets (B,V,A,F,P) -> (B,A,V*F*P)
        out["targets"] = targets.transpose(0, 2, 1, 3, 4).reshape(B, A, V * F * P)
        for k in LANG_KEYS:
            out[k] = batch[k]
        out["batch_mask"] = batch["batch_mask"]
    elif conc_type == "spat":
        sboxes = _spat_shift_boxes(boxes)
        # (B,V,F,P,…) -> (B,F,V,P,…) -> (B, F*V*P, …)
        out["props"] = props.transpose(0, 2, 1, 3, 4).reshape(B, F * V * P, D)
        out["boxes"] = sboxes.transpose(0, 2, 1, 3, 4).reshape(B, F * V * P, 5)
        out["mask"] = pmask.transpose(0, 2, 1, 3).reshape(B, F * V * P)
        # per-frame segment feature: mean over videos [C-MED — reference
        # SPAT seg handling to verify]; keeps (B,F,seg_dim)
        out["seg"] = seg.mean(axis=1)
        out["targets"] = targets.transpose(0, 2, 3, 1, 4).reshape(B, A, F * V * P)
        for k in LANG_KEYS:
            out[k] = batch[k]
        out["batch_mask"] = batch["batch_mask"]
    else:
        raise ValueError(conc_type)

    out["frame_ids"] = frame_ids(conc_type, V, F, P)
    out["video_ids"] = video_ids(conc_type, V, F, P)
    return out


def scores_to_canonical(
    scores: jnp.ndarray, conc_type: str, B: int, V: int, F: int, P: int
) -> jnp.ndarray:
    """Model logits (B',A,T) -> canonical (B,A,V,F,P)."""
    A = scores.shape[1]
    if conc_type == "svsq":
        return scores.reshape(B, A, 1, F, P)
    if conc_type == "sep":
        return scores.reshape(B, V, A, F, P).transpose(0, 2, 1, 3, 4)
    if conc_type == "temp":
        return scores.reshape(B, A, V, F, P)
    if conc_type == "spat":
        return scores.reshape(B, A, F, V, P).transpose(0, 1, 3, 2, 4)
    raise ValueError(conc_type)
