"""Grounding evaluator: Acc / VAcc / Strict Acc / Cons at IoU@0.5.

Reference parity: ``code/eval_fn_corr.py`` (+ SEP/DS4 variants) — from
per-arg proposal scores: argmax proposal -> IoU vs GT box in the annotated
frame -> correct@IoU0.5.  Metric definitions (SURVEY §2 "Evaluator" row):

  Acc        per considered (arg, annotated-frame): the top-scoring
             proposal among that frame's candidates across all videos in
             the group lies in the positive video AND has IoU>=0.5 with
             the GT box.
  VAcc       the top-scoring proposal lies in the positive video
             (meaningful for SEP/TEMP/SPAT; trivially 1 for SVSQ).
  Strict Acc per query: ALL its considered (arg, frame) pairs are correct.
  Cons       per query: all considered pairs pick the same video
             (consistency — the model grounds the whole description in
             one video).

[C-MED] exact candidate-set convention reconstructed (SURVEY §7 hard part
#4): candidates for an (arg, annotated frame f) are the P proposals at
frame f of EACH of the V videos (the concat strategies align frame
indices), i.e. a (V, P) score slice of the canonical (B,A,V,F,P) grid.
To re-verify against eval_fn_corr.py when the mount is populated.

Everything here is jittable; the host only aggregates scalar sums.
IoU in normalized coordinates equals IoU in absolute coordinates
(invariant under independent x/y scaling), so normalized boxes are used
throughout.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

IOU_THRESH = 0.5


def iou_jnp(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU of broadcastable (...,4) xyxy boxes."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]

    def area(x):
        return jnp.clip(x[..., 2] - x[..., 0], 0, None) * jnp.clip(
            x[..., 3] - x[..., 1], 0, None
        )

    union = area(a) + area(b) - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def evaluate_batch(
    scores: jnp.ndarray,  # (B,A,V,F,P) canonical logits
    prop_boxes: jnp.ndarray,  # (B,V,F,P,5) normalized (unshifted)
    gt_boxes: jnp.ndarray,  # (B,A,F,4) normalized
    gt_frame_mask: jnp.ndarray,  # (B,A,F)
    srl_arg_mask: jnp.ndarray,  # (B,A)
    pos_vid: jnp.ndarray,  # (B,)
    batch_mask: jnp.ndarray,  # (B,)
    prop_mask: jnp.ndarray,  # (B,V,F,P) valid-proposal mask
    max_pairs: int = 0,
) -> Dict[str, jnp.ndarray]:
    """-> dict of scalar sums + per-pair prediction arrays.

    ``max_pairs`` > 0 switches the per-pair payload to the COMPACT form:
    instead of full (B,A,F,…) prediction grids + the (B,A,F,V*P)
    candidate grid, the considered (arg, frame) pairs are selected ON
    DEVICE into a static (B, max_pairs) budget (VERDICT r2 item 5 — the
    bulk grids cost ~MBs of device->host transfer per eval batch; only
    the few considered pairs are ever used).  ``n_overflow`` counts pairs
    beyond the budget (the scalar sums always cover every pair)."""
    B, A, V, F, P = scores.shape
    considered = (
        gt_frame_mask * srl_arg_mask[:, :, None] * batch_mask[:, None, None]
    )  # (B,A,F)

    # padded proposals/frames carry untrained logits (loss and attention
    # both mask them) — exclude them from the candidate set before argmax
    scores = jnp.where(prop_mask[:, None] > 0, scores, -1e30)

    # argmax over the (V,P) candidate slice per (b,a,f)
    cand = scores.transpose(0, 1, 3, 2, 4).reshape(B, A, F, V * P)
    choice = jnp.argmax(cand, axis=-1)  # (B,A,F)
    v_hat = choice // P
    p_hat = choice % P

    # gather chosen box: prop_boxes (B,V,F,P,4-of-5)
    f_idx = jnp.arange(F)[None, None, :]
    b_idx = jnp.arange(B)[:, None, None]
    chosen_box = prop_boxes[b_idx, v_hat, f_idx, p_hat, :4]  # (B,A,F,4)

    iou = iou_jnp(chosen_box, gt_boxes)  # (B,A,F)
    vid_ok = (v_hat == pos_vid[:, None, None]).astype(jnp.float32)
    acc_ok = vid_ok * (iou >= IOU_THRESH).astype(jnp.float32)

    n_pairs = considered.sum()
    n_acc = (acc_ok * considered).sum()
    n_vacc = (vid_ok * considered).sum()

    # per-query strict / cons over considered pairs
    has_pairs = (considered.sum(axis=(1, 2)) > 0).astype(jnp.float32)  # (B,)
    all_correct = jnp.where(considered > 0, acc_ok, 1.0).reshape(B, -1).min(axis=-1)
    strict = all_correct * has_pairs
    # cons: all considered pairs pick the same video
    vh = jnp.where(considered > 0, v_hat, -1).reshape(B, -1)
    vmax = vh.max(axis=-1)
    same = jnp.where(
        (vh == vmax[:, None]) | (vh < 0), 1.0, 0.0
    ).min(axis=-1)
    cons = same * has_pairs

    out = {
        "n_pairs": n_pairs,
        "n_acc": n_acc,
        "n_vacc": n_vacc,
        "n_queries": has_pairs.sum(),
        "n_strict": strict.sum(),
        "n_cons": cons.sum(),
    }
    if max_pairs <= 0:
        # full grids (tests / small-batch debugging)
        out.update(
            # per-pair predictions (for the predictions dump)
            pred_vid=v_hat,
            pred_prop=p_hat,
            pred_iou=iou,
            considered=considered,
            # masked candidate grid (B,A,F,V*P) — persisted per considered
            # pair so saved predictions can be re-scored offline by
            # ``vog_tpu.evaluation.offline.eval_fun`` (reference
            # ``eval_fn_corr.py §eval_fun(predictions_file, split)``)
            cand_scores=cand,
        )
        return out

    # compact form: gather the considered pairs to the front of a static
    # (B, K) budget.  argsort of the 0/1 mask is stable in jax, so the
    # considered pairs keep their (arg-major, frame-minor) order — the
    # same order the host loop over np.nonzero produced.
    K = min(max_pairs, A * F)
    flat_cons = considered.reshape(B, A * F)
    order = jnp.argsort(-flat_cons, axis=-1)[:, :K]  # (B,K)

    def take(x):
        return jnp.take_along_axis(x.reshape(B, A * F), order, axis=-1)

    out.update(
        pair_valid=take(flat_cons),
        pair_arg=(order // F).astype(jnp.int32),
        pair_frame=(order % F).astype(jnp.int32),
        pair_vid=take(v_hat),
        pair_prop=take(p_hat),
        pair_iou=take(iou),
        # (B,K,V*P) candidate slices for the offline re-scoring payload
        pair_scores=jnp.take_along_axis(
            cand.reshape(B, A * F, V * P), order[..., None], axis=1
        ),
        n_overflow=jnp.maximum(flat_cons.sum() - take(flat_cons).sum(), 0.0),
    )
    return out


def finalize_metrics(sums: Dict[str, float]) -> Dict[str, float]:
    """Aggregate epoch sums -> the reference metric dict schema."""
    np_ = max(sums["n_pairs"], 1.0)
    nq = max(sums["n_queries"], 1.0)
    return {
        "acc": sums["n_acc"] / np_,
        "vacc": sums["n_vacc"] / np_,
        "strict_acc": sums["n_strict"] / nq,
        "cons": sums["n_cons"] / nq,
        "num_pairs": sums["n_pairs"],
        "num_queries": sums["n_queries"],
    }
