import jax.numpy as jnp
import numpy as np

from vog_tpu.evaluation import evaluate_batch, finalize_metrics


def _base(B=1, A=2, V=2, F=2, P=2):
    return dict(
        scores=np.zeros((B, A, V, F, P), np.float32),
        prop_boxes=np.zeros((B, V, F, P, 5), np.float32),
        gt_boxes=np.zeros((B, A, F, 4), np.float32),
        gt_frame_mask=np.zeros((B, A, F), np.float32),
        srl_arg_mask=np.ones((B, A), np.float32),
        pos_vid=np.zeros((B,), np.int32),
        batch_mask=np.ones((B,), np.float32),
        prop_mask=np.ones((B, V, F, P), np.float32),
    )


def _run(d):
    out = evaluate_batch(**{k: jnp.asarray(v) for k, v in d.items()})
    return {k: np.asarray(v) for k, v in out.items()}


def test_perfect_prediction():
    d = _base()
    box = [0.1, 0.1, 0.5, 0.5]
    # arg 0 annotated in frame 0; correct prop = (video 0, prop 1)
    d["gt_frame_mask"][0, 0, 0] = 1
    d["gt_boxes"][0, 0, 0] = box
    d["prop_boxes"][0, 0, 0, 1, :4] = box
    d["scores"][0, 0, 0, 0, 1] = 5.0  # highest among (V,P) at frame 0
    # arg 1 annotated in frame 1, same deal
    d["gt_frame_mask"][0, 1, 1] = 1
    d["gt_boxes"][0, 1, 1] = box
    d["prop_boxes"][0, 0, 1, 0, :4] = box
    d["scores"][0, 1, 0, 1, 0] = 5.0
    out = _run(d)
    m = finalize_metrics({k: float(out[k]) for k in (
        "n_pairs", "n_acc", "n_vacc", "n_queries", "n_strict", "n_cons")})
    assert m["acc"] == 1.0 and m["vacc"] == 1.0
    assert m["strict_acc"] == 1.0 and m["cons"] == 1.0
    assert out["n_pairs"] == 2


def test_wrong_video_kills_acc_and_vacc():
    d = _base(A=1)
    box = [0.1, 0.1, 0.5, 0.5]
    d["gt_frame_mask"][0, 0, 0] = 1
    d["gt_boxes"][0, 0, 0] = box
    # highest score in video 1 (wrong), even with a perfectly matching box
    d["prop_boxes"][0, 1, 0, 0, :4] = box
    d["scores"][0, 0, 1, 0, 0] = 5.0
    out = _run(d)
    assert out["n_vacc"] == 0 and out["n_acc"] == 0 and out["n_pairs"] == 1


def test_right_video_bad_iou():
    d = _base(A=1)
    d["gt_frame_mask"][0, 0, 0] = 1
    d["gt_boxes"][0, 0, 0] = [0.1, 0.1, 0.2, 0.2]
    d["prop_boxes"][0, 0, 0, 0, :4] = [0.6, 0.6, 0.9, 0.9]
    d["scores"][0, 0, 0, 0, 0] = 5.0
    out = _run(d)
    assert out["n_vacc"] == 1 and out["n_acc"] == 0


def test_strict_requires_all_pairs():
    d = _base()
    box = [0.1, 0.1, 0.5, 0.5]
    for a, (v_best, ok) in enumerate([(0, True), (1, False)]):
        d["gt_frame_mask"][0, a, 0] = 1
        d["gt_boxes"][0, a, 0] = box
        d["prop_boxes"][0, v_best, 0, 0, :4] = box
        d["scores"][0, a, v_best, 0, 0] = 5.0
    out = _run(d)
    assert out["n_acc"] == 1  # arg0 correct, arg1 wrong video
    assert out["n_strict"] == 0
    assert out["n_cons"] == 0  # args picked different videos


def test_cons_same_wrong_video_still_consistent():
    d = _base()
    for a in range(2):
        d["gt_frame_mask"][0, a, 0] = 1
        d["gt_boxes"][0, a, 0] = [0.1, 0.1, 0.5, 0.5]
        d["scores"][0, a, 1, 0, 0] = 5.0  # both pick video 1 (wrong)
    out = _run(d)
    assert out["n_cons"] == 1 and out["n_strict"] == 0


def test_batch_mask_and_arg_mask_exclusion():
    d = _base(B=2)
    for b in range(2):
        d["gt_frame_mask"][b, :, 0] = 1
    d["srl_arg_mask"][0, 1] = 0  # padded arg excluded
    d["batch_mask"][1] = 0  # padded sample excluded
    out = _run(d)
    assert out["n_pairs"] == 1
    assert out["n_queries"] == 1


def test_padded_proposal_never_wins_argmax():
    """Untrained logits at masked proposals must not enter the candidate
    set (round-1 advisor finding: argmax ran over the full (V,P) slice)."""
    d = _base(A=1)
    box = [0.1, 0.1, 0.5, 0.5]
    d["gt_frame_mask"][0, 0, 0] = 1
    d["gt_boxes"][0, 0, 0] = box
    # correct, valid proposal with a modest score
    d["prop_boxes"][0, 0, 0, 0, :4] = box
    d["scores"][0, 0, 0, 0, 0] = 1.0
    # a PADDED proposal in the wrong video carries a huge garbage logit
    d["prop_mask"][0, 1, 0, 1] = 0.0
    d["scores"][0, 0, 1, 0, 1] = 50.0
    out = _run(d)
    assert out["n_acc"] == 1 and out["n_vacc"] == 1
    assert out["pred_vid"][0, 0, 0] == 0 and out["pred_prop"][0, 0, 0] == 0


def test_compact_pair_payload_matches_full_grid():
    """max_pairs>0 must produce the SAME considered pairs (same order:
    arg-major, frame-minor) and candidate slices the host used to extract
    from the full grids (VERDICT r2 item 5)."""
    rng = np.random.default_rng(3)
    B, A, V, F, P = 3, 3, 2, 4, 2
    d = _base(B=B, A=A, V=V, F=F, P=P)
    d["scores"] = rng.normal(size=(B, A, V, F, P)).astype(np.float32)
    d["prop_boxes"] = rng.uniform(size=(B, V, F, P, 5)).astype(np.float32)
    d["gt_boxes"] = rng.uniform(size=(B, A, F, 4)).astype(np.float32)
    d["gt_frame_mask"] = (rng.uniform(size=(B, A, F)) > 0.6).astype(np.float32)
    d["srl_arg_mask"][1, 2] = 0
    d["batch_mask"][2] = 0

    full = _run(d)
    compact = {
        k: np.asarray(v)
        for k, v in evaluate_batch(
            **{k: jnp.asarray(v) for k, v in d.items()}, max_pairs=A * F
        ).items()
    }
    for k in ("n_pairs", "n_acc", "n_vacc", "n_queries", "n_strict", "n_cons"):
        assert full[k] == compact[k], k
    assert compact["n_overflow"] == 0
    cand = full["cand_scores"]
    for b in range(B):
        sel = full["considered"][b] > 0
        ai, fi = np.nonzero(sel)
        kmask = compact["pair_valid"][b] > 0
        np.testing.assert_array_equal(compact["pair_arg"][b][kmask], ai)
        np.testing.assert_array_equal(compact["pair_frame"][b][kmask], fi)
        np.testing.assert_array_equal(
            compact["pair_vid"][b][kmask], full["pred_vid"][b][sel]
        )
        np.testing.assert_array_equal(
            compact["pair_prop"][b][kmask], full["pred_prop"][b][sel]
        )
        np.testing.assert_array_equal(
            compact["pair_iou"][b][kmask], full["pred_iou"][b][sel]
        )
        np.testing.assert_array_equal(
            compact["pair_scores"][b][kmask], cand[b, ai, fi]
        )


def test_compact_overflow_counted():
    d = _base(B=1, A=2, V=2, F=3, P=2)
    d["gt_frame_mask"][0, :, :] = 1  # 6 considered pairs
    out = {
        k: np.asarray(v)
        for k, v in evaluate_batch(
            **{k: jnp.asarray(v) for k, v in d.items()}, max_pairs=4
        ).items()
    }
    assert out["n_pairs"] == 6  # sums always cover every pair
    assert out["pair_valid"].sum() == 4
    assert out["n_overflow"] == 2


def test_svsq_vacc_trivially_one():
    d = _base(V=1)
    box = [0.1, 0.1, 0.5, 0.5]
    d["gt_frame_mask"][0, 0, 0] = 1
    d["gt_boxes"][0, 0, 0] = box
    d["scores"][0, 0, 0, 0, 0] = 1.0
    d["prop_boxes"][0, 0, 0, 0, :4] = [0.5, 0.5, 0.9, 0.9]
    out = _run(d)
    assert out["n_vacc"] == out["n_pairs"]
