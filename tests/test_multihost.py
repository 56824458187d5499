"""Multi-host eval gather seam (vog_tpu/train/multihost.py).

process_count()==1 in CI, so process_allgather degenerates to identity —
this still executes the full gather code path (array allgather, blob
padding, pickle round-trip), which is the tested scope documented in the
module."""

import numpy as np

from vog_tpu.train.multihost import gather_eval


def test_gather_eval_single_process_identity():
    sums = {"n_pairs": 12.0, "n_acc": 5.0, "loss_sum": 3.25, "n_batch": 2.0}
    preds = [
        {"ann_idx": 0, "pred_vid": [1, 2], "scores": [0.5, -1.0]},
        {"ann_idx": 3, "pred_vid": [0], "scores": [2.0]},
    ]
    out_sums, out_preds = gather_eval(sums, preds)
    assert set(out_sums) == set(sums)
    for k in sums:
        assert abs(out_sums[k] - sums[k]) < 1e-6, k
    assert out_preds == preds


def test_gather_eval_empty_preds():
    out_sums, out_preds = gather_eval({"n_batch": 0.0}, [])
    assert out_sums == {"n_batch": 0.0}
    assert out_preds == []
