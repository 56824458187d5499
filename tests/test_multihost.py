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


def test_two_process_cluster_train_step_and_gather(tmp_path):
    """REAL multi-process coverage: 2 OS processes form a JAX CPU cluster
    (jax.distributed.initialize, Gloo), run the full DP train step over a
    cross-process 8-device mesh, and the eval gather merges per-process
    sums/predictions.  Loss must be identical on both processes."""
    import os
    import re
    import socket
    import subprocess
    import sys
    from pathlib import Path

    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    root = Path(__file__).resolve().parent.parent
    worker = root / "tests" / "_mp_worker.py"
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [str(root), env.get("PYTHONPATH", "")] if p
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=root,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        # compile-bound: ~6 fresh graph compiles per process (train/eval
        # at K=1 plus the fused K=2 scan variants) on a 1-core CPU host
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
    # full Learner.validate() across processes: rank-0's gathered
    # predictions cover every validation sample exactly once (regression
    # for the local-metadata/global-output mispairing)
    assert re.search(r"MP_EVAL_OK n_preds=8", outs[0]), outs[0][-3000:]
    losses = [re.search(r"MP_OK loss=([\d.eE+-]+)", o) for o in outs]
    assert all(losses), outs
    l0, l1 = (float(m.group(1)) for m in losses)
    assert l0 == l1, (l0, l1)
    # multi-host input sharding: each process built only its half of the
    # global batch (4 of 8 __getitem__ calls) with bit-identical loss to
    # the duplicated path (asserted inside the worker)
    shard = [re.search(r"MP_SHARD_OK getitem (\d+)/(\d+)", o) for o in outs]
    assert all(shard), outs
    for m in shard:
        assert int(m.group(1)) * 2 == int(m.group(2)), m.groups()
    # fused dispatch (steps_per_dispatch=2) composes with the sharded
    # input path: bit-identical params + identical eval preds vs K=1
    # (asserted inside the worker; rank 0 prints the marker)
    assert "MP_FUSED_OK" in outs[0], outs[0][-3000:]
