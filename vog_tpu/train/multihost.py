"""Multi-host seams: eval gather across processes.

Reference parity: the reference's DDP eval gathers per-rank prediction
pickles and all-reduces metric dicts on rank 0 (``utils/trn_utils.py``
§reduce_dict / pickle shards, SURVEY §3.2).  The TPU-native equivalent is
``jax.experimental.multihost_utils.process_allgather`` over DCN: metric
sums all-reduce numerically, and the variable-length prediction lists ride
as length-padded pickled byte arrays.

Tested scope (``tests/test_multihost.py``): single-process identity in
CI, AND a real 2-OS-process JAX CPU cluster (``jax.distributed.initialize``
+ Gloo collectives — the same init path ``misc.multihost`` runs in the
CLI) where the gather genuinely merges per-process sums/predictions and a
full DP train step runs over a cross-process global mesh.
"""

from __future__ import annotations

import pickle
from typing import Dict, List, Tuple

import jax
import numpy as np
from jax.experimental import multihost_utils


def gather_eval(sums: Dict[str, float], preds: List[Dict]) -> Tuple[Dict, List]:
    """All-gather eval state across hosts.

    ``sums`` (additive metric counters) are summed over processes; the
    per-host ``preds`` lists are concatenated in process order.  With one
    process this is an exact identity (modulo float32 rounding of sums).
    """
    keys = sorted(sums.keys())
    out_sums: Dict[str, float] = {}
    if keys:  # sums may be {} (preds-only gather, e.g. sharded-input eval)
        vals = np.asarray([sums[k] for k in keys], np.float32)
        gathered = np.asarray(multihost_utils.process_allgather(vals))
        gathered = gathered.reshape(-1, len(keys))  # (n_proc, K)
        out_sums = {k: float(gathered[:, i].sum()) for i, k in enumerate(keys)}

    blob = np.frombuffer(pickle.dumps(preds), np.uint8)
    n = np.asarray([blob.size], np.int32)
    sizes = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
    pad = int(sizes.max()) if sizes.size else 0
    padded = np.zeros((pad,), np.uint8)
    padded[: blob.size] = blob
    blobs = np.asarray(multihost_utils.process_allgather(padded))
    blobs = blobs.reshape(-1, pad) if pad else blobs.reshape(len(sizes), 0)
    out_preds: List[Dict] = []
    for i, size in enumerate(sizes):
        out_preds.extend(pickle.loads(blobs[i, : int(size)].tobytes()))
    return out_sums, out_preds
