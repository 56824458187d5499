"""Device mesh + sharding rules (SPMD pjit over ICI).

Reference parity: the reference's distributed backend is DDP-over-NCCL
data parallelism only (``code/main_dist.py`` + ``utils/trn_utils.py``,
SURVEY §2 "Distributed backend" row).  TPU-native replacement: a 2-D
``jax.sharding.Mesh`` with axes ``('data', 'model')`` — gradients are
reduced by XLA-inserted psums over ICI (the DDP all-reduce equivalent),
and the wide projection/attention weights can additionally be sharded on
the ``model`` axis (tensor parallelism the reference never had; defaults
to size 1 for parity-scale runs).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vog_tpu.config import Cfg


def make_mesh(cfg: Cfg, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    m = cfg.misc.mesh_model
    d = cfg.misc.mesh_data if cfg.misc.mesh_data > 0 else n // m
    assert d * m <= n, f"mesh ({d},{m}) larger than {n} devices"
    dev_array = np.asarray(devices[: d * m]).reshape(d, m)
    return Mesh(dev_array, ("data", "model"))


# --- parameter partitioning ------------------------------------------------
# Wide kernels get tensor-parallel sharding on the 'model' axis; everything
# else is replicated.  Keyed on flax param path suffixes.
_COL_SHARDED = (  # (in, out) kernels sharded on the output dim
    ("prop_enc", "prop_proj", "kernel"),
    ("seg_enc", "seg_proj", "kernel"),
    ("qkv", "kernel"),
    ("ff1", "kernel"),
    ("fuse_cross", "kernel"),
)
_ROW_SHARDED = (  # kernels sharded on the input dim (follow a col-shard)
    ("out", "kernel"),
    ("ff2", "kernel"),
)


def _spec_for_path(path: tuple, leaf: Any) -> P:
    for suf in _COL_SHARDED:
        if path[-len(suf):] == suf:
            return P(None, "model")
    for suf in _ROW_SHARDED:
        if path[-len(suf):] == suf:
            return P("model", None)
    return P()


def param_shardings(mesh: Mesh, params: Dict) -> Dict:
    """Pytree of NamedShardings matching ``params``."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    out = {
        path: NamedSharding(mesh, _spec_for_path(path, leaf))
        for path, leaf in flat.items()
    }
    return traverse_util.unflatten_dict(out)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays are sharded on the leading (batch) dim over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


HALF_KEYS = ("props", "seg_feats")  # bulky features; boxes/targets stay f32


def shard_batch(
    batch: Dict[str, np.ndarray], mesh: Mesh, half_feats: bool = False
) -> Dict:
    """Host batch -> device arrays sharded over the data axis.

    half_feats stores the RoI/segment features as bfloat16 in HBM (halves
    the input-transfer + HBM footprint of the P100 regime); encoders cast
    back to fp32 so weight math stays full precision (opt-in, off for
    strict parity runs).
    """
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if half_feats and k in HALF_KEYS:
            v = v.astype(jnp.bfloat16)
        out[k] = jax.device_put(v, sh)
    return out
