"""AOT serving export: serialize the jitted Predictor to a deployable
artifact (StableHLO via ``jax.export``) + a JSON manifest.

The reference has no serving surface at all (research code); this is the
production-deployment counterpart to ``vog_tpu/serve.py``: the exported
artifact embeds the trained weights as constants and replays WITHOUT the
model code, flax, or a checkpoint — only jax + the artifact file — so the
serving fleet never re-traces, never depends on the training repo's model
definitions, and gets bit-identical outputs to the live Predictor
(tests/test_export.py).

Schema: the exported call takes the canonical *feature-carrying* request
batch (props/seg_feats in the request) at a fixed batch size — the
standalone-artifact mode.  Device-store requests (``vid_rows``) stay with
the live ``Predictor``: HBM-resident tables are deployment state, not
artifact content.

Artifact layout (``<path>.vogx`` directory):
  fn.bin         serialized jax.export.Exported (StableHLO + vjp-less call)
  manifest.json  schema (key -> shape/dtype), config dims, jax version,
                 export platforms
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np

from vog_tpu.config import Cfg


def request_spec(cfg: Cfg, batch_size: int) -> Dict:
    """ShapeDtypeStruct pytree of the canonical serving request."""
    import jax

    ds = cfg.ds
    B, V, F, P, A, L = (
        batch_size,
        ds.num_cmp,
        ds.num_frms,
        ds.num_prop_per_frm,
        ds.max_srl_args,
        ds.max_seq_len,
    )
    s = jax.ShapeDtypeStruct
    f32, i32, u8 = np.float32, np.int32, np.uint8
    return {
        "props": s((B, V, F, P, ds.prop_dim), f32),
        "prop_boxes": s((B, V, F, P, 5), f32),
        "prop_mask": s((B, V, F, P), u8),
        "seg_feats": s((B, V, F, ds.seg_dim), f32),
        "tokens": s((B, L), i32),
        "seq_len": s((B,), i32),
        "verb_idx": s((B,), i32),
        "srl_roles": s((B, A), i32),
        "srl_spans": s((B, A, 2), i32),
        "srl_arg_mask": s((B, A), u8),
        # consumed by the conc assembly (zeros fine at inference)
        "targets": s((B, V, A, F, P), u8),
        "batch_mask": s((B,), u8),
    }


def export_predictor(
    predictor,
    batch_size: int,
    path: str | Path,
    platforms: Optional[Sequence[str]] = None,
) -> Path:
    """Serialize ``predictor`` (vog_tpu.serve.Predictor) at a fixed batch
    size.  ``platforms``: lowering targets (default: the current backend;
    pass e.g. ("tpu", "cpu") for a cross-platform artifact)."""
    import jax
    from jax import export as jexp

    cfg = predictor.cfg
    spec = request_spec(cfg, batch_size)
    params = predictor.params

    def fn(batch):
        # weights captured as constants — the artifact is self-contained
        return predictor._raw_predict(params, batch, None)

    kw = {}
    if platforms is not None:
        kw["platforms"] = tuple(platforms)
    exported = jexp.export(jax.jit(fn), **kw)(spec)

    out = Path(path)
    out.mkdir(parents=True, exist_ok=True)
    (out / "fn.bin").write_bytes(exported.serialize())
    manifest = {
        "format": "vogx-1",
        "batch_size": batch_size,
        "schema": {
            k: {"shape": list(v.shape), "dtype": np.dtype(v.dtype).name}
            for k, v in spec.items()
        },
        "conc_type": cfg.ds.conc_type,
        "exp_setting": cfg.ds.exp_setting,
        "mdl_name": cfg.mdl.name,
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
    }
    with open(out / "manifest.json", "w") as f:
        json.dump(manifest, f, indent=1)
    return out


class ExportedPredictor:
    """Loads a ``.vogx`` artifact and serves it — same call contract as the
    live ``Predictor`` (dict of host arrays in, dict of host arrays out),
    so it drops into ``ServingLoop`` unchanged."""

    def __init__(self, path: str | Path):
        import jax
        from jax import export as jexp

        p = Path(path)
        with open(p / "manifest.json") as f:
            self.manifest = json.load(f)
        exported = jexp.deserialize((p / "fn.bin").read_bytes())
        self._call = jax.jit(exported.call)  # compile once, replay forever
        self.batch_size = int(self.manifest["batch_size"])

    def dispatch(self, batch: Dict[str, np.ndarray]) -> Dict:
        """Async counterpart of ``__call__`` (same contract as
        ``Predictor.dispatch``): validate + enqueue, return device arrays."""
        schema = self.manifest["schema"]
        feed = {}
        for k, meta in schema.items():
            if k not in batch:
                raise KeyError(f"exported predictor request missing '{k}'")
            v = np.asarray(batch[k], dtype=meta["dtype"])
            if list(v.shape) != meta["shape"]:
                raise ValueError(
                    f"'{k}' shape {list(v.shape)} != exported {meta['shape']}"
                )
            feed[k] = v
        return self._call(feed)

    @staticmethod
    def fetch(out: Dict) -> Dict[str, np.ndarray]:
        return {k: np.asarray(v) for k, v in out.items()}

    def __call__(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        return self.fetch(self.dispatch(batch))
