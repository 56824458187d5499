"""AOT serving export: serialize the jitted Predictor to a deployable
artifact (StableHLO via ``jax.export``) + a JSON manifest.

The reference has no serving surface at all (research code); this is the
production-deployment counterpart to ``vog_tpu/serve.py``: the exported
artifact embeds the trained weights as constants and replays WITHOUT the
model code, flax, or a checkpoint — only jax + the artifact file — so the
serving fleet never re-traces, never depends on the training repo's model
definitions, and gets bit-identical outputs to the live Predictor
(tests/test_export.py).

Request schema (round-4, VERDICT r3 item #8 — the full-feature f32 mode
paid ~34 MB/request at GT5 B=16 and ran 4x slower than device-store
serving, BASELINE.md §serving):

  * ``feature_encoding="f32"``   canonical float features (legacy).
  * ``feature_encoding="bf16"``  props/seg_feats ship bfloat16 (2x
    smaller); cast to f32 inside the exported fn.
  * ``feature_encoding="int8"``  props/seg_feats ship int8 with per-
    vector symmetric scales (4x smaller; same quantization as the
    device store's ``_pack_rows``: q = round(x/s), s = maxabs/127);
    dequantized inside the exported fn.  ``encode_features`` is the
    client-side encoder; ``ExportedPredictor.dispatch`` auto-encodes
    float requests for convenience.
  * ``with_tables=True``         the device-store tables are saved INTO
    the artifact (``tables.npz``, int8/bf16-packed exactly as resident
    in HBM) and the exported fn takes ``vid_rows`` (B, V) int32 instead
    of features — a standalone artifact whose requests are KBs.

Artifact layout (``<path>.vogx`` directory):
  fn.bin         serialized jax.export.Exported (StableHLO + vjp-less call)
  manifest.json  schema (key -> shape/dtype), config dims, jax version,
                 export platforms, feature_encoding, tables flag
  tables.npz     (with_tables only) packed feature tables + scales
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np

import jax.numpy as jnp

from vog_tpu.config import Cfg

_ENCODINGS = ("f32", "bf16", "int8")


def request_spec(
    cfg: Cfg,
    batch_size: int,
    feature_encoding: str = "f32",
    vid_rows: bool = False,
) -> Dict:
    """ShapeDtypeStruct pytree of the canonical serving request."""
    import jax
    import jax.numpy as jnp

    if feature_encoding not in _ENCODINGS:
        raise ValueError(f"feature_encoding must be one of {_ENCODINGS}")
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
    spec = {
        "prop_boxes": s((B, V, F, P, 5), f32),
        "prop_mask": s((B, V, F, P), u8),
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
    if vid_rows:
        spec["vid_rows"] = s((B, V), i32)
    elif feature_encoding == "int8":
        spec["props"] = s((B, V, F, P, ds.prop_dim), np.int8)
        spec["props_scale"] = s((B, V, F, P), f32)
        spec["seg_feats"] = s((B, V, F, ds.seg_dim), np.int8)
        spec["seg_scale"] = s((B, V, F), f32)
    else:
        dt = jnp.bfloat16 if feature_encoding == "bf16" else f32
        spec["props"] = s((B, V, F, P, ds.prop_dim), dt)
        spec["seg_feats"] = s((B, V, F, ds.seg_dim), dt)
    return spec


def encode_features(
    request: Dict[str, np.ndarray], feature_encoding: str
) -> Dict[str, np.ndarray]:
    """Client-side request-feature encoder (host, before the wire/H2D).

    int8 uses the device store's per-trailing-vector symmetric scheme
    (``data/device_store.py §_pack_rows``): one scale per proposal
    feature vector / per segment frame, q = round(x / s), s = maxabs/127
    — relative error ≲1% on fc6-like activations.  Works on batched
    (B, V, ...) and single-request (V, ...) layouts alike (trailing-axis
    quantization is layout-agnostic).
    """
    if feature_encoding == "f32" or "props" not in request:
        return request
    out = {k: v for k, v in request.items()}
    if feature_encoding == "bf16":
        import ml_dtypes

        for k in ("props", "seg_feats"):
            out[k] = np.asarray(out[k]).astype(ml_dtypes.bfloat16)
        return out
    if feature_encoding != "int8":
        raise ValueError(f"unknown feature_encoding {feature_encoding!r}")
    for k, sk in (("props", "props_scale"), ("seg_feats", "seg_scale")):
        v = np.asarray(out[k], np.float32)
        s = np.max(np.abs(v), axis=-1) / 127.0
        s = np.where(s == 0, 1.0, s).astype(np.float32)
        out[k] = np.clip(np.round(v / s[..., None]), -127, 127).astype(np.int8)
        out[sk] = s
    return out


def _decode_features(batch: Dict, feature_encoding: str) -> Dict:
    """Inside-jit inverse of ``encode_features``."""
    import jax.numpy as jnp

    if feature_encoding == "f32" or "props" not in batch:
        return batch
    out = {k: v for k, v in batch.items()}
    if feature_encoding == "bf16":
        for k in ("props", "seg_feats"):
            out[k] = out[k].astype(jnp.float32)
        return out
    for k, sk in (("props", "props_scale"), ("seg_feats", "seg_scale")):
        out[k] = out[k].astype(jnp.float32) * out.pop(sk)[..., None]
    return out


def export_predictor(
    predictor,
    batch_size: int,
    path: str | Path,
    platforms: Optional[Sequence[str]] = None,
    feature_encoding: str = "f32",
    with_tables: bool = False,
    rows: Optional[Dict[str, int]] = None,
) -> Path:
    """Serialize ``predictor`` (vog_tpu.serve.Predictor) at a fixed batch
    size.  ``platforms``: lowering targets (default: the current backend;
    pass e.g. ("tpu", "cpu") for a cross-platform artifact).
    ``feature_encoding``/``with_tables``: request compaction — see the
    module docstring."""
    import jax
    from jax import export as jexp

    cfg = predictor.cfg
    if with_tables and predictor.tables is None:
        raise ValueError(
            "with_tables=True requires a Predictor constructed with "
            "device-store tables (vog_tpu.data.device_store)"
        )
    spec = request_spec(
        cfg, batch_size, feature_encoding=feature_encoding, vid_rows=with_tables
    )
    params = predictor.params

    kw = {}
    if platforms is not None:
        kw["platforms"] = tuple(platforms)

    if with_tables:
        host_tables = {
            k: np.asarray(jax.device_get(v)) for k, v in predictor.tables.items()
        }
        tspec = {
            k: jax.ShapeDtypeStruct(v.shape, v.dtype) for k, v in host_tables.items()
        }

        def fn(tables, batch):
            # weights captured as constants; tables stay an ARGUMENT so the
            # artifact ships them as data (tables.npz), not as gigabytes of
            # StableHLO constants
            return predictor._raw_predict(params, batch, tables)

        exported = jexp.export(jax.jit(fn), **kw)(tspec, spec)
    else:

        def fn(batch):
            # weights captured as constants — the artifact is self-contained
            return predictor._raw_predict(
                params, _decode_features(batch, feature_encoding), None
            )

        exported = jexp.export(jax.jit(fn), **kw)(spec)

    out = Path(path)
    out.mkdir(parents=True, exist_ok=True)
    (out / "fn.bin").write_bytes(exported.serialize())
    table_dtypes = {}
    if with_tables:
        # np.savez writes ml_dtypes.bfloat16 as a 2-byte VOID dtype that
        # np.load can't hand back to jax (round-5 bug: the with_tables
        # artifact failed to LOAD for bf16 tables).  Ship bf16 as a
        # uint16 view + the real dtype in the manifest; the loader views
        # it back.
        packed = {}
        for k, v in host_tables.items():
            if v.dtype == jnp.bfloat16:
                table_dtypes[k] = "bfloat16"
                packed[k] = np.asarray(v).view(np.uint16)
            else:
                packed[k] = np.asarray(v)
        np.savez(out / "tables.npz", **packed)
    manifest = {
        "format": "vogx-1",
        "batch_size": batch_size,
        "schema": {
            k: {"shape": list(v.shape), "dtype": np.dtype(v.dtype).name}
            for k, v in spec.items()
        },
        "feature_encoding": feature_encoding,
        "with_tables": with_tables,
        # bf16 tables travel as uint16 in tables.npz (see above); the
        # loader views entries listed here back to their real dtype
        "table_dtypes": table_dtypes,
        # vid_seg -> table row (with_tables artifacts): a standalone
        # deployment needs the mapping to build vid_rows requests —
        # round-5 fix: without it the artifact could only serve clients
        # that already knew the live store's row assignment
        "rows": {k: int(v) for k, v in rows.items()} if rows else None,
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
    so it drops into ``ServingLoop`` unchanged.

    Compact artifacts: with ``feature_encoding`` bf16/int8 the request
    features ship 2–4x smaller (``dispatch`` auto-encodes float inputs);
    with ``with_tables`` the artifact carries the packed feature tables,
    they are uploaded to the device ONCE at load, and requests carry
    ``vid_rows`` only."""

    def __init__(self, path: str | Path):
        import jax
        from jax import export as jexp

        p = Path(path)
        with open(p / "manifest.json") as f:
            self.manifest = json.load(f)
        exported = jexp.deserialize((p / "fn.bin").read_bytes())
        self._call = jax.jit(exported.call)  # compile once, replay forever
        self.batch_size = int(self.manifest["batch_size"])
        self.encoding = self.manifest.get("feature_encoding", "f32")
        self._tables = None
        self.rows = self.manifest.get("rows")  # vid_seg -> table row
        if self.manifest.get("with_tables"):
            tdt = self.manifest.get("table_dtypes", {})
            with np.load(p / "tables.npz") as z:
                self._tables = {
                    k: jax.device_put(
                        z[k].view(jnp.bfloat16) if tdt.get(k) == "bfloat16"
                        else z[k]
                    )
                    for k in z.files
                }

    def dispatch(self, batch: Dict[str, np.ndarray]) -> Dict:
        """Async counterpart of ``__call__`` (same contract as
        ``Predictor.dispatch``): validate + enqueue, return device arrays."""
        schema = self.manifest["schema"]
        if self.encoding != "f32" and "props" in batch:
            props = np.asarray(batch["props"])
            # raw float request (kind 'f'): encode here; already-encoded
            # int8 (kind 'i') / bf16 (kind 'V') pass through untouched
            if props.dtype.kind == "f":
                batch = encode_features(batch, self.encoding)
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
        if self._tables is not None:
            return self._call(self._tables, feed)
        return self._call(feed)

    @staticmethod
    def fetch(out: Dict) -> Dict[str, np.ndarray]:
        return {k: np.asarray(v) for k, v in out.items()}

    def __call__(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        return self.fetch(self.dispatch(batch))
