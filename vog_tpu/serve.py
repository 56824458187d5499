"""Serving/inference path: checkpoint -> jitted batched grounding.

The reference repo is research code with no serving surface; this is the
production-deployment counterpart (BASELINE.json: "intended for
large-scale production deployment and serving"): a ``Predictor`` that
restores a Learner checkpoint and exposes one jitted call mapping a
canonical feature batch to grounded boxes per SRL argument.

Outputs per considered (arg, annotated frame): the chosen video slot,
proposal index, its box (normalized xyxy) and score, plus the full
canonical score grid for downstream ranking.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from vog_tpu.config import Cfg
from vog_tpu.sampling import assemble_batch, scores_to_canonical
from vog_tpu.train.state import build_model, init_state


class Predictor:
    """``tables``: optional device-resident feature tables
    (vog_tpu/data/device_store.py).  When set, request batches may carry
    ``vid_rows`` instead of props/seg_feats — the gather happens inside
    the jitted call, so a GT5 request shrinks from ~34 MB of features to
    a few KB of metadata."""

    def __init__(self, cfg: Cfg, params, glove: np.ndarray, tables=None, mesh=None):
        self.cfg = cfg
        if cfg.mdl.sp_attention and mesh is not None:
            # serving-latency sequence parallelism: the P100 forward is
            # attention-dominated, so sharding T over the mesh cuts
            # per-request latency by ~the axis size (ring attention)
            from vog_tpu.train.dist import set_sequence_parallel

            set_sequence_parallel(mesh)
        self.model = build_model(cfg, glove)
        self.params = params
        self.tables = tables
        conc = cfg.ds.conc_type

        def _predict(params, batch, tables=None):
            from vog_tpu.train.state import cast_compact

            if tables is not None and "vid_rows" in batch:
                from vog_tpu.data.device_store import gather_from_tables

                batch = gather_from_tables(batch, tables)
            batch = cast_compact(batch)  # uint8 masks -> f32 (inside jit)
            clip = assemble_batch(batch, conc)
            logits = self.model.apply({"params": params}, clip, deterministic=True)
            B, V, F, P = batch["prop_mask"].shape
            scores = scores_to_canonical(logits, conc, B, V, F, P)  # (B,A,V,F,P)
            # padded proposals carry untrained logits — never let them win
            scores = jnp.where(batch["prop_mask"][:, None] > 0, scores, -1e30)
            cand = scores.transpose(0, 1, 3, 2, 4).reshape(B, scores.shape[1], F, V * P)
            choice = jnp.argmax(cand, axis=-1)  # (B,A,F)
            v_hat, p_hat = choice // P, choice % P
            b_idx = jnp.arange(B)[:, None, None]
            f_idx = jnp.arange(F)[None, None, :]
            boxes = batch["prop_boxes"][b_idx, v_hat, f_idx, p_hat, :4]
            best = jnp.max(cand, axis=-1)
            return {
                "scores": scores,
                "pred_vid": v_hat,
                "pred_prop": p_hat,
                "pred_box": boxes,
                "pred_score": best,
            }

        self._raw_predict = _predict  # unjitted — reused by vog_tpu/export.py
        self._predict = jax.jit(_predict)

    @classmethod
    def from_checkpoint(
        cls, cfg: Cfg, glove: np.ndarray, ckpt_path: str | Path, tables=None
    ) -> "Predictor":
        # template state for structure, then restore params
        state = init_state(cfg, glove, jax.random.PRNGKey(0), batch_size=1)
        ckptr = ocp.StandardCheckpointer()
        target = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = ckptr.restore(Path(ckpt_path).absolute(), target)
        return cls(cfg, restored["params"], glove, tables=tables)

    def dispatch(self, batch: Dict[str, np.ndarray]) -> Dict:
        """Enqueue one jitted call and return the DEVICE output tree
        without blocking on the result.  JAX dispatch is asynchronous, so
        the caller can overlap host work (or the next dispatch) with this
        call's compute + device->host fetch — ``ServingLoop`` uses this to
        pipeline flushes."""
        return self._predict(
            self.params,
            {k: jnp.asarray(v) for k, v in batch.items()},
            self.tables,
        )

    @staticmethod
    def fetch(out: Dict) -> Dict[str, np.ndarray]:
        """Blocking device->host transfer of a ``dispatch`` result."""
        return {k: np.asarray(v) for k, v in out.items()}

    def __call__(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        return self.fetch(self.dispatch(batch))
