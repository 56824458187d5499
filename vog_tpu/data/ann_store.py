"""Device-resident annotation tables: the index-only input path.

Why (TPU-first, SURVEY §7 step 9 input-pipeline overlap): with the feature
tables already HBM-resident (data/device_store.py), the per-batch host
payload that remains is the *annotation* block — tokens/spans/roles, GT
boxes + frame masks, per-proposal IoU targets, and the per-video proposal
boxes/masks.  All of it is **static per annotation / per video** (the
reference recomputes it in DataLoader workers every epoch,
``code/dat_loader_simple.py`` ``__getitem__`` — SURVEY §3.3), so it uploads
ONCE into five packed 2-D tables and the batch shrinks to four int32
fields per sample::

    ann_row  ()      row into the annotation tables (split-offset + idx)
    vid_rows (V,)    rows into the feature/video tables (the sampled group)
    pos_vid  ()      slot of the positive video in the group
    ann_idx  ()      split-local idx (host metadata for predictions)

``expand_index_batch`` reconstructs the full canonical batch *inside jit*:
three row-gathers against the annotation tables, two against the per-video
tables, and the (B,V,A,F,P) target tensor rebuilt from the positive-slot
one-hot — all fused by XLA into the step.  Steady-state H2D per sample is
~(V+3)·4 bytes; contrastive sampling (the only non-static part) stays on
the host where it is a dict lookup.

Sizing (real ASRL, replicated): ~40k anns × (A·F·P targets u8 + A·F·4 GT
f32 + language i32) ≈ 250 MB at P100, ~45 MB at GT5; per-video boxes
~300 MB at P100 — comfortably resident next to the feature tables.

Bit-exactness vs the host path is asserted field-for-field and
step-for-step in tests/test_ann_store.py.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from vog_tpu.config import Cfg

# table keys expand_index_batch expects; presence of "ann_i32" in the
# tables dict (plus "ann_row" in the batch) switches the step's gather on
ANN_TABLE_KEYS = ("ann_i32", "ann_u8", "ann_f32", "vid_box", "vid_pmask")


def _dims(cfg: Cfg):
    ds = cfg.ds
    return (
        ds.max_seq_len,
        ds.max_srl_args,
        ds.num_frms,
        ds.num_prop_per_frm,
        ds.num_cmp,
    )


def ann_table_bytes(cfg: Cfg, n_anns: int, n_videos: int) -> int:
    L, A, F, P, _ = _dims(cfg)
    per_ann = (L + 2 + 3 * A) * 4 + (A + A * F + A * F * P) + A * F * 4 * 4
    per_vid = F * P * 5 * 4 + F * P
    return n_anns * per_ann + n_videos * per_vid


class DeviceAnnTables:
    """Packs every split's annotation statics + the per-video proposal
    boxes into replicated device tables.

    ``datasets`` maps split name -> AnetSRLDataset (the splits share one
    table through per-split row offsets, so train/valid/test eval all hit
    the SAME jitted executable shape — no per-split recompile).
    ``vid_rows`` is DeviceFeatureTables.rows: the video tables are indexed
    by the same ``vid_rows`` batches as the feature tables.
    """

    def __init__(self, cfg: Cfg, datasets: Dict, vid_rows: Dict[str, int], mesh=None):
        import jax

        L, A, F, P, _ = _dims(cfg)
        i32_w = L + 2 + 3 * A
        u8_w = A + A * F + A * F * P
        f32_w = A * F * 4

        self.split_offset: Dict[str, int] = {}
        n = 0
        for split in ("train", "valid", "test"):
            if split in datasets:
                self.split_offset[split] = n
                n += len(datasets[split])

        ann_i32 = np.zeros((n, i32_w), np.int32)
        ann_u8 = np.zeros((n, u8_w), np.uint8)
        ann_f32 = np.zeros((n, f32_w), np.float32)
        for split, off in self.split_offset.items():
            ds = datasets[split]
            for i in range(len(ds)):
                st = ds._ann_static(i)
                r = off + i
                ann_i32[r, :L] = st["tokens"]
                ann_i32[r, L] = st["seq_len"]
                ann_i32[r, L + 1] = st["verb_idx"]
                ann_i32[r, L + 2 : L + 2 + A] = st["srl_roles"]
                ann_i32[r, L + 2 + A :] = st["srl_spans"].reshape(-1)
                ann_u8[r, :A] = st["srl_arg_mask"]
                ann_u8[r, A : A + A * F] = st["gt_frame_mask"].reshape(-1)
                ann_u8[r, A + A * F :] = st["pos_targets"].reshape(-1)
                ann_f32[r] = st["gt_boxes"].reshape(-1)

        any_ds = next(iter(datasets.values()))
        nv = max(vid_rows.values()) + 1 if vid_rows else 0
        vid_box = np.zeros((nv, F * P * 5), np.float32)
        vid_pmask = np.zeros((nv, F * P), np.uint8)
        for vid, row in vid_rows.items():
            pb, pm, _, _ = any_ds._vid_static(vid)
            vid_box[row] = pb.reshape(-1)
            vid_pmask[row] = pm.reshape(-1)

        host = {
            "ann_i32": ann_i32,
            "ann_u8": ann_u8,
            "ann_f32": ann_f32,
            "vid_box": vid_box,
            "vid_pmask": vid_pmask,
        }
        if mesh is not None and not mesh.empty:
            from jax.sharding import NamedSharding, PartitionSpec

            sharding = NamedSharding(mesh, PartitionSpec())  # replicated
            self.tables = {k: jax.device_put(v, sharding) for k, v in host.items()}
        else:
            self.tables = {k: jax.device_put(v) for k, v in host.items()}
        self.n_anns = n


def expand_index_batch(batch: Dict, tables: Dict, cfg: Cfg) -> Dict:
    """Inside-jit: index-only batch -> the full canonical batch schema.

    Field-for-field bit-identical to the host ``__getitem__`` path (same
    dtypes — masks/targets come back uint8 and flow through the step's
    ``cast_compact`` exactly like host batches).  The feature gather
    (props/seg_feats from vid_rows) still happens downstream in
    ``gather_from_tables`` — this only resolves the annotation block.
    """
    import jax.numpy as jnp

    L, A, F, P, V = _dims(cfg)
    r = batch["ann_row"]
    B = r.shape[0]
    out = {k: v for k, v in batch.items() if k != "ann_row"}

    i32 = jnp.take(tables["ann_i32"], r, axis=0)
    out["tokens"] = i32[:, :L]
    out["seq_len"] = i32[:, L]
    out["verb_idx"] = i32[:, L + 1]
    out["srl_roles"] = i32[:, L + 2 : L + 2 + A]
    out["srl_spans"] = i32[:, L + 2 + A :].reshape(B, A, 2)

    u8 = jnp.take(tables["ann_u8"], r, axis=0)
    out["srl_arg_mask"] = u8[:, :A]
    out["gt_frame_mask"] = u8[:, A : A + A * F].reshape(B, A, F)
    pos_targets = u8[:, A + A * F :].reshape(B, A, F, P)
    out["gt_boxes"] = jnp.take(tables["ann_f32"], r, axis=0).reshape(B, A, F, 4)

    rows = batch["vid_rows"]  # (B, V)
    out["prop_boxes"] = jnp.take(tables["vid_box"], rows, axis=0).reshape(
        B, V, F, P, 5
    )
    out["prop_mask"] = jnp.take(tables["vid_pmask"], rows, axis=0).reshape(
        B, V, F, P
    )
    # targets live only in the positive video's slot (dataset.py: the
    # partner videos never contribute targets)
    onehot = (
        jnp.arange(V, dtype=jnp.int32)[None, :] == batch["pos_vid"][:, None]
    ).astype(jnp.uint8)
    out["targets"] = pos_targets[:, None] * onehot[:, :, None, None, None]
    return out
