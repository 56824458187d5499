"""GT5 proposal-set builder.

Reference parity: the dcode GT5 script (SURVEY §2/§3.4): for each frame of
each video segment, build the 5-proposal set from the P100 detections —
the proposal(s) that overlap a GT box (IoU>=0.5) are kept (so the oracle
grounding accuracy is high), and the remaining slots are filled with the
top-scoring detections.  This converts a P100-regime ``roi_feats.h5`` into
a GT5-regime one.

Usage:
  python -m vog_tpu.dcode.gt5_builder <p100_dir> <out_dir> [num_props]

<p100_dir> must contain roi_feats.h5, anns_{split}.jsonl, vid_dims.json;
seg feats are referenced, not copied.
"""

from __future__ import annotations

import json
import shutil
import sys
from pathlib import Path
from typing import Dict, List

import h5py
import numpy as np

from vog_tpu.data.boxes import iou_matrix
from vog_tpu.data.vocab import load_annotations

IOU_THRESH = 0.5


def gt5_select(
    boxes: np.ndarray,  # (P, 4) detections in one frame
    scores: np.ndarray,  # (P,)
    gt_boxes: List[np.ndarray],  # GT boxes annotated in this frame
    k: int = 5,
) -> np.ndarray:
    """Indices of the k selected proposals: GT-overlapping first (best IoU
    per GT), then top-scoring detections."""
    P = boxes.shape[0]
    chosen: List[int] = []
    if gt_boxes:
        ious = iou_matrix(boxes, np.stack(gt_boxes))  # (P, G)
        for g in range(ious.shape[1]):
            best = int(np.argmax(ious[:, g]))
            if ious[best, g] >= IOU_THRESH and best not in chosen:
                chosen.append(best)
                if len(chosen) >= k:
                    break
    order = np.argsort(-scores)
    for p in order:
        if len(chosen) >= k:
            break
        if int(p) not in chosen:
            chosen.append(int(p))
    while len(chosen) < k:  # degenerate tiny-P case: repeat best
        chosen.append(chosen[-1] if chosen else 0)
    return np.asarray(chosen[:k], np.int64)


def build_gt5(p100_dir: str | Path, out_dir: str | Path, k: int = 5) -> Path:
    p100_dir, out_dir = Path(p100_dir), Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    # GT boxes per (vid_seg, frame) from all splits' annotations
    gt_by_seg: Dict[str, Dict[int, List[np.ndarray]]] = {}
    for split in ("train", "valid", "test"):
        f = p100_dir / f"anns_{split}.jsonl"
        if not f.exists():
            continue
        for ann in load_annotations(f):
            seg = gt_by_seg.setdefault(ann["vid_seg"], {})
            for arg in ann["args"]:
                for bx in arg["boxes"]:
                    seg.setdefault(int(bx["frame"]), []).append(
                        np.asarray(bx["box"], np.float32)
                    )
        shutil.copy(f, out_dir / f.name)
        cs = p100_dir / f"cs_dict_{split}.json"
        if cs.exists():
            shutil.copy(cs, out_dir / cs.name)

    with h5py.File(p100_dir / "roi_feats.h5", "r") as src, h5py.File(
        out_dir / "roi_feats.h5", "w"
    ) as dst:
        for seg in src.keys():
            feats = np.asarray(src[seg]["feats"])
            boxes = np.asarray(src[seg]["boxes"])
            scores = np.asarray(src[seg]["scores"])
            F = feats.shape[0]
            sel_feats, sel_boxes, sel_scores = [], [], []
            for fr in range(F):
                gts = gt_by_seg.get(seg, {}).get(fr, [])
                idx = gt5_select(boxes[fr], scores[fr], gts, k)
                sel_feats.append(feats[fr, idx])
                sel_boxes.append(boxes[fr, idx])
                sel_scores.append(scores[fr, idx])
            g = dst.create_group(seg)
            g.create_dataset("feats", data=np.stack(sel_feats))
            g.create_dataset("boxes", data=np.stack(sel_boxes))
            g.create_dataset("scores", data=np.stack(sel_scores))

    shutil.copy(p100_dir / "vid_dims.json", out_dir / "vid_dims.json")
    if (p100_dir / "glove.txt").exists():
        shutil.copy(p100_dir / "glove.txt", out_dir / "glove.txt")
    seg_src = p100_dir / "seg_feats"
    seg_dst = out_dir / "seg_feats"
    if seg_src.exists() and not seg_dst.exists():
        shutil.copytree(seg_src, seg_dst)
    return out_dir


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    build_gt5(src, dst, k)
    print(f"gt5 dataset written to {dst}")
