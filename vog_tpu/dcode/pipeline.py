"""One-command offline ASRL construction: dcode stages chained.

Reference parity: the reference's dcode is a sequence of one-shot scripts
(SURVEY §3.4): SRL-tag the ActivityNet-Captions sentences -> align arg
phrases with ActivityNet-Entities boxes -> write per-split annotation
files -> build the contrastive-sampling dicts (-> optionally build the
GT5 h5 from the P100 detections).  This module chains our equivalents
behind one CLI so a raw-caption drop becomes a trainable dataset dir:

  python -m vog_tpu.dcode.pipeline <raw_dir> <out_dir> \
      [--tagger=rule|bert:<model_dir>] [--gt5-from=<p100_dir>] [--gt5-k=5]

Raw inputs (in <raw_dir>):
  captions.jsonl   one per line: {"vid_seg": str, "sentence": str,
                   "split": "train"|"valid"|"test"}   (split optional ->
                   "train"; the reference derives splits from the AE
                   val split — pass them explicitly here)
  ae_annots.json   {vid_seg: [{"tokens": [...], "frame": int,
                   "box": [x1, y1, x2, y2]}, ...]}

Outputs (in <out_dir>): anns_{split}.jsonl + cs_dict_{split}.json for
every split present, and (with --gt5-from) the GT5 feature h5.  Feature
files (roi_feats.h5, seg_feats/, glove.txt, vid_dims.json) come from the
detector / TSN / GloVe download, not from this pipeline — copy or
symlink them into <out_dir> (data/download_data.sh documents sources).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
from typing import Dict, List, Optional

from vog_tpu.dcode.align_args import build_asrl
from vog_tpu.dcode.cs_builder import main as build_cs
from vog_tpu.dcode.srl_tagger import tag_sentence_rule_based

SPLITS = ("train", "valid", "test")


def _make_tagger(spec: str):
    """-> callable(tokens: list[str]) -> Optional[schema dict]."""
    if spec == "rule":
        return tag_sentence_rule_based
    if spec.startswith("bert:"):
        from vog_tpu.dcode.srl_tagger import BertSrlTagger

        tagger = BertSrlTagger.from_pretrained(spec[len("bert:"):])
        return tagger.tag_sentence
    raise ValueError(f"unknown --tagger={spec!r} (rule | bert:<model_dir>)")


def run_pipeline(
    raw_dir: str | Path,
    out_dir: str | Path,
    tagger: str = "rule",
    gt5_from: Optional[str] = None,
    gt5_k: int = 5,
) -> Dict[str, int]:
    """Returns {split: n_queries_written}."""
    raw_dir, out_dir = Path(raw_dir), Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    tag = _make_tagger(tagger)

    with open(raw_dir / "ae_annots.json") as f:
        ae: Dict[str, List[Dict]] = json.load(f)

    by_split: Dict[str, List[Dict]] = {}
    n_untagged = 0
    with open(raw_dir / "captions.jsonl") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            cap = json.loads(line)
            split = cap.get("split", "train")
            if split not in SPLITS:
                raise ValueError(f"bad split {split!r} for {cap['vid_seg']}")
            srl = tag(cap["sentence"].split())
            if srl is None:  # no predicate frame -> query dropped
                n_untagged += 1
                continue
            srl["vid_seg"] = cap["vid_seg"]
            by_split.setdefault(split, []).append(srl)

    counts: Dict[str, int] = {}
    for split, queries in sorted(by_split.items()):
        asrl = build_asrl(queries, ae)  # align + role filter + ann_idx
        out = out_dir / f"anns_{split}.jsonl"
        with open(out, "w") as f:
            for q in asrl:
                f.write(json.dumps(q) + "\n")
        counts[split] = len(asrl)
        print(
            f"{split}: {len(queries)} tagged -> {len(asrl)} grounded "
            f"queries -> {out}"
        )
    if n_untagged:
        print(f"dropped {n_untagged} captions with no SRL frame")

    build_cs(str(out_dir), tuple(sorted(by_split)))
    if gt5_from:
        from vog_tpu.dcode.gt5_builder import build_gt5

        build_gt5(gt5_from, out_dir, k=gt5_k)
    return counts


def main(argv: Optional[List[str]] = None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    kw: Dict = {}
    pos: List[str] = []
    for a in argv:
        if a.startswith("--tagger="):
            kw["tagger"] = a.split("=", 1)[1]
        elif a.startswith("--gt5-from="):
            kw["gt5_from"] = a.split("=", 1)[1]
        elif a.startswith("--gt5-k="):
            kw["gt5_k"] = int(a.split("=", 1)[1])
        else:
            pos.append(a)
    if len(pos) != 2:
        raise SystemExit(__doc__)
    run_pipeline(pos[0], pos[1], **kw)


if __name__ == "__main__":
    main()
