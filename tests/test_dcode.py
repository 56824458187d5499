"""Offline pipeline (dcode equivalents): GT5 builder, rule-based SRL,
arg-box alignment, CS dict CLI."""

import json

import numpy as np

from tests.conftest import SMALL, small_cfg
from vog_tpu.data import get_data
from vog_tpu.data.boxes import iou_matrix
from vog_tpu.data.fixtures import generate_fixture
from vog_tpu.data.vocab import load_annotations
from vog_tpu.dcode.align_args import align_query, build_asrl
from vog_tpu.dcode.gt5_builder import build_gt5, gt5_select
from vog_tpu.dcode.srl_tagger import tag_sentence_rule_based


def test_gt5_select_keeps_gt_overlap(rng):
    boxes = rng.uniform(0, 50, (20, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 30, (20, 2))
    scores = rng.uniform(size=20).astype(np.float32)
    gt = boxes[7] + 1.0  # overlaps box 7
    idx = gt5_select(boxes, scores, [gt], k=5)
    assert len(idx) == 5 and len(set(idx.tolist())) == 5
    ious = iou_matrix(boxes[idx], gt[None])[:, 0]
    assert ious.max() >= 0.5


def test_build_gt5_from_p100(tmp_path, rng):
    p100 = tmp_path / "p100"
    generate_fixture(
        p100, n_train=6, n_valid=3, n_test=3, num_props=20,
        prop_dim=SMALL["prop_dim"], seg_dim=SMALL["seg_dim"],
        glove_dim=SMALL["glove_dim"], seed=3,
    )
    out = build_gt5(p100, tmp_path / "gt5", k=5)
    # the GT5 dataset must load and keep oracle-reachable targets
    cfg = small_cfg(out)
    data = get_data(cfg, global_batch_size=2)
    found = 0
    for i in range(len(data.train_dl.ds)):
        item = data.train_dl.ds.__getitem__(i, np.random.default_rng(0))
        gfm, am, t = item["gt_frame_mask"], item["srl_arg_mask"], item["targets"]
        pos = int(item["pos_vid"])
        for a in range(t.shape[1]):
            if am[a] == 0:
                continue
            for f in range(t.shape[2]):
                if gfm[a, f] > 0:
                    assert t[pos, a, f].sum() >= 1
                    found += 1
    assert found > 0


def test_rule_based_srl():
    out = tag_sentence_rule_based(["the", "man", "throws", "the", "ball", "near", "the", "car"])
    assert out["verb_lemma"] == "throw" and out["verb_idx"] == 2
    roles = {a["role"]: a for a in out["args"]}
    assert roles["ARG0"]["lemma"] == "man"
    assert roles["ARG1"]["lemma"] == "ball"
    assert roles["ARGM-LOC"]["lemma"] == "car"
    assert tag_sentence_rule_based(["no", "verbs", "here"]) is None


def test_align_args():
    srl = tag_sentence_rule_based(["the", "man", "throws", "the", "ball"])
    srl["vid_seg"] = "v0"
    ae = [
        {"tokens": ["a", "man"], "frame": 2, "box": [1, 2, 3, 4]},
        {"tokens": ["the", "hat"], "frame": 5, "box": [9, 9, 19, 19]},
    ]
    out = align_query(srl, ae)
    roles = {a["role"]: a for a in out["args"]}
    assert "ARG0" in roles and roles["ARG0"]["boxes"][0]["frame"] == 2
    assert "ARG1" not in roles  # ball has no AE phrase

    asrl = build_asrl([srl], {"v0": ae})
    assert len(asrl) == 1 and asrl[0]["ann_idx"] == 0
    assert build_asrl([srl], {"v0": []}) == []


def test_pipeline_end_to_end(tmp_path):
    """Raw captions + AE boxes -> per-split anns jsonl + CS dicts via the
    one-command dcode pipeline (rule tagger)."""
    raw = tmp_path / "raw"
    raw.mkdir()
    caps = [
        {"vid_seg": "v0", "sentence": "the man throws the ball", "split": "train"},
        {"vid_seg": "v1", "sentence": "a woman throws the ball", "split": "train"},
        {"vid_seg": "v2", "sentence": "the dog catches the ball", "split": "train"},
        {"vid_seg": "v3", "sentence": "a man rides the horse", "split": "valid"},
        {"vid_seg": "v4", "sentence": "nothing to see", "split": "train"},  # no verb
    ]
    (raw / "captions.jsonl").write_text(
        "\n".join(json.dumps(c) for c in caps) + "\n"
    )
    ae = {
        v: [
            {"tokens": ["the", w], "frame": 1, "box": [1, 2, 30, 40]}
            for w in words
        ]
        for v, words in {
            "v0": ["man", "ball"], "v1": ["woman", "ball"],
            "v2": ["dog", "ball"], "v3": ["man", "horse"],
        }.items()
    }
    (raw / "ae_annots.json").write_text(json.dumps(ae))

    from vog_tpu.dcode.pipeline import run_pipeline

    out = tmp_path / "ds"
    counts = run_pipeline(raw, out, tagger="rule")
    assert counts == {"train": 3, "valid": 1}
    anns = load_annotations(out / "anns_train.jsonl")
    assert [a["ann_idx"] for a in anns] == [0, 1, 2]
    roles0 = {a["role"]: a for a in anns[0]["args"]}
    assert roles0["ARG0"]["lemma"] == "man" and roles0["ARG0"]["boxes"]
    cs = json.loads((out / "cs_dict_train.json").read_text())
    # v0 and v1 share the verb lemma "throw" -> contrastive partners
    assert len(cs) == 3
    # CLI arg parsing
    from vog_tpu.dcode.pipeline import main as pl_main

    pl_main([str(raw), str(tmp_path / "ds2"), "--tagger=rule"])
    assert (tmp_path / "ds2" / "anns_valid.jsonl").exists()


def test_cs_builder_cli(fixture_dir, tmp_path, capsys):
    import shutil

    d = tmp_path / "ds"
    d.mkdir()
    shutil.copy(fixture_dir / "anns_train.jsonl", d / "anns_train.jsonl")
    from vog_tpu.dcode.cs_builder import main

    main(str(d), ("train",))
    assert (d / "cs_dict_train.json").exists()
    cs = json.loads((d / "cs_dict_train.json").read_text())
    anns = load_annotations(d / "anns_train.jsonl")
    assert len(cs) == len(anns)
