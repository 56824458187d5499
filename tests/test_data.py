import json

import numpy as np
import pytest

from tests.conftest import small_cfg
from vog_tpu.data import AnetSRLDataset, FeatureStore, get_data, get_vocab
from vog_tpu.data.boxes import iou_matrix
from vog_tpu.data.contrastive import ContrastiveSampler, build_cs_dict
from vog_tpu.data.vocab import load_annotations


def test_fixture_files_exist(fixture_dir):
    for f in [
        "anns_train.jsonl",
        "anns_valid.jsonl",
        "roi_feats.h5",
        "vid_dims.json",
        "glove.txt",
        "cs_dict_train.json",
    ]:
        assert (fixture_dir / f).exists(), f


def test_vocab(fixture_dir):
    cfg = small_cfg(fixture_dir)
    vocab = get_vocab(cfg)
    assert vocab.dim == cfg.ds.glove_dim
    ids = vocab.encode(["the", "man", "zzzunknown"])
    assert ids[0] > 1 and ids[1] > 1 and ids[2] == 1  # unk


def test_cs_dict_partners_share_verb(fixture_dir):
    anns = load_annotations(fixture_dir / "anns_train.jsonl")
    cs = build_cs_dict(anns)
    checked = 0
    for i, ann in enumerate(anns):
        for j in cs[str(i)][:3]:
            if anns[j]["verb_lemma"] == ann["verb_lemma"]:
                checked += 1
            assert anns[j]["vid_seg"] != ann["vid_seg"]
    assert checked > 0


def test_cs_sampler_val_deterministic(fixture_dir):
    anns = load_annotations(fixture_dir / "anns_valid.jsonl")
    cs = build_cs_dict(anns)
    s = ContrastiveSampler(cs, len(anns), ncmp=4, is_train=False, seed=1)
    g1 = s.sample_group(3)
    g2 = s.sample_group(3)
    assert g1 == g2
    assert len(g1[0]) == 3


@pytest.mark.parametrize("conc_type", ["svsq", "spat"])
def test_dataset_item_shapes(fixture_dir, conc_type, rng):
    cfg = small_cfg(fixture_dir, **{"ds.conc_type": conc_type})
    vocab = get_vocab(cfg)
    store = FeatureStore(cfg.ds.data_dir)
    ds = AnetSRLDataset(cfg, "train", vocab, store)
    item = ds.__getitem__(0, rng)
    V, F, P, A, L = (
        cfg.ds.num_cmp,
        cfg.ds.num_frms,
        cfg.ds.num_prop_per_frm,
        cfg.ds.max_srl_args,
        cfg.ds.max_seq_len,
    )
    assert item["props"].shape == (V, F, P, cfg.ds.prop_dim)
    assert item["prop_boxes"].shape == (V, F, P, 5)
    assert item["seg_feats"].shape == (V, F, cfg.ds.seg_dim)
    assert item["tokens"].shape == (L,)
    assert item["srl_spans"].shape == (A, 2)
    assert item["targets"].shape == (V, A, F, P)
    assert item["gt_boxes"].shape == (A, F, 4)
    assert 0 <= item["pos_vid"] < V


def test_targets_only_in_positive_video(fixture_dir, rng):
    cfg = small_cfg(fixture_dir, **{"ds.conc_type": "spat"})
    vocab = get_vocab(cfg)
    store = FeatureStore(cfg.ds.data_dir)
    ds = AnetSRLDataset(cfg, "train", vocab, store)
    found_pos = 0
    for i in range(10):
        item = ds.__getitem__(i, rng)
        t = item["targets"]
        pos = int(item["pos_vid"])
        neg = np.delete(t, pos, axis=0)
        assert neg.sum() == 0.0
        # every annotated (arg, frame) must have >=1 positive proposal
        # (fixture guarantees a GT-overlapping proposal — GT5 semantics)
        gfm = item["gt_frame_mask"]
        am = item["srl_arg_mask"]
        for a in range(t.shape[1]):
            if am[a] == 0:
                continue
            for f in range(t.shape[2]):
                if gfm[a, f] > 0:
                    assert t[pos, a, f].sum() >= 1, (i, a, f)
                    found_pos += 1
    assert found_pos > 0


def test_targets_match_iou_recompute(fixture_dir, rng):
    """Cross-check dataset targets against an independent IoU recompute."""
    cfg = small_cfg(fixture_dir)
    vocab = get_vocab(cfg)
    store = FeatureStore(cfg.ds.data_dir)
    ds = AnetSRLDataset(cfg, "valid", vocab, store)
    item = ds.__getitem__(1, rng)
    ann = ds.anns[1]
    feats, boxes_abs, scores, seg = store.get(ann["vid_seg"])
    for a, arg in enumerate(ann["args"][: cfg.ds.max_srl_args]):
        for bx in arg["boxes"]:
            fr = bx["frame"]
            ious = iou_matrix(boxes_abs[fr], np.asarray(bx["box"])[None])[:, 0]
            expect = (ious >= 0.5).astype(np.float32)
            got = item["targets"][int(item["pos_vid"]), a, fr, : len(expect)]
            np.testing.assert_array_equal(got, expect)


def test_loader_batches(fixture_dir):
    cfg = small_cfg(fixture_dir, **{"ds.conc_type": "temp"})
    data = get_data(cfg, global_batch_size=4)
    batch = next(iter(data.train_dl))
    assert batch["props"].shape[0] == 4
    assert batch["batch_mask"].sum() == 4
    # eval: final batch padded, mask marks real rows
    n_valid = len(data.valid_dl.ds)
    batches = list(data.valid_dl)
    total = sum(int(b["batch_mask"].sum()) for b in batches)
    assert total == n_valid


def test_loader_epoch_determinism(fixture_dir):
    cfg = small_cfg(fixture_dir)
    data = get_data(cfg, global_batch_size=4)
    b1 = next(iter(data.valid_dl))
    b2 = next(iter(data.valid_dl))
    np.testing.assert_array_equal(b1["ann_idx"], b2["ann_idx"])
    np.testing.assert_allclose(b1["props"], b2["props"])


def test_loader_early_close_reaps_prefetch_thread(fixture_dir):
    """Breaking out of iteration (e.g. num_eval_batches cap) must terminate
    the prefetch worker instead of stranding it on a full queue (round-1
    advisor finding)."""
    import threading
    import gc

    cfg = small_cfg(fixture_dir)
    data = get_data(cfg, global_batch_size=2)
    before = threading.active_count()
    for trial in range(3):
        it = iter(data.valid_dl)
        next(it)  # consume one batch, then abandon the generator
        it.close()
    gc.collect()
    deadline = 50
    while threading.active_count() > before and deadline > 0:
        import time

        time.sleep(0.1)
        deadline -= 1
    assert threading.active_count() <= before


def test_loader_seek_matches_full_iteration(fixture_dir):
    """start_batch=k yields exactly the batches a full iteration produces
    from position k (per-sample RNG is position-independent), so mid-epoch
    resume never constructs skipped batches."""
    cfg = small_cfg(fixture_dir)
    data = get_data(cfg, global_batch_size=2)
    dl = data.train_dl

    dl.epoch = 5
    full = list(dl)
    dl.epoch = 5
    dl.start_batch = 2
    tail = list(dl)
    assert len(tail) == len(full) - 2
    for a, b in zip(full[2:], tail):
        np.testing.assert_array_equal(a["ann_idx"], b["ann_idx"])
        np.testing.assert_allclose(a["props"], b["props"])
        np.testing.assert_array_equal(a["pos_vid"], b["pos_vid"])
