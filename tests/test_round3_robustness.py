"""Round-3 robustness: async-ckpt meta ordering, checkpoint key
migration, compact uint8 batch fields, load() error narrowing.

VERDICT r2 item 8 + ADVICE r2 (medium: meta.json durable before the async
array commit; low: BaseException swallowing, pre-round-2 GroundingHead
param names unloadable).
"""

import json

import numpy as np
import pytest

from tests.conftest import small_cfg
from vog_tpu.data import get_data
from vog_tpu.train import Learner, make_mesh


def _learner(fixture_dir, tmp_path, uid, **over):
    over.setdefault("mdl.name", "img_grnd")
    over.setdefault("ds.conc_type", "svsq")
    over.setdefault("train.bs", 4)
    over.setdefault("misc.mesh_data", 1)
    cfg = small_cfg(fixture_dir, **over)
    cfg.misc.tmp_path = str(tmp_path / "tmp")
    mesh = make_mesh(cfg)
    data = get_data(cfg, global_batch_size=cfg.train.bs * mesh.shape["data"])
    return Learner(uid, data, cfg, mesh=mesh), data, cfg


def test_async_meta_published_only_after_commit_barrier(fixture_dir, tmp_path):
    """A non-blocking save must NOT make meta.json durable before the
    array commit: meta is stashed and published at the next barrier, so a
    crash mid-commit can never pair new meta with old arrays (the failure
    mode: resume would fast-forward the data iterator past batches the
    restored params never saw)."""
    lrn, _, _ = _learner(fixture_dir, tmp_path, "meta_order")
    lrn.save("last", blocking=True)
    meta_f = lrn.ckpt_dir / "last.meta.json"
    assert json.loads(meta_f.read_text())["epoch"] == 0

    lrn.epoch = 7
    lrn.batch_in_epoch = 3
    lrn.save("last", blocking=False)
    # deterministically old: the flush happens only at a barrier, never
    # from the background commit thread
    assert json.loads(meta_f.read_text())["epoch"] == 0
    lrn.wait_for_checkpoints()
    meta = json.loads(meta_f.read_text())
    assert meta["epoch"] == 7 and meta["batch_in_epoch"] == 3


def test_head_param_migration_shim():
    """Pre-round-2 checkpoints carried GroundingHead params as nn.Dense
    submodules (head/fuse_vis/kernel); the restore fallback folds them to
    the flat post-refactor names (head/fuse_vis_kernel)."""
    old = {
        "head": {
            "fuse_vis": {"kernel": np.ones((4, 8)), "bias": np.zeros(8)},
            "fuse_lang": {"kernel": np.ones((4, 8))},
            "fuse_cross": {"kernel": np.ones((4, 8))},
            "head1": {"kernel": np.ones((8, 4)), "bias": np.zeros(4)},
            "head2": {"kernel": np.ones((4, 1)), "bias": np.zeros(1)},
        },
        "lang": {"proj": {"kernel": np.ones((2, 2)), "bias": np.zeros(2)}},
    }
    new = Learner._migrate_head_params(old)
    assert set(new["head"]) == {
        "fuse_vis_kernel", "fuse_vis_bias", "fuse_lang_kernel",
        "fuse_cross_kernel", "head1_kernel", "head1_bias",
        "head2_kernel", "head2_bias",
    }
    # non-head Dense modules are untouched
    assert set(new["lang"]["proj"]) == {"kernel", "bias"}
    np.testing.assert_array_equal(
        new["head"]["fuse_vis_kernel"], old["head"]["fuse_vis"]["kernel"]
    )


def test_missing_checkpoint_propagates(fixture_dir, tmp_path):
    """load() must not reinterpret a missing checkpoint as a structure
    mismatch (round-2 ADVICE: BaseException swallowing)."""
    lrn, _, _ = _learner(fixture_dir, tmp_path, "missing_ckpt")
    with pytest.raises(FileNotFoundError):
        lrn.load(str(tmp_path / "does_not_exist"))


def test_dataset_ships_compact_dtypes(fixture_dir, rng):
    """0/1 masks and targets travel uint8 (4x smaller H2D) and are cast
    to f32 on device inside the jitted step."""
    from vog_tpu.data.dataset import AnetSRLDataset, FeatureStore, get_vocab

    cfg = small_cfg(fixture_dir)
    store = FeatureStore(cfg.ds.data_dir)
    ds = AnetSRLDataset(cfg, "train", get_vocab(cfg), store)
    item = ds.__getitem__(0, rng)
    for k in ("targets", "prop_mask", "gt_frame_mask", "srl_arg_mask"):
        assert item[k].dtype == np.uint8, k
    # and the values are still exactly 0/1
    assert set(np.unique(item["targets"])) <= {0, 1}


def test_train_dl_prefetch_device_put_transform(fixture_dir, tmp_path):
    """The Learner installs shard_batch as the loader's producer-side
    transform: train batches arrive on device from the prefetch worker
    (H2D overlaps the previous step), and a fit() epoch still trains."""
    import jax

    lrn, data, _ = _learner(
        fixture_dir, tmp_path, "tf_overlap", **{"train.epochs": 1}
    )
    assert data.train_dl.transform is not None
    b = next(iter(data.train_dl))
    assert isinstance(b["targets"], jax.Array)  # device-put in the worker
    m = lrn.fit()
    assert np.isfinite(m["val_loss"])
