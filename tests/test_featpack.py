"""Native featpack store: build, read-parity vs h5, batched gather."""

import numpy as np
import pytest

from tests.conftest import small_cfg
from vog_tpu.data import get_data
from vog_tpu.data.dataset import FeatureStore
from vog_tpu.data.featpack import PackedFeatureStore, build_featpack


@pytest.fixture(scope="module")
def packed_dir(fixture_dir, tmp_path_factory):
    # copy: don't mutate the shared session fixture (the loader
    # auto-upgrades to the packed store when featpack.bin exists)
    import shutil

    d = tmp_path_factory.mktemp("packed") / "asrl"
    shutil.copytree(fixture_dir, d)
    build_featpack(d)
    return d


def test_pack_matches_h5(packed_dir):
    h5_store = FeatureStore(packed_dir)
    pk_store = PackedFeatureStore(packed_dir)
    segs = list(pk_store.entries.keys())[:5]
    for seg in segs:
        a = h5_store.get(seg)
        b = pk_store.get(seg)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        assert h5_store.dims(seg) == pk_store.dims(seg)


def test_gather_many(packed_dir):
    pk = PackedFeatureStore(packed_dir)
    segs = list(pk.entries.keys())[:8]
    many = pk.gather_many(segs)
    assert len(many) == 8
    for seg, fields in zip(segs, many):
        single = pk.get(seg)
        for x, y in zip(fields, single):
            np.testing.assert_array_equal(x, y)


def test_loader_uses_pack_transparently(packed_dir):
    cfg = small_cfg(packed_dir)
    data = get_data(cfg, global_batch_size=2)
    assert isinstance(data.train_dl.ds.store, PackedFeatureStore)
    batch = next(iter(data.valid_dl))
    assert np.isfinite(batch["props"]).all()


def test_pack_oob_rejected(packed_dir):
    import ctypes

    pk = PackedFeatureStore(packed_dir)
    n = 1
    arr = lambda xs: (ctypes.c_uint64 * n)(*xs)
    buf = np.empty(16, np.uint8)
    rc = pk._lib.fp_gather(
        pk._handle, arr([2**62]), arr([16]), arr([0]),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, 1,
    )
    assert rc == -1
