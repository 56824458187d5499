"""pjit sharding semantics on the virtual 8-device CPU mesh (SURVEY §4
item 4): data parallelism (the reference's DDP equivalent) and the extra
tensor-parallel 'model' axis the TPU build adds."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tests.conftest import small_cfg
from vog_tpu.data import get_data
from vog_tpu.train import (
    Learner,
    make_mesh,
    make_train_step,
    param_shardings,
    shard_batch,
)


def test_mesh_shapes(fixture_dir):
    cfg = small_cfg(fixture_dir)
    mesh = make_mesh(cfg)
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1

    cfg2 = small_cfg(fixture_dir, **{"misc.mesh_data": 4, "misc.mesh_model": 2})
    mesh2 = make_mesh(cfg2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_train_step_on_mesh(fixture_dir, tmp_path, mesh_shape):
    d, m = mesh_shape
    over = {
        "misc.mesh_data": d,
        "misc.mesh_model": m,
        "mdl.name": "vog",
        "ds.conc_type": "spat",
        "train.bs": 1,
        "train.log_every": 1000,
    }
    cfg = small_cfg(fixture_dir, **over)
    cfg.misc.tmp_path = str(tmp_path / "tmp")
    mesh = make_mesh(cfg)
    data = get_data(cfg, global_batch_size=cfg.train.bs * d)
    lrn = Learner(f"dist{d}x{m}", data, cfg, mesh=mesh)

    batch = next(iter(data.train_dl))
    sb = shard_batch(batch, mesh)
    # batch arrays land sharded over 'data'
    assert sb["props"].sharding.spec == P("data")
    state, aux = lrn._train_step(lrn.state, sb, lrn.rng)
    assert np.isfinite(float(aux["loss"]))

    if m > 1:
        # a wide kernel is really sharded over the model axis
        k = state.params["prop_enc"]["prop_proj"]["kernel"]
        assert k.sharding.spec == P(None, "model")
        shard_shapes = {tuple(s.data.shape) for s in k.addressable_shards}
        assert all(s[1] == k.shape[1] // m for s in shard_shapes)

    # one more step for executable reuse
    state, aux2 = lrn._train_step(state, sb, lrn.rng)
    assert np.isfinite(float(aux2["loss"]))


def test_dp_equals_single_device_loss(fixture_dir, tmp_path):
    """Same global batch: loss on 8-way DP mesh == loss on 1-device mesh."""
    over = {"train.bs": 1, "train.log_every": 1000}
    cfg8 = small_cfg(fixture_dir, **dict(over, **{"misc.mesh_data": 8}))
    cfg8.misc.tmp_path = str(tmp_path / "t8")
    mesh8 = make_mesh(cfg8)
    data8 = get_data(cfg8, global_batch_size=8)
    l8 = Learner("dp8", data8, cfg8, mesh=mesh8)

    cfg1 = small_cfg(fixture_dir, **dict(over, **{"misc.mesh_data": 1}))
    cfg1.misc.tmp_path = str(tmp_path / "t1")
    mesh1 = make_mesh(cfg1)
    data1 = get_data(cfg1, global_batch_size=8)
    l1 = Learner("dp1", data1, cfg1, mesh=mesh1)

    batch = next(iter(data8.train_dl))
    _, aux8 = l8._train_step(l8.state, shard_batch(batch, mesh8), l8.rng)
    _, aux1 = l1._train_step(l1.state, shard_batch(batch, mesh1), l1.rng)
    np.testing.assert_allclose(float(aux8["loss"]), float(aux1["loss"]), rtol=1e-5)
