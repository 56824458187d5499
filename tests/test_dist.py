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
        "mdl.name": "vid_grnd",
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
    """Same global batch + params: loss on 8-way DP mesh == 1-device mesh."""
    import jax

    from vog_tpu.data import get_vocab
    from vog_tpu.train.state import init_state

    over = {"train.bs": 1, "train.log_every": 1000, "mdl.dropout": 0.0}
    cfg8 = small_cfg(fixture_dir, **dict(over, **{"misc.mesh_data": 8}))
    cfg1 = small_cfg(fixture_dir, **dict(over, **{"misc.mesh_data": 1}))
    mesh8, mesh1 = make_mesh(cfg8), make_mesh(cfg1)
    glove = get_vocab(cfg8).vectors
    state = init_state(cfg8, glove, jax.random.PRNGKey(0), 8)
    step8 = jax.jit(make_train_step(cfg8))
    step1 = jax.jit(make_train_step(cfg1))

    data = get_data(cfg8, global_batch_size=8)
    batch = next(iter(data.train_dl))
    rng = jax.random.PRNGKey(1)
    _, aux8 = step8(state, shard_batch(batch, mesh8), rng)
    _, aux1 = step1(state, shard_batch(batch, mesh1), rng)
    np.testing.assert_allclose(float(aux8["loss"]), float(aux1["loss"]), rtol=1e-5)
