"""Test harness config.

Tests run on CPU with 8 virtual XLA devices (SURVEY §4 item 4:
distributed-without-cluster — pjit/psum semantics validated without TPU
hardware).  Env must be set before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the environment pins JAX_PLATFORMS=axon (TPU tunnel) and the env var can
# be overridden back; the config update is authoritative
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from vog_tpu.config import Cfg, post_proc_config  # noqa: E402
from vog_tpu.data.fixtures import generate_fixture  # noqa: E402

# small dims so CPU tests stay fast; shapes stay "real" (F=10, P=5, V=4)
SMALL = dict(prop_dim=64, seg_dim=48, glove_dim=32)


def small_cfg(data_dir: str, **overrides) -> Cfg:
    cfg = Cfg()
    cfg.ds.data_dir = str(data_dir)
    cfg.ds.prop_dim = SMALL["prop_dim"]
    cfg.ds.seg_dim = SMALL["seg_dim"]
    cfg.ds.glove_dim = SMALL["glove_dim"]
    cfg.mdl.emb_dim = SMALL["glove_dim"]
    cfg.mdl.lstm_dim = 16
    cfg.mdl.vis_dim = 32
    cfg.mdl.role_dim = 8
    cfg.mdl.n_heads = 2
    cfg.mdl.dropout = 0.0
    cfg.mdl.use_pallas_attn = False
    cfg.train.bs = 2
    cfg.train.log_every = 5
    cfg.misc.tmp_path = str(data_dir) + "/../tmp"
    for k, v in overrides.items():
        parts = k.split(".")
        obj = cfg
        for p in parts[:-1]:
            obj = getattr(obj, p)
        setattr(obj, parts[-1], v)
    return post_proc_config(cfg)


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mini_asrl")
    generate_fixture(
        d,
        n_train=48,
        n_valid=16,
        n_test=16,
        num_props=5,
        prop_dim=SMALL["prop_dim"],
        seg_dim=SMALL["seg_dim"],
        glove_dim=SMALL["glove_dim"],
        seed=0,
    )
    return d


@pytest.fixture(scope="session")
def fixture_dir_big(tmp_path_factory):
    """Larger train split for generalization assertions: with only 48
    train samples every model memorizes (valid acc ≈ chance 1/P regardless
    of regularization — measured); at 160 samples the word→object-feature
    mapping generalizes (valid acc 0.70–0.83 across seeds)."""
    d = tmp_path_factory.mktemp("mini_asrl_big")
    generate_fixture(
        d,
        n_train=160,
        n_valid=16,
        n_test=16,
        num_props=5,
        prop_dim=SMALL["prop_dim"],
        seg_dim=SMALL["seg_dim"],
        glove_dim=SMALL["glove_dim"],
        seed=0,
    )
    return d


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
