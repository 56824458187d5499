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


# ---------------------------------------------------------------------------
# two-tier suite (VERDICT r3 item #7): the node ids below are the heavy
# tail measured on the reference 1-core host (full-suite --durations=0,
# 2026-08-19, threshold >= 8 s incl. setup/teardown; at least one test per
# module always stays unmarked so `pytest -m "not slow"` still covers
# every module).  tests/test_srl_golden.py marks itself slow at module
# level (fine-tune loop).  Regenerate after large suite changes by
# re-running the suite with --durations=0 and rebuilding this list.
SLOW_NODE_IDS = {
    # round-5 additions (fast tier measured 579-709 s on this host;
    # VERDICT r4 next #7 wants <= ~300 s): the heavy tail below moves to
    # the slow tier — every module keeps at least one unmarked test
    # (multihost keeps its two single-process tests, bf16_mode keeps
    # validate_end_to_end, models/multi_dispatch/torch_twin/round3 keep
    # their light majority)
    "tests/test_multihost.py::test_two_process_cluster_train_step_and_gather",
    "tests/test_bf16_mode.py::test_bf16_step_tracks_fp32",
    "tests/test_bf16_mode.py::test_params_fp32_and_logits_fp32_and_close",
    "tests/test_bf16_mode.py::test_bf16_with_rank_loss_and_sep",
    "tests/test_models.py::test_grads_finite_and_nonzero[vid_grnd]",
    "tests/test_multi_dispatch.py::test_multi_dispatch_resume_mid_epoch",
    "tests/test_round3_robustness.py::test_train_dl_prefetch_device_put_transform",
    "tests/test_torch_twin.py::test_vognet_torch_twin_gradient_parity",
    "tests/test_ann_store.py::test_learner_fit_identical_with_ann_store",
    "tests/test_ann_store.py::test_multi_dispatch_with_ann_store",
    "tests/test_ann_store.py::test_train_step_loss_identical",
    "tests/test_attention.py::test_bwd_no_bias",
    "tests/test_attention.py::test_bwd_parity",
    "tests/test_attention.py::test_bwd_parity_multiblock",
    "tests/test_decomposed_mm.py::test_decomposed_equals_materialized[1]",
    "tests/test_decomposed_mm.py::test_vognet_decomposed_forward_and_grads",
    "tests/test_device_store.py::test_learner_device_store_e2e",
    "tests/test_device_store.py::test_learner_sharded_store_e2e",
    "tests/test_device_store.py::test_sharded_train_step_loss_identical",
    "tests/test_device_store.py::test_train_step_loss_identical",
    "tests/test_dist.py::test_dp_equals_single_device_loss",
    "tests/test_dist.py::test_train_step_on_mesh[mesh_shape0]",
    "tests/test_eval.py::test_compact_pair_payload_matches_full_grid",
    "tests/test_export.py::test_export_bf16_encoding",
    "tests/test_export.py::test_export_with_tables_vid_rows",
    "tests/test_grad_accum.py::test_grad_accum_changes_vs_plain_step",
    "tests/test_grad_accum.py::test_grad_accum_learner_e2e",
    "tests/test_grad_accum.py::test_grad_accum_matches_manual",
    "tests/test_graft_entry.py::test_dryrun_in_process_on_full_mesh",
    "tests/test_graft_entry.py::test_dryrun_subprocess_bootstrap",
    "tests/test_head_kernel.py::test_head_kernel_grad_parity",
    "tests/test_int8_store.py::test_learner_int8_store_e2e",
    "tests/test_misc_flags.py::test_profiler_trace_written",
    "tests/test_misc_flags.py::test_skip_nonfinite_learner_run_continues",
    "tests/test_mm_attention.py::test_bwd_parity",
    "tests/test_mm_attention.py::test_bwd_parity_multiblock",
    "tests/test_mm_attention.py::test_fwd_parity[shape1]",
    "tests/test_models.py::test_dropout_changes_train_forward",
    "tests/test_models.py::test_forward_shapes[svsq-vid_grnd]",
    "tests/test_models.py::test_forward_shapes[svsq-vog]",
    "tests/test_models.py::test_frozen_glove_gets_no_grad",
    "tests/test_models.py::test_grads_finite_and_nonzero[img_grnd]",
    "tests/test_models.py::test_grads_finite_and_nonzero[vog]",
    "tests/test_multi_dispatch.py::test_eval_batches_per_dispatch_identical",
    "tests/test_multi_dispatch.py::test_multi_dispatch_bit_identical",
    "tests/test_multi_dispatch.py::test_multi_dispatch_disabled_under_checkify",
    "tests/test_multi_dispatch.py::test_multi_dispatch_mid_epoch_crash_resume_bit_identical",
    "tests/test_multi_dispatch.py::test_multi_dispatch_nan_aborts_at_boundary",
    "tests/test_multi_dispatch.py::test_multi_dispatch_nan_containment",
    "tests/test_multi_dispatch.py::test_multi_dispatch_with_device_store_and_guard",
    "tests/test_preempt.py::test_preempt_mid_epoch_resume_bit_identical",
    "tests/test_preempt.py::test_tensorboard_mirror",
    "tests/test_ring_attention.py::test_vognet_forward_and_grads_sp_parity",
    "tests/test_train_smoke.py::test_crash_resume_equals_uninterrupted",
    "tests/test_train_smoke.py::test_train_learns_and_writes_artifacts",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.nodeid.split("[")[0]
        if item.nodeid in SLOW_NODE_IDS or base in SLOW_NODE_IDS:
            item.add_marker(pytest.mark.slow)
