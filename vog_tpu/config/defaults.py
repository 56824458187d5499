"""Config system: frozen dataclasses mirroring the reference yaml schema.

Reference parity: ``configs/anet_srl_cfg.yml`` + ``code/extended_config.py``
(yacs CfgNode, dotted-key CLI overrides, post-processing that derives
``num_prop_per_frm`` from ``ds.exp_setting`` and conc-type-dependent sizes).
We keep the same nested group names (``ds``, ``mdl``, ``train``, ``misc``)
so reference-style dotted overrides (``--ds.conc_type=spat``) port 1:1.

The reference mount was empty this round (SURVEY.md §0) — exact key names
inside groups are reconstructed [C-MED]; the *behavioral* knobs (gt5/p100,
svsq/sep/temp/spat, model selector, train hyperparams) are the contract.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import yaml


@dataclass
class DsCfg:
    """Dataset group — reference ``cfg.ds``."""

    data_dir: str = "data/asrl"
    exp_setting: str = "gt5"  # gt5 | p100  (reference ds.exp_setting)
    conc_type: str = "svsq"  # svsq | sep | temp | spat (reference ds.conc_type)
    num_frms: int = 10  # frames uniformly sampled per segment
    num_props_gt5: int = 5
    num_props_p100: int = 100
    ncmp: int = 4  # videos per contrastive group (SEP/TEMP/SPAT)
    max_srl_args: int = 5  # padded SRL args per query
    max_seq_len: int = 40  # padded query token length
    prop_dim: int = 2048  # RoI fc6 feature dim
    seg_dim: int = 3072  # TSN segment feature dim (2048 rgb + 1024 flow)
    glove_dim: int = 300
    num_roles: int = 24  # SRL role vocabulary size (V, ARG0..ARGM-*)
    shuffle_cmp: bool = True  # shuffle positive position in train groups
    # device-resident feature tables (data/device_store.py): upload the
    # whole feats/seg store to HBM once; batches carry vid_rows and the
    # gather runs inside the jitted step.  auto = on when the table fits
    # the per-chip budget, replicated on one chip or row-sharded over the
    # mesh 'data' axis when only the per-shard slice fits (P100-at-100GB).
    # shard = force row-sharding (collective gather) regardless of size.
    device_store: str = "auto"  # auto | on | shard | off
    # index-only input path (data/ann_store.py): annotation statics
    # (tokens/spans/targets/GT boxes + per-video proposal boxes) also
    # device-resident; batches shrink to four int32 index fields per
    # sample.  Requires an active device_store; auto = follow it.
    ann_store: str = "auto"  # auto | on | off
    # derived (post_proc_config equivalent):
    num_prop_per_frm: int = 5
    num_cmp: int = 1  # 1 for svsq else ncmp


@dataclass
class MdlCfg:
    """Model group — reference ``cfg.mdl`` (+ mdl_selector keys)."""

    name: str = "vog"  # img_grnd | vid_grnd | vog (reference mdl.name)
    emb_dim: int = 300  # GloVe dim
    lstm_dim: int = 256  # per-direction BiLSTM hidden
    vis_dim: int = 512  # visual/lang projection dim
    role_dim: int = 128  # SRL role-label embedding dim
    n_heads: int = 4
    obj_tx_layers: int = 1  # VidGrnd object-transformer layers
    mm_tx_layers: int = 1  # VOGNet multimodal-transformer layers
    ff_mult: int = 4
    dropout: float = 0.1
    rpe_max_dist: int = 10  # relative-frame-distance clip for RPE
    use_pallas_attn: bool = True  # fused Pallas attention on TPU
    # arg-decomposed first mm layer: one shared QK matmul instead of A
    # (exact; see transformer.DecomposedRelAttention)
    decomposed_mm: bool = True
    # fused = reference-style cross-product MLP head; dot = factorized
    # bilinear head, much cheaper, different capacity (opt-in)
    head_type: str = "fused"
    # fused grounding-head Pallas kernel (TPU): streams the (B,A,T,D)
    # fusion intermediates through VMEM instead of HBM — same math as the
    # XLA path (parity: tests/test_head_kernel.py)
    head_kernel: bool = True
    # fused shared-QK multi-arg Pallas kernel for the decomposed mm layer
    # (flash-style online softmax + batched A value streams; backward
    # emits ds tiles so dq/dfb run as XLA GEMMs).  Measured in-model at
    # P100 B=2 fp32-highest: 81.1 ms/step vs 84.3 XLA materialized — and
    # the (B,H,T,T) weights + (B,H,A,T,dh) value streams never hit HBM in
    # the forward, so T is unbounded and batch headroom grows.
    mm_kernel: bool = True
    # sequence-parallel ring attention: shard the token axis of the
    # object-transformer / materialized-RPE attention over the mesh
    # 'model' axis (kernels/ring_attention.py).  Activates only when a
    # sequence-parallel mesh is installed (train.dist.set_sequence_parallel)
    # and T divides the axis size; a TPU-native extension the reference's
    # DDP-only backend has no analog of.
    sp_attention: bool = False
    train_embeddings: bool = False  # fine-tune GloVe
    # activation/compute dtype of the visual + multimodal path: "float32"
    # (parity default) or "bfloat16" (mixed precision: params, optimizer
    # state, the BiLSTM language encoder, softmax statistics, and the
    # loss all stay fp32; every Dense/LayerNorm computes and stores its
    # activations in bf16).  The GT5 production step is fusion/bandwidth
    # bound (BASELINE.md bf16 profile), so halving activation bytes is
    # the main single-chip lever past matmul precision.  Pallas kernel
    # inputs are cast back to fp32 at the dispatch sites (the kernels
    # accumulate fp32 regardless; bf16 kernel operands are a possible
    # later step).  Checkpoints are unchanged (param_dtype stays fp32).
    dtype: str = "float32"


@dataclass
class TrainCfg:
    """Trainer group — reference ``cfg.train``."""

    bs: int = 4  # per-device batch (groups per device)
    epochs: int = 10
    lr: float = 1e-4
    lr_schedule: str = "const"  # const | cosine (with linear warmup)
    warmup_steps: int = 0
    total_steps: int = 0  # for cosine; 0 = epochs * len(train_dl) set by CLI
    wd: float = 0.0
    grad_clip: float = 1.0
    pos_weight: float = 1.0  # BCE positive-class weight (1.0 = reference loss)
    loss_type: str = "bce"  # bce | rank (adds listwise cross-video ranking term)
    rank_weight: float = 1.0
    seed: int = 42
    resume: bool = False
    resume_path: str = ""
    log_every: int = 10
    ckpt_every_steps: int = 0  # 0 = per-epoch only
    # periodic mid-epoch saves commit in a background thread (async orbax)
    # so the step loop never stalls on filesystem writes; epoch-end /
    # best / final saves always block until durable
    async_ckpt: bool = True
    # >0: drop non-finite gradient updates (optax.apply_if_finite) instead
    # of poisoning the weights; value = max consecutive dropped steps
    # before optax hard-stops.  0 keeps strict reference behavior (a NaN
    # propagates and misc.check_nans aborts the run at the next log).
    skip_nonfinite: int = 0
    # >1: split each batch into K equal microbatches INSIDE the jitted
    # step (lax.scan over fwd/bwd, one param-shaped grad accumulator) and
    # apply ONE averaged optimizer update — peak activation memory drops
    # ~K× at fixed effective batch (the P100-SPAT memory lever; lets bs
    # grow past what the un-accumulated step fits in HBM).  Gradient
    # semantics match the reference's DDP ranks exactly: each microbatch
    # normalizes its own loss by its own mask count and grads average
    # uniformly, as NCCL all-reduce does across equal-size ranks (SURVEY
    # §2 distributed row).  Requires train.bs % grad_accum == 0; composes
    # with steps_per_dispatch and both device-store modes (the feature
    # gather runs per-microbatch, so gathered features never materialize
    # at full batch size).  1 = off (reference behavior).
    grad_accum: int = 1
    num_eval_batches: int = 0  # 0 = all
    # validate every N epochs (1 = reference behavior: every epoch); the
    # final epoch always validates so fit() returns real metrics
    eval_every: int = 1
    # per-sample budget of considered (arg, frame) pairs the eval step
    # extracts ON DEVICE for the predictions payload (kills the bulk
    # (B,A,F,V*P) candidate-grid fetch).  -1 = auto (2 * max_srl_args —
    # ASRL annotates each arg in 1-2 frames); 0 = full grids (no
    # compaction); metrics are exact either way, overflow only truncates
    # the offline re-scoring payload (and is warned about).
    eval_max_pairs: int = -1
    # >1: fuse K train steps into ONE device dispatch (lax.scan over a
    # stacked (K, B, ...) batch tree, one batched H2D for the K batches).
    # Amortizes per-step dispatch latency — the last measured input-path
    # overhead (~5 ms/step through the remote-TPU tunnel, BASELINE.md).
    # Semantically identical to K single steps (tests/test_multi_dispatch
    # .py asserts bit-identical params); ckpt/log cadence rounds to
    # dispatch granularity.  Ignored under misc.checkify (per-step error
    # sync).  Composes with multihost sharded input (each process stacks
    # its local rows; dist.stack_shard_batches_local).
    steps_per_dispatch: int = 1
    # eval-side analog of steps_per_dispatch: fuse E eval batches into one
    # lax.scan dispatch + ONE bulk fetch of the stacked outputs (amortizes
    # the per-batch dispatch AND the per-batch device->host round-trip).
    # 0 = follow steps_per_dispatch; 1 = off; >1 explicit.  Metrics and
    # predictions are identical to the per-batch path
    # (tests/test_multi_dispatch.py); composes with multihost sharded
    # input (stacked local rows + row-sharded fetch, row_axis=1).
    eval_batches_per_dispatch: int = 0
    # graceful preemption (SURVEY §5 failure-detection row): on SIGTERM
    # (the TPU-VM / batch-scheduler preemption signal) finish the current
    # dispatch, save a blocking "last" checkpoint (batch-granular meta),
    # and return from fit() — resume picks up bit-identically
    # (tests/test_preempt.py).  Ctrl-C (SIGINT) still propagates.
    save_on_preempt: bool = True


@dataclass
class MiscCfg:
    tmp_path: str = "tmp"
    # force a jax platform ("cpu" for virtual-device CPU runs; env
    # JAX_PLATFORMS alone is not authoritative — site hooks can re-pin it,
    # only jax.config.update survives).  "" = platform default.
    platform: str = ""
    mesh_data: int = -1  # -1 = all devices on data axis
    mesh_model: int = 1
    half_feats: bool = False  # store features bf16 in HBM (compute stays fp32)
    # int8-quantized device feature tables (per-proposal-vector symmetric
    # scales, dequantized inside the jitted gather): 4x less HBM than f32,
    # 2x less than half_feats — the lever that fits the ~100 GB real-ASRL
    # P100 table on fewer chips.  Quantization error ≲1% per vector
    # (tests/test_int8_store.py).  Only affects ds.device_store tables;
    # host-path batches are untouched.  Overrides half_feats for tables.
    int8_feats: bool = False
    # device-store row gather inside the step: "off" = jnp.take against
    # the 3-D row-contiguous tables (the measured fast path for ordinary
    # tables, GSPMD-partitionable — data/device_store.py §_table_shape);
    # "on" = the Pallas manual-DMA kernel (kernels/gather.py;
    # single-device meshes only — GSPMD cannot partition a bare
    # pallas_call); "auto" = take, switching to the DMA kernel for
    # feats tables >= 8 GB where XLA's gather lowering OOMs via remat
    # clones (measured round-5 at the 11.5 GB int8 P100 store)
    gather_kernel: str = "auto"
    # fp32 parity with the reference needs full-precision MXU matmuls
    # ("highest" = 3-pass bf16 fp32 emulation); "default" trades parity for
    # ~3x matmul speed
    matmul_precision: str = "highest"
    # rbg is ~8% faster end-to-end on TPU (dropout mask generation);
    # threefry keeps cross-platform reproducible streams
    prng_impl: str = "rbg"
    profile_dir: str = ""  # non-empty: jax.profiler trace of train steps
    # non-empty: mirror train loss + eval metrics to TensorBoard event
    # files under this dir (uid-suffixed), via tf.summary (SURVEY §5
    # metrics row "optional TensorBoard").  The txt/jsonl artifacts stay
    # authoritative; this is additive and rank-0-only.
    tensorboard_dir: str = ""
    profile_steps: int = 5  # steps to capture per epoch when profiling
    check_nans: bool = True  # raise on non-finite loss at log points
    # terminal progress bars (reference trainer parity: tqdm/fastprogress);
    # auto = only when stderr is a TTY, so redirected runs stay clean
    progress: str = "auto"  # auto | on | off
    checkify: bool = False  # wrap train step with jax checkify NaN/div guards
    multihost: bool = False  # jax.distributed.initialize() before mesh setup
    # persistent XLA compilation cache: compiled executables serialize to
    # this dir and later processes skip the compile entirely.  Crucial on
    # high-latency/loaded TPU links — the SAME program measured 16 s to
    # 907 s first-step compile through this environment's tunnel
    # (BASELINE.md skip_nonfinite section); with the cache warm, restart/
    # resume/serve processes pay ~0.  "" disables.
    compile_cache: str = "tmp/jax_cache"


def apply_matmul_precision(cfg: "Cfg") -> None:
    """Apply global runtime flags (matmul precision + PRNG implementation
    + persistent compile cache)."""
    import jax

    jax.config.update("jax_default_matmul_precision", cfg.misc.matmul_precision)
    if jax.default_backend() == "tpu":
        jax.config.update("jax_default_prng_impl", cfg.misc.prng_impl)
    if cfg.misc.compile_cache:
        from pathlib import Path

        Path(cfg.misc.compile_cache).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cfg.misc.compile_cache)
        # cache everything that took >1s to compile (default threshold
        # misses mid-sized programs that still cost seconds per restart)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@dataclass
class Cfg:
    ds: DsCfg = field(default_factory=DsCfg)
    mdl: MdlCfg = field(default_factory=MdlCfg)
    train: TrainCfg = field(default_factory=TrainCfg)
    misc: MiscCfg = field(default_factory=MiscCfg)
    uid: str = "dbg"

    # -- derived helpers ---------------------------------------------------
    @property
    def num_props(self) -> int:
        return self.ds.num_prop_per_frm

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)


def post_proc_config(cfg: Cfg) -> Cfg:
    """Derive dependent keys — reference ``code/extended_config.py
    §post_proc_config``: num_prop_per_frm from exp_setting, num_cmp from
    conc_type."""
    cfg.ds.num_prop_per_frm = (
        cfg.ds.num_props_gt5 if cfg.ds.exp_setting == "gt5" else cfg.ds.num_props_p100
    )
    cfg.ds.num_cmp = 1 if cfg.ds.conc_type == "svsq" else cfg.ds.ncmp
    assert cfg.ds.exp_setting in ("gt5", "p100"), cfg.ds.exp_setting
    assert cfg.ds.conc_type in ("svsq", "sep", "temp", "spat"), cfg.ds.conc_type
    assert cfg.mdl.name in ("img_grnd", "vid_grnd", "vog"), cfg.mdl.name
    return cfg


def _set_dotted(cfg: Any, key: str, value: Any) -> None:
    parts = key.split(".")
    obj = cfg
    for p in parts[:-1]:
        obj = getattr(obj, p)
    leaf = parts[-1]
    if not hasattr(obj, leaf):
        raise KeyError(f"unknown config key: {key}")
    cur = getattr(obj, leaf)
    if cur is not None and not isinstance(value, type(cur)):
        if isinstance(cur, bool):
            value = str(value).lower() in ("1", "true", "yes")
        else:
            value = type(cur)(value)
    setattr(obj, leaf, value)


def update_from_dict(cfg: Cfg, overrides: Dict[str, Any]) -> Cfg:
    """Apply dotted-key overrides — reference ``extended_config.py
    §update_from_dict`` (CLI ``--ds.conc_type=spat`` style)."""
    for k, v in overrides.items():
        _set_dotted(cfg, k.lstrip("-"), v)
    return cfg


def _merge_nested(cfg: Cfg, d: Dict[str, Any], prefix: str = "") -> None:
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            _merge_nested(cfg, v, prefix=f"{key}.")
        else:
            _set_dotted(cfg, key, v)


def get_default_cfg(yml_path: Optional[str] = None) -> Cfg:
    """Build the default config, optionally merging a yaml file with the
    same nested schema — reference ``extended_config.py §get_default_cfg``
    loading ``configs/anet_srl_cfg.yml``."""
    cfg = Cfg()
    if yml_path:
        with open(yml_path) as f:
            loaded = yaml.safe_load(f) or {}
        _merge_nested(cfg, loaded)
    return post_proc_config(cfg)
