"""Learner — the trainer runtime.

Reference parity: ``utils/trn_utils.py §Learner`` (fastai-style): epochs of
train/validate, Adam, loss smoothing (``SmoothenValue``), txt + json-lines
logging under ``tmp/{txt_logs,models,predictions,ext_logs}/{uid}…``,
best-metric checkpointing, resume, and prediction dumps scored by the eval
fn.  The artifact layout is kept uid-keyed and diff-able against the
reference's.

TPU-native replacements: DDP -> pjit over the ('data','model') mesh with
XLA collectives; torch .pth checkpoints -> orbax (params + opt state +
step); predictions pickle kept (same role as the reference's
``tmp/predictions/{uid}_valid_<ep>.pkl``).
"""

from __future__ import annotations

import json
import os
import pickle
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from vog_tpu.config import Cfg
from vog_tpu.data.loader import DataWrap
from vog_tpu.evaluation import finalize_metrics
from vog_tpu.train.dist import (
    local_batch_rows,
    make_mesh,
    param_shardings,
    replicated,
    shard_batch,
    shard_batch_local,
)
from vog_tpu.train.state import (
    TrainState,
    init_state,
    make_eval_step,
    make_train_step,
)


class SmoothenValue:
    """EMA loss smoothing — reference ``utils/trn_utils.py §SmoothenValue``."""

    def __init__(self, beta: float = 0.9):
        self.beta = beta
        self.n = 0
        self.mov_avg = 0.0
        self.smooth = 0.0

    def add_value(self, val: float) -> None:
        self.n += 1
        self.mov_avg = self.beta * self.mov_avg + (1 - self.beta) * val
        self.smooth = self.mov_avg / (1 - self.beta**self.n)


class Learner:
    SUM_KEYS = ("n_pairs", "n_acc", "n_vacc", "n_queries", "n_strict", "n_cons")

    def __init__(self, uid: str, data: DataWrap, cfg: Cfg, mesh=None):
        self.uid = uid
        self.data = data
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(cfg)
        if cfg.mdl.sp_attention:
            # sequence-parallel ring attention over the 'model' axis
            # (kernels/ring_attention.py); no-op when the axis is size 1
            from vog_tpu.train.dist import set_sequence_parallel

            set_sequence_parallel(self.mesh)
        # reference parity: rank-0-only artifact writes (SURVEY §5 metrics
        # row) — every process computes, only process 0 touches the disk
        self._is_main = jax.process_index() == 0
        self._pending_meta: Dict[str, Dict] = {}

        tmp = Path(cfg.misc.tmp_path)
        self.dirs = {
            k: tmp / k for k in ("models", "txt_logs", "predictions", "ext_logs")
        }
        for d in self.dirs.values():
            d.mkdir(parents=True, exist_ok=True)
        self.log_file = self.dirs["txt_logs"] / f"{uid}.txt"
        self.json_log = self.dirs["ext_logs"] / f"{uid}.jsonl"
        self.ckpt_dir = (self.dirs["models"] / uid).absolute()

        rng = jax.random.PRNGKey(cfg.train.seed)
        self.rng = rng
        glove = data.vocab.vectors
        n_data = self.mesh.shape["data"]
        self.global_bs = cfg.train.bs * n_data

        # cosine schedule needs the true horizon; cfg default total_steps=0
        # means "derive from the data" (otherwise LR collapses to ~0 right
        # after warmup because decay_steps falls back to warmup_steps+1)
        if cfg.train.lr_schedule == "cosine" and cfg.train.total_steps == 0:
            cfg.train.total_steps = cfg.train.epochs * len(data.train_dl)

        # device-resident feature tables: upload feats/seg to HBM once and
        # gather inside the step (kills the ~MB-scale per-batch feature
        # transfer — see data/device_store.py)
        self._tables = None
        self._device_store = False
        self._store_mesh = None
        want = cfg.ds.device_store
        if want != "off":
            from vog_tpu.data.device_store import (
                DeviceFeatureTables,
                fits_device_store,
            )

            store = data.train_dl.ds.store
            n_videos = len(store.videos())
            n_data = self.mesh.shape["data"]
            # prefer replicated (no collectives in the gather); fall back
            # to row-sharding over the 'data' axis when only the per-shard
            # slice fits (P100-at-100GB regime, SURVEY §7 hard part #5)
            fits_rep = fits_device_store(cfg, n_videos)
            fits_shard = n_data > 1 and fits_device_store(cfg, n_videos, n_data)
            if want in ("on", "shard") or (
                jax.default_backend() == "tpu" and (fits_rep or fits_shard)
            ):
                shard = want == "shard" or (not fits_rep and fits_shard)
                dft = DeviceFeatureTables(
                    cfg,
                    store,
                    self.mesh,
                    half=cfg.misc.half_feats,
                    shard=shard,
                    int8=cfg.misc.int8_feats,
                )
                self._tables = dft.tables
                self._device_store = True
                self._store_mesh = self.mesh if dft.sharded else None
                for dl in (data.train_dl, data.valid_dl, data.test_dl):
                    if dl is not None:
                        dl.ds.device_rows = dft.rows
                self.log(
                    f"device feature store: {n_videos} videos resident"
                    f"{' (row-sharded /%d)' % n_data if dft.sharded else ''} "
                    f"({sum(v.nbytes for v in self._tables.values()) / 1e6:.0f} MB)"
                )

        # index-only input path (data/ann_store.py): annotation statics +
        # per-video proposal boxes also device-resident (replicated —
        # they are MBs, not GBs); batches shrink to 4 int32 fields/sample
        # and the whole batch reconstructs inside the jitted step
        self._ann_store = False
        if self._device_store and cfg.ds.ann_store != "off":
            from vog_tpu.data.ann_store import DeviceAnnTables

            dsets = {
                s: dl.ds
                for s, dl in (
                    ("train", data.train_dl),
                    ("valid", data.valid_dl),
                    ("test", data.test_dl),
                )
                if dl is not None
            }
            dat = DeviceAnnTables(
                cfg, dsets, data.train_dl.ds.device_rows, self.mesh
            )
            self._tables = {**self._tables, **dat.tables}
            for s, d in dsets.items():
                d.index_only = True
                d.ann_row_offset = dat.split_offset[s]
            self._ann_store = True
            self.log(
                f"device annotation store: {dat.n_anns} anns resident "
                f"({sum(dat.tables[k].nbytes for k in dat.tables) / 1e6:.0f}"
                " MB) — index-only input path"
            )
        elif cfg.ds.ann_store == "on" and not self._device_store:
            self.log(
                "ds.ann_store=on ignored: requires an active ds.device_store"
            )

        state = init_state(cfg, glove, rng, self.global_bs)
        shardings = param_shardings(self.mesh, state.params)
        params = jax.device_put(state.params, shardings)
        opt_state = jax.device_put(
            state.opt_state,
            jax.tree.map(
                lambda _: replicated(self.mesh),
                state.opt_state,
                is_leaf=lambda x: isinstance(x, jnp.ndarray),
            ),
        )
        self.state = state.replace(params=params, opt_state=opt_state)

        dstore = self._device_store
        if cfg.misc.checkify:
            # sanitizer mode (SURVEY §5): NaN + div-by-zero guards compiled
            # into the step; errors surface with locations at log points
            from jax.experimental import checkify as _ck

            raw_step = make_train_step(cfg, dstore, self._store_mesh)
            jitted = jax.jit(
                _ck.checkify(raw_step, errors=_ck.float_checks | _ck.div_checks),
                donate_argnums=(0,),
            )

            def _step(state, batch, rng, tables=None):
                err, out = jitted(state, batch, rng, tables)
                _ck.check_error(err)  # host-side raise (syncs every step)
                return out

            self._train_step = _step
        else:
            self._train_step = jax.jit(
                make_train_step(cfg, dstore, self._store_mesh), donate_argnums=(0,)
            )
        self._eval_step = jax.jit(make_eval_step(cfg, dstore, self._store_mesh))
        self.best_metric = -float("inf")
        self.epoch = 0
        self.batch_in_epoch = 0

        # multi-host input sharding (DistributedSampler analog, SURVEY §2
        # distributed row): each process materializes ONLY the global-
        # batch rows its addressable 'data' shards own and jax assembles
        # the global array from the per-process locals — instead of every
        # host duplicating the entire batch construction + transfer.
        self._local_rows = None
        if cfg.misc.multihost and jax.process_count() > 1:
            self._local_rows = local_batch_rows(self.mesh, self.global_bs)
            if self._local_rows is None:
                self.log(
                    "multihost: local batch rows not contiguous for this "
                    "mesh layout — falling back to full-batch duplication"
                )
            else:
                for dl in (data.train_dl, data.valid_dl, data.test_dl):
                    if dl is not None:
                        dl.local_rows = self._local_rows
                self.log(
                    f"multihost input shard: process {jax.process_index()} "
                    f"builds batch rows [{self._local_rows[0]}, "
                    f"{self._local_rows[1]}) of {self.global_bs}"
                )
        if self._local_rows is not None:
            from vog_tpu.train.dist import stack_shard_batches_local

            self._to_global = lambda b: shard_batch_local(
                b, self.mesh, self.global_bs, cfg.misc.half_feats
            )
            self._stack_to_global = lambda bs: stack_shard_batches_local(
                bs, self.mesh, self.global_bs, cfg.misc.half_feats
            )
        else:
            from vog_tpu.train.dist import stack_shard_batches

            self._to_global = lambda b: shard_batch(
                b, self.mesh, cfg.misc.half_feats
            )
            self._stack_to_global = lambda bs: stack_shard_batches(
                bs, self.mesh, cfg.misc.half_feats
            )
        # producer-side H2D: the prefetch worker thread device_puts train
        # batches (uint8-compacted) so the transfer overlaps the previous
        # step's compute instead of stalling the step loop inline
        # (VERDICT r2 item 1).  Eval keeps inline transfer — _run_eval
        # needs host-side fields before transfer.
        data.train_dl.transform = self._to_global

        # fused multi-step dispatch (train.steps_per_dispatch > 1): the
        # loader groups K batches, stacks them into one (K, B, ...) tree
        # with a single batched H2D, and ONE lax.scan dispatch runs the K
        # steps — amortizing per-step dispatch latency (the last measured
        # input-path overhead, BASELINE.md).  Bit-identical to K single
        # dispatches (tests/test_multi_dispatch.py).
        self._multi = 0
        if cfg.train.steps_per_dispatch > 1:
            if cfg.misc.checkify:
                self.log(
                    "train.steps_per_dispatch disabled: incompatible with "
                    "misc.checkify (per-step error sync) — using "
                    "single-step dispatch"
                )
            else:
                from vog_tpu.train.state import make_multi_train_step

                self._multi = cfg.train.steps_per_dispatch
                self._train_step_multi = jax.jit(
                    make_multi_train_step(cfg, dstore, self._store_mesh),
                    donate_argnums=(0,),
                )
                data.train_dl.group = self._multi
                data.train_dl.transform = self._stack_to_global

        # fused multi-batch EVAL dispatch: scan over E stacked eval
        # batches, ONE bulk fetch of the stacked outputs — amortizes both
        # the per-batch dispatch and the per-batch device->host round-trip
        # (the two tunnel costs of _run_eval).  0 = follow
        # steps_per_dispatch.  Composes with multihost sharded input:
        # the stack assembles from per-process local rows and the fetch
        # takes only this process's row shards (row_axis=1).
        self._eval_multi = 0
        em = cfg.train.eval_batches_per_dispatch
        if em == 0:
            em = cfg.train.steps_per_dispatch
        if em > 1:
            from vog_tpu.train.state import make_multi_eval_step

            self._eval_multi = em
            self._eval_step_multi = jax.jit(
                make_multi_eval_step(cfg, dstore, self._store_mesh)
            )

        if cfg.train.resume:
            self.load(cfg.train.resume_path or None)

    # -- logging --------------------------------------------------------------
    def log(self, msg: str) -> None:
        line = f"[{time.strftime('%H:%M:%S')}] {msg}"
        print(line, flush=True)
        if self._is_main:  # rank-0-only artifact writes (reference parity)
            with open(self.log_file, "a") as f:
                f.write(line + "\n")

    def log_json(self, record: Dict) -> None:
        if self._is_main:
            with open(self.json_log, "a") as f:
                f.write(json.dumps(record) + "\n")

    # -- checkpointing ----------------------------------------------------------
    @property
    def _ckptr(self) -> ocp.AsyncCheckpointer:
        """One async orbax checkpointer per Learner: array device->host
        copies happen inline but the filesystem commit runs in a
        background thread, so periodic mid-epoch saves don't stall the
        step loop (SURVEY §5 failure-detection row; writes go to a tmp
        dir and rename on commit, so readers never see a torn ckpt)."""
        if getattr(self, "_ckptr_inst", None) is None:
            self._ckptr_inst = ocp.AsyncCheckpointer(
                ocp.StandardCheckpointHandler()
            )
        return self._ckptr_inst

    def _write_meta(self, tag: str, meta: Dict) -> None:
        if not self._is_main:
            return
        tmp = self.ckpt_dir / f"{tag}.meta.json.tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self.ckpt_dir / f"{tag}.meta.json")  # atomic publish

    def _flush_pending_meta(self) -> None:
        for tag, meta in self._pending_meta.items():
            self._write_meta(tag, meta)
        self._pending_meta.clear()

    def save(self, tag: str = "last", blocking: bool = True) -> None:
        path = self.ckpt_dir / tag
        payload = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }
        self._ckptr.save(path, args=ocp.args.StandardSave(payload), force=True)
        # the AsyncCheckpointer serializes saves — by the time save()
        # returns, any PREVIOUS async commit is durable, so its stashed
        # meta is now safe to publish
        self._flush_pending_meta()
        meta = {
            "epoch": self.epoch,
            "best_metric": self.best_metric,
            # deterministic iterator state (SURVEY §5): epoch + position;
            # resume replays the epoch's ordering and fast-forwards past
            # consumed batches
            "batch_in_epoch": self.batch_in_epoch,
        }
        if blocking:
            self._ckptr.wait_until_finished()
            self._write_meta(tag, meta)
        else:
            # meta must not become durable BEFORE the array commit (a
            # crash in that window would pair new meta with the previous
            # checkpoint's arrays and silently skip training data on
            # resume) — stash it and publish at the next barrier.  A crash
            # before the flush leaves old meta + new arrays: resume then
            # REPLAYS a few batches, which is the safe direction.
            self._pending_meta[tag] = meta

    def wait_for_checkpoints(self) -> None:
        """Barrier for any in-flight async save (call before reading own
        checkpoints or at end of training)."""
        if getattr(self, "_ckptr_inst", None) is not None:
            self._ckptr_inst.wait_until_finished()
        self._flush_pending_meta()

    # param-tree migration for pre-round-2 checkpoints: GroundingHead
    # moved from nn.Dense submodules (head/fuse_vis/kernel) to flat
    # self.param names (head/fuse_vis_kernel) when the Pallas head kernel
    # landed — fold the old two-level paths into the new flat leaves
    _HEAD_DENSE_NAMES = ("fuse_vis", "fuse_lang", "fuse_cross", "head1", "head2")

    @classmethod
    def _migrate_head_params(cls, params: Dict) -> Dict:
        from flax import traverse_util

        flat = traverse_util.flatten_dict(params)
        out = {}
        for path, leaf in flat.items():
            if (
                len(path) >= 2
                and path[-2] in cls._HEAD_DENSE_NAMES
                and path[-1] in ("kernel", "bias")
            ):
                path = path[:-2] + (f"{path[-2]}_{path[-1]}",)
            out[path] = leaf
        return traverse_util.unflatten_dict(out)

    def load(self, path: Optional[str] = None, tag: str = "last") -> None:
        self.wait_for_checkpoints()
        ckpt_path = Path(path).absolute() if path else self.ckpt_dir / tag
        ckptr = ocp.StandardCheckpointer()
        target = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }
        try:
            restored = ckptr.restore(ckpt_path, target)
            params, opt_state = restored["params"], restored["opt_state"]
            step = restored["step"]
        except (ValueError, KeyError, TypeError):
            # structure mismatch only (e.g. the ckpt was trained with a
            # different skip_nonfinite optimizer wrapper, or carries
            # pre-round-2 GroundingHead param names): fall back to
            # params+step — exact for eval/serving; training resume
            # restarts optimizer moments.  Anything else (missing file,
            # I/O errors, KeyboardInterrupt) propagates.
            from vog_tpu.train.dist import param_shardings

            raw = ckptr.restore(ckpt_path)  # raw tree, no structure target
            raw_params = self._migrate_head_params(raw["params"])
            # drop leaves the current model no longer has (params removed
            # since the ckpt was written, e.g. the dead lang/q_proj) so
            # old checkpoints stay loadable; missing NEW params still
            # raise below — silently initializing weights would be wrong
            from flax import traverse_util

            cur = set(traverse_util.flatten_dict(self.state.params))
            flat = traverse_util.flatten_dict(raw_params)
            stale = [p for p in flat if p not in cur]
            if stale:
                for p in stale:
                    del flat[p]
                raw_params = traverse_util.unflatten_dict(flat)
                self.log(
                    "ckpt: dropped stale param leaves not in the current "
                    f"model: {['/'.join(p) for p in stale]}"
                )
            shardings = param_shardings(self.mesh, self.state.params)
            params = jax.tree.map(
                lambda s, v: jax.device_put(np.asarray(v), s),
                shardings,
                raw_params,
            )
            opt_state = self.state.opt_state
            step = jnp.asarray(raw["step"])
            self.log(
                f"ckpt {ckpt_path}: optimizer state structure mismatch — "
                "restored params+step only (opt state reinitialized)"
            )
        self.state = self.state.replace(
            params=params, opt_state=opt_state, step=step
        )
        meta_f = ckpt_path.parent / f"{ckpt_path.name}.meta.json"
        if meta_f.exists():
            with open(meta_f) as f:
                meta = json.load(f)
            self.epoch = meta.get("epoch", 0)
            self.best_metric = meta.get("best_metric", -float("inf"))
            self.batch_in_epoch = meta.get("batch_in_epoch", 0)
        self.log(
            f"resumed from {ckpt_path} at step {int(self.state.step)} "
            f"(epoch {self.epoch}, batch {self.batch_in_epoch})"
        )

    # -- preemption (SURVEY §5 failure-detection row) -------------------------
    def _install_preempt(self):
        """Trap SIGTERM (TPU-VM / scheduler preemption) to set a flag the
        fit loop checks after every dispatch — the run then saves a
        blocking batch-granular checkpoint and returns instead of dying
        mid-step.  Returns the previous handlers for restoration (None
        when disabled or off the main thread).  SIGINT is left alone:
        Ctrl-C propagates (deliberate, see load())."""
        import signal
        import threading

        if (
            not self.cfg.train.save_on_preempt
            or threading.current_thread() is not threading.main_thread()
        ):
            return None
        self._preempted = False

        def handler(signum, frame):
            self._preempted = True

        return {signal.SIGTERM: signal.signal(signal.SIGTERM, handler)}

    def _restore_preempt(self, prev) -> None:
        if prev:
            import signal

            for sig, h in prev.items():
                signal.signal(sig, h)

    # -- tensorboard (SURVEY §5 metrics row) ----------------------------------
    @property
    def _tb(self):
        """Lazy tf.summary writer (misc.tensorboard_dir); None when off,
        on non-zero ranks, or when tensorflow is unavailable."""
        if not self.cfg.misc.tensorboard_dir or not self._is_main:
            return None
        if not hasattr(self, "_tb_writer"):
            try:
                import tensorflow as tf

                self._tb_writer = tf.summary.create_file_writer(
                    str(Path(self.cfg.misc.tensorboard_dir) / self.uid)
                )
            except ImportError:
                self.log("misc.tensorboard_dir set but tensorflow missing — off")
                self._tb_writer = None
        return self._tb_writer

    def _tb_scalars(self, scalars: Dict, step: int) -> None:
        tb = self._tb
        if tb is None:
            return
        import tensorflow as tf

        with tb.as_default():
            for k, v in scalars.items():
                if isinstance(v, (int, float)):
                    tf.summary.scalar(k, v, step=step)
        tb.flush()

    # -- train ------------------------------------------------------------------
    def fit(self, epochs: Optional[int] = None, lr: Optional[float] = None) -> Dict:
        cfg = self.cfg
        epochs = epochs or cfg.train.epochs
        smooth = SmoothenValue()
        metrics: Dict = {}
        # replay determinism across resume: iterator epoch follows ours,
        # and a mid-epoch resume seeks past consumed batches without
        # constructing them (per-sample RNG is keyed on (seed, epoch,
        # sample idx), so the sampling stream is position-independent)
        self.data.train_dl.epoch = self.epoch
        skip = self.batch_in_epoch
        # host-side step counter for the ckpt cadence: int(state.step)
        # forces a device sync every step (a full tunnel round-trip);
        # one sync here, then count locally (apply_gradients increments
        # step unconditionally, so the two never diverge)
        host_step = int(self.state.step) if cfg.train.ckpt_every_steps else 0
        prev_handlers = self._install_preempt()
        try:
            return self._fit_loop(epochs, cfg, smooth, metrics, skip, host_step)
        finally:
            self._restore_preempt(prev_handlers)

    def _fit_loop(
        self, epochs: int, cfg, smooth, metrics: Dict, skip: int, host_step: int
    ) -> Dict:
        from vog_tpu.train.progress import ProgressBar, progress_enabled

        show_bar = progress_enabled(cfg.misc.progress) and self._is_main
        for ep_i in range(epochs):
            t0 = time.time()
            n_seen = 0
            profiling = False
            self.data.train_dl.start_batch = skip
            it_pos = skip  # batch index; a multi dispatch advances it by K
            unit_idx = 0  # dispatch-unit counter (== batch idx when K=1)
            bar = ProgressBar(
                len(self.data.train_dl),
                desc=f"ep {self.epoch}",
                enabled=show_bar,
            )
            bar.n = skip
            for batch in self.data.train_dl:
                i = it_pos  # first batch index covered by this dispatch
                kb = (
                    int(batch["batch_mask"].shape[0]) if self._multi else 1
                )  # final group of an epoch may be short
                self.batch_in_epoch = i + kb
                if cfg.misc.profile_dir and unit_idx == 1:  # skip compile
                    jax.profiler.start_trace(cfg.misc.profile_dir)
                    profiling = True
                if self.data.train_dl.transform is None:
                    batch = self._to_global(batch)
                with jax.profiler.StepTraceAnnotation("train", step_num=i):
                    if self._multi:
                        self.state, aux = self._train_step_multi(
                            self.state, batch, self.rng, self._tables
                        )
                    else:
                        self.state, aux = self._train_step(
                            self.state, batch, self.rng, self._tables
                        )
                if profiling and i + kb > cfg.misc.profile_steps:
                    jax.block_until_ready(aux["loss"])
                    jax.profiler.stop_trace()
                    profiling = False
                    self.log(f"profiler trace written to {cfg.misc.profile_dir}")
                n_seen += self.global_bs * kb
                host_step += kb
                it_pos += kb
                unit_idx += 1
                # no loss in the postfix here: fetching it would force a
                # device sync per dispatch; it appears at log points below
                bar.update(kb)
                if getattr(self, "_preempted", False):
                    # graceful preemption: checkpoint at batch granularity
                    # and leave — resume replays from exactly here
                    # (tests/test_preempt.py asserts bit-identity)
                    bar.close("preempted")
                    self.log(
                        f"SIGTERM: saving at ep {self.epoch} batch "
                        f"{self.batch_in_epoch} and exiting fit()"
                    )
                    self.save("last", blocking=True)
                    self.wait_for_checkpoints()
                    return metrics
                if cfg.train.ckpt_every_steps and (
                    host_step // cfg.train.ckpt_every_steps
                    > (host_step - kb) // cfg.train.ckpt_every_steps
                ):
                    # non-blocking: the commit overlaps subsequent steps
                    self.save("last", blocking=not cfg.train.async_ckpt)
                # log when this dispatch crossed a log_every boundary
                if i == 0 or (it_pos // cfg.train.log_every) > (
                    i // cfg.train.log_every
                ):
                    lo = np.asarray(aux["loss"]).reshape(-1)
                    loss = float(lo[-1])
                    if not np.all(np.isfinite(lo)):
                        # with the skip_nonfinite guard the bad update was
                        # dropped — note it and continue; otherwise the
                        # weights are poisoned and the run must abort
                        if cfg.train.skip_nonfinite > 0:
                            # the guard only DROPS updates while its
                            # consecutive-bad-step count stays within
                            # budget; past that it gives up and the bad
                            # update flows through (mirroring
                            # optax.apply_if_finite) — params are then
                            # poisoned and continuing would train NaN
                            # epochs that look alive in the logs
                            # (round-5 find).  guard_notfinite is the
                            # count AFTER each step in this dispatch.
                            gnf = aux.get("guard_notfinite")
                            if gnf is not None and int(
                                np.max(np.asarray(gnf))
                            ) > cfg.train.skip_nonfinite:
                                raise FloatingPointError(
                                    f"skip_nonfinite guard gave up: > "
                                    f"{cfg.train.skip_nonfinite} consecutive "
                                    f"non-finite steps at ep {self.epoch} it "
                                    f"{it_pos - 1} — params are poisoned; "
                                    "lower train.lr or raise "
                                    "train.skip_nonfinite"
                                )
                            self.log(
                                f"ep {self.epoch} it {it_pos - 1} non-finite "
                                "loss (update dropped by skip_nonfinite)"
                            )
                            continue
                        if cfg.misc.check_nans:
                            gn = np.asarray(aux["grad_norm"]).reshape(-1)
                            raise FloatingPointError(
                                f"non-finite loss {loss} at ep {self.epoch} "
                                f"it {it_pos - 1} (grad_norm={float(gn[-1])})"
                            )
                    # finite loss does NOT mean finite grads: inf grads
                    # with a healthy-looking loss freeze params via the
                    # guard (count climbs silently toward give-up) — the
                    # exact shape of the round-5 ep8 stall.  Surface it.
                    gnf = aux.get("guard_notfinite")
                    if gnf is not None:
                        nbad = int(np.max(np.asarray(gnf)))
                        if nbad > cfg.train.skip_nonfinite:
                            raise FloatingPointError(
                                f"skip_nonfinite guard gave up: > "
                                f"{cfg.train.skip_nonfinite} consecutive "
                                f"non-finite grad steps at ep {self.epoch} "
                                f"it {it_pos - 1} (loss still finite) — "
                                "params are poisoned; lower train.lr or "
                                "raise train.skip_nonfinite"
                            )
                        if nbad > 0:
                            self.log(
                                f"ep {self.epoch} it {it_pos - 1}: "
                                f"{nbad} consecutive non-finite GRAD "
                                "step(s) with finite loss — updates "
                                "dropped by skip_nonfinite, params frozen"
                            )
                    for v in lo:
                        smooth.add_value(float(v))
                    bar.update(0, loss=loss, smooth=smooth.smooth)
                    self.log(
                        f"ep {self.epoch} it {it_pos - 1} loss {loss:.4f} "
                        f"smooth {smooth.smooth:.4f}"
                    )
                    self._tb_scalars(
                        {"train/loss": loss, "train/loss_smooth": smooth.smooth},
                        host_step if cfg.train.ckpt_every_steps else it_pos
                        + self.epoch * len(self.data.train_dl),
                    )
            if profiling:
                jax.profiler.stop_trace()
            dt = time.time() - t0
            pairs = n_seen * self.cfg.ds.num_cmp
            bar.close(f"{pairs / max(dt, 1e-9):.0f} pairs/s")
            # eval cadence: every eval_every epochs + always the last, so
            # fit() returns real metrics (reference validates every epoch)
            do_eval = (
                ep_i == epochs - 1
                or self.epoch % max(cfg.train.eval_every, 1) == 0
            )
            if do_eval:
                metrics = self.validate()
                metrics.update(
                    epoch=self.epoch,
                    train_time_s=round(dt, 2),
                    pairs_per_sec=round(pairs / max(dt, 1e-9), 2),
                )
                self.log(f"ep {self.epoch} metrics {metrics}")
                self.log_json(metrics)
                self._tb_scalars(
                    {f"valid/{k}": v for k, v in metrics.items()}, self.epoch
                )
            else:
                self.log(
                    f"ep {self.epoch} done in {dt:.1f}s "
                    f"(eval skipped; eval_every={cfg.train.eval_every})"
                )
            skip = 0
            self.batch_in_epoch = 0
            self.epoch += 1  # ckpt meta records the next epoch to run
            self.save("last")
            if do_eval and metrics["acc"] > self.best_metric:
                self.best_metric = metrics["acc"]
                self.save("best")
        self.wait_for_checkpoints()
        return metrics

    # -- eval ----------------------------------------------------------------
    def _run_eval(self, dl, split: str) -> Dict:
        sums = {k: 0.0 for k in self.SUM_KEYS}
        sums["loss_sum"] = 0.0
        sums["n_batch"] = 0.0
        preds = []
        max_b = self.cfg.train.num_eval_batches
        if max_b and len(dl) > max_b:
            self.log(
                f"eval[{split}] TRUNCATED to {max_b}/{len(dl)} batches "
                f"(train.num_eval_batches) — metrics are partial"
            )
        def consume(out: Dict, batch: Dict) -> None:
            """Accumulate one HOST-side eval-step output + its host batch
            metadata into sums/preds (shared by the per-batch and fused
            multi-batch dispatch paths)."""
            ann_idx = np.asarray(batch["ann_idx"])
            bm = np.asarray(batch["batch_mask"])
            for k in list(sums.keys()):
                sums[k] += float(out[k])
            pos_vid = np.asarray(batch["pos_vid"])
            n_props = int(self.cfg.ds.num_prop_per_frm)
            if "pair_valid" in out:
                # compact payload: the considered (arg, frame) pairs were
                # selected ON DEVICE into a static (B, K) budget, so the
                # transfer above carried K pairs instead of the full
                # (B,A,F,V*P) candidate grid (VERDICT r2 item 5)
                if out["n_overflow"] > 0:
                    self.log(
                        f"eval[{split}] WARNING: {int(out['n_overflow'])} "
                        "considered pairs exceeded train.eval_max_pairs — "
                        "predictions payload truncated (metrics unaffected)"
                    )
                valid = np.asarray(out["pair_valid"])
                for b in range(len(ann_idx)):
                    if bm[b] == 0:
                        continue
                    k = valid[b] > 0
                    preds.append(
                        {
                            "ann_idx": int(ann_idx[b]),
                            "pred_vid": out["pair_vid"][b][k].tolist(),
                            "pred_prop": out["pair_prop"][b][k].tolist(),
                            "iou": out["pair_iou"][b][k].tolist(),
                            # offline re-scoring payload
                            # (evaluation/offline.py): per-pair (arg,
                            # frame) indices + the masked (V*P) candidate
                            # score slice, and the group's positive slot
                            "arg_idx": out["pair_arg"][b][k].tolist(),
                            "frame_idx": out["pair_frame"][b][k].tolist(),
                            "scores": out["pair_scores"][b][k].tolist(),
                            "pos_vid": int(pos_vid[b]),
                            "num_props": n_props,
                        }
                    )
            else:  # full-grid mode (train.eval_max_pairs=0)
                considered = np.asarray(out["considered"])
                pv = np.asarray(out["pred_vid"])
                pp = np.asarray(out["pred_prop"])
                pi = np.asarray(out["pred_iou"])
                cand = np.asarray(out["cand_scores"])  # (B,A,F,V*P)
                for b in range(len(ann_idx)):
                    if bm[b] == 0:
                        continue
                    sel = considered[b] > 0
                    ai, fi = np.nonzero(sel)  # pair order matches flat sel
                    preds.append(
                        {
                            "ann_idx": int(ann_idx[b]),
                            "pred_vid": pv[b][sel].tolist(),
                            "pred_prop": pp[b][sel].tolist(),
                            "iou": pi[b][sel].tolist(),
                            "arg_idx": ai.tolist(),
                            "frame_idx": fi.tolist(),
                            "scores": cand[b, ai, fi].tolist(),
                            "pos_vid": int(pos_vid[b]),
                            "num_props": n_props,
                        }
                    )

        group: list = []

        def flush_group() -> None:
            """Fused path: stack the pending eval batches, ONE scan
            dispatch, ONE bulk fetch of the (E, ...) stacked outputs.
            Under multihost sharded input the stack assembles from the
            per-process local rows and the fetch takes only this
            process's row shards (row_axis=1: axis 0 is the scan)."""
            if not group:
                return
            stacked = self._stack_to_global(group)
            out = self._eval_step_multi(self.state, stacked, self._tables)
            outs = self._fetch_eval_out(out, row_axis=1)
            for e, b in enumerate(group):
                consume({k: v[e] for k, v in outs.items()}, b)
            group.clear()

        for i, batch in enumerate(dl):
            if max_b and i >= max_b:
                break
            # fused multi-batch eval needs host batches to stack (valid/
            # test loaders yield host arrays; device-resident batches fall
            # back to the per-batch path)
            if self._eval_multi > 1 and not isinstance(
                batch["pos_vid"], jax.Array
            ):
                group.append(batch)
                if len(group) == self._eval_multi:
                    flush_group()
                continue
            # train_dl batches arrive already device-put (its producer
            # transform); eval splits arrive as host arrays
            sb = (
                batch
                if isinstance(batch["pos_vid"], jax.Array)
                else self._to_global(batch)
            )
            out = self._eval_step(self.state, sb, self._tables)
            # one bulk device->host transfer per batch (each separate
            # fetch costs a full round-trip through the TPU tunnel).
            # Multihost: per-row outputs are sharded over processes —
            # fetch only THIS process's rows (device_get on the global
            # array would touch non-addressable shards and the local
            # metadata below only covers the local rows anyway).
            consume(self._fetch_eval_out(out), batch)
        flush_group()  # short tail group (separate trace, like train's)
        if self.cfg.misc.multihost and jax.process_count() > 1:
            # reference parity: DDP's rank-gather of prediction pickles
            # (SURVEY §3.2) — here over DCN.  The metric sums need NO
            # gather: they are reduced over the GLOBAL batch inside jit,
            # so every process already holds the identical global value
            # (summing them would inflate counts by process_count).
            if self._local_rows is not None:
                from vog_tpu.train.multihost import gather_eval

                _, preds = gather_eval({}, preds)
            # else: full-batch duplication mode — every process already
            # built the complete predictions list (rank 0 writes it)
        pred_file = (
            self.dirs["predictions"] / f"{self.uid}_{split}_{self.epoch}.pkl"
        )
        if self._is_main:
            with open(pred_file, "wb") as f:
                pickle.dump(preds, f)
        else:
            # reference parity: rank-0-only artifact writes — on a shared
            # filesystem N processes writing one path is a race
            print(
                f"rank {jax.process_index()}: skipped predictions write "
                f"({pred_file.name} is rank-0-only)",
                flush=True,
            )
        metrics = finalize_metrics(sums)
        metrics["val_loss"] = sums["loss_sum"] / max(sums["n_batch"], 1.0)
        return metrics

    def _fetch_eval_out(self, out, row_axis: int = 0) -> Dict:
        """Device->host fetch of an eval-step output dict.

        Single-process (or full-batch-duplication multihost): one bulk
        ``device_get``.  Sharded-input multihost: scalars (metric sums,
        psum'd over the global batch inside jit — (E,) replicated
        vectors under the fused scan dispatch) fetch as-is, while
        per-row arrays fetch ONLY the process-local rows by assembling
        this process's addressable shards in row order — global rows
        [lo, hi) — which aligns them with the loader's local metadata
        (ann_idx/batch_mask/pos_vid).  ``row_axis``: 0 for per-batch
        outputs, 1 for fused multi-batch outputs (axis 0 is the scan).
        Regression: tests/_mp_worker.py asserts the gathered predictions
        cover every global ann_idx exactly once across 2 OS processes,
        for both dispatch modes.
        """
        if self._local_rows is None or jax.process_count() == 1:
            return jax.device_get(out)
        host = {}
        for k, v in out.items():
            if getattr(v, "ndim", 0) <= row_axis:
                host[k] = np.asarray(jax.device_get(v))
                continue
            blocks = {}
            for s in v.addressable_shards:
                sl = s.index[row_axis] if len(s.index) > row_axis else slice(None)
                start = sl.start or 0
                if start not in blocks:  # 'model'-axis replicas: keep one
                    blocks[start] = np.asarray(s.data)
            arr = np.concatenate(
                [blocks[s0] for s0 in sorted(blocks)], axis=row_axis
            )
            lo, hi = self._local_rows
            if arr.shape[row_axis] != hi - lo:
                # replicated (or over-assembled) output: take our span
                sel = [slice(None)] * arr.ndim
                sel[row_axis] = slice(lo, hi)
                arr = arr[tuple(sel)]
            host[k] = arr
        return host

    def validate(self) -> Dict:
        return self._run_eval(self.data.valid_dl, "valid")

    def testing(self) -> Dict:
        return self._run_eval(self.data.test_dl, "test")
