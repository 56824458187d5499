"""TrainState construction + the jitted train/eval step functions.

Reference parity: the inner loop of ``utils/trn_utils.py §Learner.fit``
(forward, masked-BCE loss, backward, DDP all-reduce, Adam step) collapsed
into one donated, pjit-compiled ``train_step``; gradient reduction over the
'data' mesh axis is inserted by XLA (psum) instead of NCCL DDP hooks.

TPU-first: the whole step (on-device conc assembly -> model -> loss ->
grads -> Adam update) is a single XLA executable; buffers are donated so
optimizer state updates in place in HBM.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from vog_tpu.config import Cfg
from vog_tpu.evaluation import evaluate_batch
from vog_tpu.model import compute_loss, get_model
from vog_tpu.sampling import assemble_batch, scores_to_canonical, view_dims


class TrainState(train_state.TrainState):
    pass


class SkipNonfiniteState(NamedTuple):
    """State for ``skip_nonfinite_guard``: consecutive + total bad-step
    counters around the wrapped optimizer's state."""

    notfinite_count: jnp.ndarray  # int32 scalar — consecutive bad steps
    total_notfinite: jnp.ndarray  # int32 scalar — bad steps this run
    inner_state: optax.OptState


def skip_nonfinite_guard(
    inner: optax.GradientTransformation, max_consecutive_errors: int
) -> optax.GradientTransformation:
    """Drop non-finite gradient updates WITHOUT a ``lax.cond``.

    Semantically equivalent to ``optax.apply_if_finite(inner, k)`` (tested
    step-for-step in tests/test_skip_guard.py): a step whose gradients
    contain NaN/inf leaves params and the inner optimizer state unchanged;
    after more than ``max_consecutive_errors`` consecutive bad steps the
    raw update is applied anyway so the NaN propagates and the run aborts
    at the next ``misc.check_nans`` log point.

    Why not apply_if_finite: its ``lax.cond`` traces the entire inner
    update twice (apply branch + reject branch), doubling the step graph —
    measured at 4 -> 14 min compile through the remote-TPU tunnel
    (docs/ROUND2_NOTES.md).  Here the inner update is traced ONCE on
    zero-masked gradients and the outputs/state are merged with
    elementwise ``jnp.where`` selects, whose cost is a pass over the
    (small) optimizer-state tree — ~zero compile and runtime overhead.
    """

    def init(params):
        return SkipNonfiniteState(
            notfinite_count=jnp.zeros([], jnp.int32),
            total_notfinite=jnp.zeros([], jnp.int32),
            inner_state=inner.init(params),
        )

    def update(updates, state, params=None):
        leaves = jax.tree.leaves(updates)
        isfinite = jnp.all(
            jnp.asarray([jnp.all(jnp.isfinite(u)) for u in leaves])
        )
        notfinite_count = jnp.where(
            isfinite, 0, state.notfinite_count + 1
        ).astype(jnp.int32)
        # mirror apply_if_finite: give up suppressing once the NEW count
        # exceeds the budget — the bad update flows through untouched
        apply = jnp.logical_or(
            isfinite, notfinite_count > max_consecutive_errors
        )
        # raw (possibly non-finite) updates go straight into the inner
        # transform: on a dropped step its outputs are discarded by the
        # selects below (jnp.where never propagates the unselected NaNs),
        # and on a give-up step the raw update is exactly what must flow
        new_updates, new_inner = inner.update(
            updates, state.inner_state, params
        )
        out_updates = jax.tree.map(
            lambda u: jnp.where(apply, u, jnp.zeros_like(u)), new_updates
        )
        out_inner = jax.tree.map(
            lambda n, o: jnp.where(apply, n, o), new_inner, state.inner_state
        )
        return out_updates, SkipNonfiniteState(
            notfinite_count=notfinite_count,
            total_notfinite=(
                state.total_notfinite + jnp.where(isfinite, 0, 1)
            ).astype(jnp.int32),
            inner_state=out_inner,
        )

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: Cfg) -> optax.GradientTransformation:
    """Adam (reference opt_fn) + global-norm clipping + optional schedule."""
    t = cfg.train
    if t.lr_schedule == "cosine":
        total = max(t.total_steps, t.warmup_steps + 1)
        lr = optax.warmup_cosine_decay_schedule(
            0.0, t.lr, warmup_steps=max(t.warmup_steps, 1), decay_steps=total
        )
    else:
        lr = t.lr
    steps = [optax.clip_by_global_norm(t.grad_clip)]
    if t.wd > 0:
        steps.append(optax.adamw(lr, weight_decay=t.wd))
    else:
        steps.append(optax.adam(lr))
    tx = optax.chain(*steps)
    if t.skip_nonfinite > 0:
        # production guard: a non-finite grad step is dropped (params and
        # opt state unchanged) instead of poisoning the weights; aborts
        # after skip_nonfinite consecutive bad steps.  Off by default for
        # strict reference parity (the reference has no such guard).
        # cond-free equivalent of optax.apply_if_finite — see
        # skip_nonfinite_guard (compile cost: ~0 vs 2x step graph).
        tx = skip_nonfinite_guard(tx, max_consecutive_errors=t.skip_nonfinite)
    return tx


def build_model(cfg: Cfg, glove: np.ndarray):
    V, F, P = cfg.ds.num_cmp, cfg.ds.num_frms, cfg.ds.num_prop_per_frm
    _, Fp, _ = view_dims(cfg.ds.conc_type, V, F, P)
    return get_model(cfg, glove, n_frames=Fp)


def example_batch(cfg: Cfg, batch_size: int, vocab_size: int = 64) -> Dict:
    """A zeros batch with the canonical shapes (for init / compile checks)."""
    ds = cfg.ds
    V, F, P, A, L = ds.num_cmp, ds.num_frms, ds.num_prop_per_frm, ds.max_srl_args, ds.max_seq_len
    B = batch_size
    z = np.zeros
    return {
        "props": z((B, V, F, P, ds.prop_dim), np.float32),
        "prop_boxes": z((B, V, F, P, 5), np.float32),
        "prop_mask": np.ones((B, V, F, P), np.float32),
        "seg_feats": z((B, V, F, ds.seg_dim), np.float32),
        "tokens": np.ones((B, L), np.int32),
        "seq_len": np.full((B,), 4, np.int32),
        "verb_idx": np.ones((B,), np.int32),
        "srl_roles": np.ones((B, A), np.int32),
        "srl_spans": np.tile(np.array([[0, 1]], np.int32), (B, A, 1))[..., :2],
        "srl_arg_mask": np.ones((B, A), np.float32),
        "targets": z((B, V, A, F, P), np.float32),
        "gt_boxes": z((B, A, F, 4), np.float32),
        "gt_frame_mask": np.ones((B, A, F), np.float32),
        "pos_vid": z((B,), np.int32),
        "ann_idx": z((B,), np.int32),
        "batch_mask": np.ones((B,), np.float32),
    }


def init_state(cfg: Cfg, glove: np.ndarray, rng: jax.Array, batch_size: int) -> TrainState:
    model = build_model(cfg, glove)
    batch = jax.tree.map(jnp.asarray, example_batch(cfg, batch_size))
    clip = assemble_batch(batch, cfg.ds.conc_type)

    # jit the init: eager init dispatches thousands of tiny ops (glacial
    # through the remote-TPU tunnel); one compiled program instead
    @jax.jit
    def _init(rng):
        return model.init({"params": rng, "dropout": rng}, clip, deterministic=True)

    variables = _init(rng)
    return TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=make_optimizer(cfg)
    )


# 0/1 fields the dataset ships as uint8 (4x smaller H2D); cast back to
# f32 here INSIDE jit — the cast fuses into the first consumer for free
COMPACT_KEYS = ("targets", "prop_mask", "gt_frame_mask", "srl_arg_mask", "batch_mask")


def cast_compact(batch: Dict) -> Dict:
    out = dict(batch)
    for k in COMPACT_KEYS:
        if k in out:
            out[k] = out[k].astype(jnp.float32)
    return out


def _make_gather(cfg: Cfg, device_store: bool, store_mesh):
    """The in-step resolve for device-resident tables.

    Features: local take when the tables are replicated, collective
    psum_scatter gather when they are row-sharded over ``store_mesh``'s
    'data' axis.  When the batch is index-only (carries ``ann_row`` —
    static per trace), the annotation block expands first
    (data/ann_store.py) so the feature gather sees the canonical schema.
    """
    if not device_store:
        return lambda batch, tables: batch
    if store_mesh is not None:
        from vog_tpu.data.device_store import sharded_gather_from_tables

        feats = lambda batch, tables: sharded_gather_from_tables(
            batch, tables, store_mesh
        )
    else:
        from vog_tpu.data.device_store import gather_from_tables

        gk = cfg.misc.gather_kernel
        feats = lambda batch, tables: gather_from_tables(batch, tables, kernel=gk)

    def gather(batch: Dict, tables):
        if tables is not None and "ann_row" in batch:
            from vog_tpu.data.ann_store import expand_index_batch

            batch = expand_index_batch(batch, tables, cfg)
        return feats(batch, tables)

    return gather


def make_train_step(
    cfg: Cfg, device_store: bool = False, store_mesh=None
) -> Callable:
    """device_store=True: the step takes a 4th ``tables`` arg (the
    device-resident feature tables) and batches carry ``vid_rows`` — the
    feature gather happens here inside jit (data/device_store.py).
    store_mesh: set when the tables are row-sharded over the mesh's 'data'
    axis (P100-scale) — the gather becomes a collective.
    cfg.train.grad_accum > 1 routes the step through the microbatched
    gradient-accumulation scan (see the inline comment below)."""
    conc = cfg.ds.conc_type
    gather = _make_gather(cfg, device_store, store_mesh)
    accum = max(int(getattr(cfg.train, "grad_accum", 1)), 1)

    def train_step(state: TrainState, batch: Dict, rng: jax.Array, tables=None):
        step_rng = jax.random.fold_in(rng, state.step)

        if accum == 1:
            batch = cast_compact(gather(batch, tables))
            clip = assemble_batch(batch, conc)

            def loss_fn(params):
                logits = state.apply_fn(
                    {"params": params},
                    clip,
                    deterministic=False,
                    rngs={"dropout": step_rng},
                )
                loss, aux = compute_loss(
                    logits, clip, cfg.train.pos_weight,
                    cfg.train.loss_type, cfg.train.rank_weight,
                    rank_num_cmp=cfg.ds.num_cmp if conc == "sep" else 1,
                )
                return loss, aux

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            new_state = state.apply_gradients(grads=grads)
            aux["grad_norm"] = optax.global_norm(grads)
            if cfg.train.skip_nonfinite > 0:
                # guard's consecutive-bad-step counter (the guard is the
                # outermost transform, so opt_state IS its state); the
                # Learner aborts once this exceeds the budget — past that
                # point the give-up semantics applied a non-finite update
                # and the params are poisoned (round-5 find: a >K burst
                # poisoned a run that then "trained" 10 NaN epochs while
                # logging "update dropped")
                aux["guard_notfinite"] = new_state.opt_state.notfinite_count
            return new_state, aux

        # grad-accumulation path (train.grad_accum = K): split the batch
        # into K equal microbatches, lax.scan fwd/bwd over them carrying a
        # single param-shaped grad accumulator, then ONE averaged optimizer
        # update.  Peak activation memory drops ~K× at fixed effective
        # batch — the P100-SPAT memory lever.  Gradient semantics match
        # the reference's DDP ranks (SURVEY §2 distributed row): each
        # microbatch normalizes its own loss by its own mask count and the
        # grads average uniformly, exactly what NCCL all-reduce does across
        # equal-size ranks.  Device-store gathers and ann-store expansion
        # run per-microbatch inside the scan, so gathered features are
        # never materialized at the full batch size either.
        B = jax.tree.leaves(batch)[0].shape[0]
        if B % accum != 0:
            raise ValueError(
                f"train.grad_accum={accum} must divide the batch size {B}"
            )
        micro = jax.tree.map(
            lambda x: x.reshape((accum, B // accum) + x.shape[1:]), batch
        )

        def micro_loss(params, mb, rng_i):
            mb = cast_compact(gather(mb, tables))
            clip = assemble_batch(mb, conc)
            logits = state.apply_fn(
                {"params": params}, clip, deterministic=False,
                rngs={"dropout": rng_i},
            )
            return compute_loss(
                logits, clip, cfg.train.pos_weight,
                cfg.train.loss_type, cfg.train.rank_weight,
                rank_num_cmp=cfg.ds.num_cmp if conc == "sep" else 1,
            )

        grad_fn = jax.value_and_grad(micro_loss, has_aux=True)

        def body(acc_g, xs):
            mb, i = xs
            (_, aux), g = grad_fn(
                state.params, mb, jax.random.fold_in(step_rng, i)
            )
            return jax.tree.map(jnp.add, acc_g, g), aux

        zero_g = jax.tree.map(jnp.zeros_like, state.params)
        acc_g, auxs = jax.lax.scan(
            body, zero_g, (micro, jnp.arange(accum, dtype=jnp.int32))
        )
        grads = jax.tree.map(lambda g: g / accum, acc_g)
        aux = jax.tree.map(lambda x: x.mean(0), auxs)
        new_state = state.apply_gradients(grads=grads)
        aux["grad_norm"] = optax.global_norm(grads)
        if cfg.train.skip_nonfinite > 0:
            aux["guard_notfinite"] = new_state.opt_state.notfinite_count
        return new_state, aux

    return train_step


def make_multi_train_step(
    cfg: Cfg, device_store: bool = False, store_mesh=None
) -> Callable:
    """K train steps fused into one dispatch (``train.steps_per_dispatch``).

    ``stacked`` is a pytree of (K, B, ...) arrays — K host batches stacked
    on a new leading axis (dist.stack_shard_batches) — and the body is the
    exact single-batch ``train_step`` under ``lax.scan``, so the result is
    bit-identical to K sequential dispatches (per-step dropout keys still
    differ: the body folds ``state.step`` into the rng and step increments
    every scan iteration).  The win is host-side: one dispatch + one H2D per
    K steps instead of K round-trips (BASELINE.md input-path table).
    """
    step = make_train_step(cfg, device_store, store_mesh)
    # NaN containment (round-3 verdict): with skip_nonfinite=0 (the parity
    # default) a non-finite loss at scan step i would poison the params
    # carried to steps i+1..K-1 INSIDE one dispatch, before the host-side
    # check at the dispatch boundary can abort — K-1 steps worse than the
    # unfused path.  Fix inside the scan: carry a sticky "poisoned" flag
    # keyed on the same signal the host checks (non-finite loss); once it
    # trips, subsequent states are frozen via jnp.where selects, so the
    # state fetched at the abort boundary holds the last clean params.
    # On all-finite dispatches the selects pass the new state through
    # bit-identically (predicate is a scalar on the already-computed
    # loss), preserving fused-vs-single bit-identity
    # (tests/test_multi_dispatch.py).  When skip_nonfinite>0 the optimizer
    # guard already drops bad updates per-step and the run continues, so
    # the freeze must stay out of the way (static flag below).
    freeze_on_nan = int(getattr(cfg.train, "skip_nonfinite", 0)) == 0

    def multi_step(state: TrainState, stacked: Dict, rng: jax.Array, tables=None):
        if not freeze_on_nan:
            def body(s, b):
                return step(s, b, rng, tables)

            return jax.lax.scan(body, state, stacked)

        def body(carry, b):
            s, poisoned = carry
            new_s, aux = step(s, b, rng, tables)
            poisoned = jnp.logical_or(
                poisoned, ~jnp.isfinite(aux["loss"])
            )
            out = jax.tree.map(
                lambda n, o: jnp.where(poisoned, o, n), new_s, s
            )
            return (out, poisoned), aux

        (final, _), auxs = jax.lax.scan(
            body, (state, jnp.zeros([], bool)), stacked
        )
        return final, auxs

    return multi_step


def make_multi_eval_step(
    cfg: Cfg, device_store: bool = False, store_mesh=None
) -> Callable:
    """E eval batches fused into one dispatch
    (``train.eval_batches_per_dispatch``): the body is the exact
    single-batch ``eval_step`` under ``lax.scan`` over a stacked
    (E, B, ...) tree, so every output leaf gains a leading E axis and the
    host fetches ONE stacked tree instead of E round-trips.  State is
    constant across the scan (inference)."""
    step = make_eval_step(cfg, device_store, store_mesh)

    def multi_eval(state: TrainState, stacked: Dict, tables=None):
        def body(carry, b):
            return carry, step(state, b, tables)

        _, outs = jax.lax.scan(body, 0, stacked)
        return outs

    return multi_eval


def make_eval_step(
    cfg: Cfg, device_store: bool = False, store_mesh=None
) -> Callable:
    conc = cfg.ds.conc_type
    gather = _make_gather(cfg, device_store, store_mesh)
    max_pairs = cfg.train.eval_max_pairs
    if max_pairs < 0:  # auto: 1-2 annotated frames per arg in ASRL
        max_pairs = 2 * cfg.ds.max_srl_args

    def eval_step(state: TrainState, batch: Dict, tables=None):
        batch = cast_compact(gather(batch, tables))
        clip = assemble_batch(batch, conc)
        logits = state.apply_fn({"params": state.params}, clip, deterministic=True)
        loss, _ = compute_loss(logits, clip)
        B, V, F, P = batch["prop_mask"].shape
        scores = scores_to_canonical(logits, conc, B, V, F, P)
        out = evaluate_batch(
            scores,
            batch["prop_boxes"],
            batch["gt_boxes"],
            batch["gt_frame_mask"],
            batch["srl_arg_mask"],
            batch["pos_vid"],
            batch["batch_mask"],
            batch["prop_mask"],
            max_pairs=max_pairs,
        )
        nb = jnp.maximum(batch["batch_mask"].sum(), 1.0)
        out["loss_sum"] = loss * nb  # batch-mean loss weighted for aggregation
        out["n_batch"] = nb
        return out

    return eval_step
