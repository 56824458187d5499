"""Worker for the real multi-process multihost test (not a pytest module).

Launched by tests/test_multihost.py as N separate processes that form a
JAX CPU cluster (jax.distributed.initialize + Gloo collectives).  Each
process owns 4 virtual CPU devices; the global mesh spans all N*4.

Exercises the two multi-host seams for real (not the single-process
identity): the full DP train step over a cross-process mesh (gradient
psum rides the cluster collectives; the replicated loss must be
addressable and identical everywhere), and the eval gather
(vog_tpu/train/multihost.py: metric-sum allgather + length-padded
pickled prediction blobs).

Usage: python tests/_mp_worker.py <pid> <nproc> <port>
Prints "MP_OK loss=<val>" on success.
"""

import os
import sys


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")  # authoritative over axon site hook
    # persistent compile cache (same mechanism as the production CLI,
    # misc.compile_cache): this worker compiles ~6 large graphs per run on
    # a 1-core host — repeat runs load them instead
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tmp", "jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    n_global = len(jax.devices())
    assert n_global == nproc * 4, n_global

    # --- eval gather across real processes --------------------------------
    from vog_tpu.train.multihost import gather_eval

    sums = {"n_acc": float(pid + 1), "n_pairs": 10.0 * (pid + 1)}
    preds = [{"ann_idx": pid, "pred_vid": [pid] * (pid + 2)}]
    out_sums, out_preds = gather_eval(sums, preds)
    assert out_sums["n_acc"] == sum(i + 1 for i in range(nproc)), out_sums
    assert out_sums["n_pairs"] == sum(10.0 * (i + 1) for i in range(nproc))
    assert [p["ann_idx"] for p in out_preds] == list(range(nproc)), out_preds

    # --- full DP train step over the cross-process global mesh ------------
    import numpy as np
    from jax.sharding import Mesh

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _cfg, _glove, _random_batch
    from vog_tpu.train.dist import param_shardings, shard_batch
    from vog_tpu.train.state import init_state, make_train_step

    cfg = _cfg(tiny=True)
    data_ax = n_global
    cfg.misc.mesh_data = data_ax
    cfg.misc.mesh_model = 1
    mesh = Mesh(np.asarray(jax.devices()).reshape(data_ax, 1), ("data", "model"))

    global_bs = data_ax
    state = init_state(cfg, _glove(cfg, 64), jax.random.PRNGKey(0), global_bs)
    state = state.replace(
        params=jax.device_put(state.params, param_shardings(mesh, state.params))
    )
    # every process holds the same host batch; device_put with the global
    # sharding takes each process's addressable shards
    batch = shard_batch(_random_batch(cfg, global_bs), mesh)
    train_step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
    state, aux = train_step(state, batch, jax.random.PRNGKey(1))
    loss = float(aux["loss"])  # replicated -> addressable on every process
    assert np.isfinite(loss), loss

    # --- multi-host input sharding (DistributedSampler analog) ------------
    # Each process materializes only its rows of the global batch; the
    # assembled global array must give a BIT-IDENTICAL loss to the
    # duplicated full-batch path, with ~1/nproc of the __getitem__ work.
    import tempfile

    from tests.conftest import small_cfg
    from vog_tpu.data import get_data
    from vog_tpu.data.fixtures import generate_fixture
    from vog_tpu.train.dist import local_batch_rows, shard_batch_local

    fdir = tempfile.mkdtemp(prefix=f"mp_fix_{pid}_")
    # seed-0 fixture: every process generates identical bytes locally
    generate_fixture(
        fdir, n_train=48, n_valid=8, n_test=8, num_props=5,
        prop_dim=64, seg_dim=48, glove_dim=32, seed=0,
    )
    cfg2 = small_cfg(
        fdir, **{"mdl.name": "img_grnd", "ds.conc_type": "svsq", "train.bs": 8}
    )
    gbs = 8
    data = get_data(cfg2, gbs)
    dl = data.train_dl
    calls = {"n": 0}
    orig_getitem = dl.ds.__getitem__

    def counting_getitem(i, rng=None):
        calls["n"] += 1
        return orig_getitem(i, rng)

    dl.ds.__getitem__ = counting_getitem
    dl.prefetch = 0  # strict on-demand so the call count is exact
    step2 = jax.jit(make_train_step(cfg2), donate_argnums=(0,))

    def one_step(sharded_batch):
        st = init_state(cfg2, data.vocab.vectors, jax.random.PRNGKey(0), gbs)
        st = st.replace(
            params=jax.device_put(st.params, param_shardings(mesh, st.params))
        )
        _, aux2 = step2(st, sharded_batch, jax.random.PRNGKey(1))
        return float(aux2["loss"])

    # path A: every process builds the full global batch (duplication)
    dl.local_rows, dl.epoch, calls["n"] = None, 0, 0
    loss_dup = one_step(shard_batch(next(iter(dl)), mesh))
    calls_dup = calls["n"]

    # path B: rank-strided local rows + make_array_from_process_local_data
    dl.local_rows = local_batch_rows(mesh, gbs)
    assert dl.local_rows is not None
    dl.epoch, calls["n"] = 0, 0
    loss_loc = one_step(shard_batch_local(next(iter(dl)), mesh, gbs))
    calls_loc = calls["n"]

    assert loss_loc == loss_dup, (loss_loc, loss_dup)
    assert calls_dup == gbs, calls_dup
    assert calls_loc == gbs // nproc, (calls_loc, gbs, nproc)
    print(
        f"MP_SHARD_OK getitem {calls_loc}/{calls_dup}",
        flush=True,
    )

    # --- full Learner.validate() across processes -------------------------
    # Regression for the local-metadata/global-output mispairing: per-row
    # eval outputs are sharded over processes; each process must pair its
    # OWN rows with its local ann_idx, and the rank gather must cover
    # every validation sample exactly once (learner._fetch_eval_out).
    from vog_tpu.train.learner import Learner

    cfg2.misc.multihost = True
    cfg2.misc.mesh_data = n_global
    cfg2.misc.mesh_model = 1
    cfg2.train.bs = 1  # per-device -> global_bs == n_global
    cfg2.train.epochs = 1
    data3 = get_data(cfg2, gbs)
    lrn = Learner("mpval", data3, cfg2, mesh=mesh)
    metrics = lrn.validate()
    assert np.isfinite(metrics["val_loss"]), metrics
    if pid == 0:
        import pickle

        pred_file = lrn.dirs["predictions"] / "mpval_valid_0.pkl"
        with open(pred_file, "rb") as f:
            got = sorted(p["ann_idx"] for p in pickle.load(f))
        assert len(got) == len(set(got)), f"duplicate ann_idx in preds: {got}"
        assert len(got) == 8, got  # n_valid fixture samples, each once
        print(f"MP_EVAL_OK n_preds={len(got)}", flush=True)

    # --- fused dispatch x sharded input ------------------------------------
    # steps_per_dispatch / eval_batches_per_dispatch must COMPOSE with the
    # per-process sharded input path: each process stacks only its local
    # rows (dist.stack_shard_batches_local) and the fused eval fetch takes
    # its row shards at row_axis=1.  Assert bit-identical training params
    # and identical eval metrics/predictions vs the single-dispatch path.
    def fit_params(uid, k):
        import copy

        c = copy.deepcopy(cfg2)
        c.train.steps_per_dispatch = k
        c.train.eval_batches_per_dispatch = k
        c.train.epochs = 1
        d = get_data(c, gbs)
        ln = Learner(uid, d, c, mesh=mesh)
        if k > 1:
            assert ln._multi == k and ln._eval_multi == k, (
                ln._multi,
                ln._eval_multi,
            )
        m = ln.fit()
        return jax.device_get(ln.state.params), m

    p1, m1 = fit_params("mpk1", 1)
    p2, m2 = fit_params("mpk2", 2)
    jax.tree.map(np.testing.assert_array_equal, p1, p2)
    assert m1["acc"] == m2["acc"] and m1["num_pairs"] == m2["num_pairs"], (
        m1,
        m2,
    )
    if pid == 0:
        import pickle as _pkl

        eq = []
        for u in ("mpk1", "mpk2"):
            with open(lrn.dirs["predictions"] / f"{u}_valid_0.pkl", "rb") as f:
                eq.append(
                    sorted(
                        (p["ann_idx"], tuple(p["pred_prop"]))
                        for p in _pkl.load(f)
                    )
                )
        assert eq[0] == eq[1], "fused-dispatch predictions differ"
        print("MP_FUSED_OK", flush=True)

    print(f"MP_OK loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
