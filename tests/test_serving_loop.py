"""ServingLoop: micro-batching request dispatcher (VERDICT r2 item 7).

Covers: per-request responses identical to the direct batched Predictor
call, tail padding to the jitted batch shape, concurrent clients, and
the CLI self-test path.
"""

import threading

import jax
import numpy as np

from tests.conftest import small_cfg
from vog_tpu.data import get_data
from vog_tpu.serve import Predictor
from vog_tpu.serving import ServingLoop, batch_to_requests
from vog_tpu.train.state import init_state


def _setup(fixture_dir, bs=4, **over):
    over.setdefault("mdl.name", "img_grnd")
    over.setdefault("ds.conc_type", "svsq")
    over.setdefault("train.bs", bs)
    cfg = small_cfg(fixture_dir, **over)
    data = get_data(cfg, bs)
    glove = data.vocab.vectors
    state = init_state(cfg, glove, jax.random.PRNGKey(0), bs)
    pred = Predictor(cfg, state.params, glove)
    return cfg, data, pred


def test_loop_matches_direct_batch_call(fixture_dir):
    cfg, data, pred = _setup(fixture_dir)
    batch = next(iter(data.valid_dl))
    direct = pred(batch)
    loop = ServingLoop(pred, max_batch=4, max_wait_ms=20.0)
    try:
        futs = [loop.submit(r) for r in batch_to_requests(batch)]
        for i, f in enumerate(futs):
            out = f.result(timeout=60)
            for k in ("pred_vid", "pred_prop", "pred_box", "pred_score"):
                np.testing.assert_allclose(
                    out[k], direct[k][i], rtol=1e-5, atol=1e-6, err_msg=k
                )
    finally:
        loop.close()


def test_loop_pads_short_flush(fixture_dir):
    """A single queued request still runs (padded to the batch shape)."""
    cfg, data, pred = _setup(fixture_dir)
    batch = next(iter(data.valid_dl))
    req = batch_to_requests(batch)[0]
    loop = ServingLoop(pred, max_batch=4, max_wait_ms=1.0)
    try:
        out = loop(req)
        assert out["pred_vid"].shape == (
            cfg.ds.max_srl_args,
            cfg.ds.num_frms,
        )
    finally:
        loop.close()


def test_loop_concurrent_clients(fixture_dir):
    cfg, data, pred = _setup(fixture_dir)
    reqs = batch_to_requests(next(iter(data.valid_dl)))
    loop = ServingLoop(pred, max_batch=4, max_wait_ms=2.0)
    results = []
    lock = threading.Lock()

    def client(i):
        out = loop(reqs[i % len(reqs)])
        with lock:
            results.append(out)

    try:
        threads = [threading.Thread(target=client, args=(i,)) for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert len(results) == 12
        for out in results:
            assert np.isfinite(out["pred_score"]).all()
    finally:
        loop.close()


def test_pipelined_matches_unpipelined(fixture_dir):
    """pipeline_depth=2 (dispatch/fetch overlap) returns identical
    responses to the inline depth-1 path, including across many flushes
    so in-flight ordering is exercised."""
    cfg, data, pred = _setup(fixture_dir)
    reqs = batch_to_requests(next(iter(data.valid_dl)))
    loop1 = ServingLoop(pred, max_batch=4, max_wait_ms=1.0, pipeline_depth=1)
    loop2 = ServingLoop(pred, max_batch=4, max_wait_ms=1.0, pipeline_depth=2)
    assert not loop1._pipelined and loop2._pipelined
    try:
        futs1 = [loop1.submit(reqs[i % len(reqs)]) for i in range(12)]
        futs2 = [loop2.submit(reqs[i % len(reqs)]) for i in range(12)]
        for f1, f2 in zip(futs1, futs2):
            o1, o2 = f1.result(timeout=60), f2.result(timeout=60)
            for k in ("pred_vid", "pred_prop", "pred_box", "pred_score"):
                np.testing.assert_array_equal(o1[k], o2[k], err_msg=k)
    finally:
        loop1.close()
        loop2.close()


def test_pipelined_error_resolves_futures(fixture_dir):
    """A request that fails inside dispatch (bad field shape) must reject
    its future, not strand the client or kill the loop."""
    cfg, data, pred = _setup(fixture_dir)
    reqs = batch_to_requests(next(iter(data.valid_dl)))
    loop = ServingLoop(pred, max_batch=4, max_wait_ms=1.0, pipeline_depth=2)
    try:
        bad = dict(reqs[0])
        # string dtype: jnp.asarray inside Predictor.dispatch raises
        bad["tokens"] = np.array(["x"] * len(reqs[0]["tokens"]))
        f_bad = loop.submit(bad)
        try:
            f_bad.result(timeout=60)
            raised = False
        except Exception:
            raised = True
        assert raised
        # the loop keeps serving after the failure
        ok = loop(reqs[0])
        assert np.isfinite(ok["pred_score"]).all()
    finally:
        loop.close()


def test_bucketed_flush_matches_full_batch(fixture_dir):
    """Bucketed mode (pad to smallest bucket >= n) returns identical
    responses to the single-shape loop, for flush sizes landing in each
    bucket, and actually dispatches bucket-sized batches."""
    cfg, data, pred = _setup(fixture_dir)
    reqs = batch_to_requests(next(iter(data.valid_dl)))

    dispatched = []
    orig = pred.dispatch

    def spy(batch):
        dispatched.append(len(batch["batch_mask"]))
        return orig(batch)

    pred.dispatch = spy
    full = ServingLoop(pred, max_batch=4, max_wait_ms=5.0)
    bucketed = ServingLoop(
        pred, max_batch=4, max_wait_ms=5.0, bucket_sizes=[1, 2]
    )
    assert bucketed.bucket_sizes == [1, 2, 4]
    try:
        for n in (1, 2, 3, 4):
            futs_f = [full.submit(reqs[i % len(reqs)]) for i in range(n)]
            outs_f = [f.result(timeout=60) for f in futs_f]
            dispatched.clear()  # record only the bucketed loop's flushes
            futs_b = [bucketed.submit(reqs[i % len(reqs)]) for i in range(n)]
            outs_b = [f.result(timeout=60) for f in futs_b]
            for of, ob in zip(outs_f, outs_b):
                for k in ("pred_vid", "pred_prop", "pred_box", "pred_score"):
                    np.testing.assert_allclose(
                        ob[k], of[k], rtol=1e-5, atol=1e-6, err_msg=k
                    )
            # every bucketed dispatch pads to a bucket shape, and a lone
            # request runs at B=1 (never the full batch shape)
            assert dispatched and all(d in (1, 2, 4) for d in dispatched)
            if n == 1:
                assert dispatched == [1], dispatched
    finally:
        full.close()
        bucketed.close()
        pred.dispatch = orig


def test_prewarm_compiles_buckets(fixture_dir):
    cfg, data, pred = _setup(fixture_dir)
    req = batch_to_requests(next(iter(data.valid_dl)))[0]
    loop = ServingLoop(pred, max_batch=4, max_wait_ms=1.0, bucket_sizes=[1, 2])
    try:
        loop.prewarm(req)  # must not raise; compiles B in {1,2,4}
        out = loop(req)
        assert out["pred_vid"].shape == (cfg.ds.max_srl_args, cfg.ds.num_frms)
    finally:
        loop.close()


def test_cli_selftest(fixture_dir, tmp_path, capsys):
    from vog_tpu.cli import serve as serve_cli

    argv = [
        "srvloop",
        f"--ds.data_dir={fixture_dir}",
        "--ds.prop_dim=64", "--ds.seg_dim=48", "--ds.glove_dim=32",
        "--mdl.emb_dim=32", "--mdl.lstm_dim=16", "--mdl.vis_dim=32",
        "--mdl.role_dim=8", "--mdl.n_heads=2", "--mdl.use_pallas_attn=false",
        "--mdl.name=img_grnd", "--ds.conc_type=svsq",
        "--ds.device_store=off", "--train.bs=4",
        f"--misc.tmp_path={tmp_path}/tmp",
        "--selftest=16", "--concurrency=4", "--random_init",
    ]
    out = serve_cli.main(argv)
    assert out["n_requests"] == 16
    assert out["p95_ms"] >= out["p50_ms"] > 0
    assert out["requests_per_sec"] > 0
