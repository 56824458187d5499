"""Profile a training step on the real TPU and print a top-op report.

  python tools/profile_step.py [gt5|p100] [model] [batch]

Captures a jax.profiler trace of 10 steady-state steps and aggregates
device op durations by fusion family — the quick what-dominates view used
for the round-1 optimization work (dropout RNG, head fusion traffic,
attention share).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OP_PREFIXES = (
    "fusion", "attn", "multiply", "convolution", "loop_", "dynamic", "copy",
    "transpose", "reduce", "custom", "bitcast", "select", "broadcast",
    "scatter", "gather", "dot", "rng", "threefry", "iota", "concatenate",
    "slice", "pad", "add", "while",
)


def main():
    import jax

    from __graft_entry__ import _cfg, _glove, _random_batch
    from vog_tpu.config import apply_matmul_precision, post_proc_config
    from vog_tpu.train.dist import make_mesh, shard_batch
    from vog_tpu.train.state import init_state, make_train_step

    exp = sys.argv[1] if len(sys.argv) > 1 else "gt5"
    name = sys.argv[2] if len(sys.argv) > 2 else "vog"
    B = int(sys.argv[3]) if len(sys.argv) > 3 else (16 if exp == "gt5" else 2)

    cfg = _cfg(tiny=False)
    cfg.ds.exp_setting = exp
    cfg.mdl.name = name
    post_proc_config(cfg)
    cfg.misc.mesh_data = 1
    cfg.misc.mesh_model = 1
    # PROFILE_PRECISION=default profiles the bf16-MXU production step
    cfg.misc.matmul_precision = os.environ.get(
        "PROFILE_PRECISION", cfg.misc.matmul_precision
    )
    apply_matmul_precision(cfg)
    mesh = make_mesh(cfg)

    state = init_state(cfg, _glove(cfg), jax.random.PRNGKey(0), B)
    step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
    batch = shard_batch(_random_batch(cfg, B, seed=1), mesh)
    rng = jax.random.PRNGKey(1)
    for _ in range(4):
        state, aux = step(state, batch, rng)
        float(aux["loss"])

    tracedir = tempfile.mkdtemp(prefix="vogtrace_")
    jax.profiler.start_trace(tracedir)
    N = 10
    for _ in range(N):
        state, aux = step(state, batch, rng)
    float(aux["loss"])
    jax.profiler.stop_trace()

    traces = glob.glob(f"{tracedir}/**/*.trace.json.gz", recursive=True)
    assert traces, f"no trace under {tracedir}"
    with gzip.open(traces[0]) as f:
        events = json.load(f).get("traceEvents", [])
    dur = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            n = e.get("name", "?")
            if n.startswith(OP_PREFIXES):
                dur[n.split(".")[0]] += e["dur"]
    total = sum(dur.values())
    print(f"{exp}/{name} B={B}: device ops {total / N / 1e3:.2f} ms/step")
    for fam, d in dur.most_common(15):
        print(f"  {d / N / 1e3:7.3f} ms/step  {fam}")


if __name__ == "__main__":
    main()
