"""Measure kernel-vs-XLA step time across precisions (P100 + GT5).

The Pallas kernels (mm_attention, grounding_head, flash attention) were
tuned at fp32-highest; this sweeps {precision} x {kernels on/off} on the
real chip so the size/precision gating reflects measurement.

Usage: python tools/bench_kernel_matrix.py [p100|gt5] [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def time_step(cfg, B):
    import jax

    from __graft_entry__ import _glove, _random_batch
    from vog_tpu.train.dist import make_mesh, shard_batch
    from vog_tpu.train.state import init_state, make_train_step

    mesh = make_mesh(cfg)
    state = init_state(cfg, _glove(cfg), jax.random.PRNGKey(0), B)
    step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
    rng = jax.random.PRNGKey(1)
    batch = shard_batch(_random_batch(cfg, B, seed=1), mesh)
    for _ in range(5):
        state, aux = step(state, batch, rng)
        float(aux["loss"])
    N = 20
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(N):
            state, aux = step(state, batch, rng)
        float(aux["loss"])
        dt = min(dt, time.perf_counter() - t0)
    return dt / N


def main():
    import jax

    from __graft_entry__ import _cfg
    from vog_tpu.config import post_proc_config

    exp = sys.argv[1] if len(sys.argv) > 1 else "p100"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else (2 if exp == "p100" else 16)

    for precision in ("highest", "default"):
        jax.config.update("jax_default_matmul_precision", precision)
        for kernels in (True, False):
            cfg = _cfg(tiny=False)
            cfg.ds.exp_setting = exp
            post_proc_config(cfg)
            cfg.misc.mesh_data = 1
            cfg.misc.mesh_model = 1
            cfg.mdl.mm_kernel = kernels
            cfg.mdl.head_kernel = kernels
            cfg.mdl.use_pallas_attn = kernels
            ms = time_step(cfg, B) * 1e3
            print(
                f"{exp} B={B} precision={precision} kernels={'on' if kernels else 'off'}: "
                f"{ms:.1f} ms/step",
                flush=True,
            )


if __name__ == "__main__":
    main()
