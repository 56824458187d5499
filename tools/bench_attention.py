"""Honest Pallas-vs-XLA attention micro-benchmark on the real TPU.

Axon-tunnel sync discipline: iterations are CHAINED (each consumes the
previous output) and the loop is closed by a scalar fetch — see bench.py.

  python tools/bench_attention.py [T] [BH_pairs...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, q, k, v, fb, n=30):
    q = fn(q, k, v, fb) * 0 + q  # compile & warm
    float(q[0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(n):
        q = fn(q, k, v, fb) * 1e-3 + q  # chain: next iter depends on prev
    val = float(q[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / n
    assert np.isfinite(val)
    return dt * 1e3


def main():
    from vog_tpu.kernels.attention import flash_attention
    from vog_tpu.model.transformer import xla_attention

    T = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    B, H, dh, F = 2, 4, 128, 10
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, H, T, dh)).astype(np.float32))
        for _ in range(3)
    )
    mask = jnp.ones((B, T), jnp.float32)
    fids = jnp.asarray((np.arange(T) // max(T // F, 1)).clip(0, F - 1).astype(np.int32))
    fb = jnp.asarray(rng.normal(scale=0.5, size=(H, F, F)).astype(np.float32))

    pallas_fwd = jax.jit(lambda q, k, v, fb: flash_attention(q, k, v, mask, fb, fids))
    xla_fwd = jax.jit(lambda q, k, v, fb: xla_attention(q, k, v, mask, fb, fids))
    print(f"T={T} fwd: pallas {bench(pallas_fwd, q, k, v, fb):.2f} ms | "
          f"xla {bench(xla_fwd, q, k, v, fb):.2f} ms", flush=True)

    def gp(q, k, v, fb):
        return jax.grad(lambda q: jnp.sum(flash_attention(q, k, v, mask, fb, fids) ** 2))(q)

    def gx(q, k, v, fb):
        return jax.grad(lambda q: jnp.sum(xla_attention(q, k, v, mask, fb, fids) ** 2))(q)

    print(f"T={T} fwd+bwd: pallas {bench(jax.jit(gp), q, k, v, fb):.2f} ms | "
          f"xla {bench(jax.jit(gx), q, k, v, fb):.2f} ms", flush=True)

    # backward-strategy comparison (VERDICT r3 item #5b): emit the (T,T)
    # score-grad to HBM + XLA GEMMs vs recompute-in-VMEM second kernel.
    # Grad w.r.t. ALL inputs so both kernels' full work is on the clock.
    for mode in ("emit", "recompute"):
        def gm(q, k, v, fb, _m=mode):
            def l(args):
                q, k, v, fb = args
                return jnp.sum(
                    flash_attention(q, k, v, mask, fb, fids, bwd_mode=_m) ** 2
                )
            return jax.grad(l)((q, k, v, fb))[0]
        print(f"T={T} fwd+bwd[{mode}]: {bench(jax.jit(gm), q, k, v, fb):.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
