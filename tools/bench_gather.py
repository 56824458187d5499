"""Isolate the device-store row-gather cost vs table size on the real chip.

Reference-scale finding (BASELINE.md §Round-4): the production step slowed
7.0 -> 15.4 ms when the feats table grew 1.6k -> 15k rows even though the
gathered bytes are identical.  This probe times the gather ALONE — jit of
gather + full-output reduction (the reduction pass is constant across
variants, so deltas are gather cost) — across table sizes and variants:

  take2d  jnp.take on the ROUND-4 flat (N, W) layout (the regression:
          2-D tiles interleave 8 table rows, cost grows with N)
  take    jnp.take on the 3-D (N, W/128, 128) row-contiguous layout —
          the production default (gather_from_tables, kernel="auto")
  pallas  kernels/gather.gather_rows (manual-DMA row copies, kernel="on")

One JSON line per (N, variant).  Usage:
  python tools/bench_gather.py [N ...]     (default 1600 15000)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

B, V = 16, 4


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vog_tpu.kernels.gather import gather_rows

    sizes = [int(a) for a in sys.argv[1:]] or [1600, 15000]
    # real GT5 dims: feats row = F*P*prop_dim = 10*5*2048, seg = F*3072
    Wf, Ws = 10 * 5 * 2048, 10 * 3072

    rng = np.random.default_rng(0)

    def run(N: int, variant: str) -> dict:
        if variant == "take2d":
            feats = jnp.zeros((N, Wf), jnp.bfloat16)
            seg = jnp.zeros((N, Ws), jnp.bfloat16)
        else:
            feats = jnp.zeros((N, Wf // 128, 128), jnp.bfloat16)
            seg = jnp.zeros((N, Ws // 128, 128), jnp.bfloat16)
        rows = jnp.asarray(rng.integers(0, N, (B, V)), jnp.int32)

        g = gather_rows if variant == "pallas" else (
            lambda t, r: jnp.take(t, r, axis=0)
        )

        @jax.jit
        def f(feats, seg, rows):
            p = g(feats, rows).astype(jnp.float32)
            s = g(seg, rows).astype(jnp.float32)
            return p.sum() + s.sum()

        for _ in range(3):
            out = float(f(feats, seg, rows))
        M = 50
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(M):
                out = f(feats, seg, rows)
            float(out)
            best = min(best, (time.perf_counter() - t0) / M)
        mb = (B * V * (Wf + Ws) * 2) / 1e6
        return {
            "N": N,
            "variant": variant,
            "ms": round(best * 1e3, 3),
            "gathered_MB": round(mb, 1),
            "eff_GBps": round(mb / 1e3 / best, 1),
        }

    for N in sizes:
        for variant in ("take2d", "take", "pallas"):
            print(json.dumps(run(N, variant)), flush=True)


if __name__ == "__main__":
    main()
