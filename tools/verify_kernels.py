"""On-chip Pallas kernel parity gate (VERDICT r3 item #3).

Runs the three hot Pallas kernels — flash attention with factored RPE
(kernels/attention.py), the shared-QK multi-arg kernel
(kernels/mm_attention.py), and the fused grounding head
(kernels/grounding_head.py) — on the REAL TPU chip (Mosaic, not
interpret mode) against the plain-XLA math at the production GT5 and
P100 shapes (SURVEY §3.1: vis_dim=512, n_heads=4, A=5; SPAT token
counts T=200 / T=4000), forward AND all gradients, and asserts relative
maxdiff thresholds.  The interpret-mode tests (tests/test_attention.py
etc.) prove the kernel math; this tool proves the *Mosaic lowering* of
that math on hardware, closing the silent-drift hole VERDICT r3
"What's weak" #3 called out.

Prints ONE JSON line:
  {"ok": bool, "precision": ..., "checks": {name: {"fwd": relmax,
   "grads": relmax, "ok": bool}}, "thresholds": {...}}

Env:
  VERIFY_PRECISION=highest|default   matmul precision (default: highest,
                                     the parity mode; 'default' checks the
                                     bf16-MXU production mode with looser
                                     thresholds)
  VERIFY_FAST=1                      reduced shapes (used by bench.py so
                                     the driver artifact carries a parity
                                     bit without minutes of extra compile)

Exit code 0 iff every check passes.
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

# persistent XLA compile cache (same dir the trainer uses,
# config/defaults.py §compile_cache): the gate is ~10 Mosaic+XLA compiles
# and is re-run by every bench.py invocation — warm-cache runs drop from
# ~9 min to well under bench's parity-subprocess budget
_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tmp", "jax_cache"
)
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

NEG = -1e30


def _rel(a, b) -> float:
    a = np.asarray(jax.device_get(a), np.float64)
    b = np.asarray(jax.device_get(b), np.float64)
    # floor the scale at 1.0: every reference tensor here is O(10–1e3)
    # except scalar reductions (db2 = sum of ~1e4 centered normals) whose
    # near-total cancellation would turn harmless 1e-4 absolute noise into
    # a fake 1e-3 "relative" alarm
    scale = max(float(np.max(np.abs(b))), 1.0)
    return float(np.max(np.abs(a - b))) / scale


# ---------------------------------------------------------------- XLA refs
# Same equations the in-model XLA fallbacks compute (model/transformer.py
# §xla_attention / §DecomposedRelAttention materialized branch,
# model/grounding.py §GroundingHead) restated locally so this tool checks
# kernel-vs-math, not kernel-vs-another-module.


def xla_flash_ref(q, k, v, mask, fb, fids):
    dh = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.float32(dh))
    logits = logits + fb[:, fids][:, :, fids][None]
    logits = jnp.where(mask[:, None, None, :] > 0, logits, jnp.finfo(jnp.float32).min)
    return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, -1), v)


def xla_mm_ref(qm, km, vm, cn, mask, fb, fids):
    # combined-logit form (round-5): softmax_j(shared + cn_a) @ vm — the
    # kernel's exact math; the former w·e product form underflows f32 in
    # sharp regimes (BASELINE.md §Round-5)
    shared = jnp.einsum("bhid,bhjd->bhij", qm, km) + fb[:, fids][:, :, fids][None]
    shared = jnp.where(mask[:, None, None, :] > 0, shared, NEG)
    t = shared[:, :, None] + cn[:, :, :, None, :]
    p = jnp.exp(t - t.max(-1, keepdims=True))
    return jnp.einsum("bhaij,bhjd->bhaid", p, vm) / p.sum(-1, keepdims=True)


def xla_head_ref(vis, arg, wv, wl, wx, w1, b1, w2, b2):
    cross = jnp.einsum("btd,bad->batd", vis, arg)
    h = jax.nn.relu(wv[:, None] + wl[:, :, None] + cross @ wx)
    h1 = jax.nn.relu(h @ w1 + b1)
    return h1 @ w2 + b2


# ---------------------------------------------------------------- inputs


def _attn_inputs(seed, B, H, T, dh, F):
    rng = np.random.default_rng(seed)
    r = lambda *s: jnp.asarray(rng.normal(size=s, scale=0.5).astype(np.float32))
    q, k, v = r(B, H, T, dh), r(B, H, T, dh), r(B, H, T, dh)
    mask = jnp.asarray((rng.uniform(size=(B, T)) > 0.15).astype(np.float32))
    mask = mask.at[:, 0].set(1.0)
    fb = r(H, F, F)
    fids = jnp.asarray(
        (np.arange(T) // max(T // F, 1)).clip(0, F - 1).astype(np.int32)
    )
    return q, k, v, mask, fb, fids


def _compare(name, kern_fn, ref_fn, diff_args, static, gproj, results, thr_f, thr_g):
    """fwd + grad rel-maxdiff between kern_fn and ref_fn (same signature:
    positional diff_args then static kwargs), gradients wrt diff_args."""

    def loss(fn):
        def f(*a):
            return jnp.sum(fn(*a, **static) * gproj)

        return f

    out_k = jax.jit(lambda *a: kern_fn(*a, **static))(*diff_args)
    out_r = jax.jit(lambda *a: ref_fn(*a, **static))(*diff_args)
    fwd = _rel(out_k, out_r)
    argn = tuple(range(len(diff_args)))
    gk = jax.jit(jax.grad(loss(kern_fn), argnums=argn))(*diff_args)
    gr = jax.jit(jax.grad(loss(ref_fn), argnums=argn))(*diff_args)
    grads = max(_rel(a, b) for a, b in zip(gk, gr))
    ok = fwd <= thr_f and grads <= thr_g
    results[name] = {"fwd": round(fwd, 9), "grads": round(grads, 9), "ok": ok}
    print(f"[verify_kernels] {name}: fwd={fwd:.3e} grads={grads:.3e} ok={ok}",
          file=sys.stderr, flush=True)
    # free HBM between heavyweight checks (the tunnel chip has 16 GB)
    del out_k, out_r, gk, gr


def run(fast: bool = False, precision: str | None = None) -> dict:
    from vog_tpu.kernels.attention import flash_attention
    from vog_tpu.kernels.grounding_head import fused_grounding_head
    from vog_tpu.kernels.mm_attention import mm_shared_qk_attention

    precision = precision or os.environ.get("VERIFY_PRECISION", "highest")
    jax.config.update("jax_default_matmul_precision", precision)
    on_tpu = jax.default_backend() == "tpu"
    # thresholds: fp32-highest keeps both paths in fp32 accumulate — only
    # reduction-order noise; 'default' runs bf16 MXU passes on both sides
    # but XLA may fuse/rescale differently, so looser
    thr_f, thr_g = (5e-4, 5e-3) if precision == "highest" else (2e-2, 5e-2)
    H, dh, A, D, F = 4, 128, 5, 512, 40
    if fast:
        shapes = {"gt5": dict(B=4, T=200), "p100": dict(B=1, T=2048)}
    else:
        shapes = {"gt5": dict(B=16, T=200), "p100": dict(B=2, T=4000)}

    results: dict = {}
    rng = np.random.default_rng(7)
    for tag, s in shapes.items():
        B, T = s["B"], s["T"]
        q, k, v, mask, fb, fids = _attn_inputs(11, B, H, T, dh, F)
        gp = jnp.asarray(rng.normal(size=(B, H, T, dh)).astype(np.float32))
        _compare(
            f"flash_{tag}",
            lambda q, k, v, fb, *, mask, fids: flash_attention(
                q, k, v, mask, fb, fids, interpret=not on_tpu
            ),
            lambda q, k, v, fb, *, mask, fids: xla_flash_ref(q, k, v, mask, fb, fids),
            (q, k, v, fb),
            dict(mask=mask, fids=fids),
            gp,
            results,
            thr_f,
            thr_g,
        )

        # mm kernel: P100 runs at smaller batch in production (B=2); reuse
        # the same tensors as qm/km/vm and add per-arg log-domain key
        # weights cn (<= 0, as the model passes them)
        e = jnp.asarray(
            rng.uniform(-3.0, 0.0, (B, H, A, T)).astype(np.float32)
        )
        gpa = jnp.asarray(rng.normal(size=(B, H, A, T, dh)).astype(np.float32))
        _compare(
            f"mm_{tag}",
            lambda qm, km, vm, e, fb, *, mask, fids: mm_shared_qk_attention(
                qm, km, vm, e, mask, fb, fids, interpret=not on_tpu
            ),
            lambda qm, km, vm, e, fb, *, mask, fids: xla_mm_ref(
                qm, km, vm, e, mask, fb, fids
            ),
            (q, k, v, e, fb),
            dict(mask=mask, fids=fids),
            gpa,
            results,
            thr_f,
            # the ratio form (numer/denom) amplifies reduction-order noise
            # through the quotient rule; measured on-chip ~1.2e-3 at highest
            thr_g if precision != "highest" else 5e-3,
        )

        # fused head at the same token counts
        r = lambda *sh: jnp.asarray(rng.normal(size=sh, scale=0.5).astype(np.float32))
        Dh = D // 2
        head_args = (
            r(B, T, D),
            r(B, A, D),
            r(B, T, D),
            r(B, A, D),
            jnp.asarray(r(D, D) / np.sqrt(D)),
            jnp.asarray(r(D, Dh) / np.sqrt(D)),
            r(Dh),
            jnp.asarray(r(Dh) / np.sqrt(Dh)),
            jnp.asarray(np.float32(0.3)),
        )
        gph = jnp.asarray(rng.normal(size=(B, A, T)).astype(np.float32))
        _compare(
            f"head_{tag}",
            functools.partial(fused_grounding_head, interpret=not on_tpu),
            xla_head_ref,
            head_args,
            {},
            gph,
            results,
            thr_f,
            thr_g,
        )

    # ---- gather kernel (kernels/gather.py): bitwise row-copy parity vs
    # jnp.take on the 3-D row-contiguous tables at the real asrl_40k row
    # widths (feats W=102400, seg W=30720), every storage dtype.  This is
    # the kernel that shipped broken in round 4 precisely because it had
    # no gate entry (VERDICT r4 weak #3) — policy now: every kernel in
    # vog_tpu/kernels/ has a check here (tests/test_kernel_gate.py
    # enforces by import).
    from vog_tpu.kernels.gather import gather_rows

    # parity is bitwise (row copies), so N is irrelevant — only the REAL
    # asrl_40k row widths matter (feats 102400 / seg 30720); tables are
    # generated on-device (host-side normals of this size page-fault for
    # minutes on the 1-core host)
    Ng = 256 if fast else 2048
    # fast widths keep K = W/128 a multiple of the dtype's sublane tile
    # (kernels/gather.py guard) so the Pallas path actually runs
    fast_w = {"bfloat16": 4096, "float32": 2048, "int8": 8192}
    for dt, W in (("bfloat16", 102400), ("float32", 30720), ("int8", 102400)):
        if fast:
            W = fast_w[dt]
        key = jax.random.PRNGKey(hash(dt) % 2**31)
        if dt == "int8":
            t3 = jax.random.randint(
                key, (Ng, W // 128, 128), -127, 128, jnp.int32
            ).astype(jnp.int8)
        else:
            t3 = jax.random.normal(key, (Ng, W // 128, 128), dt)
        rows_g = jnp.asarray(
            rng.integers(0, Ng, (16, 4)).astype(np.int32)
        )
        got = jax.device_get(gather_rows(t3, rows_g, interpret=not on_tpu))
        want = jax.device_get(jnp.take(t3, rows_g, axis=0))
        exact = bool(np.array_equal(got, want))
        results[f"gather_{dt}"] = {"fwd": 0.0 if exact else 1.0,
                                   "grads": 0.0, "ok": exact}
        print(f"[verify_kernels] gather_{dt}: bitwise={exact}",
              file=sys.stderr, flush=True)
        del t3, got, want

    # ---- ring attention (kernels/ring_attention.py): shard_map+collective
    # path, not Pallas — single-chip entry checks it lowers/executes and
    # matches the dense math on a 1-device mesh (n=1 ring); multi-device
    # parity is tests/test_ring_attention.py on the virtual 8-dev mesh.
    from jax.sharding import Mesh

    from vog_tpu.kernels.ring_attention import ring_attention

    B, T = (4, 200) if fast else (16, 200)
    q, k, v, mask, fb, fids = _attn_inputs(13, B, H, T, dh, F)
    mesh1 = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("model",))
    got = jax.jit(
        lambda q, k, v, m, fb, fi: ring_attention(q, k, v, m, fb, fi, mesh1)
    )(q, k, v, mask, fb, fids)
    want = jax.jit(xla_flash_ref)(q, k, v, mask, fb, fids)
    rel = _rel(got, want)
    results["ring_gt5"] = {"fwd": round(rel, 9), "grads": 0.0,
                           "ok": rel <= thr_f}
    print(f"[verify_kernels] ring_gt5: fwd={rel:.3e} ok={rel <= thr_f}",
          file=sys.stderr, flush=True)

    ok = all(r["ok"] for r in results.values())
    return {
        "ok": ok,
        "backend": jax.default_backend(),
        "mosaic": on_tpu,
        "precision": precision,
        "fast": fast,
        "thresholds": {"fwd": thr_f, "grads": thr_g},
        "checks": results,
    }


def main() -> None:
    out = run(fast=os.environ.get("VERIFY_FAST") == "1")
    print(json.dumps(out))
    sys.exit(0 if out["ok"] else 1)


if __name__ == "__main__":
    main()
