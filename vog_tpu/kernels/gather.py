"""Pallas row-gather: DMA exactly the requested rows of a resident table.

History (round 4 -> 5, all measured on the v5e): the round-4 version of
this kernel used a BlockSpec ``(1, bw)`` over the then-2-D ``(N, W)``
table — which Mosaic rejects at lowering (sublane dim 1 is neither
divisible by 8 nor equal to N), so it never ran on hardware.  The round-5
root-cause found the 2-D table *layout* — not XLA's gather — was the real
problem: a 2-D array's (8, 128) tiles interleave 8 table rows, so any
single-row access touches neighbour rows and the gather cost grows with
N.  The store now packs tables 3-D ``(N, W//128, 128)``
(data/device_store.py §_table_shape) where every row is a self-contained
tile run; against that layout plain ``jnp.take`` is bytes-gathered-bound
(~0.1 ms for 64 rows x 200 KB from a 3 GB table) and is the production
default (``misc.gather_kernel=auto``).

This kernel remains as the explicit manual-DMA variant
(``misc.gather_kernel=on``): the row indices are SCALAR-PREFETCHED into
SMEM, the table stays UNBLOCKED in HBM (``pl.ANY`` — no BlockSpec, so no
tiling constraint and no relayout), and the single kernel instance issues
one async HBM->HBM copy per requested row through a small semaphore ring
(at most ``_INFLIGHT`` outstanding).  Its cost is within noise of the
3-D ``jnp.take`` on-chip (tmp/gather_proto3: 0.6–1.0 ms, launch-overhead
bound at these sizes).  Use cases: pinning gather cost independent of
XLA's gather heuristics, and as the template for fusing a dequant/cast
into the copy.  Single-device meshes only — GSPMD cannot partition a
bare ``pallas_call`` (use the default take under dp/tp meshes).

Out-of-range rows clamp to [0, N-1], matching ``jnp.take``'s
``mode='clip'`` semantics, BEFORE any DMA offset is formed.

On-chip parity: tools/verify_kernels.py §gather (f32/bf16/int8 at the
real asrl_40k widths); interpret-mode parity: tests/test_gather.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# max outstanding row copies: enough to cover DMA issue latency; small
# enough that the semaphore array stays trivial
_INFLIGHT = 8


def _make_kernel(R: int):
    def kernel(rows_ref, t_ref, o_ref, sems):
        def copy(i):
            return pltpu.make_async_copy(
                t_ref.at[pl.ds(rows_ref[i], 1)],
                o_ref.at[pl.ds(i, 1)],
                sems.at[jax.lax.rem(i, _INFLIGHT)],
            )

        def body(i, _):
            # before reusing a semaphore slot, drain the copy that used it
            @pl.when(i >= _INFLIGHT)
            def _():
                copy(i - _INFLIGHT).wait()

            copy(i).start()
            return 0

        jax.lax.fori_loop(0, R, body, 0)

        def drain(i, _):
            copy(i).wait()
            return 0

        jax.lax.fori_loop(max(R - _INFLIGHT, 0), R, drain, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows(table: jnp.ndarray, rows: jnp.ndarray, interpret: bool = False):
    """``table[rows]`` for a 3-D row-contiguous ``(N, K, 128)`` table and
    int32 ``rows`` of any shape; returns ``rows.shape + (K, 128)``.
    Falls back to ``jnp.take`` for 2-D tables (non-lane-aligned fixture
    widths), off-TPU (the DMA kernel is Mosaic-only), and when the
    row's sublane count K is not a multiple of the dtype's sublane tile
    (f32 8 / bf16 16 / int8 32): Mosaic requires DMA slices along tiled
    dims to be tile-aligned, even full-dim ones (measured: K=50 bf16
    rejected at lowering).  Real asrl dims pass (feats K=800, seg K=240
    — except int8 seg, which takes the fallback)."""
    if table.ndim != 3 or (jax.default_backend() != "tpu" and not interpret):
        return jnp.take(table, rows, axis=0)
    N, K, L = table.shape
    sublane_tile = 8 * 4 // table.dtype.itemsize
    if K % sublane_tile != 0:
        return jnp.take(table, rows, axis=0)
    flat = jnp.clip(rows.reshape(-1).astype(jnp.int32), 0, N - 1)
    R = flat.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_INFLIGHT,))],
    )
    out = pl.pallas_call(
        _make_kernel(R),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, K, L), table.dtype),
        interpret=interpret,
    )(flat, table)
    return out.reshape(*rows.shape, K, L)
