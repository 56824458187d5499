"""Pallas row-gather: DMA exactly the requested rows of a resident table.

Why (reference-scale finding, BASELINE.md §Round-4): the production step
gathers B*V rows of the HBM-resident feature table with ``jnp.take``.
The gathered bytes are table-size independent (~17 MB at GT5 B=16), yet
the measured step grew 7.0 -> 15.4 ms when the table grew 1.6k -> 15k
rows (2.0e9 elements) — XLA's generic gather lowering degrades with
operand size.  This kernel replaces it with the canonical
embedding-table pattern: the row indices are SCALAR-PREFETCHED, the
BlockSpec ``index_map`` consumes them, and the Mosaic pipeline turns the
whole thing into double-buffered HBM->VMEM->HBM row copies whose cost
depends only on the bytes gathered.

The table stays in its natural 2-D (N, W) layout (device_store.py packs
rows flat precisely so gathers touch only requested rows).  Output dtype
== table dtype; the caller casts/dequantizes exactly as with jnp.take.

Grid: (R, W // BW) — one program per (row, column-block).  BW is the
widest 128-multiple block that keeps a (1, BW) bf16/int8 tile within a
small VMEM budget; W % 128 == 0 always holds (W is F*P*prop_dim or
F*seg_dim with prop_dim/seg_dim multiples of 128 at real dims; the
helper falls back to jnp.take otherwise — tiny fixture dims).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-block byte budget: 2 blocks live (double buffering) in+out + slack
_BLOCK_BYTES = 512 * 1024


def _block_width(W: int, itemsize: int) -> int:
    """Widest 128-multiple divisor of W with block bytes <= budget."""
    cap = max(_BLOCK_BYTES // itemsize, 128)
    best = 0
    for bw in range(128, min(W, cap) + 1, 128):
        if W % bw == 0:
            best = bw
    return best


def _copy_kernel(rows_ref, t_ref, o_ref):
    del rows_ref  # consumed by the index_map, not the body
    o_ref[...] = t_ref[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows(table: jnp.ndarray, rows: jnp.ndarray, interpret: bool = False):
    """``table[rows]`` for a 2-D (N, W) table and int32 ``rows`` of any
    shape; returns rows.shape + (W,).  Falls back to jnp.take when the
    width doesn't block to 128 lanes (fixture-sized dims) or on CPU."""
    N, W = table.shape
    bw = _block_width(W, table.dtype.itemsize)
    if bw == 0 or (jax.default_backend() != "tpu" and not interpret):
        return jnp.take(table, rows, axis=0)
    flat = rows.reshape(-1).astype(jnp.int32)
    R = flat.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R, W // bw),
        in_specs=[
            pl.BlockSpec((1, bw), lambda i, j, rows_ref: (rows_ref[i], j)),
        ],
        out_specs=pl.BlockSpec((1, bw), lambda i, j, rows_ref: (i, j)),
    )
    out = pl.pallas_call(
        _copy_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, W), table.dtype),
        interpret=interpret,
    )(flat, table)
    return out.reshape(*rows.shape, W)
