"""Device-resident feature tables: preload the feature store to HBM once.

Why (TPU-first, SURVEY §7 hard part #5): per-batch feature transfer is the
real-data bottleneck — a GT5-SPAT batch carries ~34 MB of fc6/TSN floats,
which costs ~330 ms through this environment's remote-TPU tunnel (measured,
BASELINE.md §4) and real PCIe bandwidth + host RAM churn on any machine.
The reference re-reads features from h5 on every batch (SURVEY §3.3).

Here the whole table uploads ONCE: feats (N, F*P*prop_dim/128, 128) and
seg (N, F*seg_dim/128, 128) row-contiguous device arrays (see
DeviceFeatureTables for the layout history), replicated over the mesh;
batches then carry
only ``vid_rows (B, V) int32`` and the gather runs inside the jitted step
(XLA dynamic-gather from HBM), so steady-state H2D is a few hundred KB of
language/targets/boxes per batch.

Sizing: full real ASRL GT5 is ~15k segments x 10 x 5 x 2048 x 4 B ≈ 6 GB —
fits one v5e's 16 GB HBM next to the model.  The P100 table (~100 GB) does
not fit one chip — there the table **shards its rows over the mesh's
'data' axis** and the in-step gather becomes a collective
(``sharded_gather_from_tables``): each device gathers the rows it owns
for the *global* batch (masked to zero elsewhere) and a
``lax.psum_scatter`` over the batch dimension both sums the per-owner
contributions and hands every device exactly its local batch block — one
array-sized pass over ICI, no all-gather of the table, no host round-trip.
A 100 GB P100 table fits a 16-chip slice at ~6.3 GB/chip.

Opt-in via ``ds.device_store`` = auto | on | off (auto = on when the table
fits the per-chip budget, replicated on one chip or row-sharded on a
multi-chip 'data' axis).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from vog_tpu.config import Cfg

# conservative per-chip budget for the tables: leave room for params,
# optimizer state, and activations on a 16 GB v5e
DEVICE_STORE_BUDGET_BYTES = 8 * 1024**3


def store_elem_bytes(cfg: Cfg) -> int:
    """Bytes per table element under the configured storage dtype."""
    if cfg.misc.int8_feats:
        return 1
    return 2 if cfg.misc.half_feats else 4


def table_bytes(cfg: Cfg, n_videos: int) -> int:
    ds = cfg.ds
    per_vid = ds.num_frms * (ds.num_prop_per_frm * ds.prop_dim + ds.seg_dim)
    return n_videos * per_vid * store_elem_bytes(cfg)


def fits_device_store(cfg: Cfg, n_videos: int, n_data_shards: int = 1) -> bool:
    """Does the table fit the per-chip budget?  With ``n_data_shards`` > 1
    the rows shard over the 'data' mesh axis, so each chip holds 1/n."""
    need = table_bytes(cfg, n_videos)
    return need <= DEVICE_STORE_BUDGET_BYTES * max(n_data_shards, 1)


def _table_shape(n: int, width: int) -> tuple:
    """Feature tables store as 3-D ``(N, width//128, 128)`` whenever the
    row width is lane-aligned, else flat 2-D ``(N, width)``.

    Why 3-D (measured on-chip, round 5): a 2-D (N, W) array's tiled TPU
    layout packs 8 *table rows* per (8, 128) tile, so gathering one row
    touches tiles it shares with 7 neighbours and XLA's gather lowering
    degrades with N — the same production step measured 7.0 -> 15.4
    ms/step as the store grew 1.6k -> 15k videos (BASELINE §Round-4).
    In the 3-D form the (8, 128) tiles live in the row's own
    (W//128, 128) minor dims, every row is a self-contained tile run,
    and ``jnp.take`` is bytes-gathered-bound: the same 15k-row bf16
    gather drops ~9.8 ms -> ~0.1 ms (tmp/gather_proto3 on the v5e).
    4-D (N,F,P,D) was rejected in round 3 for forcing a full-table
    relayout copy into the step; 3-D keeps the default (0,1,2) layout.
    """
    if width % 128 == 0:
        return (n, width // 128, 128)
    return (n, width)


def _pack_rows(local: Dict[str, np.ndarray], dtype, int8: bool) -> Dict[str, np.ndarray]:
    """Host (rows, ...) arrays -> the packed arrays to upload (3-D
    row-contiguous when lane-aligned — see ``_table_shape``).

    int8 mode quantizes per trailing vector (one symmetric scale per
    proposal feature / per segment frame): q = round(x / s), s =
    maxabs/127 — relative error ≲1% on fc6-like activations, 4x less
    HBM than f32.  Emits a ``{k}_scale`` (rows, n_vectors) f32 array next
    to each int8 table; the in-step gather dequantizes.
    """
    out = {}
    for k, v in local.items():
        shape = _table_shape(v.shape[0], int(np.prod(v.shape[1:])))
        if int8:
            s = np.max(np.abs(v), axis=-1) / 127.0
            s = np.where(s == 0, 1.0, s).astype(np.float32)
            q = np.clip(np.round(v / s[..., None]), -127, 127).astype(np.int8)
            out[k] = q.reshape(shape)
            out[k + "_scale"] = s.reshape(s.shape[0], -1)
        else:
            out[k] = v.reshape(shape).astype(dtype)
    return out


# streaming-build chunk size: bounds the host staging buffer (and thus the
# host's first-touch cost) while keeping device_put dispatches few
_STREAM_CHUNK_BYTES = 64 << 20


def _stream_build_tables(
    vids, store, shapes: Dict[str, tuple], dtype, int8: bool, n: int, sharding
) -> Dict[str, np.ndarray]:
    """Build the packed device tables by STREAMING row chunks to the device.

    Why not build-then-upload (measured on this host, docs/ROUND3_NOTES):
    the bulk path first-touches ~3 full copies of the table in host RAM
    (f32 staging -> packed cast -> transfer) and large fresh allocations
    fault in at ~5-10 MB/s on memory-ballooned VMs — a 1.6 GB table cost
    ~15 min of pure page faults.  Here the only big host buffer is ONE
    reused ~64 MB staging chunk: each chunk is packed (cast / per-vector
    int8 quantization) into the staging, device_put, and folded into the
    device-resident table with a DONATED ``lax.dynamic_update_slice`` —
    in-place in HBM, peak device memory = table + one chunk.  Numerically
    identical to ``_pack_rows`` (same casts, same scales).

    ``vids`` may be shorter than ``n`` (sharded padding): missing rows
    stay zero.  Returns the table dict (+ ``{k}_scale`` rows for int8).
    """
    import jax
    import jax.numpy as jnp
    from functools import partial

    np_dt = np.dtype(np.int8) if int8 else np.dtype(dtype)
    widths = {k: int(np.prod(s)) for k, s in shapes.items()}
    chunk = max(1, _STREAM_CHUNK_BYTES // (widths["feats"] * np_dt.itemsize))

    def dev_zeros(shape, dt):
        f = jax.jit(partial(jnp.zeros, shape, dt), out_shardings=sharding)
        return f()

    def updater(ndim):
        zeros = (jnp.int32(0),) * (ndim - 1)
        return jax.jit(
            lambda t, c, i: jax.lax.dynamic_update_slice(t, c, (i, *zeros)),
            donate_argnums=(0,),
            out_shardings=sharding,
        )

    tshape = {k: _table_shape(n, w) for k, w in widths.items()}
    tables = {k: dev_zeros(s, np_dt) for k, s in tshape.items()}
    upd = {k: updater(len(tshape[k])) for k in widths}
    scales = (
        {k: np.zeros((n, int(np.prod(s[:-1]))), np.float32) for k, s in shapes.items()}
        if int8
        else {}
    )
    stag = {k: np.empty((chunk, w), np_dt) for k, w in widths.items()}
    tmp = {k: np.zeros(s, np.float32) for k, s in shapes.items()}

    F, P = shapes["feats"][0], shapes["feats"][1]
    for i0 in range(0, n, chunk):
        m = min(chunk, n - i0)
        for j in range(m):
            vi = i0 + j
            if vi < len(vids):
                fv, _, _, sv = store.get(vids[vi])
                fi, pi = min(fv.shape[0], F), min(fv.shape[1], P)
                tmp["feats"][:] = 0
                tmp["feats"][:fi, :pi] = fv[:fi, :pi]
                tmp["seg"][:] = 0
                tmp["seg"][: min(sv.shape[0], F)] = sv[:F]
            else:  # padding row (sharded equal-size rounding)
                tmp["feats"][:] = 0
                tmp["seg"][:] = 0
            for k in widths:
                v = tmp[k]
                if int8:
                    s = np.max(np.abs(v), axis=-1) / 127.0
                    s = np.where(s == 0, 1.0, s).astype(np.float32)
                    scales[k][i0 + j] = s.reshape(-1)
                    stag[k][j] = (
                        np.clip(np.round(v / s[..., None]), -127, 127)
                        .astype(np.int8)
                        .reshape(-1)
                    )
                else:
                    # assignment casts f32 -> dtype (same rounding as astype)
                    stag[k][j] = v.reshape(-1)
        for k in widths:
            # row-major reshape to the table's 3-D form is a view (no copy)
            cdev = jax.device_put(
                stag[k][:m].reshape((m, *tshape[k][1:])), sharding
            )
            tables[k] = upd[k](tables[k], cdev, jnp.int32(i0))
    for k, sc in scales.items():
        tables[k + "_scale"] = jax.device_put(sc, sharding)
    return tables


class DeviceFeatureTables:
    """Builds (and uploads) the packed per-video feature tables.

    ``rows`` maps vid_seg -> row index; ``tables`` is the device pytree
    {"feats": (N, F*P*D/128, 128), "seg": (N, F*Dv/128, 128)} — replicated
    over the mesh, or with ``shard=True`` row-sharded over the mesh's
    'data' axis (rows padded to a multiple of the axis size; gather then
    goes through ``sharded_gather_from_tables``).

    Layout history (all measured on-chip): the natural 4-D (N,F,P,D)
    table made XLA insert a RELAYOUT COPY OF THE ENTIRE TABLE into the
    step (round 3 — a 7.5 GB table OOMed a 16 GB chip); the round-3 flat
    2-D (N, W) fix removed the copy but its (8, 128) tiles interleave 8
    *table rows*, so the gather degrades with N (7.0 -> 15.4 ms/step at
    1.6k -> 15k videos, BASELINE §Round-4).  The 3-D row-contiguous form
    (``_table_shape``) keeps the default layout AND makes every row a
    self-contained tile run — gather cost tracks only the bytes gathered
    (~0.1 ms at GT5 B=16 against a 15k-row bf16 table).
    """

    def __init__(
        self,
        cfg: Cfg,
        store,
        mesh=None,
        half: bool = False,
        shard: bool = False,
        int8: bool = False,
    ):
        import jax

        ds = cfg.ds
        F, P = ds.num_frms, ds.num_prop_per_frm
        vids: List[str] = store.videos()
        self.rows: Dict[str, int] = {v: i for i, v in enumerate(vids)}
        n = len(vids)
        self.sharded = bool(shard and mesh is not None and mesh.shape["data"] > 1)
        self.int8 = bool(int8)
        dtype = jax.numpy.bfloat16 if half else jax.numpy.float32
        shapes = {
            "feats": (F, P, ds.prop_dim),
            "seg": (F, ds.seg_dim),
        }

        if self.sharded:
            from jax.sharding import (
                NamedSharding,
                PartitionSpec,
                SingleDeviceSharding,
            )

            nd = mesh.shape["data"]
            n = ((n + nd - 1) // nd) * nd  # equal-sized row shards
            sharding = NamedSharding(mesh, PartitionSpec("data"))
            # build per-addressable-shard: stream ONLY locally-owned rows
            # to each device (at 100 GB scale each host touches just its
            # slice of the dataset; the 'model' axis replicates a row
            # range across several devices — stream it once, reuse)
            idx_map = sharding.addressable_devices_indices_map(
                _table_shape(n, int(np.prod(shapes["feats"])))
            )
            built: Dict[tuple, Dict] = {}
            dev_for: Dict[object, tuple] = {}
            for dev, idx in idx_map.items():
                sl = idx[0]
                key = (sl.start, sl.stop)
                dev_for[dev] = key
                if key not in built:
                    built[key] = _stream_build_tables(
                        vids[sl.start : sl.stop],
                        store,
                        shapes,
                        dtype,
                        self.int8,
                        sl.stop - sl.start,
                        SingleDeviceSharding(dev),
                    )
            self.tables = {}
            for k in next(iter(built.values())):
                per_dev = []
                for dev, idx in idx_map.items():
                    v = built[dev_for[dev]][k]
                    # each entry must live on ITS device (replicated model
                    # axis shares a range; re-put pins the right device)
                    per_dev.append(jax.device_put(v, SingleDeviceSharding(dev)))
                self.tables[k] = jax.make_array_from_single_device_arrays(
                    (n, *per_dev[0].shape[1:]), sharding, per_dev
                )
            return

        if mesh is not None and not mesh.empty:
            from jax.sharding import NamedSharding, PartitionSpec

            sharding = NamedSharding(mesh, PartitionSpec())  # replicated
        else:
            sharding = None
        self.tables = _stream_build_tables(
            vids, store, shapes, dtype, self.int8, n, sharding
        )


# feats-table size past which gather_from_tables "auto" prefers the
# manual-DMA kernel over XLA's gather (see the docstring below; the
# failure was observed at 11.5 GB, the 7.5 GB-class bf16 P100 tables of
# earlier rounds ran fine — 8 GB splits the two observations)
_GATHER_KERNEL_BYTES = 8 * 1024**3


def _row_width(table) -> int:
    """Logical row width of a packed table (2-D flat or 3-D row-tiled)."""
    w = 1
    for d in table.shape[1:]:
        w *= d
    return w


def gather_from_tables(batch: Dict, tables: Dict, kernel: str = "auto") -> Dict:
    """Inside-jit: resolve vid_rows against the resident row-contiguous
    tables so the downstream path sees the canonical props/seg_feats batch
    schema.  Clip-view dims are recovered statically from prop_mask + row
    width.

    ``kernel``: "off" forces ``jnp.take``; "on" forces the Pallas
    manual-DMA kernel (kernels/gather.py, single-device meshes only —
    GSPMD cannot partition the custom call); "auto" (production
    default) is ``jnp.take`` against the 3-D row-contiguous layout
    (bytes-gathered-bound, GSPMD-partitionable) for ordinary tables,
    but switches to the DMA kernel once the feats table passes
    ``_GATHER_KERNEL_BYTES``: at an 11.5 GB int8 P100 table, XLA's
    generic gather lowering put FIVE 1.35 GB remat-fusion clones of
    table slices live simultaneously and OOMed the 16 GB chip at
    compile, while the DMA kernel (whose cost is only the bytes
    gathered and whose footprint is the output) ran the same step at
    39.9 ms e2e (round-5, BASELINE §P100-at-scale)."""
    import jax.numpy as jnp

    rows = batch["vid_rows"]  # (B, V) int32
    B, V, F, P = batch["prop_mask"].shape
    D = _row_width(tables["feats"]) // (F * P)
    Dv = _row_width(tables["seg"]) // F
    out = {k: v for k, v in batch.items() if k != "vid_rows"}
    if kernel == "on" or (
        kernel == "auto" and tables["feats"].nbytes >= _GATHER_KERNEL_BYTES
    ):
        # gather_rows itself falls back to jnp.take off-TPU and for
        # layouts the DMA slice rules reject, so "auto" stays safe
        from vog_tpu.kernels.gather import gather_rows as _take
    else:
        _take = lambda t, r: jnp.take(t, r, axis=0)
    props = _take(tables["feats"], rows).reshape(B, V, F, P, D).astype(jnp.float32)
    seg = _take(tables["seg"], rows).reshape(B, V, F, Dv).astype(jnp.float32)
    if "feats_scale" in tables:  # int8 tables: dequantize per vector
        fs = jnp.take(tables["feats_scale"], rows, axis=0).reshape(B, V, F, P, 1)
        ss = jnp.take(tables["seg_scale"], rows, axis=0).reshape(B, V, F, 1)
        props = props * fs
        seg = seg * ss
    out["props"] = props
    out["seg_feats"] = seg
    return out


def sharded_gather_from_tables(batch: Dict, tables: Dict, mesh) -> Dict:
    """Inside-jit collective gather against row-sharded tables.

    Tables are PartitionSpec('data') on rows; the batch is sharded on its
    leading dim over the same axis.  Per device: gather the *global* (B,V)
    rows from the local row shard, zero the rows another device owns, then
    ``psum_scatter`` over the batch dim — the sum reconstructs every row
    (exactly one owner is non-zero) while the scatter leaves each device
    holding only its own batch block.  Cost: one (B,V,F,P,D)-sized
    reduce-scatter over ICI; the table itself never moves.
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    rows = batch["vid_rows"]  # (B, V) int32 — global batch
    B, V, F, Pn = batch["prop_mask"].shape
    D = _row_width(tables["feats"]) // (F * Pn)
    Dv = _row_width(tables["seg"]) // F
    out = {k: v for k, v in batch.items() if k != "vid_rows"}
    int8 = "feats_scale" in tables

    def local(feats_loc, seg_loc, fs_loc, ss_loc, rows_full):
        nloc = feats_loc.shape[0]
        start = jax.lax.axis_index("data") * nloc
        loc = jnp.clip(rows_full - start, 0, nloc - 1)
        mine = (rows_full >= start) & (rows_full < start + nloc)
        # flatten the gathered rows (3-D tables -> flat rows; cheap, it's
        # batch-sized) so masking/scatter below is layout-agnostic
        f = jnp.take(feats_loc, loc, axis=0).reshape(B, V, -1)  # (B,V,F*P*D)
        s = jnp.take(seg_loc, loc, axis=0).reshape(B, V, -1)  # (B,V,F*Dv)
        if int8:  # dequantize locally; the scatter then carries f32
            fs = jnp.take(fs_loc, loc, axis=0)  # (B, V, F*P)
            ss = jnp.take(ss_loc, loc, axis=0)  # (B, V, F)
            f = (
                f.astype(jnp.float32).reshape(*f.shape[:-1], F * Pn, D)
                * fs[..., None]
            ).reshape(f.shape)
            s = (
                s.astype(jnp.float32).reshape(*s.shape[:-1], F, Dv)
                * ss[..., None]
            ).reshape(s.shape)
        f = jnp.where(mine[..., None], f, 0)
        s = jnp.where(mine[..., None], s, 0)
        f = jax.lax.psum_scatter(f, "data", scatter_dimension=0, tiled=True)
        s = jax.lax.psum_scatter(s, "data", scatter_dimension=0, tiled=True)
        return f, s

    scales = (
        (tables["feats_scale"], tables["seg_scale"])
        if int8
        else (tables["feats"][:, :0], tables["seg"][:, :0])  # unused dummies
    )
    props, seg = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data"), P()),
        out_specs=(P("data"), P("data")),
    )(tables["feats"], tables["seg"], scales[0], scales[1], rows)
    out["props"] = props.reshape(B, V, F, Pn, D).astype(jnp.float32)
    out["seg_feats"] = seg.reshape(B, V, F, Dv).astype(jnp.float32)
    return out
