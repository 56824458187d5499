"""Packed feature store: h5 -> flat mmap pack + C++ threaded gather.

Host-IO replacement for per-batch h5 reads (SURVEY §3.3 hot loop; §7 hard
part #5 "Input bandwidth": the real P100 fc6 table is ~100+GB and h5py
reads through the GIL starve the TPU).  Layout:

  featpack.bin    all arrays back-to-back, little-endian float32
  featpack.json   {"entries": {vid_seg: {"feats": [offset, shape],
                                "boxes": [...], "scores": [...],
                                "seg": [...]}}}

``PackedFeatureStore`` is API-compatible with
``vog_tpu.data.dataset.FeatureStore`` (get / dims) so the Dataset is
agnostic; ``FeatureStore`` auto-upgrades when a pack is present.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List

import numpy as np


def build_featpack(data_dir: str | Path) -> Path:
    """One-shot conversion: roi_feats.h5 + seg_feats/*.npy -> pack files."""
    import h5py

    data_dir = Path(data_dir)
    bin_path = data_dir / "featpack.bin"
    idx_path = data_dir / "featpack.json"
    entries: Dict[str, Dict[str, List]] = {}
    offset = 0
    with h5py.File(data_dir / "roi_feats.h5", "r") as h5, open(bin_path, "wb") as out:

        def emit(arr: np.ndarray) -> List:
            nonlocal offset
            arr = np.ascontiguousarray(arr, dtype=np.float32)
            out.write(arr.tobytes())
            rec = [offset, list(arr.shape)]
            offset += arr.nbytes
            return rec

        for seg in h5.keys():
            entries[seg] = {
                "feats": emit(np.asarray(h5[seg]["feats"])),
                "boxes": emit(np.asarray(h5[seg]["boxes"])),
                "scores": emit(np.asarray(h5[seg]["scores"])),
                "seg": emit(np.load(data_dir / "seg_feats" / f"{seg}.npy")),
            }
    with open(idx_path, "w") as f:
        json.dump({"entries": entries}, f)
    return bin_path


class PackedFeatureStore:
    """mmap + C++ threaded gather; drop-in for FeatureStore."""

    FIELDS = ("feats", "boxes", "scores", "seg")

    def __init__(self, data_dir: str | Path, nthreads: int = 8):
        from vog_tpu.native import load_featpack

        self.data_dir = Path(data_dir)
        self._lib = load_featpack()
        self._handle = self._lib.fp_open(
            str(self.data_dir / "featpack.bin").encode()
        )
        if not self._handle:
            raise FileNotFoundError(self.data_dir / "featpack.bin")
        with open(self.data_dir / "featpack.json") as f:
            self.entries = json.load(f)["entries"]
        with open(self.data_dir / "vid_dims.json") as f:
            self.vid_dims = json.load(f)
        self.nthreads = nthreads

    def __del__(self):  # pragma: no cover - interpreter teardown
        try:
            if getattr(self, "_handle", None):
                self._lib.fp_close(self._handle)
                self._handle = None
        except Exception:
            pass

    def dims(self, vid_seg: str):
        w, h = self.vid_dims[vid_seg]
        return float(w), float(h)

    def videos(self) -> List[str]:
        return list(self.entries.keys())

    def gather_many(self, vid_segs: List[str], fields=None):
        """Fetch the given fields (default: all) for many segments in ONE
        threaded C++ call.  Returns a list of per-segment field tuples."""
        import ctypes

        fields = fields or self.FIELDS
        recs = []
        src, size, dst = [], [], []
        total = 0
        for seg in vid_segs:
            e = self.entries[seg]
            shapes = []
            for f in fields:
                off, shape = e[f]
                nbytes = int(np.prod(shape)) * 4
                src.append(off)
                size.append(nbytes)
                dst.append(total)
                shapes.append((total, shape))
                total += nbytes
            recs.append(shapes)
        buf = np.empty(total, np.uint8)
        n = len(src)
        arr = lambda xs: (ctypes.c_uint64 * n)(*xs)
        rc = self._lib.fp_gather(
            self._handle,
            arr(src),
            arr(size),
            arr(dst),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n,
            self.nthreads,
        )
        if rc != 0:
            raise RuntimeError("featpack gather out of bounds")
        out = []
        for shapes in recs:
            fields = tuple(
                np.frombuffer(
                    buf, np.float32, count=int(np.prod(shape)), offset=off
                ).reshape(shape)
                for off, shape in shapes
            )
            out.append(fields)
        return out

    def get(self, vid_seg: str):
        return self.gather_many([vid_seg])[0]

    def get_meta(self, vid_seg: str):
        """Small fields only: (boxes_abs (F,P,4), scores (F,P)) — used when
        the big feats/seg tables are device-resident."""
        return self.gather_many([vid_seg], fields=("boxes", "scores"))[0]

    def get_feats(self, vid_seg: str):
        """Big fields only: (feats (F,P,D), seg (F,Dv))."""
        return self.gather_many([vid_seg], fields=("feats", "seg"))[0]
