"""ctypes bridge to the native graph builder (``csrc/graph_builder.cpp``).

The analog of the reference's ctypes bridge (``sgl/operators/utils.py:10-74``)
but for host-side graph *construction* — on TPU the SpMM itself is Pallas,
so the native layer accelerates what stays on the host: edge sorting,
degrees, normalization for billion-edge graphs.  Compiles on first use with
g++ -O3 -fopenmp; every entry point has a numpy fallback so the framework
works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np
import numpy.ctypeslib as ctl

_CSRC_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc")
_SO_PATH = os.path.join(_CSRC_DIR, "libsglgraph.so")
_SRC_PATHS = [
    os.path.join(_CSRC_DIR, "graph_builder.cpp"),
    os.path.join(_CSRC_DIR, "csv_loader.cpp"),
]

_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-fopenmp", "-pthread",
                "-shared", "-fPIC", "-o", _SO_PATH, *_SRC_PATHS, "-lz",
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if not os.path.exists(_SO_PATH) or os.path.getmtime(_SO_PATH) < max(
        os.path.getmtime(p) for p in _SRC_PATHS
    ):
        if not _build():
            _lib_failed = True
            return None
    try:
        lib = ctl.load_library("libsglgraph.so", _CSRC_DIR)
    except OSError:
        _lib_failed = True
        return None
    i32 = ctl.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32 = ctl.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.sgl_sort_edges_by_dst.argtypes = [
        i32, i32, f32, ctypes.c_int64, ctypes.c_int32, i32, i32, f32,
    ]
    lib.sgl_compute_degrees.argtypes = [i32, f32, ctypes.c_int64, ctypes.c_int32, f32]
    lib.sgl_normalized_weights.argtypes = [
        i32, i32, f32, ctypes.c_int64, f32, ctypes.c_float, f32,
    ]
    lib.sgl_gather_rows.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, i32, ctypes.c_int64, ctypes.c_void_p,
    ]
    i64 = ctl.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.sgl_pack_cells_2d.argtypes = [
        i32, i32, f32, i64, i64, i64, i32, i32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        i32, i32, f32, i32,
    ]
    lib.sgl_classify_sort_cells_2d.argtypes = [
        i32, i32, f32, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, i32, ctypes.c_int32,
        i32, i32, i32, f32, i64,
    ]
    lib.sgl_csv_load.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.sgl_csv_load.restype = ctypes.c_int64
    lib.sgl_buf_free.argtypes = [ctypes.c_void_p]
    lib.sgl_buf_free.restype = None
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def sort_edges_by_dst(
    src: np.ndarray, dst: np.ndarray, val: np.ndarray, num_nodes: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Stable parallel sort of COO edges by dst (numpy lexsort fallback)."""
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    val = np.ascontiguousarray(val, np.float32)
    lib = _load()
    if lib is None:
        order = np.argsort(dst, kind="stable")
        return src[order], dst[order], val[order]
    n = src.shape[0]
    out_src = np.empty(n, np.int32)
    out_dst = np.empty(n, np.int32)
    out_val = np.empty(n, np.float32)
    lib.sgl_sort_edges_by_dst(src, dst, val, n, num_nodes, out_src, out_dst, out_val)
    return out_src, out_dst, out_val


def compute_degrees(src: np.ndarray, val: np.ndarray, num_nodes: int) -> np.ndarray:
    src = np.ascontiguousarray(src, np.int32)
    val = np.ascontiguousarray(val, np.float32)
    lib = _load()
    if lib is None:
        deg = np.zeros(num_nodes, np.float32)
        np.add.at(deg, src, val)
        return deg
    deg = np.zeros(num_nodes, np.float32)
    lib.sgl_compute_degrees(src, val, src.shape[0], num_nodes, deg)
    return deg


def normalized_weights(
    src: np.ndarray, dst: np.ndarray, val: np.ndarray, deg: np.ndarray, r: float
) -> np.ndarray:
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    val = np.ascontiguousarray(val, np.float32)
    deg = np.ascontiguousarray(deg, np.float32)
    lib = _load()
    if lib is None:
        with np.errstate(divide="ignore"):
            left = np.where(deg > 0, deg ** (r - 1.0), 0.0)
            right = np.where(deg > 0, deg ** (-r), 0.0)
        return (left[dst] * val * right[src]).astype(np.float32)
    out = np.empty(src.shape[0], np.float32)
    lib.sgl_normalized_weights(src, dst, val, src.shape[0], deg, r, out)
    return out


def gather_rows(
    x: np.ndarray, idx: np.ndarray, out: Optional[np.ndarray] = None
) -> np.ndarray:
    """``x[idx]`` as a parallel native row gather (numpy ``take`` fallback).

    The hot host-side op of the out-of-core SpMM: building each part's
    column workspace reads the full feature volume once per hop, and
    numpy's fancy indexing is single-threaded."""
    x = np.ascontiguousarray(x)
    idx = np.ascontiguousarray(idx, np.int32)
    lib = _load()
    if lib is None:
        return np.take(x, idx, axis=0, out=out)
    # the C gather is a raw memcpy per row: out-of-range indices would read
    # arbitrary memory (numpy would raise).  min/max is cheap vs the gather.
    if idx.size and (int(idx.min()) < 0 or int(idx.max()) >= x.shape[0]):
        raise IndexError(
            f"gather_rows: index out of range [0, {x.shape[0]}) "
            f"(got min {int(idx.min())}, max {int(idx.max())})"
        )
    if out is None:
        out = np.empty((idx.shape[0],) + x.shape[1:], x.dtype)
    else:
        expect = (idx.shape[0],) + x.shape[1:]
        if (out.shape != expect or out.dtype != x.dtype
                or not out.flags["C_CONTIGUOUS"]):
            raise ValueError(
                f"gather_rows: out must be C-contiguous {expect} {x.dtype} "
                f"(got {out.shape} {out.dtype}, "
                f"contiguous={out.flags['C_CONTIGUOUS']})"
            )
    row_bytes = x.nbytes // max(x.shape[0], 1)
    lib.sgl_gather_rows(
        x.ctypes.data_as(ctypes.c_void_p), row_bytes, idx, idx.shape[0],
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def build_normalized_adj_host(
    src: np.ndarray,
    dst: np.ndarray,
    val: np.ndarray,
    num_nodes: int,
    r: float = 0.5,
):
    """Full host-side normalized-adjacency build for huge graphs:
    append self loops, compute degrees, normalize, sort by dst — all in the
    native library.  Returns (src, dst, w) dst-sorted, ready for
    ``SparseAdj(..., sorted_by_dst=True)``."""
    loop = np.arange(num_nodes, dtype=np.int32)
    s = np.concatenate([np.asarray(src, np.int32), loop])
    d = np.concatenate([np.asarray(dst, np.int32), loop])
    v = np.concatenate(
        [np.asarray(val, np.float32), np.ones(num_nodes, np.float32)]
    )
    deg = compute_degrees(s, v, num_nodes)
    w = normalized_weights(s, d, v, deg, r)
    return sort_edges_by_dst(s, d, w, num_nodes)


def load_csv_native(path: str, dtype=np.float32) -> Optional[np.ndarray]:
    """Parse a headerless numeric csv / csv.gz with the native loader
    (``csrc/csv_loader.cpp``: zlib stream + OpenMP-parallel parse).

    Returns a 2-D array, or ``None`` when the native library is missing,
    the dtype is unsupported, or the file doesn't fit the strict numeric
    dialect — callers fall back to ``numpy.loadtxt``.
    """
    dtype = np.dtype(dtype)
    code = {np.dtype(np.float32): 0, np.dtype(np.int64): 1}.get(dtype)
    lib = _load()
    if lib is None or code is None:
        return None
    data = ctypes.c_void_p()
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    status = lib.sgl_csv_load(
        path.encode(), code, ctypes.byref(data), ctypes.byref(rows),
        ctypes.byref(cols),
    )
    if status != 0:
        if data.value:
            lib.sgl_buf_free(data)
        return None
    try:
        n = rows.value * cols.value
        if n == 0:
            return np.zeros((rows.value, cols.value), dtype)
        buf = ctypes.cast(
            data, ctypes.POINTER(ctypes.c_char * (n * dtype.itemsize))
        ).contents
        return np.frombuffer(buf, dtype=dtype).reshape(
            rows.value, cols.value
        ).copy()
    finally:
        lib.sgl_buf_free(data)


def pack_cells_2d(src, dst, w, cell_starts, slot_offs, ct_offs, t_lo_rows,
                  blk_base, tr, chunk, n_tiles):
    """Fill every 2-D cell's padded chunk arrays in one parallel native
    pass (see ``sgl_pack_cells_2d``).  Returns the four packed arrays as
    ONE buffer each; callers slice per-cell views via ``slot_offs`` /
    ``ct_offs``.  Returns None when the native library is unavailable —
    the caller keeps its numpy packing loop."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    w = np.ascontiguousarray(w, np.float32)
    cell_starts = np.ascontiguousarray(cell_starts, np.int64)
    slot_offs = np.ascontiguousarray(slot_offs, np.int64)
    ct_offs = np.ascontiguousarray(ct_offs, np.int64)
    t_lo_rows = np.ascontiguousarray(t_lo_rows, np.int32)
    blk_base = np.ascontiguousarray(blk_base, np.int32)
    n_cells = cell_starts.shape[0] - 1
    o_src = np.empty(int(slot_offs[-1]), np.int32)
    o_dst = np.empty(int(slot_offs[-1]), np.int32)
    o_w = np.empty(int(slot_offs[-1]), np.float32)
    o_ct = np.empty(int(ct_offs[-1]), np.int32)
    lib.sgl_pack_cells_2d(
        src, dst, w, cell_starts, slot_offs, ct_offs, t_lo_rows, blk_base,
        n_cells, tr, chunk, n_tiles, o_src, o_dst, o_w, o_ct,
    )
    return o_src, o_dst, o_w, o_ct


def classify_sort_cells_2d(src, dst, w, tr, sb, k, part_of_tile):
    """Fused per-edge 2-D cell classification + stable counting sort (see
    ``sgl_classify_sort_cells_2d``).  Returns
    ``(o_src, o_dst, o_tile, o_w, cell_counts)`` or None without the
    native library (the caller keeps its numpy passes)."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    w = np.ascontiguousarray(w, np.float32)
    part_of_tile = np.ascontiguousarray(part_of_tile, np.int32)
    n = src.shape[0]
    n_keys = (int(part_of_tile[-1]) + 1) * k if part_of_tile.size else k
    o_src = np.empty(n, np.int32)
    o_dst = np.empty(n, np.int32)
    o_tile = np.empty(n, np.int32)
    o_w = np.empty(n, np.float32)
    cell_counts = np.empty(n_keys, np.int64)
    lib.sgl_classify_sort_cells_2d(
        src, dst, w, n, tr, sb, k, part_of_tile, n_keys,
        o_src, o_dst, o_tile, o_w, cell_counts,
    )
    return o_src, o_dst, o_tile, o_w, cell_counts
