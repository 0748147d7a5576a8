"""Out-of-core SpMM: graphs whose FEATURES exceed device HBM.

The reference claims "scale to graph data with billions of nodes and
edges" (``/root/reference/README.md:15-17``) — which it reaches by running
the whole precompute on host CPUs (``sgl/operators/csrc/matmul.c``) with
everything in host RAM.  The TPU-native answer keeps the *compute* on the
chip and streams the *data*: at papers100M scale (111M nodes × 128 f32 =
57 GB features, 1.8B edges ≈ 22 GB of edge arrays) neither x, y, nor the
edge list fits in a v5e's 16 GB HBM, so all three live in host RAM and
move through the chip part by part.

Layout (host, numpy — :func:`prepare_out_of_core`):

1. optional self-loop (diag) split — applied host-side, since out-of-core
   throughput is PCIe-bound, not gather-bound;
2. the same dst-sorted per-tile chunk layout as ``prepare_chunked``
   (shared helper :func:`~sgl_tpu.kernels.pallas_spmm.chunk_layout_np`);
3. BALANCED contiguous chunk-range parts (mid-tile splits allowed; every
   part has the same chunk count so all parts share ONE compiled step);
4. per part, the **column workspace**: ``cols = unique(src)`` — the only
   feature rows this part's gather touches.  Edge ``src`` indices are
   remapped to workspace positions; ``cols`` pads to the across-part max.

Execution (:func:`spmm_out_of_core`): per part, transfer the edge arrays
and the host-gathered ``x[cols]`` workspace, run one jitted
gather → weighted hi/lo bf16 messages → Pallas MXU segment-reduce step,
and overlap-add the part's output rows into the host result (consecutive
parts may share a boundary tile).  Readback is double-buffered — part
``i+1`` is dispatched before part ``i``'s host readback, so transfer and
compute overlap under JAX's async dispatch.

Device-resident at any instant: ~two parts of edges + workspaces +
message buffers — independent of graph size.  The hub split is
intentionally absent here: a dense ``(N, k)`` hub strip is itself
out-of-core at this scale, and the gather-row savings it buys optimize an
HBM pipeline that is not the bottleneck once PCIe streaming dominates.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import os
import time
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sgl_tpu.kernels.pallas_spmm import (
    CHUNK,
    TILE_R,
    _round_up,
    _segment_reduce_mxu,
    chunk_layout_np,
)
from sgl_tpu.kernels.sparse import SparseAdj

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class OocPart:
    """One part's host-side arrays, ready for transfer."""

    src: np.ndarray  # (E_b,) int32, workspace-remapped
    dst: np.ndarray  # (E_b,) int32, part-local rows
    w: np.ndarray  # (E_b,) float32
    chunk_tile: np.ndarray  # (C,) int32, part-local tiles
    cols: np.ndarray  # (S,) int32 global feature rows (padded with 0)
    row_offset: int  # global row of part-local row 0
    valid_rows: int  # real output rows (n_tiles * TILE_R)


@dataclasses.dataclass
class OutOfCoreAdj:
    """Host-resident prepared adjacency for feature-out-of-core SpMM."""

    num_nodes: int
    n_rows: int  # static per-part output rows (max tiles * TILE_R)
    parts: List[OocPart]
    diag: Optional[np.ndarray]  # (N,) f32 self-loop weights, host-applied
    # lazily-filled device copies of part edge arrays (identical every
    # hop, so re-transferring them is pure PCIe waste); bounded by
    # ``max_device_edge_bytes`` in spmm_out_of_core
    _dev_edges: dict = dataclasses.field(default_factory=dict, repr=False)
    # null-transfer measurement mode: ONE device workspace shared across
    # parts (keyed by dtype) — see spmm_out_of_core(null_transfer=True)
    _dev_ws: dict = dataclasses.field(default_factory=dict, repr=False)

    @property
    def num_parts(self) -> int:
        return len(self.parts)

    def part_edge_nbytes(self) -> int:
        p = self.parts[0]
        return int(p.src.nbytes + p.dst.nbytes + p.w.nbytes + p.chunk_tile.nbytes)


def prepare_out_of_core(
    adj,
    max_edges_per_part: int = 6 << 20,
    *,
    split_diag: bool = True,
    chunk: Optional[int] = None,
) -> OutOfCoreAdj:
    """Build the out-of-core layout from a (possibly huge) COO adjacency.

    ``adj`` is a :class:`SparseAdj` or an ``(src, dst, w, num_nodes)``
    tuple of host arrays; weights already normalized (use
    ``symmetric_normalized_weights_host`` / the native builder for huge
    graphs).  Everything here is host-side numpy — no device memory is
    touched.
    """
    if isinstance(adj, SparseAdj):
        src, dst, w, n = adj.src, adj.dst, adj.w, adj.num_nodes
    else:
        src, dst, w, n = adj
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    w = np.asarray(w, np.float32)

    keep = w != 0
    src, dst, w = src[keep], dst[keep], w[keep]

    diag = None
    if split_diag:
        loop = src == dst
        if loop.any():
            diag = np.zeros(n, np.float32)
            np.add.at(diag, dst[loop], w[loop])
            src, dst, w = src[~loop], dst[~loop], w[~loop]

    order = np.argsort(dst, kind="stable")
    src, dst, w = src[order], dst[order], w[order]

    chunk = chunk or CHUNK
    c_src, c_dst, c_w, chunk_tile = chunk_layout_np(src, dst, w, n, chunk)
    n_chunks = chunk_tile.shape[0]

    # balanced contiguous chunk ranges (all parts within one chunk of each
    # other; every part pads to the largest, so balance == zero waste)
    max_chunks = max(max_edges_per_part // chunk, 1)
    n_parts = -(-n_chunks // max_chunks)
    bounds = np.linspace(0, n_chunks, n_parts + 1).round().astype(int)
    splits = list(np.unique(bounds))
    part_chunks = int(max(np.diff(splits)))

    raw_parts = []
    for lo, hi in zip(splits[:-1], splits[1:]):
        t_lo = int(chunk_tile[lo])
        t_hi = int(chunk_tile[hi - 1]) + 1
        pad_c = part_chunks - (hi - lo)
        e_lo, e_hi = lo * chunk, hi * chunk
        last_tile = t_hi - t_lo - 1  # padding keeps chunk_tile non-decreasing
        p_src = np.concatenate([c_src[e_lo:e_hi], np.zeros(pad_c * chunk, np.int64)])
        p_dst = np.concatenate(
            [c_dst[e_lo:e_hi] - t_lo * TILE_R,
             np.full(pad_c * chunk, last_tile * TILE_R, np.int64)]
        ).astype(np.int32)
        p_w = np.concatenate([c_w[e_lo:e_hi], np.zeros(pad_c * chunk, np.float32)])
        p_ct = np.concatenate(
            [chunk_tile[lo:hi] - t_lo, np.full(pad_c, last_tile, np.int64)]
        ).astype(np.int32)
        # column workspace: the only x rows this part's gather reads
        cols, inv = np.unique(p_src, return_inverse=True)
        raw_parts.append(
            (inv.astype(np.int32), p_dst, p_w, p_ct, cols.astype(np.int32),
             t_lo * TILE_R, (t_hi - t_lo) * TILE_R)
        )

    # pad workspaces to a common size so every part runs the same compiled
    # step (padding cols point at row 0; their edges carry w == 0)
    s_max = max(p[4].shape[0] for p in raw_parts)
    s_max = _round_up(s_max, TILE_R)
    parts = []
    for p_src, p_dst, p_w, p_ct, cols, off, valid in raw_parts:
        cols = np.pad(cols, (0, s_max - cols.shape[0]))
        parts.append(OocPart(p_src, p_dst, p_w, p_ct, cols, off, valid))

    n_rows = max(p.valid_rows for p in parts)
    real_edges = int(np.count_nonzero(c_w))
    slots = part_chunks * chunk * len(parts)
    ws_rows = s_max * len(parts)
    logger.info(
        "out-of-core layout: %d parts x %d chunks (%d real edges in %d "
        "slots, %.2fx padding), workspace %d rows/part (%.2fx the unique-"
        "column total), diag %s",
        len(parts), part_chunks, real_edges, slots,
        slots / max(real_edges, 1), s_max,
        ws_rows / max(sum(p[4].shape[0] for p in raw_parts), 1),
        "split" if diag is not None else "off",
    )
    return OutOfCoreAdj(num_nodes=n, n_rows=n_rows, parts=parts, diag=diag)


@functools.partial(jax.jit, static_argnames=("n_rows", "interpret"))
def _ooc_step(src, dst, w, chunk_tile, xw, n_rows: int, interpret: bool = False):
    """One part: gather from the workspace, weighted hi/lo bf16 messages,
    Pallas MXU segment reduce.  Returns (n_rows, d) f32 partial output
    (rows past the part's valid_rows are unwritten — caller slices)."""
    d = xw.shape[1]
    d_pad = _round_up(d, 128)
    xp = xw if d_pad == d else jnp.pad(xw, ((0, 0), (0, d_pad - d)))
    single = xw.dtype == jnp.bfloat16
    msgs = jnp.take(xp, src, axis=0).astype(jnp.float32) * w[:, None]
    hi = msgs.astype(jnp.bfloat16)
    lo = None if single else (msgs - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    out = _segment_reduce_mxu(
        hi, lo, dst, chunk_tile, num_nodes=n_rows, interpret=interpret
    )
    return out[:, :d]


@dataclasses.dataclass(frozen=True)
class OocSubPart:
    """One (dst-part, src-block) cell of the 2-D layout."""

    src: np.ndarray  # (E_b,) int32, block-relative (src - block_lo)
    dst: np.ndarray  # (E_b,) int32, part-local rows
    w: np.ndarray  # (E_b,) float32
    chunk_tile: np.ndarray  # (C,) int32, part-local, non-decreasing
    tile_mask: np.ndarray  # (n_tiles,) uint8 — tiles the kernel writes
    n_edges: int  # real edges (0 => skip the dispatch entirely)


@dataclasses.dataclass
class OutOfCoreAdj2D:
    """2-D (dst-part × src-block) out-of-core layout.

    The 1-D layout's unique-column workspaces degrade on power-law graphs
    (hub sources reach every dst range, so each part's workspace covers
    ~all of x: measured 10× per-hop H2D duplication at the products
    config, and a ~N-row workspace cannot fit HBM at papers100M scale —
    docs/PERFORMANCE.md "Out-of-core").  Here the workspace of column
    block ``b`` is the CONTIGUOUS slice ``x[b·sb:(b+1)·sb]`` — no host
    gather, no index remap beyond a subtraction — and the block loop runs
    OUTSIDE the part loop, so each block uploads once per accumulator
    group: per-hop H2D = ``ceil(P/G)·N·d`` bytes, = one feature volume
    when every part's accumulator fits in HBM together.
    """

    num_nodes: int
    n_rows: int  # uniform per-part output rows
    block_rows: int  # uniform src-block workspace rows (TILE_R-padded)
    num_blocks: int
    row_offsets: List[int]  # global row of each part's local row 0
    valid_rows: List[int]  # real rows per part
    parts: List[List[OocSubPart]]  # [part][block]
    diag: Optional[np.ndarray]
    # kernel output-block height (multiple of 128).  Wider blocks divide
    # each cell's per-tile chunk round-up by tile_rows/128 at the price
    # of a (tile_rows, chunk) one-hot — the same lever as the ring
    # layout's multi-tile blocks (docs/PERFORMANCE.md round 4).
    tile_rows: int = 128
    _dev_edges: dict = dataclasses.field(default_factory=dict, repr=False)
    # null-transfer measurement mode: one shared device workspace per
    # dtype (see spmm_out_of_core_2d(null_transfer=True))
    _dev_ws: dict = dataclasses.field(default_factory=dict, repr=False)
    # device-resident execution: size-class cell stacks + diag
    # (see spmm_pallas_2d_resident; separate from _dev_edges, whose
    # (part, block) keys drive the byte-budget eviction)
    _dev_stacks: dict = dataclasses.field(default_factory=dict, repr=False)

    @property
    def num_parts(self) -> int:
        return len(self.parts)

    def subpart_edge_nbytes(self) -> int:
        """Total edge-array bytes across non-empty cells (cells are sized
        per power-of-two class, so per-cell bytes vary)."""
        return int(
            sum(
                s.src.nbytes + s.dst.nbytes + s.w.nbytes
                + s.chunk_tile.nbytes + s.tile_mask.nbytes
                for row in self.parts for s in row if s.n_edges
            )
        )


#: Gather-source operand budget (bytes).  Measured on v5e
#: (dev/exp_gather_cliff.py): the XLA row gather runs at 3.5-4.1 ns/row
#: while the source array is <=102 MB and ~12 ns/row from >=118 MB —
#: a byte threshold (f32 and bf16 alike, index-distribution-independent)
#: consistent with the operand being staged in the 128 MiB VMEM.  Block
#: workspaces are sized under this so message production stays on the
#: fast side of the cliff.
GATHER_OPERAND_BUDGET = 100 << 20


def _auto_src_blocks(n: int, feat_dim: int, feat_dtype) -> int:
    d_pad = _round_up(max(int(feat_dim), 1), 128)
    item = np.dtype(feat_dtype).itemsize
    rows = max(
        (GATHER_OPERAND_BUDGET // (d_pad * item)) // TILE_R * TILE_R, TILE_R
    )
    return max(-(-n // rows), 1)


def _cell_tile_counts(src, dst, n, k, sb, max_edges_per_part, tr,
                      tile128=None, block_of=None):
    """Per-(cell, local tile) edge counts of the 2-D layout at tile_rows
    ``tr`` — the one pass over the edge list the layout pick needs; every
    chunk candidate reuses it (the part bounds depend only on ``tr``).

    The per-edge arithmetic runs in int32 through small per-TILE lookup
    tables instead of 64-bit divisions/searchsorteds over the edge list —
    measured 5× at products scale (62M edges: 10.4 s → ~2 s/candidate),
    the difference between a free model sweep and one that dominates the
    build.  ``tile128``/``block_of`` (``dst // 128`` / ``src // sb`` as
    int32) are computed once by the caller and shared across candidates.
    """
    if tile128 is None:
        tile128 = (dst // TILE_R).astype(np.int32)
    if block_of is None:
        block_of = (src // sb).astype(np.int32)
    f = tr // TILE_R
    n_tiles_total = _round_up(n, tr) // tr
    tile_of = tile128 // f if f > 1 else tile128
    tile_counts = np.bincount(tile_of, minlength=n_tiles_total)
    cum = np.cumsum(tile_counts)
    n_parts = max(-(-int(cum[-1]) // max_edges_per_part), 1)
    targets = np.linspace(0, cum[-1], n_parts + 1)[1:-1]
    bounds = sorted(set([0] + np.searchsorted(cum, targets).tolist()
                        + [n_tiles_total]))
    n_parts = len(bounds) - 1
    n_tiles = max(hi - lo for lo, hi in zip(bounds[:-1], bounds[1:]))
    if n_parts * k * n_tiles >= 2**31:
        # the dense (cells × tiles) count matrix would overflow int32 keys
        # AND cost tens of GB — the sweep is not worth that at this scale;
        # signal the caller to fall back to the measured-best fixed shape
        return None
    # per-TILE tables: part id and (part*k)*n_tiles + local-tile offset
    tiles = np.arange(n_tiles_total)
    part_of_tile = np.searchsorted(np.asarray(bounds[1:]), tiles,
                                   side="right")
    t_lo = np.asarray(bounds[:-1])
    off_of_tile = (
        part_of_tile * k * n_tiles + (tiles - t_lo[part_of_tile])
    ).astype(np.int32)
    flat = off_of_tile[tile_of] + block_of * np.int32(n_tiles)
    return np.bincount(flat, minlength=n_parts * k * n_tiles).reshape(
        n_parts * k, n_tiles
    )


def _count_cell_slots(cnt, chunk):
    """Padded slot total from per-cell tile counts (incl. the per-cell
    power-of-two size-class rounding), mirroring the build below."""
    padded = np.where(cnt > 0, _round_up_arr(cnt, chunk), 0)
    slots = 0
    for s in padded.sum(axis=1):
        if s:
            c_cell = 1 << (max(int(s) // chunk, 1) - 1).bit_length()
            slots += c_cell * chunk
    return slots


def _pick_cell_layout(src, dst, n, k, max_edges_per_part, chunk_cands,
                      tr_cands):
    """Joint (chunk, tile_rows) pick for the 2-D cells by the measured
    per-slot model: slots × (0.33 ns per 128 output rows + 270 ns per
    chunk + regime-constant gather/kernel base).  The base term is
    layout-invariant at fixed ``src_blocks`` so it drops out of the
    ranking; the padded slot counts carry the whole layout dependence.
    One edge-list pass per tile_rows candidate; chunk candidates reuse
    the per-cell counts."""
    sb = _round_up(-(-n // k), TILE_R)
    tile128 = (dst // TILE_R).astype(np.int32)
    block_of = (src // sb).astype(np.int32)
    best = None
    for tr in tr_cands:
        cnt = _cell_tile_counts(src, dst, n, k, sb, max_edges_per_part, tr,
                                tile128=tile128, block_of=block_of)
        if cnt is None:
            # count domain too large to sweep (papers100M-and-beyond with
            # many parts × blocks × tiles): take the measured-best shape
            # from the products on-chip sweep instead of crashing or
            # allocating a tens-of-GB count matrix
            pick = (
                256 if 256 in chunk_cands else chunk_cands[0],
                512 if 512 in tr_cands else tr_cands[0],
            )
            logger.info(
                "2-D out-of-core model pick: count domain too large; "
                "falling back to chunk=%d tile_rows=%d", *pick,
            )
            return pick
        for c in chunk_cands:
            slots = _count_cell_slots(cnt, c)
            cost = slots * (5.2 + 0.33 * (tr / 128) + 270.0 / c)
            if best is None or cost < best[0]:
                best = (cost, c, tr)
    _, chunk, tile_rows = best
    logger.info(
        "2-D out-of-core model pick: chunk=%d tile_rows=%d", chunk, tile_rows
    )
    return chunk, tile_rows


def _round_up_arr(a, m):
    return ((a + m - 1) // m) * m


def _pad_cols(xw, d_pad):
    """Eager on-device column pad to the lane width (once per block
    upload; the cell jits then see ``d == d_pad`` and skip their pad)."""
    if xw.shape[1] == d_pad:
        return xw
    return jnp.pad(xw, ((0, 0), (0, d_pad - xw.shape[1])))


def prepare_out_of_core_2d(
    adj,
    max_edges_per_part: int = 6 << 20,
    src_blocks="auto",
    *,
    split_diag: bool = True,
    chunk: Optional[int] = None,
    tile_rows: Optional[int] = None,
    feat_dim: int = 128,
    feat_dtype=np.float32,
    strict: bool = False,
    cache_dir: Optional[str] = None,
) -> OutOfCoreAdj2D:
    """Build the 2-D out-of-core layout (see :class:`OutOfCoreAdj2D`).

    ``cache_dir`` enables a content-keyed on-disk cache: the ~100 s
    products-scale build (cell-key argsort + per-cell packing) is saved
    once and warm runs load it in seconds.  The key hashes the full edge
    arrays and every layout parameter.

    ``src_blocks`` sets the column-block count: block workspaces are
    ``ceil(n/src_blocks)`` rows.  The default ``"auto"`` sizes blocks to
    keep the per-cell gather operand under :data:`GATHER_OPERAND_BUDGET`
    (the measured v5e gather-rate cliff, ~3x the per-row rate above it —
    the round-5 finding that flipped the 2-D path from compute- to
    transfer-bound) using ``feat_dim``/``feat_dtype``, the width and
    dtype the features will have at :func:`spmm_out_of_core_2d` time.
    Empty (part, block) cells cost nothing — their dispatch is skipped;
    partially-empty cells skip their untouched tiles via a per-subpart
    tile mask (a ``jnp.where`` select, never arithmetic on uninitialized
    memory).

    ``strict=True`` raises at build time when the densest cell's message
    buffers could exceed HBM (default: warn) — the failure would otherwise
    surface as a RESOURCE_EXHAUSTED far from its cause.

    ``chunk`` / ``tile_rows``: ``None`` picks both jointly by the
    measured per-slot cost model over the cell slot counts (gather-rate
    regime + 0.33 ns per 128 output rows + 270 ns per chunk — the same
    constants as the ring layout's picker, with the gather term from the
    cliff measurement); explicit values pin them.  The pre-round-5
    measured sweep (k=8, above-cliff gather: chunk 512/256/128 →
    2.99/2.28/2.01 s/hop) is superseded — under the cliff the chunk
    overhead term outweighs the padding it saves, and the model prices
    that correctly."""
    if isinstance(adj, SparseAdj):
        src, dst, w, n = adj.src, adj.dst, adj.w, adj.num_nodes
    else:
        src, dst, w, n = adj
    if n >= 2**31:
        raise ValueError("node ids must fit int32")
    src = np.asarray(src, np.int32)
    dst = np.asarray(dst, np.int32)
    w = np.asarray(w, np.float32)
    keep = w != 0
    src, dst, w = src[keep], dst[keep], w[keep]

    # src_blocks resolution is cheap and deterministic — the resolved int
    # goes into the legacy cache key; only a model-picked chunk/tile_rows
    # needs the request-keyed cache (the pick itself costs bincount sweeps)
    auto_layout = chunk is None or tile_rows is None
    if src_blocks == "auto":
        src_blocks = _auto_src_blocks(n, feat_dim, feat_dtype)

    cache_path = None
    if cache_dir is not None:
        os.makedirs(cache_dir, exist_ok=True)
        cache_path = _layout_cache_path(
            cache_dir, src, dst, w, n, max_edges_per_part, src_blocks,
            split_diag, chunk or 128, tile_rows or 128,
            # auto-resolved (chunk, tile_rows) are deterministic in the
            # content+params already hashed, so keying the REQUEST keeps
            # warm hits from paying the model pick; explicit pins keep
            # the legacy key format (existing caches stay valid)
            auto=(
                f"|auto{int(feat_dim)}x{np.dtype(feat_dtype).name}"
                f"|c{chunk}|tr{tile_rows}"
                if auto_layout
                else ""
            ),
        )
        if os.path.exists(cache_path):
            t0 = time.time()
            oc = load_out_of_core_2d(cache_path)
            logger.info(
                "2-D out-of-core layout loaded from cache in %.1fs (%s)",
                time.time() - t0, cache_path,
            )
            # the HBM guard must run on warm hits too: the cache may have
            # been built with strict=False (warn-only), and a later
            # strict=True caller still deserves the ValueError at the
            # cause (shape access on the mmaps is metadata-only)
            _guard_cell_budget(oc.parts, strict)
            return oc

    diag = None
    if split_diag:
        loop = src == dst
        if loop.any():
            diag = np.zeros(n, np.float32)
            np.add.at(diag, dst[loop], w[loop])
            src, dst, w = src[~loop], dst[~loop], w[~loop]

    k = max(int(src_blocks), 1)
    sb = _round_up(-(-n // k), TILE_R)
    if chunk is None or tile_rows is None:
        chunk, tile_rows = _pick_cell_layout(
            src, dst, n, k, max_edges_per_part,
            chunk_cands=(chunk,) if chunk else (128, 256, 512),
            tr_cands=(tile_rows,) if tile_rows else (128, 256, 512, 1024),
        )
    tr = int(tile_rows)
    if tr % TILE_R:
        raise ValueError(f"tile_rows must be a multiple of {TILE_R}: {tr}")

    # dst parts on output-block boundaries, balanced by edge count.
    # Per-edge arithmetic is int32 via small per-tile lookup tables (the
    # round-5 build speedup — 64-bit divisions and searchsorteds over the
    # edge list were the measured hotspots at products scale)
    n_tiles_total = _round_up(n, tr) // tr
    tile_of_all = (dst // tr).astype(np.int32)
    tile_counts = np.bincount(tile_of_all, minlength=n_tiles_total)
    cum = np.cumsum(tile_counts)
    n_parts = max(-(-int(cum[-1]) // max_edges_per_part), 1)
    targets = np.linspace(0, cum[-1], n_parts + 1)[1:-1]
    bounds = [0] + sorted(set(np.searchsorted(cum, targets).tolist() + [])) + [n_tiles_total]
    bounds = sorted(set(b for b in bounds))
    if bounds[-1] != n_tiles_total:
        bounds.append(n_tiles_total)
    n_parts = len(bounds) - 1
    n_tiles = max(hi - lo for lo, hi in zip(bounds[:-1], bounds[1:]))
    n_rows = n_tiles * tr

    # (part, block) bucket of every edge, then ONE sort so the subpart
    # loop below is pure slicing.  Fast path: when the input is already
    # dst-sorted (symmetric_normalized_weights_host / the native builder
    # emit dst order — the `sorted_by_dst` flag short-circuits the scan),
    # a stable counting sort on the tiny composite cell key preserves dst
    # order within each cell; the native fused pass also computes the key
    # per edge from the small per-tile table, so the per-edge
    # tile/part/block/key arrays never materialize
    part_of_tile = np.searchsorted(
        np.asarray(bounds[1:]), np.arange(n_tiles_total), side="right"
    ).astype(np.int32)
    dst_sorted = bool(getattr(adj, "sorted_by_dst", False)) or (
        dst.size and bool(np.all(dst[1:] >= dst[:-1]))
    )
    fused = None
    if dst_sorted and n_parts * k < 2**31:
        from sgl_tpu.graph.native import classify_sort_cells_2d

        fused = classify_sort_cells_2d(src, dst, w, tr, sb, k, part_of_tile)
    if fused is not None:
        src, dst, tile_sorted, w, cell_counts = fused
        cell_counts = cell_counts[: n_parts * k]
    else:
        part_of = part_of_tile[tile_of_all]
        block_of = (src // sb).astype(np.int32)
        cell_key = part_of * np.int32(k) + block_of
        if n_parts * k >= 2**31:
            cell_key = part_of.astype(np.int64) * k + block_of
        # cell sizes are order-invariant: count BEFORE the sort
        cell_counts = np.bincount(cell_key, minlength=n_parts * k)
        if dst_sorted:
            order = np.argsort(cell_key, kind="stable")
        else:
            order = np.lexsort((dst, block_of, part_of))
        src, dst, w = src[order], dst[order], w[order]
        tile_sorted = tile_of_all[order]  # dst // tr in cell order, int32
    cell_starts = np.concatenate([[0], np.cumsum(cell_counts)])

    # first pass: per-subpart padded chunk counts -> global c_max
    def _subpart_padded(lo, hi, t_lo):
        tiles = tile_sorted[lo:hi] - np.int32(t_lo)
        counts = np.bincount(tiles, minlength=n_tiles)
        padded = np.where(counts > 0, _round_up_arr(counts, chunk), 0)
        return counts, padded

    all_padded = []
    for p in range(n_parts):
        t_lo = bounds[p]
        for b in range(k):
            i = p * k + b
            all_padded.append(
                _subpart_padded(cell_starts[i], cell_starts[i + 1], t_lo)
            )

    # per-cell output geometry (power-of-two size classes), shared by the
    # native one-pass packer and the numpy fallback loop
    n_cells = n_parts * k
    e_bs = np.empty(n_cells, np.int64)
    c_cells = np.empty(n_cells, np.int64)
    for i in range(n_cells):
        c_real = max(int(all_padded[i][1].sum()) // chunk, 1)
        c_cells[i] = 1 << (c_real - 1).bit_length()
        e_bs[i] = c_cells[i] * chunk
    slot_offs = np.concatenate([[0], np.cumsum(e_bs)])
    ct_offs = np.concatenate([[0], np.cumsum(c_cells)])

    from sgl_tpu.graph.native import pack_cells_2d

    packed = pack_cells_2d(
        src, dst, w, cell_starts, slot_offs, ct_offs,
        np.asarray([bounds[i // k] * tr for i in range(n_cells)], np.int32),
        np.asarray([(i % k) * sb for i in range(n_cells)], np.int32),
        tr, chunk, n_tiles,
    )
    if packed is not None:
        a_src, a_dst, a_w, a_ct = packed
        parts = []
        real_edges = int(src.shape[0])
        slots = 0
        for p in range(n_parts):
            row = []
            for b in range(k):
                i = p * k + b
                lo, hi = int(cell_starts[i]), int(cell_starts[i + 1])
                mask = (all_padded[i][0] > 0).astype(np.uint8)
                if hi > lo:
                    slots += int(e_bs[i])
                row.append(OocSubPart(
                    a_src[slot_offs[i]:slot_offs[i + 1]],
                    a_dst[slot_offs[i]:slot_offs[i + 1]],
                    a_w[slot_offs[i]:slot_offs[i + 1]],
                    a_ct[ct_offs[i]:ct_offs[i + 1]],
                    mask, hi - lo,
                ))
            parts.append(row)
        return _finish_out_of_core_2d(
            parts, n, n_rows, sb, k, bounds, tr, diag, n_parts, real_edges,
            slots, strict, cache_path,
        )

    parts: List[List[OocSubPart]] = []
    real_edges = int(src.shape[0])
    slots = 0
    for p in range(n_parts):
        t_lo = bounds[p]
        row = []
        for b in range(k):
            i = p * k + b
            lo, hi = int(cell_starts[i]), int(cell_starts[i + 1])
            counts, padded = all_padded[i]
            mask = (counts > 0).astype(np.uint8)
            # per-cell chunk count bucketed to the next power of two:
            # one compiled step PER SIZE CLASS (jit re-specializes by
            # shape; the persistent compile cache amortizes it) instead
            # of every cell padding to the densest cell — measured 6.4x
            # slot inflation at the products config with a global e_b
            c_real = max(int(padded.sum()) // chunk, 1)
            c_cell = 1 << (c_real - 1).bit_length()
            e_b = c_cell * chunk
            offs = np.concatenate([[0], np.cumsum(padded)])
            o_src = np.zeros(e_b, np.int32)
            o_w = np.zeros(e_b, np.float32)
            # visited tiles in order; trailing pad chunks repeat the LAST
            # visited tile (never re-zeroes an earlier tile)
            vis = np.nonzero(counts)[0]
            if vis.size:
                ct = np.repeat(vis.astype(np.int32), padded[vis] // chunk)
                pad_tile = int(vis[-1])
            else:
                ct = np.zeros(0, np.int32)
                pad_tile = 0
            o_ct = np.concatenate(
                [ct, np.full(c_cell - ct.shape[0], pad_tile, np.int32)]
            )
            o_dst = np.empty(e_b, np.int32)
            tile_fill = np.repeat(np.arange(n_tiles, dtype=np.int32), padded)
            o_dst[: tile_fill.shape[0]] = tile_fill * np.int32(tr)
            o_dst[tile_fill.shape[0]:] = pad_tile * tr
            if hi > lo:
                d_loc = dst[lo:hi] - np.int32(t_lo * tr)
                tiles = tile_sorted[lo:hi] - np.int32(t_lo)
                starts = np.concatenate([[0], np.cumsum(counts)])
                pos = offs[tiles] + (np.arange(hi - lo) - starts[tiles])
                o_src[pos] = src[lo:hi] - np.int32(b * sb)
                o_dst[pos] = d_loc
                o_w[pos] = w[lo:hi]
            if hi > lo:
                slots += e_b
            row.append(
                OocSubPart(o_src, o_dst, o_w, o_ct, mask, hi - lo)
            )
        parts.append(row)

    return _finish_out_of_core_2d(
        parts, n, n_rows, sb, k, bounds, tr, diag, n_parts, real_edges,
        slots, strict, cache_path,
    )


def _finish_out_of_core_2d(parts, n, n_rows, sb, k, bounds, tr, diag,
                           n_parts, real_edges, slots, strict, cache_path):
    """Shared tail of the 2-D layout build (native and numpy packers):
    HBM guard, accounting log, object construction, cache save."""
    _guard_cell_budget(parts, strict)
    n_classes = len({s.src.shape[0] for row in parts for s in row if s.n_edges})
    logger.info(
        "2-D out-of-core layout: %d parts x %d blocks (%d non-empty cells, "
        "%d size classes), %d real edges in %d slots (%.2fx padding), "
        "block workspace %d rows, part output %d rows",
        n_parts, k, sum(1 for row in parts for s in row if s.n_edges),
        n_classes, real_edges, slots, slots / max(real_edges, 1), sb, n_rows,
    )
    oc = OutOfCoreAdj2D(
        num_nodes=n,
        n_rows=n_rows,
        block_rows=sb,
        num_blocks=k,
        row_offsets=[bounds[p] * tr for p in range(n_parts)],
        valid_rows=[
            min((bounds[p + 1] - bounds[p]) * tr, n - bounds[p] * tr)
            for p in range(n_parts)
        ],
        parts=parts,
        diag=diag,
        tile_rows=tr,
    )
    if cache_path is not None:
        t0 = time.time()
        save_out_of_core_2d(oc, cache_path)
        logger.info(
            "2-D out-of-core layout cached in %.1fs (%s)",
            time.time() - t0, cache_path,
        )
    return oc


_CELL_SLOT_BUDGET = 12 << 20  # module-level so tests can exercise the guard


def _guard_cell_budget(parts, strict: bool) -> None:
    """HBM bound on the densest 2-D cell (cold builds AND warm cache
    loads).  msgs (f32) + hi/lo (bf16) ≈ 8 B per slot-lane; at d_pad=128
    a 16M-slot cell alone wants ~16 GB of message buffers — the whole
    HBM.  (Observed: src_blocks=2 at the products config dies with
    RESOURCE_EXHAUSTED.)  A single 128-row hub tile holding more edges
    than max_edges_per_part cannot be split (parts are tile-bounded), so
    under ``strict`` this raises here, at the cause, instead of a
    RESOURCE_EXHAUSTED at run time."""
    e_b_max = max(
        (s.src.shape[0] for row in parts for s in row if s.n_edges), default=0
    )
    if e_b_max > _CELL_SLOT_BUDGET:
        msg = (
            f"2-D out-of-core: densest cell has {e_b_max} edge slots; its "
            "message buffers may exceed HBM at d_pad=128 — raise "
            "src_blocks or lower max_edges_per_part"
        )
        if strict:
            raise ValueError(msg)
        import warnings as _w

        _w.warn(msg, stacklevel=3)


def save_out_of_core_2d(oc: OutOfCoreAdj2D, path) -> None:
    """Persist a 2-D layout as a DIRECTORY of .npy files (one per cell
    array).  The per-array format lets :func:`load_out_of_core_2d` open
    everything ``mmap_mode="r"`` — the warm "load" is metadata-only
    (measured: a monolithic .npz read cost 8.1 s at products scale; the
    mmap open is sub-second, with pages faulted in as cells upload)."""
    tmp = str(path) + ".tmp"
    os.makedirs(tmp, exist_ok=True)

    def put(name, arr):
        np.save(os.path.join(tmp, name + ".npy"), arr)

    put("meta", np.asarray(
        [oc.num_nodes, oc.n_rows, oc.block_rows, oc.num_blocks,
         len(oc.parts), oc.tile_rows], np.int64
    ))
    put("row_offsets", np.asarray(oc.row_offsets, np.int64))
    put("valid_rows", np.asarray(oc.valid_rows, np.int64))
    ne = np.asarray(
        [[s.n_edges for s in row] for row in oc.parts], np.int64
    )
    put("n_edges", ne)
    if oc.diag is not None:
        put("diag", oc.diag)
    for p, row in enumerate(oc.parts):
        for b, s in enumerate(row):
            k = f"c{p}_{b}_"
            put(k + "src", s.src)
            put(k + "dst", s.dst)
            put(k + "w", s.w)
            put(k + "ct", s.chunk_tile)
            put(k + "mask", s.tile_mask)
    if os.path.isdir(str(path)):
        import shutil

        shutil.rmtree(str(path))
    os.replace(tmp, str(path))  # atomic: a crashed save never half-caches


def load_out_of_core_2d(path) -> OutOfCoreAdj2D:
    """Load a layout saved by :func:`save_out_of_core_2d` (arrays are
    read-only memmaps; pages fault in on first use)."""
    def get(name, mmap=True):
        return np.load(
            os.path.join(str(path), name + ".npy"),
            mmap_mode="r" if mmap else None,
        )

    meta = get("meta", mmap=False).tolist()
    # pre-round-5 caches have no tile_rows entry (always 128 then)
    num_nodes, n_rows, block_rows, num_blocks, n_parts = meta[:5]
    tile_rows = meta[5] if len(meta) > 5 else 128
    ne = get("n_edges", mmap=False)
    parts = []
    for p in range(n_parts):
        row = []
        for b in range(num_blocks):
            k = f"c{p}_{b}_"
            row.append(OocSubPart(
                get(k + "src"), get(k + "dst"), get(k + "w"),
                get(k + "ct"), get(k + "mask"), int(ne[p, b]),
            ))
        parts.append(row)
    has_diag = os.path.exists(os.path.join(str(path), "diag.npy"))
    return OutOfCoreAdj2D(
        num_nodes=int(num_nodes),
        n_rows=int(n_rows),
        block_rows=int(block_rows),
        num_blocks=int(num_blocks),
        row_offsets=get("row_offsets", mmap=False).tolist(),
        valid_rows=get("valid_rows", mmap=False).tolist(),
        parts=parts,
        diag=get("diag") if has_diag else None,
        tile_rows=int(tile_rows),
    )


def _layout_cache_path(cache_dir, src, dst, w, n, max_edges_per_part,
                       src_blocks, split_diag, chunk, tile_rows=128,
                       auto=""):
    """Content-keyed cache path: the key hashes the full edge arrays plus
    every layout parameter, so a changed graph or config never aliases.
    ``auto`` (non-empty when chunk/tile_rows are model-picked) keys the
    REQUEST instead of the resolution — the pick is deterministic in the
    hashed content, and warm hits skip its bincount sweeps."""
    import hashlib

    h = hashlib.sha1()
    h.update(
        (
            f"v2|{n}|{max_edges_per_part}|{src_blocks}|{split_diag}|{chunk}|"
            f"{src.shape[0]}"
            # default stays byte-compatible with pre-round-5 cache keys
            + (f"|tr{tile_rows}" if tile_rows != 128 else "")
            + auto
        ).encode()
    )
    for a in (src, dst, w):
        h.update(np.ascontiguousarray(a).tobytes())
    return os.path.join(cache_dir, f"ooc2d_{h.hexdigest()}")


@functools.partial(
    jax.jit, static_argnames=("n_rows", "interpret", "masked", "tile_r")
)
def _ooc_step_2d(src, dst, w, chunk_tile, tile_mask, xw, acc,
                 n_rows: int, interpret: bool = False, masked: bool = True,
                 tile_r: int = 128):
    """One (part, block) cell: gather from the block workspace, Pallas MXU
    segment reduce, select away unvisited tiles, accumulate.

    ``masked=False`` (static) skips the select for fully-covered cells —
    elementwise ops on the Pallas output are the measured de-fusion
    hazard (CLAUDE.md XLA quirk), so dense cells avoid them entirely."""
    d = xw.shape[1]
    d_pad = _round_up(d, 128)
    xp = xw if d_pad == d else jnp.pad(xw, ((0, 0), (0, d_pad - d)))
    single = xw.dtype == jnp.bfloat16
    msgs = jnp.take(xp, src, axis=0).astype(jnp.float32) * w[:, None]
    hi = msgs.astype(jnp.bfloat16)
    lo = None if single else (msgs - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    out = _segment_reduce_mxu(
        hi, lo, dst, chunk_tile, num_nodes=n_rows, interpret=interpret,
        tile_r=tile_r,
    )
    out = out[:, :d]
    if masked:
        rows = jnp.repeat(tile_mask.astype(jnp.bool_), tile_r)
        # select, never multiply: unvisited tiles are uninitialized memory
        out = jnp.where(rows[:, None], out, 0.0)
    return acc + out


@functools.partial(
    jax.jit, static_argnames=("n_rows", "interpret", "tile_r")
)
def _ooc_cell_2d(src, dst, w, chunk_tile, xw,
                 n_rows: int, interpret: bool = False, tile_r: int = 128):
    """Gather + Pallas reduce ONLY — the raw (n_rows, d_pad) kernel output
    leaves this jit untouched (no mask, no accumulate, no column slice),
    keeping the gather → hi/lo-write pipeline fusion intact.  Used by
    ``step_mode="split"``; the accumulate runs in :func:`_ooc_acc_2d`."""
    d = xw.shape[1]
    d_pad = _round_up(d, 128)
    xp = xw if d_pad == d else jnp.pad(xw, ((0, 0), (0, d_pad - d)))
    single = xw.dtype == jnp.bfloat16
    msgs = jnp.take(xp, src, axis=0).astype(jnp.float32) * w[:, None]
    hi = msgs.astype(jnp.bfloat16)
    lo = None if single else (msgs - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return _segment_reduce_mxu(
        hi, lo, dst, chunk_tile, num_nodes=n_rows, interpret=interpret,
        tile_r=tile_r,
    )


@functools.partial(jax.jit, static_argnames=("masked", "tile_r"))
def _ooc_acc_2d(acc, out, tile_mask, masked: bool = True, tile_r: int = 128):
    """Accumulate one cell's kernel output (separate dispatch from the
    gather jit — see :func:`_ooc_cell_2d`).  ``acc`` is (n_rows, d_pad)."""
    if masked:
        rows = jnp.repeat(tile_mask.astype(jnp.bool_), tile_r)
        # select, never multiply: unvisited tiles are uninitialized memory
        out = jnp.where(rows[:, None], out, 0.0)
    return acc + out


def spmm_out_of_core_2d(
    oc: OutOfCoreAdj2D,
    x_host: np.ndarray,
    out: Optional[np.ndarray] = None,
    interpret: bool = False,
    max_device_edge_bytes: int = 4 << 30,
    max_device_acc_bytes: int = 2 << 30,
    null_transfer: bool = False,
    step_mode: str = "fused",
) -> np.ndarray:
    """``y = adj @ x`` via the 2-D layout: block workspaces are contiguous
    slices of ``x`` (no host gather), each uploaded once per accumulator
    group.  See :class:`OutOfCoreAdj2D`.

    ``null_transfer=True`` is the MEASUREMENT mode that bounds the 2-D
    path's non-transfer overhead on hardware (the 1-D analog bounded its
    compute at 0.574 s/hop): the identical per-cell jitted step chain runs
    against ONE device-resident block workspace shared across blocks (edge
    indices stay real; workspace content does not affect timing) with the
    H2D block uploads and D2H readbacks skipped.  The returned array is
    NOT the SpMM result in this mode.

    ``step_mode`` selects the per-cell dispatch structure:

    * ``"fused"`` — one jit per cell (gather → kernel → mask → acc add);
      the accumulate consumes the Pallas output inside the same program,
      which is the measured XLA gather de-fusion hazard (CLAUDE.md);
    * ``"split"`` — the gather+kernel jit returns the raw (n_rows, d_pad)
      output and a second tiny jit does mask+accumulate, keeping the
      gather pipeline fusion clean at the cost of one extra dispatch and
      an HBM round-trip of the cell output.
    """
    x_host = np.ascontiguousarray(x_host)
    d = x_host.shape[1]
    if step_mode not in ("fused", "split"):
        raise ValueError(f"step_mode must be 'fused' or 'split': {step_mode}")
    split = step_mode == "split"
    # accumulators stay lane-padded: block workspaces are column-padded
    # ONCE per upload (below) rather than inside every cell jit — the
    # in-jit pad materialized a padded copy per CELL (7x redundant per
    # block at the products config), pure HBM bandwidth waste
    d_pad = _round_up(d, 128)
    d_acc = d_pad
    if out is None:
        out = np.zeros((oc.num_nodes, d), x_host.dtype)
    else:
        out[:] = 0
    acc_bytes = oc.n_rows * d_acc * 4
    group = max(int(max_device_acc_bytes // max(acc_bytes, 1)), 1)
    # byte-budget edge cache (cell sizes vary by size class): evict from
    # the most recent insertions until under THIS call's budget
    def _cell_bytes(p, b):
        s = oc.parts[p][b]
        return (s.src.nbytes + s.dst.nbytes + s.w.nbytes
                + s.chunk_tile.nbytes + s.tile_mask.nbytes)

    cached_bytes = sum(_cell_bytes(*key) for key in oc._dev_edges)
    for key in reversed(list(oc._dev_edges)):
        if cached_bytes <= max_device_edge_bytes:
            break
        cached_bytes -= _cell_bytes(*key)
        del oc._dev_edges[key]

    n = oc.num_nodes
    sb = oc.block_rows
    ws_shared = None
    if null_transfer:
        # key by (dtype, d): the same layout can be measured with
        # different feature widths, and a stale-shaped workspace would
        # fail deep inside the jitted step
        key = (np.dtype(x_host.dtype).name, d)
        ws_shared = oc._dev_ws.get(key)
        if ws_shared is None:
            xw0 = x_host[:sb]
            if xw0.shape[0] < sb:
                xw0 = np.pad(xw0, ((0, sb - xw0.shape[0]), (0, 0)))
            ws_shared = _pad_cols(jnp.asarray(xw0), d_pad)
            oc._dev_ws[key] = ws_shared
    last_acc = None
    for g_lo in range(0, oc.num_parts, group):
        g = range(g_lo, min(g_lo + group, oc.num_parts))
        accs = {p: jnp.zeros((oc.n_rows, d_acc), jnp.float32) for p in g}
        for b in range(oc.num_blocks):
            if null_transfer:
                xw_dev = ws_shared
            else:
                lo, hi = b * sb, min((b + 1) * sb, n)
                xw = x_host[lo:hi]
                if hi - lo < sb:  # last block pads to the uniform shape
                    xw = np.pad(xw, ((0, sb - (hi - lo)), (0, 0)))
                xw_dev = None  # upload lazily: skip if no cell in g needs it
            for p in g:
                s = oc.parts[p][b]
                if s.n_edges == 0:
                    continue
                key = (p, b)
                edges = oc._dev_edges.get(key)
                if edges is None:
                    edges = (
                        jnp.asarray(s.src), jnp.asarray(s.dst),
                        jnp.asarray(s.w), jnp.asarray(s.chunk_tile),
                        jnp.asarray(s.tile_mask),
                    )
                    nb = _cell_bytes(p, b)
                    if cached_bytes + nb <= max_device_edge_bytes:
                        oc._dev_edges[key] = edges
                        cached_bytes += nb
                if xw_dev is None:
                    xw_dev = _pad_cols(jnp.asarray(xw), d_pad)
                masked = not bool(s.tile_mask.all())
                if split:
                    cell = _ooc_cell_2d(
                        *edges[:4], xw_dev, n_rows=oc.n_rows,
                        interpret=interpret, tile_r=oc.tile_rows,
                    )
                    accs[p] = _ooc_acc_2d(
                        accs[p], cell, edges[4], masked=masked,
                        tile_r=oc.tile_rows,
                    )
                else:
                    accs[p] = _ooc_step_2d(
                        *edges, xw_dev, accs[p], n_rows=oc.n_rows,
                        interpret=interpret, masked=masked,
                        tile_r=oc.tile_rows,
                    )
        if null_transfer:
            last_acc = accs[max(g)]
            continue  # no readback in measurement mode
        for p in g:
            off, valid = oc.row_offsets[p], oc.valid_rows[p]
            dev = accs[p][:valid, :d]
            if out.dtype != np.float32:
                # cast ON DEVICE: a bf16 output halves the D2H leg too
                # (the accumulators stay f32 through the adds)
                dev = dev.astype(out.dtype)
            out[off:off + valid] = np.asarray(dev)
    if null_transfer:
        # a 1-element fetch is a REAL sync even where block_until_ready
        # returns early (the tunneled dev chip); cells execute in program
        # order, so the last accumulator's completion implies all of them
        np.asarray(last_acc[:1, :1])
        return out

    if oc.diag is not None:
        for lo in range(0, oc.num_nodes, _DIAG_WINDOW):
            hi = min(lo + _DIAG_WINDOW, oc.num_nodes)
            out[lo:hi] += (
                oc.diag[lo:hi, None] * x_host[lo:hi]
            ).astype(out.dtype)
    return out


_DIAG_WINDOW = 1 << 20  # host rows per diag-apply block (bounds temp memory)


def spmm_out_of_core(
    oc: OutOfCoreAdj,
    x_host: np.ndarray,
    out: Optional[np.ndarray] = None,
    interpret: bool = False,
    max_device_edge_bytes: int = 4 << 30,
    null_transfer: bool = False,
) -> np.ndarray:
    """``y = adj @ x`` with x, y, and edges all host-resident.

    Streams one part at a time through the device; double-buffers the
    readback so part ``i+1``'s transfer+compute overlaps part ``i``'s
    device→host copy.  Part edge arrays are identical for every hop, so
    as many as fit under ``max_device_edge_bytes`` stay device-cached —
    only the feature workspace re-streams each hop.  Returns ``out``
    (allocated if None) in ``x_host.dtype``.

    ``null_transfer=True`` is a MEASUREMENT mode (VERDICT r2 next #6): it
    runs the identical per-part jitted step chain but against ONE
    device-resident workspace shared across parts (gather cost is set by
    the per-part edge indices, which stay real; workspace *content* does
    not affect timing) and skips the host↔device feature/readback traffic
    entirely.  Wall-clock then bounds the non-transfer overhead (dispatch
    + kernel) that survives on a directly-attached host — the returned
    array is NOT the SpMM result.  Host-gather cost is measured
    separately (it overlaps transfer on a real host).
    """
    x_host = np.ascontiguousarray(x_host)
    d = x_host.shape[1]
    if out is None:
        out = np.zeros((oc.num_nodes, d), x_host.dtype)
    else:
        out[:] = 0
    cacheable = max(max_device_edge_bytes // max(oc.part_edge_nbytes(), 1), 0)
    # the budget must hold across calls on a shared OutOfCoreAdj: evict
    # entries an earlier, larger-budget call cached beyond this call's cap
    for i in [i for i in oc._dev_edges if i >= cacheable]:
        del oc._dev_edges[i]

    def flush(pending):
        dev, off, valid = pending
        hi = min(off + valid, oc.num_nodes)
        dev = dev[: hi - off]
        if out.dtype != np.float32:
            # cast ON DEVICE: bf16 output halves the D2H leg (boundary
            # rows pay one extra rounding in the host-side overlap-add)
            dev = dev.astype(out.dtype)
        # consecutive parts may share a boundary tile -> overlap-ADD
        out[off:hi] += np.asarray(dev)

    ws_shared = None
    if null_transfer:
        # key by (dtype, d) — see the 2-D path's note
        key = (np.dtype(x_host.dtype).name, x_host.shape[1])
        ws_shared = oc._dev_ws.get(key)
        if ws_shared is None:
            ws_shared = jnp.asarray(x_host[oc.parts[0].cols])
            oc._dev_ws[key] = ws_shared

    pending = None
    for i, p in enumerate(oc.parts):
        edges = oc._dev_edges.get(i)
        if edges is None:
            edges = (
                jnp.asarray(p.src), jnp.asarray(p.dst), jnp.asarray(p.w),
                jnp.asarray(p.chunk_tile),
            )
            if i < cacheable:
                oc._dev_edges[i] = edges
        if null_transfer:
            xw_dev = ws_shared
        else:
            # host gather (native OMP row copy when available) + H2D
            from sgl_tpu.graph.native import gather_rows

            xw_dev = jnp.asarray(gather_rows(x_host, p.cols))
        dev = _ooc_step(
            *edges, xw_dev, n_rows=oc.n_rows, interpret=interpret
        )
        if null_transfer:
            pending = (dev, p.row_offset, p.valid_rows)
            continue  # no readback in measurement mode
        if pending is not None:
            flush(pending)
        pending = (dev, p.row_offset, p.valid_rows)
    if null_transfer:
        # a 1-element fetch is a REAL sync even on backends where
        # block_until_ready returns early (the tunneled dev chip); the
        # device executes parts in program order, so the last part's
        # completion implies all of them
        np.asarray(pending[0][:1, :1])
        return out
    if pending is not None:
        flush(pending)

    if oc.diag is not None:
        for lo in range(0, oc.num_nodes, _DIAG_WINDOW):
            hi = min(lo + _DIAG_WINDOW, oc.num_nodes)
            out[lo:hi] += (
                oc.diag[lo:hi, None] * x_host[lo:hi]
            ).astype(out.dtype)
    return out


def k_hop_out_of_core(
    oc,
    x_host: np.ndarray,
    prop_steps: int,
    hop_sink: Optional[Callable[[int, np.ndarray], None]] = None,
    interpret: bool = False,
):
    """``[X, AX, A²X, …]`` with every hop host-resident.

    Mirrors ``k_hop_propagate`` (``ops/graph_ops.py``) for graphs beyond
    HBM; ``oc`` is an :class:`OutOfCoreAdj` (1-D unique-cols layout) or
    an :class:`OutOfCoreAdj2D` (src-block layout).  With
    ``hop_sink(k, arr)`` given, each hop is handed off (e.g. written to
    a memmap) instead of retained, so peak host memory is two hop
    matrices; otherwise returns the full hop list.
    """
    spmm = (
        spmm_out_of_core_2d
        if isinstance(oc, OutOfCoreAdj2D)
        else spmm_out_of_core
    )
    hops = None
    if hop_sink is None:
        hops = [np.asarray(x_host)]
    else:
        hop_sink(0, np.asarray(x_host))
    cur = np.asarray(x_host)
    for k in range(1, prop_steps + 1):
        cur = spmm(oc, cur, interpret=interpret)
        if hop_sink is None:
            hops.append(cur)
        else:
            hop_sink(k, cur)
    return hops


# ---------------------------------------------------------------------------
# Device-resident execution of the 2-D layout (in-HBM huge graphs).
#
# Round-5 finding (dev/exp_gather_cliff.py): the XLA row gather runs at
# 3.5-4.1 ns/row while its source operand is under ~100 MB and ~12 ns/row
# above.  Executing the 2-D (dst-part x src-block) layout with x resident
# slices each gather source to one <=100 MB block: same cells as the
# out-of-core path, no host traffic, one jitted scan per cell size class.
#
# MEASURED OUTCOME (dev/exp_resident2d.py, products config): the
# streaming scan does NOT pay the above-cliff rate (its full-1.2 GB-
# operand gather runs at ~4.5 ns/row inside its scan shape), and this
# executor LOSES to it in-HBM: 0.811 vs 0.452 s/hop f32, 0.535 vs 0.420
# bf16.  The cliff is real for standalone cell jits (it set the
# out-of-core compute bound) but does not transfer to the streaming scan.
# Kept as an opt-in executor: its peak memory is one size class's
# message buffers (vs one 6M-edge part's), the useful regime when HBM
# headroom is too tight for streaming but x still fits.
#
# This is also NOT the round-4-falsified in-kernel 2-D design
# (dev/exp_spmm2d_layout.py): that moved x blocks through the KERNEL
# (per-cell block re-DMA + sb-wide one-hot flops).  Here the kernel is
# unchanged; only the XLA gather's operand shrinks.
# ---------------------------------------------------------------------------


def _class_stacks(oc: OutOfCoreAdj2D):
    """Non-empty cells grouped by edge-slot class, stacked for lax.scan;
    device arrays cached on the layout (keyed 'stacks')."""
    cached = oc._dev_stacks.get("stacks")
    if cached is not None:
        return cached
    groups = {}
    for p, row in enumerate(oc.parts):
        for b, s in enumerate(row):
            if s.n_edges:
                groups.setdefault(s.src.shape[0], []).append((p, b, s))
    stacks = []
    for e_b in sorted(groups, reverse=True):
        cells = groups[e_b]
        stacks.append(tuple(
            jnp.asarray(a)
            for a in (
                np.stack([s.src for _, _, s in cells]),
                np.stack([s.dst for _, _, s in cells]),
                np.stack([s.w for _, _, s in cells]),
                np.stack([s.chunk_tile for _, _, s in cells]),
                np.stack([s.tile_mask for _, _, s in cells]),
                np.asarray([b for _, b, _ in cells], np.int32),
                np.asarray([oc.row_offsets[p] for p, _, _ in cells],
                           np.int32),
            )
        ))
    oc._dev_stacks["stacks"] = stacks
    return stacks


@functools.partial(
    jax.jit,
    static_argnames=("n_rows", "sb", "tile_r", "single", "interpret"),
)
def _resident_class_scan(cells, xp, y, n_rows: int, sb: int, tile_r: int,
                         single: bool, interpret: bool = False):
    """One scan over a size class's stacked cells: slice the cell's block
    out of the resident features (gather source <= the operand budget),
    produce messages, reduce, masked-accumulate into the global rows."""
    d_pad = xp.shape[1]

    def body(y, cell):
        src, dst, w, ct, mask, blk, off = cell
        xb = jax.lax.dynamic_slice(xp, (blk * sb, 0), (sb, d_pad))
        msgs = jnp.take(xb, src, axis=0).astype(jnp.float32) * w[:, None]
        hi = msgs.astype(jnp.bfloat16)
        lo = (
            None if single
            else (msgs - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        )
        out = _segment_reduce_mxu(
            hi, lo, dst, ct, num_nodes=n_rows, tile_r=tile_r,
            interpret=interpret,
        )
        # unvisited tiles are uninitialized memory: select, never multiply
        rows = jnp.repeat(mask.astype(jnp.bool_), tile_r)
        out = jnp.where(rows[:, None], out, 0.0)
        cur = jax.lax.dynamic_slice(y, (off, 0), (n_rows, d_pad))
        return jax.lax.dynamic_update_slice(y, cur + out, (off, 0)), None

    y, _ = jax.lax.scan(body, y, cells)
    return y


def spmm_pallas_2d_resident(
    oc: OutOfCoreAdj2D, x: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """``y = adj @ x`` with x DEVICE-resident through the 2-D layout.

    Opt-in low-peak-memory executor — measured SLOWER than
    ``spmm_pallas_streaming`` at the products config (see the section
    note above); use it when one streaming part's message buffers do not
    fit HBM but x does.  Build the layout with
    ``prepare_out_of_core_2d(..., feat_dim=x.shape[1],
    feat_dtype=x.dtype)`` so the auto block sizing matches the features
    actually gathered.  One dispatch per cell size class (3-5), plus one
    for the diag."""
    x = jnp.asarray(x)
    n, d = x.shape
    d_pad = _round_up(d, 128)
    sb = oc.block_rows
    k = oc.num_blocks
    xp = jnp.pad(x, ((0, k * sb - n), (0, d_pad - d)))
    tr = oc.tile_rows
    n_total = _round_up(n, tr) + oc.n_rows
    y = jnp.zeros((n_total, d_pad), jnp.float32)
    single = x.dtype == jnp.bfloat16
    for cells in _class_stacks(oc):
        y = _resident_class_scan(
            cells, xp, y, n_rows=oc.n_rows, sb=sb, tile_r=tr,
            single=single, interpret=interpret,
        )
    y = y[:n, :d]
    if oc.diag is not None:
        diag = oc._dev_stacks.get("diag")
        if diag is None:
            diag = jnp.asarray(oc.diag)
            oc._dev_stacks["diag"] = diag
        # separate dispatch: an elementwise f(x) summed with the Pallas
        # output inside one program is the measured de-fusion hazard
        y = y + diag[:, None] * x.astype(jnp.float32)
    return y.astype(x.dtype)
