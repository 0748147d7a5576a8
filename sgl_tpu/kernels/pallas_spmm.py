"""Pallas TPU SpMM: MXU one-hot segment reduction over dst-sorted edges.

Replaces the scatter-add half of SpMM (the part XLA serializes worst) with a
hand-written TPU kernel.  Strategy — nothing like the reference's C kernels
(``sgl/operators/csrc/matmul.c``), which walk CSR rows on scalar cores:

1. messages ``m_e = w_e * x[src_e]`` are produced by XLA as two separate
   bf16 outputs (hi/lo split of the f32 value), letting the gather →
   multiply → round pipeline fuse into each output's write;
2. edges are pre-sorted by ``dst`` and **chunk-aligned per output tile** on
   the host (:func:`prepare_chunked`): each 128-row output tile's edge
   range is padded to whole ``CHUNK``-edge chunks, so every chunk belongs
   to exactly one tile — no boundary-window re-reads, no masking (padding
   edges carry ``w == 0``);
3. the kernel is a plain pipelined grid over chunks: Pallas streams each
   chunk's hi/lo/dst blocks HBM→VMEM automatically (double-buffered), the
   chunk reduces via ``onehot(dst) @ hi + onehot(dst) @ lo`` — a
   (TILE_R × CHUNK) @ (CHUNK × D) bf16 MXU matmul — and accumulates into
   the tile's output block, which stays VMEM-resident across the tile's
   consecutive chunks (output-block revisiting).

Scatter-add becomes dense matmul, far below the MXU roofline, so the
scatter phase is HBM-bound; the measured end-to-end bound is the XLA row
gather in step 1 (~2.5 ns/row on v5e).

Precision: the one-hot is exact in bf16 and ``hi + lo`` reconstructs f32 to
~2^-16 relative error at single-pass bf16 MXU throughput (6x cheaper than
``Precision.HIGHEST``).
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgl_tpu.kernels.sparse import SparseAdj, spmm_segment

TILE_R = 128  # output rows per tile (MXU-aligned)
# edges per chunk: 2048 won a sweep over {512, 1024, 2048, 4096} on v5e
CHUNK = int(os.environ.get("SGL_TPU_SPMM_CHUNK", "2048"))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ChunkedAdj:
    """Tile-chunk-aligned sparse adjacency for the Pallas kernel.

    Edge arrays have length ``n_chunks * CHUNK``; every chunk's edges all
    target the same 128-row output tile (``chunk_tile`` maps chunk → tile).
    Padding edges have ``w == 0`` and an in-tile dst.  Built host-side once
    per graph by :func:`prepare_chunked`.
    """

    src: jnp.ndarray  # [E'] int32
    dst: jnp.ndarray  # [E'] int32 (sorted within the tile structure)
    w: jnp.ndarray  # [E'] float32, 0 on padding
    chunk_tile: jnp.ndarray  # [n_chunks] int32
    num_nodes: int

    def tree_flatten(self):
        return (self.src, self.dst, self.w, self.chunk_tile), (self.num_nodes,)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, aux[0])

    @property
    def n_chunks(self) -> int:
        return int(self.chunk_tile.shape[0])

    def transpose_sparse(self) -> SparseAdj:
        """Transposed edges as a plain SparseAdj (for the VJP)."""
        return SparseAdj(self.dst, self.src, self.w, self.num_nodes, False)


def prepare_chunked(adj: SparseAdj) -> ChunkedAdj:
    """Re-layout a dst-sorted ``SparseAdj`` into per-tile whole chunks.

    Every tile (even an empty one) gets at least one chunk so its output
    block is always written.  Host-side numpy; run once per graph and reuse
    across hops/epochs.
    """
    src = np.asarray(adj.src)
    dst = np.asarray(adj.dst)
    w = np.asarray(adj.w)
    if not adj.sorted_by_dst:
        order = np.argsort(dst, kind="stable")
        src, dst, w = src[order], dst[order], w[order]
    keep = w != 0
    src, dst, w = src[keep], dst[keep], w[keep]
    n = adj.num_nodes
    n_tiles = _round_up(n, TILE_R) // TILE_R
    tile_of = dst // TILE_R
    counts = np.bincount(tile_of, minlength=n_tiles)
    padded = np.maximum(_round_up_arr(counts, CHUNK), CHUNK)
    offsets = np.concatenate([[0], np.cumsum(padded)])
    e_out = int(offsets[-1])
    out_src = np.zeros(e_out, np.int32)
    out_dst = np.empty(e_out, np.int32)
    out_w = np.zeros(e_out, np.float32)
    # padding dst defaults to the tile's base row (in-tile, weight 0)
    tile_idx = np.repeat(np.arange(n_tiles, dtype=np.int32), padded)
    out_dst[:] = tile_idx * TILE_R
    # edges are dst-sorted, hence tile-sorted: contiguous runs per tile
    starts = np.concatenate([[0], np.cumsum(counts)])
    pos = offsets[tile_of] + (np.arange(src.shape[0]) - starts[tile_of])
    out_src[pos] = src
    out_dst[pos] = dst
    out_w[pos] = w
    chunk_tile = np.repeat(
        np.arange(n_tiles, dtype=np.int32), (padded // CHUNK)
    )
    return ChunkedAdj(
        jnp.asarray(out_src),
        jnp.asarray(out_dst),
        jnp.asarray(out_w),
        jnp.asarray(chunk_tile),
        num_nodes=n,
    )


def _round_up_arr(x: np.ndarray, m: int) -> np.ndarray:
    return ((x + m - 1) // m) * m


def _seg_kernel(chunk_tile_ref, dst_ref, hi_ref, lo_ref, out_ref):
    c = pl.program_id(0)
    tile = chunk_tile_ref[c]
    is_first = jnp.logical_or(c == 0, chunk_tile_ref[jnp.maximum(c - 1, 0)] != tile)

    @pl.when(is_first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    local = dst_ref[0] - tile * TILE_R  # (1, CHUNK)
    rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, CHUNK), 0)
    onehot = (local == rows).astype(jnp.bfloat16)  # (TILE_R, CHUNK)

    def mm(m):
        return jax.lax.dot_general(
            onehot,
            m,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    out_ref[:] += mm(hi_ref[0]) + mm(lo_ref[0])


@functools.partial(jax.jit, static_argnames=("num_nodes", "interpret"))
def _segment_reduce_mxu(hi, lo, dst, chunk_tile, num_nodes: int, interpret: bool = False):
    """Tile-chunked segment sum via the Pallas kernel.

    hi/lo: [E', D] bf16 message halves (E' = n_chunks * CHUNK, D % 128 == 0)
    dst:   [E'] int32; chunk_tile: [n_chunks] int32 (non-decreasing)
    """
    e_pad, d = hi.shape
    n_chunks = chunk_tile.shape[0]
    assert e_pad == n_chunks * CHUNK and d % 128 == 0
    n_tiles = pl.cdiv(num_nodes, TILE_R)
    hi3 = hi.reshape(n_chunks, CHUNK, d)
    lo3 = lo.reshape(n_chunks, CHUNK, d)
    dst3 = dst.reshape(n_chunks, 1, CHUNK)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 1, CHUNK), lambda c, ct: (c, 0, 0)),
            pl.BlockSpec((1, CHUNK, d), lambda c, ct: (c, 0, 0)),
            pl.BlockSpec((1, CHUNK, d), lambda c, ct: (c, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (TILE_R, d), lambda c, ct: (ct[c], 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _seg_kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE_R, d), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * e_pad * TILE_R * d,
            bytes_accessed=e_pad * (d * 4 + 4) + n_tiles * TILE_R * d * 4,
            transcendentals=0,
        ),
    )(chunk_tile, dst3, hi3, lo3)
    return out[:num_nodes]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def spmm_pallas(adj: ChunkedAdj, x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """``y = adj @ x`` with XLA gather + Pallas MXU segment reduction.

    ``adj`` must be a :class:`ChunkedAdj` (build once per graph with
    :func:`prepare_chunked`).  Result is [num_nodes, D] in ``x.dtype``.
    Differentiable w.r.t. ``x`` (VJP = transpose SpMM via the segment
    backend, since transposed edges are no longer tile-structured).
    """
    return _spmm_pallas_impl(adj, x, interpret)


def _spmm_pallas_impl(adj: ChunkedAdj, x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    if isinstance(adj, SparseAdj):
        raise TypeError(
            "spmm_pallas requires a ChunkedAdj; convert once with "
            "sgl_tpu.kernels.prepare_chunked(adj)"
        )
    d = x.shape[1]
    d_pad = _round_up(d, 128)
    msgs = jnp.take(x, adj.src, axis=0).astype(jnp.float32) * adj.w[:, None]
    if d_pad != d:
        msgs = jnp.pad(msgs, ((0, 0), (0, d_pad - d)))
    # hi/lo bf16 halves as separate arrays: each output's write fuses with
    # the gather (a concat would force an extra materialize+copy pass)
    hi = msgs.astype(jnp.bfloat16)
    lo = (msgs - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    out = _segment_reduce_mxu(
        hi, lo, adj.dst, adj.chunk_tile, num_nodes=adj.num_nodes, interpret=interpret
    )
    return out[:, :d].astype(x.dtype)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ChunkedPart:
    """One tile-aligned slice of a huge graph's ChunkedAdj: covers output
    rows ``[tile_offset*TILE_R, (tile_offset+n_tiles)*TILE_R)``."""

    src: jnp.ndarray
    dst: jnp.ndarray  # LOCAL to the part: dst - tile_offset*TILE_R
    w: jnp.ndarray
    chunk_tile: jnp.ndarray  # local tile ids
    tile_offset: int
    n_tiles: int

    def tree_flatten(self):
        return (self.src, self.dst, self.w, self.chunk_tile), (
            self.tile_offset,
            self.n_tiles,
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)


def prepare_chunked_parts(adj: SparseAdj, max_edges_per_part: int = 16 << 20):
    """Split a graph into tile-aligned parts so each part's message buffers
    fit in HBM — the single-chip path to billion-edge graphs (ogbn-products /
    papers100M scale), where an (E, D) message buffer cannot materialize.

    Parts share one kernel compilation: chunk and tile counts are padded to
    the per-part maxima.
    """
    full = prepare_chunked(adj)
    chunk_tile = np.asarray(full.chunk_tile)
    n_chunks = chunk_tile.shape[0]
    max_chunks = max(max_edges_per_part // CHUNK, 1)
    # split points at tile boundaries, greedy by chunk count
    splits = [0]
    last = 0
    for c in range(1, n_chunks):
        if chunk_tile[c] != chunk_tile[c - 1] and c - last >= max_chunks:
            splits.append(c)
            last = c
    splits.append(n_chunks)
    part_chunks = max(np.diff(splits))
    parts = []
    src = np.asarray(full.src)
    dst = np.asarray(full.dst)
    w = np.asarray(full.w)
    for lo, hi in zip(splits[:-1], splits[1:]):
        t_lo = int(chunk_tile[lo])
        t_hi = int(chunk_tile[hi - 1]) + 1
        pad_c = part_chunks - (hi - lo)
        e_lo, e_hi = lo * CHUNK, hi * CHUNK
        last_tile = t_hi - t_lo - 1  # padding must keep chunk_tile
        # non-decreasing, else the revisit logic would re-zero an earlier tile
        p_src = np.concatenate([src[e_lo:e_hi], np.zeros(pad_c * CHUNK, np.int32)])
        p_dst = np.concatenate(
            [dst[e_lo:e_hi] - t_lo * TILE_R,
             np.full(pad_c * CHUNK, last_tile * TILE_R, np.int32)]
        ).astype(np.int32)
        p_w = np.concatenate([w[e_lo:e_hi], np.zeros(pad_c * CHUNK, np.float32)])
        p_ct = np.concatenate(
            [chunk_tile[lo:hi] - t_lo, np.full(pad_c, last_tile, np.int32)]
        ).astype(np.int32)
        parts.append(
            ChunkedPart(
                jnp.asarray(p_src),
                jnp.asarray(p_dst),
                jnp.asarray(p_w),
                jnp.asarray(p_ct),
                tile_offset=t_lo,
                n_tiles=t_hi - t_lo,
            )
        )
    max_tiles = max(p.n_tiles for p in parts)
    return parts, full.num_nodes, max_tiles


@functools.partial(jax.jit, static_argnames=("n_rows", "interpret"))
def _part_rows(part: ChunkedPart, x, n_rows: int, interpret: bool = False):
    d = x.shape[1]
    d_pad = _round_up(d, 128)
    msgs = jnp.take(x, part.src, axis=0).astype(jnp.float32) * part.w[:, None]
    if d_pad != d:
        msgs = jnp.pad(msgs, ((0, 0), (0, d_pad - d)))
    hi = msgs.astype(jnp.bfloat16)
    lo = (msgs - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    out = _segment_reduce_mxu(
        hi, lo, part.dst, part.chunk_tile, num_nodes=n_rows, interpret=interpret
    )
    return out[:, :d].astype(x.dtype)


def spmm_pallas_streaming(parts_bundle, x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """``y = adj @ x`` part by part; peak device memory is one part's
    message buffers instead of the whole graph's."""
    parts, num_nodes, max_tiles = parts_bundle
    n_rows = max_tiles * TILE_R
    outs = []
    for p in parts:
        rows = _part_rows(p, x, n_rows=n_rows, interpret=interpret)
        outs.append(rows[: p.n_tiles * TILE_R])
    return jnp.concatenate(outs, axis=0)[:num_nodes]


def _spmm_pallas_fwd(adj, x, interpret):
    return _spmm_pallas_impl(adj, x, interpret), adj


def _spmm_pallas_bwd(interpret, adj, g):
    # d/dx (A x) applied to cotangent g is A^T g (off the hot path)
    dx = spmm_segment(adj.transpose_sparse(), g)
    return (None, dx)


spmm_pallas.defvjp(_spmm_pallas_fwd, _spmm_pallas_bwd)
