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
gather in step 1 (~3.5 ns/row on v5e, payload-size independent).  Because
the gather is pay-per-row, two edge classes are split out of it entirely
at preparation time (see :class:`ChunkedAdj`): self-loops become one fused
``diag ⊙ x`` elementwise op, and edges out of the k highest-degree sources
become one dense ``hub_m @ x[hubs]`` MXU matmul — on power-law graphs the
hubs carry 30–50% of all edges, and streaming a dense (N, k) strip is far
cheaper than gathering those rows edge by edge.

Precision: the one-hot is exact in bf16 and ``hi + lo`` reconstructs f32 to
~2^-16 relative error at single-pass bf16 MXU throughput (6x cheaper than
``Precision.HIGHEST``).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgl_tpu.kernels.sparse import SparseAdj, spmm_segment

TILE_R = 128  # output rows per tile (MXU-aligned)
# edges per chunk: 512 won a sweep over {128..4096} on v5e once diag/hub
# splitting landed (smaller chunks cut per-tile padding, and the gather —
# not the MXU reduction — is the bound, so narrow matmuls cost nothing)
CHUNK = int(os.environ.get("SGL_TPU_SPMM_CHUNK", "512"))


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

    The hot loop is bound by the per-edge feature-row gather (~3.5 ns/row
    on v5e, payload-size independent), so two edge classes are split out of
    the gather entirely:

    * ``diag``: self-loop weights — applied as ``diag ⊙ x`` (one fused
      elementwise op instead of N gathered rows);
    * ``hub_ids``/``hub_m``: edges whose *source* is one of the k
      highest-out-degree nodes — applied as a dense ``hub_m @ x[hub_ids]``
      MXU matmul.  Power-law graphs concentrate 30–50% of edges in a few
      thousand hubs; a dense (N, k) strip is far cheaper to stream than
      those rows are to gather.
    """

    src: jnp.ndarray  # [E'] int32
    dst: jnp.ndarray  # [E'] int32 (sorted within the tile structure)
    w: jnp.ndarray  # [E'] float32, 0 on padding
    chunk_tile: jnp.ndarray  # [n_chunks] int32
    num_nodes: int
    diag: Optional[jnp.ndarray] = None  # [N] f32 self-loop weights
    hub_ids: Optional[jnp.ndarray] = None  # [k] int32 hub node ids
    hub_m: Optional[jnp.ndarray] = None  # [N, k] f32 dense hub columns

    def tree_flatten(self):
        return (
            self.src,
            self.dst,
            self.w,
            self.chunk_tile,
            self.diag,
            self.hub_ids,
            self.hub_m,
        ), (self.num_nodes,)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        src, dst, w, chunk_tile, diag, hub_ids, hub_m = leaves
        return cls(
            src,
            dst,
            w,
            chunk_tile,
            num_nodes=aux[0],
            diag=diag,
            hub_ids=hub_ids,
            hub_m=hub_m,
        )

    @property
    def n_chunks(self) -> int:
        return int(self.chunk_tile.shape[0])

    def transpose_sparse(self) -> SparseAdj:
        """Transposed *chunked-part* edges as a plain SparseAdj (for the
        VJP; diag/hub extras are transposed separately)."""
        return SparseAdj(self.dst, self.src, self.w, self.num_nodes, False)

    def apply_extras(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """Add the split-out diag/hub contributions of ``adj @ x`` to ``y``."""
        if self.diag is not None:
            y = y + self.diag[:, None].astype(y.dtype) * x.astype(y.dtype)
        if self.hub_ids is not None:
            if self.hub_m.dtype == jnp.bfloat16:
                # bf16 strip (prepare_chunked(hub_dtype=bf16), OPT-IN —
                # faster standalone but measured slower inside the
                # production hop-stacking scan, so NOT the default):
                # halves the (N, k) HBM stream, and the MXU pass is bf16
                # either way under DEFAULT precision, so numerics are
                # unchanged
                xh = jnp.take(x, self.hub_ids, axis=0).astype(jnp.bfloat16)
                y = y + jax.lax.dot(
                    self.hub_m, xh, preferred_element_type=jnp.float32
                ).astype(y.dtype)
                return y
            xh = jnp.take(x, self.hub_ids, axis=0).astype(jnp.float32)
            # HIGH (3-pass bf16) measures the same end-to-end error as
            # HIGHEST (the message path's ~2^-16 dominates) at -0.4 ms/hop;
            # bf16 inputs take DEFAULT (one pass) — its rounding is below
            # the input quantization, -0.9 ms/hop (dev/exp_spmm --micro5)
            prec = (
                jax.lax.Precision.DEFAULT
                if x.dtype == jnp.bfloat16
                else jax.lax.Precision.HIGH
            )
            y = y + jax.lax.dot(self.hub_m, xh, precision=prec).astype(y.dtype)
        return y

    def extras_transpose_vjp(self, g: jnp.ndarray) -> jnp.ndarray:
        """diag/hub part of ``A^T g`` (cotangent of ``apply_extras`` w.r.t x)."""
        dx = jnp.zeros((self.num_nodes, g.shape[1]), g.dtype)
        if self.diag is not None:
            dx = dx + self.diag[:, None].astype(g.dtype) * g
        if self.hub_ids is not None:
            if self.hub_m.dtype == jnp.bfloat16:
                dh = jax.lax.dot(
                    self.hub_m.T,
                    g.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                ).astype(g.dtype)
            else:
                dh = jax.lax.dot(
                    self.hub_m.T,
                    g.astype(jnp.float32),
                    precision=jax.lax.Precision.HIGH,
                ).astype(g.dtype)
            dx = dx.at[self.hub_ids].add(dh)
        return dx


def _select_hubs(
    src: np.ndarray, n: int, hub_k, max_hub_bytes: int, cutoff_div: int = 700
):
    """Pick hub sources worth the dense path.

    A dense hub column costs one streamed read of N·4 bytes per hop
    (~N·5ps at v5e HBM bandwidth); a gathered edge costs ~3.5 ns.  A node
    pays its way when out-degree ≥ N·4B/BW / 3.5ns ≈ N/700 — re-swept and
    confirmed for the f32 strip (``--micro6``) AND for the bf16 strip
    (``--hub16``: cut1050/1400 within noise of cut700, cut2100 strictly
    worse — the strip is not purely stream-bound, so the halved bytes do
    not halve the breakeven).
    """
    if hub_k in (0, None):
        return None
    counts = np.bincount(src, minlength=n)
    if hub_k == "auto":
        cutoff = max(n // cutoff_div, 32)
        k = int(np.count_nonzero(counts >= cutoff))
    else:
        k = int(hub_k)
    k = min(k, 8192, max_hub_bytes // max(4 * n, 1))
    if k < 16:
        return None
    return np.argpartition(-counts, k - 1)[:k].astype(np.int32)


def split_extras(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    n: int,
    *,
    split_diag: bool = True,
    hub_k="auto",
    max_hub_bytes: int = 512 << 20,
    hub_dtype=None,
):
    """Host-side split of self-loops and hub-source edges out of an edge
    list.  Returns ``(src, dst, w, diag, hub_ids, hub_m)`` with the split
    edges removed (``diag``/``hub_*`` are None when not taken).

    Measured v5e quirk: adding ``diag ⊙ x`` to the Pallas output WITHOUT
    the hub matmul in the same sum de-fuses the XLA gather pipeline and
    costs far more than the removed rows save (26.5 → 42.9 ms/hop on the
    5.2M edge bench); with the hub matmul present the same add is free.
    So the diag split is only taken together with the hub split.
    """
    hub_np = np.dtype(np.float32)
    if hub_dtype is not None and jnp.dtype(hub_dtype) == jnp.bfloat16:
        # bf16 strip: halves the (N, k) stream.  Opt-in only — faster in
        # keep-last loops, slower in the production hop-stacking scan
        # (see prepare_chunked docstring / docs/PERFORMANCE.md round 4).
        # The degree cutoff stays N/700 either way (swept)
        import ml_dtypes

        hub_np = np.dtype(ml_dtypes.bfloat16)
    selfm = src == dst
    hubs = _select_hubs(src[~selfm], n, hub_k, max_hub_bytes)

    diag = None
    if split_diag and hubs is not None and bool(np.any(selfm)):
        diag = np.zeros(n, np.float32)
        np.add.at(diag, dst[selfm], w[selfm])
        src, dst, w = src[~selfm], dst[~selfm], w[~selfm]

    hub_ids = hub_m = None
    if hubs is not None:
        k = hubs.shape[0]
        col = np.full(n, -1, np.int64)
        col[hubs] = np.arange(k)
        hubm = col[src] >= 0
        # bincount instead of np.add.at: ~10x faster at tens of millions of
        # hub edges (add.at is a per-element ufunc loop)
        flat = dst[hubm].astype(np.int64) * k + col[src[hubm]]
        hub_m = np.bincount(flat, weights=w[hubm], minlength=n * k).reshape(
            n, k
        ).astype(hub_np)
        src, dst, w = src[~hubm], dst[~hubm], w[~hubm]
        hub_ids = hubs
    return src, dst, w, diag, hub_ids, hub_m


def prepare_chunked(
    adj: SparseAdj,
    *,
    split_diag: bool = True,
    hub_k="auto",
    max_hub_bytes: int = 512 << 20,
    chunk: Optional[int] = None,
    hub_dtype=None,
) -> ChunkedAdj:
    """Re-layout a dst-sorted ``SparseAdj`` into per-tile whole chunks.

    Every tile (even an empty one) gets at least one chunk so its output
    block is always written.  Host-side numpy; run once per graph and reuse
    across hops/epochs.  ``split_diag``/``hub_k`` move self-loops and
    high-out-degree sources out of the gather path (see :class:`ChunkedAdj`).

    ``hub_dtype=jnp.bfloat16`` stores the dense hub strip in bf16 (half
    the strip stream; numerics unchanged — the MXU pass is bf16 either
    way under DEFAULT precision).  Measured harness-dependent: −0.47
    ms/hop in a keep-last ``fori_loop`` chain, but **+0.17 ms/hop in the
    production hop-stacking scan** (XLA hoists the f32 strip's one-time
    conversion out of the scan), so it is NOT the default — opt in only
    for keep-last pipelines (docs/PERFORMANCE.md round 4).
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

    src, dst, w, diag, hub_ids, hub_m = split_extras(
        src, dst, w, n, split_diag=split_diag, hub_k=hub_k,
        max_hub_bytes=max_hub_bytes, hub_dtype=hub_dtype,
    )

    out_src, out_dst, out_w, chunk_tile = chunk_layout_np(
        src, dst, w, n, chunk or CHUNK
    )
    return ChunkedAdj(
        jnp.asarray(out_src),
        jnp.asarray(out_dst),
        jnp.asarray(out_w),
        jnp.asarray(chunk_tile),
        num_nodes=n,
        diag=None if diag is None else jnp.asarray(diag),
        hub_ids=None if hub_ids is None else jnp.asarray(hub_ids),
        hub_m=None if hub_m is None else jnp.asarray(hub_m),
    )


def _round_up_arr(x: np.ndarray, m: int) -> np.ndarray:
    return ((x + m - 1) // m) * m


def chunk_layout_np(
    src: np.ndarray, dst: np.ndarray, w: np.ndarray, n: int, chunk: int
):
    """Core tile-chunk re-layout, host-side numpy (shared by the in-HBM,
    streaming, and out-of-core preparers).  ``dst`` must be sorted; every
    output tile (even an empty one) gets at least one chunk so the kernel
    always writes its block.  Returns (src, dst, w, chunk_tile) numpy
    arrays; padding slots carry ``w == 0`` with in-tile dst rows."""
    n_tiles = _round_up(n, TILE_R) // TILE_R
    tile_of = dst // TILE_R
    counts = np.bincount(tile_of, minlength=n_tiles)
    padded = np.maximum(_round_up_arr(counts, chunk), chunk)
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
    chunk_tile = np.repeat(np.arange(n_tiles, dtype=np.int32), (padded // chunk))
    return out_src, out_dst, out_w, chunk_tile


def _make_seg_kernel(single: bool, accumulate: bool):
    """Build one of the four segment-reduce kernel bodies.

    All four share the one-hot MXU reduction core; the two axes of
    variation are static Python here so every variant still traces to a
    straight-line kernel:

    * ``single`` — bf16 features carry one message array (no lo half);
      f32 fidelity does two MXU passes (hi + lo bf16 halves).
    * ``accumulate`` — the streaming path aliases the caller's global
      accumulator as the output and LOADS the live block on a tile's
      first chunk instead of zeroing (overlap-add across parts); it also
      carries an ``off`` scalar-prefetch operand consumed only by the
      wrapper's index maps.  The ring path measured the opposite
      preference and keeps the zero-init form (dev/exp_ringacc.py).
    """

    def kernel(*refs):
        if accumulate:
            ct_ref, _off_ref, *refs = refs  # off drives the index maps only
        else:
            ct_ref, *refs = refs
        dst_ref, hi_ref = refs[0], refs[1]
        lo_ref = None if single else refs[2]
        acc_ref = refs[-2] if accumulate else None
        out_ref = refs[-1]

        c = pl.program_id(0)
        tile = ct_ref[c]
        is_first = jnp.logical_or(c == 0, ct_ref[jnp.maximum(c - 1, 0)] != tile)

        @pl.when(is_first)
        def _():
            out_ref[:] = acc_ref[:] if accumulate else jnp.zeros_like(out_ref)

        chunk = dst_ref.shape[-1]
        tile_r = out_ref.shape[0]
        local = dst_ref[0] - tile * tile_r  # (1, chunk)
        rows = jax.lax.broadcasted_iota(jnp.int32, (tile_r, chunk), 0)
        onehot = (local == rows).astype(jnp.bfloat16)  # (tile_r, chunk)

        def mm(m):
            return jax.lax.dot_general(
                onehot,
                m,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        upd = mm(hi_ref[0])
        if not single:
            upd = upd + mm(lo_ref[0])
        out_ref[:] += upd

    return kernel


_seg_kernel_single = _make_seg_kernel(single=True, accumulate=False)
_seg_kernel = _make_seg_kernel(single=False, accumulate=False)


@functools.partial(
    jax.jit, static_argnames=("num_nodes", "interpret", "tile_r")
)
def _segment_reduce_mxu(
    hi, lo, dst, chunk_tile, num_nodes: int, interpret: bool = False,
    tile_r: int = TILE_R,
):
    """Tile-chunked segment sum via the Pallas kernel.

    hi/lo: [E', D] bf16 message halves (E' = n_chunks * chunk, D % 128 == 0).
    ``lo=None`` selects the single-matmul variant (bf16 fidelity — used when
    the caller's features are bf16 anyway, halving message HBM traffic).
    dst:   [E'] int32; chunk_tile: [n_chunks] int32 (non-decreasing).
    The chunk size is derived from the shapes (layouts built with any
    ``prepare_chunked`` chunk setting stay valid).

    ``tile_r`` is the output-block height in rows (default 128).  Wider
    blocks let one chunk cover what would otherwise be ``tile_r/128``
    tiles — the lever that removes the ring layout's per-tile coverage
    floor (every bucket must chunk every block it writes) at pod-scale P.
    The one-hot grows to (tile_r, chunk), costing ~tile_r/128 more MXU per
    slot, so wide blocks only pay where they delete padding slots — the
    layout builder's cost model decides.
    """
    e_pad, d = hi.shape
    n_chunks = chunk_tile.shape[0]
    chunk = e_pad // n_chunks
    assert e_pad == n_chunks * chunk and d % 128 == 0
    assert tile_r % TILE_R == 0
    n_tiles = pl.cdiv(num_nodes, tile_r)
    hi3 = hi.reshape(n_chunks, chunk, d)
    dst3 = dst.reshape(n_chunks, 1, chunk)
    msg_spec = pl.BlockSpec((1, chunk, d), lambda c, ct: (c, 0, 0))
    in_specs = [pl.BlockSpec((1, 1, chunk), lambda c, ct: (c, 0, 0)), msg_spec]
    operands = [dst3, hi3]
    if lo is None:
        kernel = _seg_kernel_single
        passes = 1
    else:
        kernel = _seg_kernel
        passes = 2
        in_specs.append(msg_spec)
        operands.append(lo.reshape(n_chunks, chunk, d))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tile_r, d), lambda c, ct: (ct[c], 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile_r, d), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * passes * e_pad * tile_r * d,
            bytes_accessed=e_pad * (d * 2 * passes + 4) + n_tiles * tile_r * d * 4,
            transcendentals=0,
        ),
    )(chunk_tile, *operands)
    return out[:num_nodes]


_seg_kernel_single_acc = _make_seg_kernel(single=True, accumulate=True)
_seg_kernel_acc = _make_seg_kernel(single=False, accumulate=True)


@functools.partial(
    jax.jit, static_argnames=("interpret", "tile_r"), donate_argnums=(4,)
)
def _segment_reduce_mxu_acc(
    hi, lo, dst, chunk_tile, acc, off_tiles, interpret: bool = False,
    tile_r: int = TILE_R,
):
    """Streaming variant of :func:`_segment_reduce_mxu`: accumulates the
    part's tile contributions INTO ``acc`` in place.

    ``acc`` is the full (n_total, D) f32 accumulator; ``off_tiles`` is a
    (1,) int32 array holding the part's global tile offset — data, not a
    static, so all parts of a streaming graph share ONE compiled kernel
    (the offset rides scalar prefetch into the output index map).  Blocks
    the grid never visits keep their prior ``acc`` contents (the aliased
    output IS the input buffer), which is exactly the overlap-add the
    mid-tile part splits need.  Saves 2 HBM touches of the part's output
    window per part vs the out-buffer + ``y.at[o:o+v].add`` form —
    measured 16.62 → 16.31 ms/hop on the ×4-part bench (the win matches
    the window-traffic arithmetic; docs/PERFORMANCE.md).  The ring path
    measured the OPPOSITE (dev/exp_ringacc.py) and keeps out+add: its
    buckets revisit every tile P times, so the first-visit load costs
    more than the small window add it replaces.
    """
    e_pad, d = hi.shape
    n_chunks = chunk_tile.shape[0]
    chunk = e_pad // n_chunks
    assert e_pad == n_chunks * chunk and d % 128 == 0
    assert tile_r % TILE_R == 0
    assert acc.shape[0] % tile_r == 0 and acc.shape[1] == d
    hi3 = hi.reshape(n_chunks, chunk, d)
    dst3 = dst.reshape(n_chunks, 1, chunk)
    msg_spec = pl.BlockSpec((1, chunk, d), lambda c, ct, off: (c, 0, 0))
    out_map = lambda c, ct, off: (ct[c] + off[0], 0)
    acc_spec = pl.BlockSpec((tile_r, d), out_map, memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 1, chunk), lambda c, ct, off: (c, 0, 0)),
        msg_spec,
    ]
    operands = [dst3, hi3]
    if lo is None:
        kernel = _seg_kernel_single_acc
        passes = 1
    else:
        kernel = _seg_kernel_acc
        passes = 2
        in_specs.append(msg_spec)
        operands.append(lo.reshape(n_chunks, chunk, d))
    in_specs.append(acc_spec)
    operands.append(acc)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=acc_spec,
    )
    # alias index counts ALL pallas_call inputs including the two scalar-
    # prefetch operands (verified both conventions, dev/exp_acc_alias.py:
    # the other one shape-errors): ct, off, dst3, hi3[, lo3], acc
    alias_idx = 4 + passes - 1
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(acc.shape, jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        input_output_aliases={alias_idx: 0},
        cost_estimate=pl.CostEstimate(
            flops=2 * passes * e_pad * tile_r * d,
            bytes_accessed=e_pad * (d * 2 * passes + 4)
            + 2 * n_chunks * tile_r * d * 4,
            transcendentals=0,
        ),
    )(chunk_tile, off_tiles, *operands)


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
    xp = x if d_pad == d else jnp.pad(x, ((0, 0), (0, d_pad - d)))
    # pad x's columns BEFORE the gather: padding the (E, d) gather output
    # instead would materialize the full f32 message buffer (10 GB at
    # products scale) because the pad breaks the gather->bf16 write fusion
    msgs = jnp.take(xp, adj.src, axis=0).astype(jnp.float32) * adj.w[:, None]
    hi = msgs.astype(jnp.bfloat16)
    if x.dtype == jnp.bfloat16:
        # bf16 features: one bf16 rounding of the weighted message is the
        # same error scale as the input quantization itself — single-pass
        # kernel, half the message HBM traffic
        lo = None
    else:
        # hi/lo bf16 halves as separate arrays: each output's write fuses
        # with the gather (a concat would force an extra materialize+copy
        # pass); hi + lo reconstructs f32 to ~2^-16 relative error
        lo = (msgs - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    out = _segment_reduce_mxu(
        hi, lo, adj.dst, adj.chunk_tile, num_nodes=adj.num_nodes, interpret=interpret
    )
    return adj.apply_extras(x, out[:, :d]).astype(x.dtype)


def prepare_chunked_multi(adjs):
    """Chunk layout for R adjacencies sharing (src, dst) with different
    weights (e.g. one graph under several normalization exponents).

    Returns ``(struct, w_stack)``: one :class:`ChunkedAdj` carrying the
    shared structure and an ``(R, E')`` weight stack in the same edge
    layout.  diag/hub splits are disabled — their dense carriers would be
    per-r.  Use with :func:`spmm_pallas_multi`.
    """
    chs = [
        prepare_chunked(a, split_diag=False, hub_k=0) for a in adjs
    ]  # identical structure: prepare_chunked is deterministic in (src, dst)
    return chs[0], jnp.stack([c.w for c in chs])


@functools.partial(jax.jit, static_argnames=("interpret",))
def spmm_pallas_multi(
    struct: ChunkedAdj, w_stack: jnp.ndarray, x: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """R simultaneous SpMMs over shared structure: ``y[r] = A_r @ x[r]``.

    The per-edge feature-row gather is payload-size-independent (measured
    ~3.5 ns/row on v5e for 256 B–1 KB rows), so gathering all R feature
    blocks as one ``(N, R·D)`` row costs the same as one block — and the
    scatter side runs through the one-hot MXU kernel, whose cost is
    bandwidth-proportional (unlike XLA's payload-bound ``segment_sum``,
    which loses 2.3x when stacked this way — measured).
    """
    r, n, d = x.shape
    d_pad = _round_up(d, 128)
    xp = x if d_pad == d else jnp.pad(x, ((0, 0), (0, 0), (0, d_pad - d)))
    xs = jnp.moveaxis(xp, 0, 1).reshape(n, r * d_pad)
    msgs = jnp.take(xs, struct.src, axis=0).astype(jnp.float32)
    msgs = msgs.reshape(-1, r, d_pad) * w_stack.T[:, :, None]
    msgs = msgs.reshape(-1, r * d_pad)
    hi = msgs.astype(jnp.bfloat16)
    if x.dtype == jnp.bfloat16:
        lo = None
    else:
        lo = (msgs - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    out = _segment_reduce_mxu(
        hi, lo, struct.dst, struct.chunk_tile,
        num_nodes=struct.num_nodes, interpret=interpret,
    )
    out = out[:n].reshape(n, r, d_pad)[:, :, :d]
    return jnp.moveaxis(out, 1, 0).astype(x.dtype)


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


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class StackedParts:
    """All parts stacked on a leading axis so the whole streaming SpMM runs
    as ONE jitted ``lax.scan`` — one kernel launch per hop instead of one
    per part (a ~31 ms dispatch each over a tunneled link; launch overhead
    on real chips too), with peak memory still one part's buffers (scan
    temporaries are per-iteration)."""

    src: jnp.ndarray  # (Pn, E_b) int32
    dst: jnp.ndarray  # (Pn, E_b) int32, part-local rows
    w: jnp.ndarray  # (Pn, E_b) f32
    chunk_tile: jnp.ndarray  # (Pn, C) int32
    # STATIC layout metadata (pytree aux, not leaves): row offsets and
    # valid rows are layout constants, and keeping them static lets the
    # scan unroll into static-window accumulator updates — measured ~1
    # ms/part cheaper than lax.scan + dynamic slices (round 5,
    # dev/exp_stream_parts.py)
    tile_offset: tuple  # (Pn,) ints, ×1 = global row offset (pre-scaled)
    valid_rows: tuple  # (Pn,) ints = n_tiles·TILE_R per part

    def tree_flatten(self):
        return (
            self.src,
            self.dst,
            self.w,
            self.chunk_tile,
        ), (self.tile_offset, self.valid_rows)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    @property
    def num_parts(self) -> int:
        return int(self.src.shape[0])


def stack_parts(parts) -> StackedParts:
    return StackedParts(
        jnp.stack([p.src for p in parts]),
        jnp.stack([p.dst for p in parts]),
        jnp.stack([p.w for p in parts]),
        jnp.stack([p.chunk_tile for p in parts]),
        tuple(int(p.tile_offset) * TILE_R for p in parts),
        tuple(int(p.n_tiles) * TILE_R for p in parts),
    )


def prepare_chunked_parts(
    adj: SparseAdj,
    # 6M swept best at products scale on v5e (dev/exp_stream_sweep.py):
    # 4M pays more per-part dispatch, 16M OOMs the scan (per-part f32
    # msgs + hi/lo ≈ 24 B/slot-col resident at once)
    max_edges_per_part: int = 6 << 20,
    *,
    split_diag: bool = True,
    hub_k="auto",
    max_hub_bytes: int = 512 << 20,
    hub_dtype=None,
):
    """Split a graph into tile-aligned parts so each part's message buffers
    fit in HBM — the single-chip path to billion-edge graphs (ogbn-products /
    papers100M scale), where an (E, D) message buffer cannot materialize.

    Parts share one kernel compilation: chunk and tile counts are padded to
    the per-part maxima.  The diag/hub splits apply globally (outside the
    part loop); ``max_hub_bytes`` caps the dense hub strip, which shrinks
    the hub count automatically as N grows (at papers100M scale the strip
    is disabled entirely).
    """
    full = prepare_chunked(
        adj, split_diag=split_diag, hub_k=hub_k, max_hub_bytes=max_hub_bytes,
        hub_dtype=hub_dtype,
    )
    chunk_tile = np.asarray(full.chunk_tile)
    n_chunks = chunk_tile.shape[0]
    chunk = full.src.shape[0] // n_chunks
    max_chunks = max(max_edges_per_part // chunk, 1)
    # split even mid-tile: a single output tile can hold tens of millions
    # of in-edges (power-law dst hubs), so tile-boundary-only splits cannot
    # bound part size.  Parts that share a tile produce partial sums;
    # spmm_pallas_streaming overlap-ADDS part outputs instead of
    # concatenating.  Splits are BALANCED (all parts within one chunk of
    # each other) because every part pads to the largest one — fixed
    # max_chunks strides left the trailing part ~90% padding, ~1M wasted
    # gather slots on the 5.2M bench (measured round 2).
    n_parts = -(-n_chunks // max_chunks)
    bounds = np.linspace(0, n_chunks, n_parts + 1).round().astype(int)
    splits = list(np.unique(bounds))
    part_chunks = max(np.diff(splits))
    parts = []
    src = np.asarray(full.src)
    dst = np.asarray(full.dst)
    w = np.asarray(full.w)
    for lo, hi in zip(splits[:-1], splits[1:]):
        t_lo = int(chunk_tile[lo])
        t_hi = int(chunk_tile[hi - 1]) + 1
        pad_c = part_chunks - (hi - lo)
        e_lo, e_hi = lo * chunk, hi * chunk
        last_tile = t_hi - t_lo - 1  # padding must keep chunk_tile
        # non-decreasing, else the revisit logic would re-zero an earlier tile
        p_src = np.concatenate([src[e_lo:e_hi], np.zeros(pad_c * chunk, np.int32)])
        p_dst = np.concatenate(
            [dst[e_lo:e_hi] - t_lo * TILE_R,
             np.full(pad_c * chunk, last_tile * TILE_R, np.int32)]
        ).astype(np.int32)
        p_w = np.concatenate([w[e_lo:e_hi], np.zeros(pad_c * chunk, np.float32)])
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
    real_edges = int(np.count_nonzero(w))
    slots = part_chunks * chunk * len(parts)
    logging.getLogger(__name__).info(
        "streaming parts: %d parts x %d chunks (%d real edges in %d slots, "
        "%.2fx padding incl per-part chunk waste)",
        len(parts), part_chunks, real_edges, slots,
        slots / max(real_edges, 1),
    )
    extras = ChunkedAdj(
        # structure-free carrier for the global diag/hub contributions
        jnp.zeros(0, jnp.int32),
        jnp.zeros(0, jnp.int32),
        jnp.zeros(0, jnp.float32),
        jnp.zeros(0, jnp.int32),
        num_nodes=full.num_nodes,
        diag=full.diag,
        hub_ids=full.hub_ids,
        hub_m=full.hub_m,
    )
    return stack_parts(parts), full.num_nodes, max_tiles, extras


#: unroll the streaming part loop up to this many parts (static windows,
#: measured ~1 ms/part cheaper than lax.scan); deeper graphs scan to keep
#: compile time linear-but-bounded
_STREAM_UNROLL_MAX = 24


@functools.partial(
    jax.jit, static_argnames=("n_rows", "num_nodes", "interpret")
)
def _streaming_scan(
    stk: StackedParts,
    extras: ChunkedAdj,
    x,
    n_rows: int,
    num_nodes: int,
    interpret: bool = False,
):
    d = x.shape[1]
    d_pad = _round_up(d, 128)
    xp = x if d_pad == d else jnp.pad(x, ((0, 0), (0, d_pad - d)))
    single = x.dtype == jnp.bfloat16  # same dispatch as _spmm_pallas_impl
    # the f32 upcast of the gather source is MEASURED-kept for bf16 too
    # (round 5, products config: native-bf16 gather 0.456 s/hop vs 0.420
    # with the upcast): the gather is transaction-bound and payload-
    # independent, so halving row bytes saves nothing, while gathering
    # pre-cast f32 rows saves the per-edge cast on the 6M-row message path
    xp = xp.astype(jnp.float32)
    # the accumulator keeps an n_rows overhang so every part's window is
    # in-bounds (no start-index clamping double-adds)
    n_total = _round_up(num_nodes, TILE_R) + n_rows
    n_parts = int(stk.src.shape[0])

    def make_msgs(src, w):
        # the message pipeline is perf-load-bearing (the f32-upcast gather
        # decision lives here — see "Falsified alternatives" in
        # docs/PERFORMANCE.md); both part-loop forms below must share it
        msgs = jnp.take(xp, src, axis=0) * w[:, None]
        hi = msgs.astype(jnp.bfloat16)
        lo = None if single else (msgs - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    def produce(src, w, dst, ct):
        hi, lo = make_msgs(src, w)
        return _segment_reduce_mxu(
            hi, lo, dst, ct, num_nodes=n_rows, interpret=interpret
        )

    y0 = jnp.zeros((n_total, d_pad), jnp.float32)
    if n_parts <= _STREAM_UNROLL_MAX:
        # unrolled part loop, accumulating IN PLACE: each part's kernel
        # aliases the global accumulator as its output and loads the live
        # block on first visit, so the per-part (n_rows, d_pad) out buffer
        # and the y.at[o:o+v].add read-modify-write never exist.  Round-5
        # history at 4 parts on the 5M-edge bench: scan + dynamic windows
        # 20.3 → unrolled static at[].add windows 16.6 → aliased
        # accumulate (this form) 16.3 ms/hop.  Most of the unroll win was
        # launch + dynamic-slice overhead; the aliasing retires the
        # remaining window out-buffer write and read-modify-add
        # (~0.1 ms/part of HBM touches — measured, dev/exp_acc_alias.py).
        y = y0
        for i in range(n_parts):
            hi, lo = make_msgs(stk.src[i], stk.w[i])
            off = jnp.asarray([stk.tile_offset[i] // TILE_R], jnp.int32)
            y = _segment_reduce_mxu_acc(
                hi, lo, stk.dst[i], stk.chunk_tile[i], y, off,
                interpret=interpret,
            )
    else:
        # scan keeps compile time bounded for very deep part counts
        row_ids = jnp.arange(n_rows, dtype=jnp.int32)

        def body(y, part):
            src, dst, w, ct, off, valid = part
            out = produce(src, w, dst, ct)
            # rows past the part's real tiles are never written by the kernel
            out = jnp.where((row_ids < valid)[:, None], out, 0.0)
            cur = jax.lax.dynamic_slice(y, (off, 0), (n_rows, d_pad))
            return jax.lax.dynamic_update_slice(y, cur + out, (off, 0)), None

        y, _ = jax.lax.scan(
            body,
            y0,
            (stk.src, stk.dst, stk.w, stk.chunk_tile,
             jnp.asarray(stk.tile_offset, jnp.int32),
             jnp.asarray(stk.valid_rows, jnp.int32)),
        )
    y = y[:num_nodes, :d]
    return extras.apply_extras(x, y).astype(x.dtype)


def spmm_pallas_streaming(parts_bundle, x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """``y = adj @ x`` over stacked parts in one jitted scan; peak device
    memory is one part's message buffers instead of the whole graph's.
    Consecutive parts may share a boundary tile (mid-tile splits), so
    partial sums overlap-ADD into the accumulator."""
    stk, num_nodes, max_tiles, extras = parts_bundle
    return _streaming_scan(
        stk,
        extras,
        x,
        n_rows=max_tiles * TILE_R,
        num_nodes=num_nodes,
        interpret=interpret,
    )


def _spmm_pallas_fwd(adj, x, interpret):
    return _spmm_pallas_impl(adj, x, interpret), adj


def _spmm_pallas_bwd(interpret, adj, g):
    # d/dx (A x) applied to cotangent g is A^T g (off the hot path)
    dx = spmm_segment(adj.transpose_sparse(), g)
    dx = dx + adj.extras_transpose_vjp(g)
    return (None, dx)


spmm_pallas.defvjp(_spmm_pallas_fwd, _spmm_pallas_bwd)
