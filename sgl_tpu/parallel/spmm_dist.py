"""Distributed k-hop propagation: 1-D node partition + ring feature exchange.

This fills the reference's main scalability gap (SURVEY.md §2.9: precompute
is a single-process CPU job).  Design — the ring-attention analog for
graphs:

* nodes are block-partitioned over the mesh axis ``graph``: device ``p``
  owns feature rows ``[p·B, (p+1)·B)`` and **all edges whose dst lies in its
  block** (so accumulation is device-local, no scatter across devices);
* per-device edges are bucketed by *source block*; at ring step ``s`` device
  ``p`` holds source block ``(p - s) mod P`` of ``x`` and consumes exactly
  that bucket, then the blocks rotate via ``ppermute`` over ICI;
* the next block is sent while the current bucket's SpMM runs, so the ring
  transfer overlaps compute exactly like ring attention overlaps KV blocks;
* per-hop comm volume is ``N·D`` bytes per device ring-total — the minimum
  for unstructured SpMM without replicating ``x``; per-device memory is
  ``O(N/P · D)``.

Buckets are padded to a common static size (degree skew → padding waste is
the known cost; see SURVEY.md §7 hard parts), with ``w == 0`` killing padded
contributions.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sgl_tpu.kernels.sparse import SparseAdj


logger = logging.getLogger(__name__)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def ring_padding_stats(dadj) -> dict:
    """Padded-slot accounting for a ring layout (``DistAdj`` or
    :class:`DistChunkedAdj`).

    Both layouts pad every (owner, source-block) bucket to a common static
    size — on power-law graphs one hub-heavy bucket inflates all P² buckets
    (diag/hub splits in the chunked layout pull the worst offenders out of
    the buckets first).  ``ratio`` = allocated slots / real edges; the SpMM
    does useless work proportional to it, so it must stay visible rather
    than silently capping throughput.
    """
    w = np.asarray(dadj.w)
    real = int((w != 0).sum())
    slots = int(w.size)
    return {
        "real_edges": real,
        "padded_slots": slots,
        "ratio": slots / max(real, 1),
    }


def ring_bucket_work_time(
    dadj,
    feat_dim: int = 128,
    dtype=jnp.float32,
    interpret: bool = False,
    rounds: int = 3,
    iters: int = 2,
    chain=(2, 6),
) -> float:
    """Measure one hop of PER-DEVICE bucket work (s/hop) for a chunked ring
    layout on the current default device.

    Times the full per-bucket pipeline — block gather → weighted hi/lo
    messages → one-hot MXU reduce — chained loop-carried over all P²
    buckets, exactly the per-hop compute each pod device does (the
    ppermute overlaps it and is layout-invariant, so bucket work is the
    quantity that discriminates layouts).  Slope timing between a
    ``chain[0]``- and ``chain[1]``-hop program cancels the fixed
    dispatch+readback cost (~31 ms on the tunneled dev chip); the
    interleaved-min protocol over ``rounds`` is chip-noise-robust
    (dev/exp_spmm.py's method).  Feature content does not affect timing;
    synthetic rows are generated at ``feat_dim``/``dtype``.
    """
    import time as _time

    from sgl_tpu.kernels.pallas_spmm import _segment_reduce_mxu

    p = dadj.num_partitions
    # the kernel operates on lane-padded widths; generate at d_pad (what
    # the production pipeline feeds it for this feat_dim)
    d = _round_up(max(int(feat_dim), 1), 128)
    e_b = dadj.src.shape[-1]
    c_max = dadj.chunk_tile.shape[-1]
    src = dadj.src.reshape(p * p, e_b)
    dst = dadj.dst.reshape(p * p, e_b)
    w = dadj.w.reshape(p * p, e_b)
    ct = dadj.chunk_tile.reshape(p * p, c_max)
    block = dadj.block
    tile_r = dadj.tile_rows
    single = jnp.dtype(dtype) == jnp.bfloat16
    owner_block = jnp.arange(p * p, dtype=jnp.int32) % p
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((p * block, d)), dtype
    ).reshape(p, block, d)

    def make(k):
        def run(xp):
            def hop(carry, _):
                def bkt(acc, i):
                    # loop-carry dependence WITHOUT dtype promotion: an
                    # f32 scalar added to a bf16 block would upcast the
                    # whole gather source and time the wrong pipeline
                    xb = (jnp.take(xp, owner_block[i], axis=0)
                          + carry.astype(xp.dtype) * 0)
                    msgs = (
                        jnp.take(xb, src[i], axis=0).astype(jnp.float32)
                        * w[i][:, None]
                    )
                    hi = msgs.astype(jnp.bfloat16)
                    lo = (
                        None
                        if single
                        else (msgs - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                    )
                    out = _segment_reduce_mxu(
                        hi, lo, dst[i], ct[i], num_nodes=block,
                        tile_r=tile_r, interpret=interpret,
                    )
                    return acc + out[0, 0], None

                acc, _ = jax.lax.scan(
                    bkt, jnp.float32(0), jnp.arange(p * p, dtype=jnp.int32)
                )
                return acc * 1e-20, None

            acc, _ = jax.lax.scan(hop, jnp.float32(0), None, length=k)
            return acc

        return jax.jit(run)

    k1, k2 = chain
    fns = {k: make(k) for k in (k1, k2)}

    def timed(fn):
        float(fn(x))  # compile + warm
        ts = []
        for _ in range(iters):
            t0 = _time.perf_counter()
            float(fn(x))
            ts.append(_time.perf_counter() - t0)
        return min(ts)

    best = np.inf
    for _ in range(rounds):
        t1 = timed(fns[k1])
        t2 = timed(fns[k2])
        best = min(best, (t2 - t1) / (k2 - k1))
    return float(best)


_PADDING_WARN_RATIO = 2.0


def _report_padding(dadj, kind: str) -> None:
    stats = ring_padding_stats(dadj)
    logger.info(
        "%s ring layout: %d real edges in %d slots (%.2fx padding, P=%d)",
        kind,
        stats["real_edges"],
        stats["padded_slots"],
        stats["ratio"],
        dadj.num_partitions,
    )
    if stats["ratio"] > _PADDING_WARN_RATIO:
        # Per-owner bucket sizes cannot vary under SPMD (every device's
        # shard must be shape-equal).  The chunked layout already applies
        # four mitigations (node shuffle, model-driven (tile_rows, chunk)
        # selection incl. multi-tile output blocks, dst super-hub strip);
        # a ratio still above the threshold usually reflects a time-
        # optimal pick that tolerates padding (the model prices padded
        # slots) — fewer partitions or a larger hub budget are the levers
        # left if the throughput itself disappoints.
        warnings.warn(
            f"{kind} ring buckets are {stats['ratio']:.1f}x padded "
            f"({stats['padded_slots']} slots for {stats['real_edges']} edges); "
            "consider a larger hub_k (chunked layout) or fewer partitions",
            stacklevel=3,
        )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DistAdj:
    """Edge buckets for the ring schedule.

    ``src``/``dst``/``w`` have shape ``(P, P, E_b)``: leading axis = owning
    device (dst block), second axis = source block, ``E_b`` = padded bucket
    size.  Local ids: ``src`` is offset within its source block, ``dst``
    offset within the owner's block.
    """

    src: jnp.ndarray
    dst: jnp.ndarray
    w: jnp.ndarray
    num_nodes: int
    block: int  # rows per device

    def tree_flatten(self):
        return (self.src, self.dst, self.w), (self.num_nodes, self.block)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    @property
    def num_partitions(self) -> int:
        return int(self.src.shape[0])


def partition_adj(adj: SparseAdj, num_partitions: int, bucket_multiple: int = 8) -> DistAdj:
    """Host-side partition of a normalized adjacency into ring buckets."""
    p = num_partitions
    n = adj.num_nodes
    block = _round_up(n, p) // p
    src = np.asarray(adj.src)
    dst = np.asarray(adj.dst)
    w = np.asarray(adj.w)
    keep = w != 0  # drop padding edges before re-bucketing
    src, dst, w = src[keep], dst[keep], w[keep]
    owner = dst // block
    sblk = src // block
    sizes = np.zeros((p, p), np.int64)
    np.add.at(sizes, (owner, sblk), 1)
    e_b = _round_up(max(int(sizes.max()), 1), bucket_multiple)
    out_src = np.zeros((p, p, e_b), np.int32)
    out_dst = np.zeros((p, p, e_b), np.int32)
    out_w = np.zeros((p, p, e_b), np.float32)
    order = np.lexsort((src, dst, sblk, owner))
    src, dst, w, owner, sblk = (
        src[order],
        dst[order],
        w[order],
        owner[order],
        sblk[order],
    )
    # contiguous runs per (owner, sblk)
    offs = np.concatenate([[0], np.cumsum(sizes.reshape(-1))]).astype(np.int64)
    flat_idx = (owner * p + sblk).astype(np.int64)
    # position of each edge within its bucket
    pos = np.arange(src.shape[0]) - offs[flat_idx]
    out_src[owner, sblk, pos] = (src - sblk * block).astype(np.int32)
    out_dst[owner, sblk, pos] = (dst - owner * block).astype(np.int32)
    out_w[owner, sblk, pos] = w
    out = DistAdj(
        jnp.asarray(out_src),
        jnp.asarray(out_dst),
        jnp.asarray(out_w),
        num_nodes=n,
        block=block,
    )
    _report_padding(out, "segment")
    return out


def pad_features(x, num_partitions: int, block: Optional[int] = None) -> jnp.ndarray:
    """Pad feature rows so the node axis divides evenly across devices.

    bf16 inputs stay bf16 — the ring rotates the feature block every hop,
    so the dtype sets the per-hop ICI volume (bf16 halves it) and selects
    the kernel's single-pass variant; everything else promotes to f32."""
    n, _ = x.shape
    if block is None:
        block = _round_up(n, num_partitions) // num_partitions
    pad = block * num_partitions - n
    x = jnp.asarray(x)
    if x.dtype != jnp.bfloat16:
        x = x.astype(jnp.float32)
    return jnp.pad(x, ((0, pad), (0, 0))) if pad else x


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DistChunkedAdj:
    """Ring buckets in the Pallas tile-chunk layout (+ diag/hub splits).

    The per-device, per-ring-step local SpMM runs the same one-hot MXU
    kernel as the single-chip path (``kernels.pallas_spmm``) instead of an
    XLA ``segment_sum`` (5x slower per chip, measured) — multi-chip scaling
    multiplies the fast kernel, not the slow one.  Two extras ride outside
    the ring:

    * ``diag``: self-loop weights, applied locally (``diag ⊙ x``);
    * ``hub_ids``/``hub_m``: the k highest-out-degree sources bypass the
      ring entirely — their k feature rows are psum-gathered once per hop
      (k·D bytes, negligible next to the N·D ring volume) and applied as a
      local dense ``hub_m_local @ x[hubs]`` matmul.  On power-law graphs
      this removes 30-50% of ring-bucket edges.
    * ``hub_in_ids``/``hub_in_m``: the k highest-IN-degree destinations —
      a dst super-hub's in-edges from one source block all land in one
      (owner, src-block, tile) run, and the densest run sets every
      bucket's padded size, so they are the P≥16 padding driver.  Their
      rows compute as ``yh = psum_p(hub_in_m[:, block_p] @ x_p)`` — each
      device contributes its own column block against the features it owns
      (no rotation), one (k, D) psum per hop — and scatter into the
      owners' output rows.

    Shapes: ``src/dst/w`` are (P, P, C·chunk) with local ids; ``chunk_tile``
    is (P, P, C), non-decreasing per bucket; ``diag``/``hub_m`` rows are
    padded to P·block and row-sharded; ``hub_in_m`` is (k_in, P·block),
    column-sharded.
    """

    src: jnp.ndarray
    dst: jnp.ndarray
    w: jnp.ndarray
    chunk_tile: jnp.ndarray
    diag: Optional[jnp.ndarray]
    hub_ids: Optional[jnp.ndarray]
    hub_m: Optional[jnp.ndarray]
    num_nodes: int
    block: int
    # kernel output-block height in rows (a multiple of 128).  Wide blocks
    # collapse the per-tile coverage floor — every bucket must emit >= 1
    # chunk per 128-row tile it writes, P²·tiles·chunk slots total — by
    # tile_rows/128, at ~tile_rows/128 more MXU per slot; the layout
    # builder's cost model picks the minimizer (round-4 fix for the
    # measured 4.42x padding at P=64).
    tile_rows: int = 128
    # node relabeling (``order[new] = old``): datasets commonly assign ids
    # by degree, clustering every hub into tile 0 of owner 0 — one bucket
    # then inflates all P² bucket paddings (measured 54x at P=64 on a
    # zipf graph).  A fixed shuffle spreads hub *destinations* across
    # owners/tiles; propagation is node-order-equivariant, so the layout
    # permutes features in and un-permutes outputs transparently.
    order: Optional[jnp.ndarray] = None
    hub_in_ids: Optional[jnp.ndarray] = None  # [k_in] int32 (new ids)
    hub_in_m: Optional[jnp.ndarray] = None  # [k_in, P·block] f32
    # (P, P, tiles) f32: 1 where the bucket emits chunks for the tile.
    # With empty-tile skipping the kernel never writes an untouched tile's
    # output block (it would stay uninitialized), so the ring body masks
    # those rows to zero before accumulating.  None = legacy full-coverage
    # layout (every tile chunked in every bucket).
    tile_mask: Optional[jnp.ndarray] = None

    def tree_flatten(self):
        return (
            self.src,
            self.dst,
            self.w,
            self.chunk_tile,
            self.diag,
            self.hub_ids,
            self.hub_m,
            self.order,
            self.hub_in_ids,
            self.hub_in_m,
            self.tile_mask,
        ), (self.num_nodes, self.block, self.tile_rows)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        (src, dst, w, chunk_tile, diag, hub_ids, hub_m, order,
         hub_in_ids, hub_in_m, tile_mask) = leaves
        return cls(
            src, dst, w, chunk_tile, diag, hub_ids, hub_m, *aux,
            order=order, hub_in_ids=hub_in_ids, hub_in_m=hub_in_m,
            tile_mask=tile_mask,
        )

    @property
    def num_partitions(self) -> int:
        return int(self.src.shape[0])


def partition_adj_chunked(
    adj: SparseAdj,
    num_partitions: int,
    *,
    split_diag: bool = True,
    hub_k="auto",
    max_hub_bytes: int = 512 << 20,
    chunk: Optional[int] = None,
    tile_rows: Optional[int] = None,
    shuffle: bool = True,
    shuffle_seed: int = 0,
    skip_empty_tiles: bool = False,
    feat_dim: Optional[int] = None,
    feat_dtype=None,
    measure: bool | str = False,
) -> DistChunkedAdj:
    """Host-side partition into per-(owner, source-block) Pallas chunk
    layouts.  ``block`` is rounded up to the kernel's output-block height.

    ``shuffle`` relabels nodes by a fixed permutation before bucketing
    (see :class:`DistChunkedAdj.order`): degree-ordered node ids cluster
    hub destinations into one tile/owner, and the single densest bucket
    sets every bucket's padded size.

    ``tile_rows`` is the kernel output-block height (``None`` = choose).
    At pod-scale P the padding residual is the per-tile coverage floor —
    every bucket pads every 128-row tile it writes to a whole chunk,
    P²·tiles·chunk slots (measured 4.42x at P=64, docs/PERFORMANCE.md) —
    and wider output blocks divide ``tiles`` down by tile_rows/128.  The
    cost is ~tile_rows/128 more MXU work per slot (the one-hot scatter
    grows), so the builder minimizes a measured-constant model,
    ``slots × (3.5 ns production + 0.34 ns · tile_rows/128 scatter)``,
    jointly over (tile_rows, chunk) instead of slots alone.

    ``skip_empty_tiles`` (opt-in) lets buckets emit chunks only for tiles
    they actually touch; a (P, P, tiles) ``tile_mask`` selects away the
    then-uninitialized output rows after the kernel (``jnp.where``, never
    arithmetic — NaN·0=NaN).  Measured finding (round 3, zipf graphs at
    P=8..160, incl. the 100k-node table graph in docs/PERFORMANCE.md): it
    saves ZERO slots, because the shared bucket size ``e_b`` is set by the
    densest bucket, which always has full tile coverage on power-law
    graphs — hence the default is off (multi-tile output blocks above are
    the fix that works).

    ``measure`` replaces the cost model's hand margin with measurement
    (VERDICT r4 #3): when the RAW model (no margin) prefers a wide-block
    layout over the best 128-row one, BOTH candidates are built and their
    real per-device bucket work is timed on the current device
    (:func:`ring_bucket_work_time` — seconds), and the measured winner is
    returned.  ``True`` forces it; ``"auto"`` measures only when the
    default backend is an accelerator (CPU builds keep the model + 45%
    margin, whose calibrated error bars the margin encodes).  When the
    raw model already prefers 128-row blocks the measurement is skipped —
    the margin only ever affects wide-vs-128 decisions.
    """
    from sgl_tpu.kernels.pallas_spmm import CHUNK, TILE_R, split_extras

    p = num_partitions
    n = adj.num_nodes
    src = np.asarray(adj.src)
    dst = np.asarray(adj.dst)
    w = np.asarray(adj.w)
    keep = w != 0
    src, dst, w = src[keep], dst[keep], w[keep]

    node_order = None
    if shuffle and p > 1:
        rng = np.random.default_rng(shuffle_seed)
        node_order = rng.permutation(n).astype(np.int32)  # node_order[new] = old
        new_of = np.empty(n, np.int64)
        new_of[node_order] = np.arange(n)
        src = new_of[src]
        dst = new_of[dst]

    src, dst, w, diag, hub_ids, hub_m = split_extras(
        src, dst, w, n, split_diag=split_diag, hub_k=hub_k,
        max_hub_bytes=max_hub_bytes,
    )

    # dst-side super-hub split (see class docstring): a node's in-edges
    # from one source block are one indivisible (owner, sblk, tile) run,
    # and every bucket pads to the densest run — pull the top in-degree
    # destinations into a column-sharded dense strip instead.  The strip
    # matrix itself is built later (its column count is block·p, and
    # ``block`` is only fixed after the tile_rows choice below).
    hub_in_ids = None
    hub_in_edges = None
    if hub_k not in (0, None) and p > 1 and src.size:
        block0 = _round_up(-(-n // p), TILE_R)
        in_counts = np.bincount(dst, minlength=n)
        cutoff = max(n // 700, 32)
        k_in = int(np.count_nonzero(in_counts >= cutoff))
        k_in = min(k_in, 4096, max_hub_bytes // max(4 * block0, 1))
        if k_in >= 16:
            hubs_in = np.argpartition(-in_counts, k_in - 1)[:k_in].astype(np.int32)
            row_of = np.full(n, -1, np.int64)
            row_of[hubs_in] = np.arange(k_in)
            m = row_of[dst] >= 0
            hub_in_edges = (row_of[dst[m]], src[m], w[m])
            src, dst, w = src[~m], dst[~m], w[~m]
            hub_in_ids = hubs_in

    # joint (tile_rows, chunk) selection: per candidate R the node blocks
    # re-round (block must be a multiple of R), owners/buckets shift, and
    # the (bucket, tile) run histogram changes — all bincount reductions,
    # effectively free next to the edge sort below
    def _bucket_counts(r):
        blk = _round_up(-(-n // p), r)
        own = dst // blk
        sbk = src // blk
        tls = blk // r
        ld = (dst - own * blk).astype(np.int64)
        flat = (own * p + sbk) * tls + (ld // r)
        cnt = np.bincount(flat, minlength=p * p * tls).reshape(p * p, tls)
        return blk, own, sbk, ld, cnt

    def _slots(cnt, c):
        pad_c = np.maximum(_round_up_arr_np(cnt, c), c)
        if skip_empty_tiles:
            pad_c = np.where(cnt > 0, pad_c, 0)
        return p * p * int(pad_c.sum(axis=1).max()), pad_c

    chunk_cands = (
        (chunk,) if chunk is not None else (32, 64, 128, 192, 256, 384, CHUNK)
    )
    if tile_rows is not None:
        r_cands = (tile_rows,)
    else:
        r_cands = (128, 256, 512, 1024, 2048)
    # VMEM bound: the kernel keeps the (R, d_pad) f32 output block
    # resident across a tile's chunks, plus the (R, chunk) bf16 one-hot
    # and double-buffered (chunk, d_pad) bf16 hi/lo message blocks — at
    # wide D the 2048-row candidates stop fitting, and the same layout
    # that compiled for D=128 would fail at run time.  ``feat_dim``
    # (None = assume 128) lets callers that know the feature width
    # filter candidates; (128, ·) always remains as the fallback.
    d_pad = _round_up(max(int(feat_dim or 128), 1), 128)

    def _fits_vmem(r, c):
        return r * d_pad * 4 + r * c * 2 + 4 * c * d_pad * 2 <= (10 << 20)

    # The VMEM filter applies at EVERY r (the chunk-dependent
    # double-buffered message-block term can blow the budget at r=128
    # too, e.g. d_pad=8192 with chunk=512) — but one candidate, the
    # smallest (r, chunk) the caller's pins allow, stays unconditionally
    # eligible so ``best`` is never None: an explicitly pinned config is
    # honored (an infeasible pin then fails with the compiler's own
    # resource error at the pinned shape, not an opaque TypeError here).
    fallback = (min(r_cands), min(chunk_cands))
    cands = []
    for r in r_cands:
        blk_r, *_rest, cnt_r = _bucket_counts(r)
        for c in chunk_cands:
            if not _fits_vmem(r, c) and (r, c) != fallback:
                continue
            s, _ = _slots(cnt_r, c)
            # measured per-slot model of the FULL bucket pipeline
            # (gather ⊕ hi/lo ⊕ one-hot reduce), fitted to the 25-config
            # (tile_r, chunk) sweep on v5e (dev/exp_spmm --tilecost):
            # ~2.9 ns base (gather-bound production), +0.33 ns per 128
            # output rows (the wider one-hot), +270 ns per CHUNK (grid
            # step + dst-block DMA overhead — why minimum-padding tiny
            # chunks lose in real time despite fewer slots)
            cands.append((s * (2.9 + 0.33 * (r / 128) + 270.0 / c), r, c))

    meas = measure
    if meas == "auto":
        meas = jax.default_backend() != "cpu"
    if meas and tile_rows is None:
        best128 = min((t for t in cands if t[1] == 128), default=None)
        bestwide = min((t for t in cands if t[1] != 128), default=None)
        if (
            best128 is not None
            and bestwide is not None
            and bestwide[0] < best128[0]
        ):
            # the raw model prefers a wide block — settle it by measuring
            # the real per-device bucket work of both candidates (the
            # model's ranking error at small P is what the hand margin
            # below papers over; measurement removes the margin)
            kw = dict(
                split_diag=split_diag, hub_k=hub_k,
                max_hub_bytes=max_hub_bytes, shuffle=shuffle,
                shuffle_seed=shuffle_seed,
                skip_empty_tiles=skip_empty_tiles, feat_dim=feat_dim,
            )
            d_m = int(feat_dim or 128)
            dt_m = feat_dtype if feat_dtype is not None else jnp.float32
            interp = jax.default_backend() == "cpu"
            picked = None
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")  # one padding report at the end
                for _, r_c, c_c in (best128, bestwide):
                    cand = partition_adj_chunked(
                        adj, p, tile_rows=r_c, chunk=c_c, **kw
                    )
                    t_c = ring_bucket_work_time(cand, d_m, dtype=dt_m,
                                                interpret=interp)
                    logger.info(
                        "measured pick: (tile_rows=%d, chunk=%d) -> %.2f ms "
                        "bucket work/hop", r_c, c_c, t_c * 1e3,
                    )
                    if picked is None or t_c < picked[0]:
                        picked = (t_c, cand)
            out = picked[1]
            _report_padding(out, "chunked")
            return out

    def _margined(t):
        # wide blocks must EARN a 45% modeled margin: the end-to-end
        # bucket-chain A/B (dev/exp_ringwork.py) shows the fit's
        # error bars — at P=8 a modeled 1.39x win MEASURED 0.94x
        # (loss) while at P=16 a modeled 1.50x measured 1.22x (win).
        # The margin keeps small-P layouts on the safe 128-row block
        # and still lets coverage-floor-dominated large-P layouts
        # (modeled >=1.8x) take wide blocks.  ``measure`` above replaces
        # this margin with a real A/B.
        cost, r, _ = t
        return cost * 1.45 if r != 128 else cost

    _, tile_r, chunk = min(cands, key=_margined)
    block, owner, sblk, l_dst, counts = _bucket_counts(tile_r)
    tiles = block // tile_r
    n_pad = block * p

    if diag is not None:
        diag = np.pad(diag, (0, n_pad - n))
    if hub_m is not None:
        hub_m = np.pad(hub_m, ((0, n_pad - n), (0, 0)))
    hub_in_m = None
    if hub_in_edges is not None:
        rows_in, src_in, w_in = hub_in_edges
        k_in = hub_in_ids.shape[0]
        hub_in_m = np.bincount(
            rows_in * n_pad + src_in, weights=w_in, minlength=k_in * n_pad
        ).reshape(k_in, n_pad).astype(np.float32)

    _, padded = _slots(counts, chunk)
    c_max = max(int(padded.sum(axis=1).max()) // chunk, 1)
    e_b = c_max * chunk

    out_src = np.zeros((p * p, e_b), np.int32)
    out_dst = np.empty((p * p, e_b), np.int32)
    out_w = np.zeros((p * p, e_b), np.float32)
    out_ct = np.empty((p * p, c_max), np.int32)
    # bucket-local offsets of each tile's padded run
    offs = np.concatenate(
        [np.zeros((p * p, 1), np.int64), np.cumsum(padded, axis=1)], axis=1
    )
    # default dst/chunk_tile: pad trailing chunks with the bucket's LAST
    # chunked tile so the kernel's revisit logic never re-zeroes an
    # earlier tile (with empty-tile skipping the last chunked tile is the
    # last VISITED one; a fully-empty bucket pads against tile 0, which
    # the mask then zeroes)
    for bkt in range(p * p):
        ct = np.repeat(np.arange(tiles, dtype=np.int32), padded[bkt] // chunk)
        pad_chunks = c_max - ct.shape[0]
        pad_tile = int(ct[-1]) if ct.shape[0] else 0
        out_ct[bkt] = np.concatenate(
            [ct, np.full(pad_chunks, pad_tile, np.int32)]
        )
        tile_idx = np.repeat(np.arange(tiles, dtype=np.int32), padded[bkt])
        out_dst[bkt, : tile_idx.shape[0]] = tile_idx * tile_r
        out_dst[bkt, tile_idx.shape[0] :] = pad_tile * tile_r
    tile_mask = None
    if skip_empty_tiles:
        # 1 where the kernel writes the tile's output block (visited
        # tiles); unwritten blocks are uninitialized memory and must be
        # masked out of the ring accumulation
        tile_mask = (padded > 0).astype(np.float32)

    order = np.lexsort((l_dst, sblk, owner))
    src_s, w_s, owner_s, sblk_s, l_dst_s = (
        src[order],
        w[order],
        owner[order],
        sblk[order],
        l_dst[order],
    )
    tile_s = l_dst_s // tile_r
    bkt_s = owner_s * p + sblk_s
    # position of each edge within its (bucket, tile) run
    run_id = bkt_s * tiles + tile_s
    run_starts = np.concatenate([[0], np.cumsum(counts.reshape(-1))])
    pos_in_run = np.arange(src_s.shape[0]) - run_starts[run_id]
    pos = offs[bkt_s, tile_s] + pos_in_run
    out_src[bkt_s, pos] = (src_s - sblk_s * block).astype(np.int32)
    out_dst[bkt_s, pos] = l_dst_s.astype(np.int32)
    out_w[bkt_s, pos] = w_s

    out = DistChunkedAdj(
        jnp.asarray(out_src.reshape(p, p, e_b)),
        jnp.asarray(out_dst.reshape(p, p, e_b)),
        jnp.asarray(out_w.reshape(p, p, e_b)),
        jnp.asarray(out_ct.reshape(p, p, c_max)),
        diag=None if diag is None else jnp.asarray(diag),
        hub_ids=None if hub_ids is None else jnp.asarray(hub_ids),
        hub_m=None if hub_m is None else jnp.asarray(hub_m),
        num_nodes=n,
        block=block,
        tile_rows=tile_r,
        order=None if node_order is None else jnp.asarray(node_order),
        hub_in_ids=None if hub_in_ids is None else jnp.asarray(hub_in_ids),
        hub_in_m=None if hub_in_m is None else jnp.asarray(hub_in_m),
        tile_mask=None if tile_mask is None else jnp.asarray(
            tile_mask.reshape(p, p, tiles)
        ),
    )
    _report_padding(out, "chunked")
    return out


def _round_up_arr_np(x: np.ndarray, m: int) -> np.ndarray:
    return ((x + m - 1) // m) * m


def _ring_spmm_local(src_b, dst_b, w_b, x_local, *, axis: str, parts: int, block: int):
    """Per-device body under shard_map: one full ring rotation.

    ``src_b/dst_b/w_b``: (1, P, E_b) local shards (leading owner axis sharded
    to size 1) of this device's edges bucketed by source block;
    ``x_local``: (B, D) owned feature rows.
    """
    src_b, dst_b, w_b = src_b[0], dst_b[0], w_b[0]
    p = jax.lax.axis_index(axis)
    perm = [(i, (i + 1) % parts) for i in range(parts)]

    def step(carry, s):
        buf, y = carry
        b = jnp.mod(p - s, parts)  # source block currently held
        nxt = jax.lax.ppermute(buf, axis, perm)  # send early: overlaps SpMM
        src = jnp.take(src_b, b, axis=0)
        dst = jnp.take(dst_b, b, axis=0)
        w = jnp.take(w_b, b, axis=0)
        msgs = jnp.take(buf, src, axis=0).astype(jnp.float32) * w[:, None]
        y = y + jax.ops.segment_sum(msgs, dst, num_segments=block)
        return (nxt, y), None

    # f32 accumulator even for a bf16 ring buffer (P partial sums);
    # zeros_like keeps the shard_map varying-axes annotation
    y0 = jnp.zeros_like(x_local, dtype=jnp.float32)
    (_, y), _ = jax.lax.scan(
        step, (x_local, y0), jnp.arange(parts, dtype=jnp.int32)
    )
    return y.astype(x_local.dtype)


def _ring_spmm_local_chunked(
    src_b,
    dst_b,
    w_b,
    ct_b,
    mask_b,
    diag_l,
    hub_ids,
    hub_m_l,
    hub_in_ids,
    hub_in_m_l,
    x_local,
    *,
    axis: str,
    parts: int,
    block: int,
    interpret: bool,
    has_diag: bool,
    has_hub: bool,
    has_hub_in: bool,
    has_mask: bool,
    tile_r: int = 128,
):
    """Per-device ring body running the Pallas one-hot MXU kernel per
    bucket (see :class:`DistChunkedAdj`)."""
    from sgl_tpu.kernels.pallas_spmm import _round_up, _segment_reduce_mxu

    src_b, dst_b, w_b, ct_b, mask_b = (
        src_b[0], dst_b[0], w_b[0], ct_b[0], mask_b[0]
    )
    p = jax.lax.axis_index(axis)
    perm = [(i, (i + 1) % parts) for i in range(parts)]
    d = x_local.shape[1]
    d_pad = _round_up(d, 128)

    single = x_local.dtype == jnp.bfloat16  # bf16 ring: half the ICI
    # volume per rotation + the kernel's single-pass variant (same
    # dispatch as the single-chip _spmm_pallas_impl)

    def reduce_bucket(buf, src, dst, w, ct):
        msgs = jnp.take(buf, src, axis=0).astype(jnp.float32) * w[:, None]
        if d_pad != d:
            msgs = jnp.pad(msgs, ((0, 0), (0, d_pad - d)))
        hi = msgs.astype(jnp.bfloat16)
        lo = (
            None if single
            else (msgs - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        )
        out = _segment_reduce_mxu(
            hi, lo, dst, ct, num_nodes=block, interpret=interpret,
            tile_r=tile_r,
        )
        return out[:, :d]

    def step(carry, s):
        buf, y = carry
        b = jnp.mod(p - s, parts)  # source block currently held
        nxt = jax.lax.ppermute(buf, axis, perm)  # send early: overlaps SpMM
        out = reduce_bucket(
            buf,
            jnp.take(src_b, b, axis=0),
            jnp.take(dst_b, b, axis=0),
            jnp.take(w_b, b, axis=0),
            jnp.take(ct_b, b, axis=0),
        )
        if has_mask:
            # empty-tile skipping: unvisited tiles' output blocks are
            # uninitialized memory (NaN in interpret mode, arbitrary on
            # real HBM).  A multiply-mask CANNOT zero them (NaN*0=NaN,
            # Inf*0=NaN) — select so the garbage is never an operand.
            rows = jnp.repeat(jnp.take(mask_b, b, axis=0), tile_r)
            out = jnp.where(rows[:, None] > 0, out, 0.0)
        y = y + out
        return (nxt, y), None

    # accumulate in f32 regardless of the ring dtype (P partial sums);
    # zeros_like keeps the shard_map varying-axes annotation
    y0 = jnp.zeros_like(x_local, dtype=jnp.float32)
    (_, y), _ = jax.lax.scan(
        step, (x_local, y0), jnp.arange(parts, dtype=jnp.int32)
    )
    if has_diag:
        y = y + diag_l[:, None] * x_local.astype(jnp.float32)
    if has_hub:
        # hub rows bypass the ring: one psum of (k, D) per hop
        mine = (hub_ids // block) == p
        local_pos = jnp.clip(hub_ids - p * block, 0, block - 1)
        xh = jnp.where(
            mine[:, None],
            jnp.take(x_local, local_pos, axis=0).astype(jnp.float32),
            0.0,
        )
        xh = jax.lax.psum(xh, axis)
        # HIGH: same measured error as HIGHEST here (the bucket path's
        # hi/lo reconstruction dominates), one fewer MXU pass
        y = y + jax.lax.dot(
            hub_m_l, xh, precision=jax.lax.Precision.HIGH
        )
    if has_hub_in:
        # dst super-hub rows: each device multiplies its own column block
        # of hub_in_m against the features it owns; one (k_in, D) psum
        yh = jax.lax.psum(
            jax.lax.dot(
                hub_in_m_l, x_local.astype(jnp.float32),
                precision=jax.lax.Precision.HIGH,
            ),
            axis,
        )
        mine_in = (hub_in_ids // block) == p
        pos_in = jnp.clip(hub_in_ids - p * block, 0, block - 1)
        y = y.at[pos_in].add(jnp.where(mine_in[:, None], yh, 0.0))
    return y.astype(x_local.dtype)


def make_dist_spmm(mesh: Mesh, axis: str = "graph", interpret: bool = False):
    """Build ``spmm(dist_adj, x_padded) -> y_padded`` running under
    ``shard_map`` with ``x`` row-sharded over ``axis``.  Accepts either a
    :class:`DistAdj` (XLA segment backend) or a :class:`DistChunkedAdj`
    (per-device Pallas MXU kernel; ``interpret=True`` for CPU tests)."""
    parts = mesh.shape[axis]

    def spmm_dist(dadj, x_pad: jnp.ndarray) -> jnp.ndarray:
        if isinstance(dadj, DistChunkedAdj):
            p = dadj.num_partitions
            has_diag = dadj.diag is not None
            has_hub = dadj.hub_ids is not None
            has_hub_in = dadj.hub_in_ids is not None
            has_mask = dadj.tile_mask is not None
            body = functools.partial(
                _ring_spmm_local_chunked,
                axis=axis,
                parts=parts,
                block=dadj.block,
                interpret=interpret,
                has_diag=has_diag,
                has_hub=has_hub,
                has_hub_in=has_hub_in,
                has_mask=has_mask,
                tile_r=dadj.tile_rows,
            )
            # absent extras become tiny dummies (shard_map wants arrays)
            diag = dadj.diag if has_diag else jnp.zeros(p * dadj.block, jnp.float32)
            hub_ids = dadj.hub_ids if has_hub else jnp.zeros(1, jnp.int32)
            hub_m = (
                dadj.hub_m
                if has_hub
                else jnp.zeros((p * dadj.block, 1), jnp.float32)
            )
            hub_in_ids = (
                dadj.hub_in_ids if has_hub_in else jnp.zeros(1, jnp.int32)
            )
            hub_in_m = (
                dadj.hub_in_m
                if has_hub_in
                else jnp.zeros((1, p * dadj.block), jnp.float32)
            )
            tile_mask = (
                dadj.tile_mask
                if has_mask
                else jnp.ones((p, p, 1), jnp.float32)
            )
            return jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(
                    P(axis),
                    P(axis),
                    P(axis),
                    P(axis),
                    P(axis),
                    P(axis),
                    P(),
                    P(axis),
                    P(),
                    P(None, axis),
                    P(axis),
                ),
                out_specs=P(axis),
                # pallas_call's out_shape carries no vma annotation; the
                # body is manifestly per-device so skip the vma check
                check_vma=False,
            )(
                dadj.src,
                dadj.dst,
                dadj.w,
                dadj.chunk_tile,
                tile_mask,
                diag,
                hub_ids,
                hub_m,
                hub_in_ids,
                hub_in_m,
                x_pad,
            )
        body = functools.partial(
            _ring_spmm_local, axis=axis, parts=parts, block=dadj.block
        )
        # leading (owner) axis of the buckets and the row axis of x are
        # sharded; everything else stays local
        return jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=P(axis),
        )(dadj.src, dadj.dst, dadj.w, x_pad)

    return spmm_dist


class ShardedHops:
    """Hop stack kept node-sharded over the ``graph`` mesh axis.

    ``data`` is ``(K+1, P·block, D)`` (hop-major) or ``(P·block, D')``
    (after an eager aggregation), with the node axis sharded — per-device
    memory is ``O(N/P · D · K)``, the property that makes papers100M-scale
    training possible (a replicated ``(K+1, N, D)`` stack is ~228 GB at
    K=3, D=128 f32 — it cannot exist on one chip).  Batch rows come out
    through :meth:`rows`: a ``shard_map`` lookup where each device
    contributes the rows it owns and one ``(…, B, D)`` psum assembles the
    batch — never an all-gather of the stack.  The layout's node shuffle
    un-permutes for free here: ``new_of`` folds into the index lookup
    (VERDICT r3 next #3).
    """

    def __init__(self, data, mesh, axis, block, num_nodes, new_of=None):
        self.data = data
        self.mesh = mesh
        self.axis = axis
        self.block = block
        self.num_nodes = num_nodes
        self.new_of = new_of  # old id -> layout id (None = identity)

    @property
    def per_device_bytes(self) -> int:
        return sum(
            s.data.nbytes for s in self.data.addressable_shards
        ) // max(len(self.data.addressable_shards), 1)

    def aggregate(self, fn) -> "ShardedHops":
        """Apply a parameter-free hop aggregation (``(K+1, N, D) -> (N,
        D')``) WITHOUT leaving the sharded domain: the reduction is over
        the (unsharded) hop axis, so GSPMD keeps the node axis sharded."""
        axis = self.axis

        @jax.jit
        def run(h):
            out = fn(h)
            return jax.lax.with_sharding_constraint(
                out, NamedSharding(self.mesh, P(axis))
            )

        return ShardedHops(
            run(self.data), self.mesh, axis, self.block, self.num_nodes,
            new_of=self.new_of,
        )

    def rows(self, idx) -> jnp.ndarray:
        """Gather batch rows (old node ids) from the sharded stack.
        Returns ``(K+1, B, D)`` / ``(B, D')`` replicated."""
        idx = jnp.asarray(idx, jnp.int32)
        if self.new_of is not None:
            idx = jnp.take(self.new_of, idx)
        axis, block = self.axis, self.block

        def body(data_l, idx):
            p = jax.lax.axis_index(axis)
            loc = idx - p * block
            ok = (loc >= 0) & (loc < block)
            safe = jnp.clip(loc, 0, block - 1)
            ax = data_l.ndim - 2
            rows = jnp.take(data_l, safe, axis=ax)
            mask = ok.astype(rows.dtype)
            rows = rows * (mask[:, None] if ax == 0 else mask[None, :, None])
            return jax.lax.psum(rows, axis)

        in_spec = P(axis) if self.data.ndim == 2 else P(None, axis)
        return jax.shard_map(
            body, mesh=self.mesh, in_specs=(in_spec, P()), out_specs=P(),
            check_vma=False,
        )(self.data, idx)

    def map_rows(self, fn, *args) -> jnp.ndarray:
        """Apply ``fn(shard_rows, *args)`` (e.g. a logits head with its
        params) to every device's owned rows, returning the per-node
        result with the node axis STILL sharded on axis 0 — full-graph
        inference without ever replicating the stack.  ``args`` are
        replicated (params pytrees)."""
        axis = self.axis
        in_spec = P(axis) if self.data.ndim == 2 else P(None, axis)
        return jax.shard_map(
            fn, mesh=self.mesh,
            in_specs=(in_spec,) + tuple(P() for _ in args),
            out_specs=P(axis), check_vma=False,
        )(self.data, *args)

    def gather_full(self) -> jnp.ndarray:
        """Replicated, un-permuted ``(K+1, N, D)`` — tests/small graphs
        only; defeats the sharding."""
        out = self.data[..., : self.num_nodes, :] if self.data.ndim == 2 else (
            self.data[:, : self.num_nodes, :]
        )
        if self.new_of is not None:
            out = jnp.take(out, self.new_of, axis=out.ndim - 2)
        return out


def k_hop_propagate_dist(
    mesh: Mesh,
    dadj,
    x,
    prop_steps: int,
    axis: str = "graph",
    interpret: bool = False,
    keep_sharded: bool = False,
):
    """Distributed ``[X, AX, ..., A^K X]``.

    Default: returns a replicated, un-permuted ``(K+1, N, D)`` array
    (small graphs / parity tests).  ``keep_sharded=True`` returns a
    :class:`ShardedHops` instead — the stack never materializes on one
    device (per-device memory ``O(N/P·D·K)``), batch rows come out via a
    psum lookup, and the node-shuffle un-permute folds into that lookup.
    ``dadj`` may be a :class:`DistAdj` (XLA segment compute) or a
    :class:`DistChunkedAdj` (Pallas MXU compute; the TPU hot path)."""
    parts = mesh.shape[axis]
    order = getattr(dadj, "order", None)
    if order is not None:
        x = jnp.take(jnp.asarray(x), order, axis=0)  # x_perm[new] = x[order[new]]
    x_pad = pad_features(x, parts, block=dadj.block)
    spmm_dist = make_dist_spmm(mesh, axis, interpret=interpret)
    sharding = NamedSharding(mesh, P(None, axis))

    @functools.partial(jax.jit, static_argnames=())
    def run(dadj, x_pad):
        def step(h, _):
            h2 = spmm_dist(dadj, h)
            return h2, h2

        _, hops = jax.lax.scan(step, x_pad, None, length=prop_steps)
        out = jnp.concatenate([x_pad[None], hops], axis=0)
        return jax.lax.with_sharding_constraint(out, sharding)

    out = run(dadj, x_pad)
    new_of = None
    if order is not None:
        new_of = jnp.zeros(dadj.num_nodes, jnp.int32).at[order].set(
            jnp.arange(dadj.num_nodes, dtype=jnp.int32)
        )
    if keep_sharded:
        return ShardedHops(
            out, mesh, axis, dadj.block, dadj.num_nodes, new_of=new_of
        )
    out = out[:, : dadj.num_nodes, :]
    if order is not None:
        # un-permute rows: out_old[old] = out_new[new_of[old]]
        out = jnp.take(out, new_of, axis=1)
    return out
