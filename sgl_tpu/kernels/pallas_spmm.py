"""Pallas TPU SpMM: MXU one-hot segment reduction over dst-sorted edges.

Replaces the scatter-add half of SpMM (the part XLA serializes worst) with a
hand-written TPU kernel.  Strategy — nothing like the reference's C kernels
(``sgl/operators/csrc/matmul.c``), which walk CSR rows on scalar cores:

1. messages ``m_e = w_e * x[src_e]`` are produced by XLA (gather + multiply
   fuse into one HBM-bandwidth-bound pass);
2. edges are pre-sorted by ``dst`` (``Graph.from_coo`` guarantees this), so
   each 128-row output tile owns a contiguous edge range;
3. the kernel walks each tile's edge range in ``CHUNK``-edge steps with
   double-buffered HBM→VMEM DMA and reduces each chunk with
   ``onehot(dst)ᵀ @ msgs`` — a (TILE_R × CHUNK) @ (CHUNK × D) matmul on the
   MXU.  Scatter-add becomes dense matmul: ~128·D FLOPs/edge, far below the
   MXU roofline, so the kernel stays HBM-bound (the speed of light for
   unstructured SpMM).

Out-of-tile edges inside an aligned chunk window simply match no one-hot
column, so no masking is needed; padding edges carry ``w == 0``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgl_tpu.kernels.sparse import SparseAdj

TILE_R = 128  # output rows per grid step (MXU-aligned)
CHUNK = 512  # edges per inner DMA/matmul step
N_BUF = 2  # double buffering


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _seg_kernel(tile_ptr_ref, dst_ref, msgs_ref, out_ref, msgs_buf, dst_buf, sems, dst_sems):
    t = pl.program_id(0)
    e0 = tile_ptr_ref[t]
    e1 = tile_ptr_ref[t + 1]
    # chunk-aligned window covering [e0, e1); alignment keeps DMAs inside the
    # padded edge array, equality-matching drops foreign edges.
    w0 = (e0 // CHUNK) * CHUNK
    n_chunks = jnp.maximum(pl.cdiv(e1 - w0, CHUNK), jnp.int32(e1 > e0))

    def get_dma(slot, chunk_idx):
        off = w0 + chunk_idx * CHUNK
        return (
            pltpu.make_async_copy(
                msgs_ref.at[pl.ds(off, CHUNK), :], msgs_buf.at[slot], sems.at[slot]
            ),
            pltpu.make_async_copy(
                dst_ref.at[pl.ds(off, CHUNK), :], dst_buf.at[slot], dst_sems.at[slot]
            ),
        )

    @pl.when(n_chunks > 0)
    def _():
        m0, d0 = get_dma(0, 0)
        m0.start()
        d0.start()

    out_ref[:] = jnp.zeros_like(out_ref)
    row_base = t * TILE_R

    def body(ci, acc):
        slot = ci % N_BUF
        nxt = (ci + 1) % N_BUF

        @pl.when(ci + 1 < n_chunks)
        def _():
            m, d = get_dma(nxt, ci + 1)
            m.start()
            d.start()

        m, d = get_dma(slot, ci)
        m.wait()
        d.wait()

        local = dst_buf[slot] - row_base  # (CHUNK, 1) int32
        cols = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, TILE_R), 1)
        onehot = (local == cols).astype(jnp.float32)  # (CHUNK, TILE_R)
        contrib = jax.lax.dot_general(
            onehot,
            msgs_buf[slot],
            dimension_numbers=(((0,), (0,)), ((), ())),
            # HIGHEST keeps f32 message precision through the MXU (default
            # precision would bf16-round the inputs); we are far below the
            # MXU roofline so the extra passes are free.
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (TILE_R, D)
        return acc + contrib

    acc = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros_like(out_ref), unroll=False
    )
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("num_nodes", "interpret"))
def _segment_reduce_mxu(msgs, dst, num_nodes: int, interpret: bool = False):
    """Sorted-by-dst segment sum of ``msgs`` rows via the Pallas kernel.

    msgs: [E_pad, D] float32 (E_pad multiple of CHUNK, D multiple of 128)
    dst:  [E_pad] int32 sorted ascending (padding edges at the end)
    """
    e_pad, d = msgs.shape
    assert e_pad % CHUNK == 0 and d % 128 == 0
    n_tiles = pl.cdiv(num_nodes, TILE_R)
    n_pad = n_tiles * TILE_R
    # first edge of each output tile (cheap: T+1 binary searches)
    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * TILE_R
    tile_ptr = jnp.searchsorted(dst, bounds, side="left").astype(jnp.int32)
    dst2d = dst.reshape(-1, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # dst2d stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # msgs stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (TILE_R, d), lambda t, ptr: (t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, CHUNK, d), jnp.float32),
            pltpu.VMEM((N_BUF, CHUNK, 1), jnp.int32),
            pltpu.SemaphoreType.DMA((N_BUF,)),
            pltpu.SemaphoreType.DMA((N_BUF,)),
        ],
    )
    out = pl.pallas_call(
        _seg_kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * e_pad * TILE_R * d,
            bytes_accessed=e_pad * (d * 4 + 4) + n_pad * d * 4,
            transcendentals=0,
        ),
    )(tile_ptr, dst2d, msgs)
    return out[:num_nodes]


def spmm_pallas(adj: SparseAdj, x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """``y = adj @ x`` with XLA gather + Pallas MXU segment reduction.

    Requires ``adj`` sorted by dst (``Graph.from_coo`` default).  Shapes are
    padded internally to kernel alignment; result is [num_nodes, D] float32.
    """
    if not adj.sorted_by_dst:
        raise ValueError("spmm_pallas requires dst-sorted edges")
    e = adj.src.shape[0]
    d = x.shape[1]
    e_pad = _round_up(e, CHUNK)
    d_pad = _round_up(d, 128)
    msgs = jnp.take(x, adj.src, axis=0).astype(jnp.float32) * adj.w[:, None]
    dst = adj.dst
    if e_pad != e:
        msgs = jnp.pad(msgs, ((0, e_pad - e), (0, 0)))
        # pad dst with an out-of-range id so padded edges match no tile row
        dst = jnp.pad(dst, (0, e_pad - e), constant_values=jnp.int32(2**30))
    if d_pad != d:
        msgs = jnp.pad(msgs, ((0, 0), (0, d_pad - d)))
    out = _segment_reduce_mxu(msgs, dst, num_nodes=adj.num_nodes, interpret=interpret)
    return out[:, :d].astype(x.dtype)
