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

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from sgl_tpu.kernels.sparse import SparseAdj


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


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
    return DistAdj(
        jnp.asarray(out_src),
        jnp.asarray(out_dst),
        jnp.asarray(out_w),
        num_nodes=n,
        block=block,
    )


def pad_features(x, num_partitions: int) -> jnp.ndarray:
    """Pad feature rows so the node axis divides evenly across devices."""
    n, _ = x.shape
    block = _round_up(n, num_partitions) // num_partitions
    pad = block * num_partitions - n
    x = jnp.asarray(x, jnp.float32)
    return jnp.pad(x, ((0, pad), (0, 0))) if pad else x


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
        msgs = jnp.take(buf, src, axis=0) * w[:, None]
        y = y + jax.ops.segment_sum(msgs, dst, num_segments=block)
        return (nxt, y), None

    y0 = jnp.zeros_like(x_local)
    (_, y), _ = jax.lax.scan(
        step, (x_local, y0), jnp.arange(parts, dtype=jnp.int32)
    )
    return y


def make_dist_spmm(mesh: Mesh, axis: str = "graph"):
    """Build ``spmm(dist_adj, x_padded) -> y_padded`` running under
    ``shard_map`` with ``x`` row-sharded over ``axis``."""
    parts = mesh.shape[axis]

    def spmm_dist(dadj: DistAdj, x_pad: jnp.ndarray) -> jnp.ndarray:
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


def k_hop_propagate_dist(
    mesh: Mesh,
    dadj: DistAdj,
    x,
    prop_steps: int,
    axis: str = "graph",
) -> jnp.ndarray:
    """Distributed ``[X, AX, ..., A^K X]``: returns ``(K+1, N, D)`` with the
    node axis sharded over ``axis`` (un-padded rows sliced off)."""
    parts = mesh.shape[axis]
    x_pad = pad_features(x, parts)
    spmm_dist = make_dist_spmm(mesh, axis)

    @functools.partial(jax.jit, static_argnames=())
    def run(dadj, x_pad):
        def step(h, _):
            h2 = spmm_dist(dadj, h)
            return h2, h2

        _, hops = jax.lax.scan(step, x_pad, None, length=prop_steps)
        return jnp.concatenate([x_pad[None], hops], axis=0)

    out = run(dadj, x_pad)
    return out[:, : dadj.num_nodes, :]
