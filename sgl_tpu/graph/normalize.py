"""Adjacency normalization as pure, jittable edge-weight transforms.

The reference materializes normalized scipy matrices
(``adj_to_symmetric_norm``, ``sgl/operators/utils.py:76-89``):
``D^{r-1} (A+I)^T D^{-r}`` with ``deg = rowsum(A+I)``.  Here the same math is
a function from a ``Graph`` to a ``SparseAdj`` (edge weights), computed with
``segment_sum`` so it runs under ``jit`` / ``shard_map`` on device — no scipy
on the hot path, and the distributed precompute can normalize shard-locally.

Per stored edge ``(s, t, a)`` of ``Â = A + I`` the normalized weight is
``w = deg[t]^(r-1) * a * deg[s]^(-r)`` with messages flowing ``x[s] -> y[t]``
(this is exactly the transpose semantics of the reference; for the undirected
graphs all shipped datasets use, transpose == identity).  ``r = 0.5`` gives
the standard GCN ``D^-1/2 Â D^-1/2``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sgl_tpu.graph.graph import Graph
from sgl_tpu.kernels.sparse import SparseAdj


def _safe_pow(deg: jnp.ndarray, p: float) -> jnp.ndarray:
    """deg**p with 0**negative -> 0 (reference zeroes infs)."""
    powed = jnp.power(jnp.where(deg > 0, deg, 1.0), p)
    return jnp.where(deg > 0, powed, 0.0)


def _with_self_loops(graph: Graph):
    """Edges of ``Â = A + I`` plus row-degrees of ``Â``.

    Returns (src, dst, val, deg, n_self) with the N self edges appended at
    the end (un-sorted; callers may re-sort).
    """
    n = graph.num_nodes
    loop = jnp.arange(n, dtype=jnp.int32)
    src = jnp.concatenate([jnp.asarray(graph.src), loop])
    dst = jnp.concatenate([jnp.asarray(graph.dst), loop])
    val = jnp.concatenate(
        [jnp.asarray(graph.val), jnp.ones(n, jnp.float32)]
    )
    deg = jax.ops.segment_sum(val, src, num_segments=n)
    return src, dst, val, deg


def _sorted_adj(src, dst, w, num_nodes: int, sort: bool) -> SparseAdj:
    if sort:
        order = jnp.argsort(dst, stable=True)
        src, dst, w = src[order], dst[order], w[order]
    return SparseAdj(src, dst, w, num_nodes, sorted_by_dst=sort)


def symmetric_normalized_weights(
    graph: Graph, r: float = 0.5, sort: bool = True
) -> SparseAdj:
    """Generalized symmetric normalization ``D^{r-1} Â^T D^{-r}``.

    Mirrors ``adj_to_symmetric_norm`` (reference ``operators/utils.py:76-89``)
    as used by ``LaplacianGraphOp`` (``graph_op/laplacian_graph_op.py:7-19``).
    """
    src, dst, val, deg = _with_self_loops(graph)
    w = _safe_pow(deg, r - 1.0)[dst] * val * _safe_pow(deg, -r)[src]
    return _sorted_adj(src, dst, w, graph.num_nodes, sort)


def ppr_weights(
    graph: Graph, r: float = 0.5, alpha: float = 0.15, sort: bool = True
) -> SparseAdj:
    """Personalized-PageRank transition ``(1-α)·Ā + α·I`` over the
    symmetric-normalized ``Ā`` (reference ``graph_op/ppr_graph_op.py:7-21``).
    """
    n = graph.num_nodes
    src, dst, val, deg = _with_self_loops(graph)
    w = _safe_pow(deg, r - 1.0)[dst] * val * _safe_pow(deg, -r)[src]
    w = w * (1.0 - alpha)
    # the N self edges are the trailing block appended by _with_self_loops
    w = w.at[-n:].add(alpha)
    return _sorted_adj(src, dst, w, n, sort)


def row_normalized_weights(
    graph: Graph, add_self_loops: bool = True, sort: bool = True
) -> SparseAdj:
    """Random-walk normalization ``D^{-1} Â`` (messages averaged over
    in-neighbors of each destination): used by label propagation / C&S."""
    if add_self_loops:
        src, dst, val, deg_out = _with_self_loops(graph)
    else:
        src = jnp.asarray(graph.src)
        dst = jnp.asarray(graph.dst)
        val = jnp.asarray(graph.val)
    deg_in = jax.ops.segment_sum(val, dst, num_segments=graph.num_nodes)
    w = val * _safe_pow(deg_in, -1.0)[dst]
    return _sorted_adj(src, dst, w, graph.num_nodes, sort)
