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


def _host_norm_edges(graph: Graph, r: float):
    """Â = A + I edges with generalized symmetric weights, all on the host
    (native OpenMP builder with numpy fallback) — no device round-trip."""
    import numpy as np

    from sgl_tpu.graph import native

    n = graph.num_nodes
    loop = np.arange(n, dtype=np.int32)
    s = np.concatenate([np.asarray(graph.src, np.int32), loop])
    d = np.concatenate([np.asarray(graph.dst, np.int32), loop])
    v = np.concatenate(
        [np.asarray(graph.val, np.float32), np.ones(n, np.float32)]
    )
    deg = native.compute_degrees(s, v, n)
    w = native.normalized_weights(s, d, v, deg, r)
    return s, d, w


def symmetric_normalized_weights_host(graph: Graph, r: float = 0.5) -> SparseAdj:
    """Host-side twin of :func:`symmetric_normalized_weights` for huge
    graphs: the jitted version round-trips the full edge list through
    device memory (minutes over a tunneled link at 60M edges), this one
    stays in host numpy + the native parallel sort and returns a
    dst-sorted ``SparseAdj`` of host arrays ready for ``prepare_chunked``."""
    from sgl_tpu.graph import native

    s, d, w = _host_norm_edges(graph, r)
    s, d, w = native.sort_edges_by_dst(s, d, w, graph.num_nodes)
    return SparseAdj(s, d, w, graph.num_nodes, sorted_by_dst=True)


def ppr_weights_host(
    graph: Graph, r: float = 0.5, alpha: float = 0.15
) -> SparseAdj:
    """Host-side twin of :func:`ppr_weights` (same trailing-self-loop
    α-boost semantics)."""
    from sgl_tpu.graph import native

    n = graph.num_nodes
    s, d, w = _host_norm_edges(graph, r)
    w = w * (1.0 - alpha)
    w[-n:] += alpha
    s, d, w = native.sort_edges_by_dst(s, d, w, n)
    return SparseAdj(s, d, w, n, sorted_by_dst=True)


# above this many edges GraphOp normalizes on the host (no device round-trip)
HOST_NORM_EDGE_THRESHOLD = 8 << 20


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
