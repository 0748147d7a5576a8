"""Graph ops: k-hop propagation as a scan of SpMMs.

The reference's ``GraphOp.propagate`` (``sgl/operators/base_op.py:19-36``)
returns a Python list of torch tensors, one ctypes C-kernel call per hop.
Here propagation is one jitted function: normalize once, ``lax.scan`` the
SpMM, return a single stacked ``(K+1, N, D)`` array — which is what lets
every message op downstream be a fused XLA reduction instead of a list walk.
Gradients never flow through propagation (SGAP pre-compute is training-free),
so the result is stop-gradient'd.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sgl_tpu.graph.graph import Graph
from sgl_tpu.graph.normalize import (
    HOST_NORM_EDGE_THRESHOLD,
    ppr_weights,
    ppr_weights_host,
    symmetric_normalized_weights,
    symmetric_normalized_weights_host,
)
from sgl_tpu.kernels.sparse import SparseAdj, spmm


@functools.partial(jax.jit, static_argnames=("prop_steps", "backend"))
def k_hop_propagate(
    adj: SparseAdj,
    x: jnp.ndarray,
    prop_steps: int,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """``[X, AX, A²X, …]`` stacked as ``(prop_steps+1, N, D)``."""

    def step(h, _):
        h_next = spmm(adj, h, backend=backend)
        return h_next, h_next

    _, hops = jax.lax.scan(step, x, None, length=prop_steps)
    out = jnp.concatenate([x[None], hops], axis=0)
    return jax.lax.stop_gradient(out)


@functools.partial(jax.jit, static_argnames=("prop_steps", "backend"))
def k_hop_aggregate(
    adj: SparseAdj,
    x: jnp.ndarray,
    weights: jnp.ndarray,
    prop_steps: int,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """Fused ``sum_k weights[k] · A^k x`` without materializing the hop
    stack — peak memory O(N·D) instead of O((K+1)·N·D).  Used for linear
    message ops (sum/mean/simple-weighted/last) where the aggregation is a
    fixed linear combination of hops."""

    def step(carry, w_k):
        h, acc = carry
        h_next = spmm(adj, h, backend=backend)
        return (h_next, acc + w_k * h_next), None

    # accumulate in f32 even for bf16 hops (weights are f32, so the adds
    # upcast); cast back so the cached result keeps the requested dtype
    acc0 = weights[0] * x
    (_, acc), _ = jax.lax.scan(
        step, (x, acc0), weights[1:], length=prop_steps
    )
    return jax.lax.stop_gradient(acc.astype(x.dtype))


def _as_compute_dtype(x) -> jnp.ndarray:
    """f32 by default; bf16 passes through (opt-in fast precompute —
    the Pallas SpMM has a single-pass bf16 variant)."""
    x = jnp.asarray(x)
    if x.dtype == jnp.bfloat16:
        return x
    return x.astype(jnp.float32)


class GraphOp:
    """Propagation operator: builds a normalized ``SparseAdj`` from a
    ``Graph`` and runs the k-hop scan."""

    def __init__(self, prop_steps: int):
        self.prop_steps = prop_steps
        self._adj_cache = (None, None, None)  # (weakref(graph), backend, adj)

    def construct_adj(self, graph: Graph) -> SparseAdj:
        raise NotImplementedError

    def _adj_for(self, graph: Graph, backend: Optional[str], hub_dtype=None):
        """Normalized (and, on TPU, tile-chunked) adjacency with a one-entry
        cache — tasks like label reuse re-preprocess every epoch on the same
        graph, and the host re-layout should not be repaid each time.
        ``hub_dtype`` keys the cache too.  It is OPT-IN experimental only
        (no default caller passes it): the bf16 strip won a keep-last
        harness A/B but LOST in the production hop-stacking scan — see the
        falsification note in :meth:`propagate` before wiring it on."""
        import weakref

        key = (backend, None if hub_dtype is None else str(hub_dtype))
        ref, cached_key, cached = self._adj_cache
        if ref is not None and ref() is graph and cached_key == key:
            return cached
        adj = self.construct_adj(graph)
        if backend != "segment":
            import jax

            if jax.default_backend() not in ("cpu",):
                # host re-layout unlocks the Pallas kernel on TPU
                from sgl_tpu.kernels.pallas_spmm import prepare_chunked

                adj = prepare_chunked(adj, hub_dtype=hub_dtype)
        try:
            self._adj_cache = (weakref.ref(graph), key, adj)
        except TypeError:
            pass
        return adj

    def propagate(
        self, graph: Graph, x, backend: Optional[str] = None
    ) -> jnp.ndarray:
        if graph.num_nodes != jnp.shape(x)[0]:
            raise ValueError(
                "Dimension mismatch detected for the adjacency and the feature matrix!"
            )
        xc = _as_compute_dtype(x)
        # NOTE: a bf16 hub strip (hub_dtype=bf16) measured FASTER in a
        # keep-last fori_loop harness (-0.47 ms/hop) but SLOWER in this
        # production hop-stacking scan (+0.17 ms/hop, interleaved A/B) —
        # XLA evidently hoists the f32 strip's one-time bf16 conversion
        # out of the scan, making f32 storage free here.  So the strip
        # stays f32 by default; hub_dtype remains available for
        # keep-last-style pipelines.
        adj = self._adj_for(graph, backend)
        return k_hop_propagate(adj, xc, self.prop_steps, backend=backend)

    def propagate_out_of_core(
        self,
        graph: Graph,
        x_host,
        max_edges_per_part: int = 6 << 20,
        hop_sink=None,
        interpret: bool = False,
        layout: str = "1d",
        src_blocks="auto",
        layout_cache_dir: Optional[str] = None,
    ):
        """``[X, AX, …]`` for graphs whose features/edges exceed HBM.

        Host-resident end to end (see ``kernels/spmm_ooc.py``): the
        normalized adjacency is built on the host (huge graphs route to
        the native builder automatically), laid out into out-of-core
        parts once (cached per graph), and each hop streams through the
        chip.  Returns a list of numpy hops, or hands each hop to
        ``hop_sink(k, arr)`` (e.g. a memmap writer) and returns None.

        ``layout="2d"`` uses the src-block layout (contiguous column
        workspaces, no host gather — the papers100M-regime choice where a
        unique-column workspace cannot fit HBM; ``src_blocks`` bounds the
        workspace rows at ``ceil(N / src_blocks)``).  ``layout_cache_dir``
        persists the ~100 s products-scale 2-D layout build to disk,
        content-keyed (warm loads in seconds).
        """
        from sgl_tpu.kernels.spmm_ooc import (
            OutOfCoreAdj,
            OutOfCoreAdj2D,
            k_hop_out_of_core,
            prepare_out_of_core,
            prepare_out_of_core_2d,
        )

        if layout not in ("1d", "2d"):
            raise ValueError("layout must be '1d' or '2d'")
        want_cls = OutOfCoreAdj2D if layout == "2d" else OutOfCoreAdj
        # key the cached layout on every input that shapes it: the 2-D
        # auto sizing depends on the FEATURE width/dtype (gather-cliff
        # budget), so a second call with different features must rebuild
        # instead of silently reusing a mis-sized layout
        build_key = (
            "ooc", layout, int(max_edges_per_part), src_blocks,
            int(x_host.shape[1]), np.dtype(x_host.dtype).name,
        )
        ref, cached_backend, cached = self._adj_cache
        if (
            ref is not None
            and ref() is graph
            and cached_backend == build_key
            and isinstance(cached, want_cls)
        ):
            oc = cached
        else:
            if layout == "2d":
                oc = prepare_out_of_core_2d(
                    self.construct_adj(graph),
                    max_edges_per_part=max_edges_per_part,
                    src_blocks=src_blocks,
                    # size the gather workspaces for the actual features
                    # (the measured v5e gather-rate cliff is a byte
                    # threshold — see GATHER_OPERAND_BUDGET)
                    feat_dim=x_host.shape[1],
                    feat_dtype=x_host.dtype,
                    cache_dir=layout_cache_dir,
                )
            else:
                oc = prepare_out_of_core(
                    self.construct_adj(graph),
                    max_edges_per_part=max_edges_per_part,
                )
            try:
                import weakref

                self._adj_cache = (weakref.ref(graph), build_key, oc)
            except TypeError:
                pass
        return k_hop_out_of_core(
            oc, x_host, self.prop_steps, hop_sink=hop_sink, interpret=interpret
        )

    def propagate_aggregate(
        self, graph: Graph, x, weights, backend: Optional[str] = None
    ) -> jnp.ndarray:
        """Fused ``sum_k weights[k] A^k x`` (see ``k_hop_aggregate``)."""
        if graph.num_nodes != jnp.shape(x)[0]:
            raise ValueError(
                "Dimension mismatch detected for the adjacency and the feature matrix!"
            )
        adj = self._adj_for(graph, backend)
        return k_hop_aggregate(
            adj,
            _as_compute_dtype(x),
            jnp.asarray(weights, jnp.float32),
            self.prop_steps,
            backend=backend,
        )


class LaplacianGraphOp(GraphOp):
    """Generalized symmetric normalization ``D^{r-1} Â D^{-r}``
    (reference ``graph_op/laplacian_graph_op.py:7-19``; r=0.5 = GCN).

    Huge graphs (> ``HOST_NORM_EDGE_THRESHOLD`` edges) normalize on the
    host via the native builder — the jitted path would round-trip the
    whole edge list through device memory only to pull it back for the
    chunk re-layout."""

    def __init__(self, prop_steps: int, r: float = 0.5):
        super().__init__(prop_steps)
        self.r = r

    def construct_adj(self, graph: Graph) -> SparseAdj:
        if graph.num_edges > HOST_NORM_EDGE_THRESHOLD:
            return symmetric_normalized_weights_host(graph, r=self.r)
        return symmetric_normalized_weights(graph, r=self.r)


class PprGraphOp(GraphOp):
    """Personalized-PageRank transition ``(1-α)Ā + αI``
    (reference ``graph_op/ppr_graph_op.py:7-21``; APPNP-style)."""

    def __init__(self, prop_steps: int, r: float = 0.5, alpha: float = 0.15):
        super().__init__(prop_steps)
        self.r = r
        self.alpha = alpha

    def construct_adj(self, graph: Graph) -> SparseAdj:
        if graph.num_edges > HOST_NORM_EDGE_THRESHOLD:
            return ppr_weights_host(graph, r=self.r, alpha=self.alpha)
        return ppr_weights(graph, r=self.r, alpha=self.alpha)
