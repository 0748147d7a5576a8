"""Immutable COO graph containers (pytrees), TPU-first.

Design notes (vs reference ``sgl/data/base_data.py:8,72,145,237``):

* The reference stores scipy CSR matrices and torch tensors and hands CSR
  pointers over a ctypes boundary.  Here the canonical representation is a
  *padded COO edge list* — three flat arrays ``(src, dst, val)`` — because
  XLA wants static shapes and coalesced gathers, not pointer-chasing CSR.
* Edges are sorted by ``dst`` (then ``src``) so hop propagation can use a
  sorted ``segment_sum`` and so a block-CSR layout can be derived for the
  Pallas kernel without re-sorting.
* Padding: ``src=0, dst=num_nodes-1, val=0`` — padding edges contribute
  exactly zero everywhere (degrees, SpMM), keep ``dst`` sorted, and keep
  every index in range so no masking is needed on the hot path.
* ``Graph`` is a registered pytree: array leaves move with jit/shard_map,
  integer metadata is static aux data, so a ``Graph`` can cross a ``jit``
  boundary without retracing on every call.

A homogeneous ``Graph`` = ``Edge`` + ``Node`` data, mirroring the
reference's ``Graph`` (``base_data.py:145``) but functional.  The hetero
container mirrors ``HeteroGraph`` (``base_data.py:237``) with global node-id
offsets per node type.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_amount(num_edges: int, multiple: int) -> int:
    """Edges are padded to a bucket multiple to avoid recompilation storms
    when edge counts vary slightly (transforms, NAS, subgraph sampling)."""
    return max(_round_up(max(num_edges, 1), multiple) - num_edges, 0)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Graph:
    """Padded-COO homogeneous graph.

    ``src``/``dst``/``val`` have length ``num_edges_padded``; entries past
    ``num_edges`` are zero-valued padding.  Message direction for SpMM is
    ``src -> dst`` along the *transpose* of the stored adjacency, matching
    the reference's ``D^{r-1} A^T D^{-r}`` normalization
    (``sgl/operators/utils.py:76-89``); for the undirected graphs every
    dataset ships, transpose == identity.
    """

    src: np.ndarray  # [E_pad] int32
    dst: np.ndarray  # [E_pad] int32
    val: np.ndarray  # [E_pad] float32, 0 on padding
    x: Optional[np.ndarray]  # [N, D] node features
    y: Optional[np.ndarray]  # [N] or [N, C] node labels
    num_nodes: int
    num_edges: int  # real (un-padded) edge count

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        leaves = (self.src, self.dst, self.val, self.x, self.y)
        aux = (self.num_nodes, self.num_edges)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        src, dst, val, x, y = leaves
        num_nodes, num_edges = aux
        return cls(src, dst, val, x, y, num_nodes, num_edges)

    # -- construction ------------------------------------------------------
    @staticmethod
    def from_coo(
        src,
        dst,
        val=None,
        *,
        num_nodes: int,
        x=None,
        y=None,
        pad_multiple: int = 1024,
        sort: bool = True,
    ) -> "Graph":
        src = np.asarray(src, dtype=np.int32).reshape(-1)
        dst = np.asarray(dst, dtype=np.int32).reshape(-1)
        if val is None:
            val = np.ones(src.shape[0], dtype=np.float32)
        else:
            val = np.asarray(val, dtype=np.float32).reshape(-1)
        if not (src.shape == dst.shape == val.shape):
            raise ValueError("src/dst/val must have identical 1-D shapes")
        if src.size and (src.min() < 0 or src.max() >= num_nodes):
            raise ValueError("src indices out of range")
        if dst.size and (dst.min() < 0 or dst.max() >= num_nodes):
            raise ValueError("dst indices out of range")
        num_edges = int(src.shape[0])
        if sort and num_edges:
            if num_edges > 1_000_000:
                # OpenMP counting sort (csrc/graph_builder.cpp); only dst
                # order matters for the kernels, src sub-order is free
                from sgl_tpu.graph import native

                src, dst, val = native.sort_edges_by_dst(src, dst, val, num_nodes)
            else:
                order = np.lexsort((src, dst))
                src, dst, val = src[order], dst[order], val[order]
        pad = pad_amount(num_edges, pad_multiple)
        if pad:
            src = np.concatenate([src, np.zeros(pad, np.int32)])
            dst = np.concatenate(
                [dst, np.full(pad, max(num_nodes - 1, 0), np.int32)]
            )
            val = np.concatenate([val, np.zeros(pad, np.float32)])
        if x is not None:
            x = np.asarray(x, dtype=np.float32)
            if x.shape[0] != num_nodes:
                raise ValueError("feature row count != num_nodes")
        if y is not None:
            y = np.asarray(y)
        return Graph(src, dst, val, x, y, num_nodes, num_edges)

    # -- properties --------------------------------------------------------
    @property
    def num_edges_padded(self) -> int:
        return int(self.src.shape[0])

    @property
    def num_features(self) -> int:
        if self.x is None:
            raise ValueError("graph has no node features")
        return int(self.x.shape[1])

    @property
    def num_classes(self) -> int:
        if self.y is None:
            raise ValueError("graph has no labels")
        y = np.asarray(self.y)
        if y.ndim > 1 and y.shape[-1] > 1:
            return int(y.shape[-1])
        return int(y.max()) + 1

    def node_degrees(self) -> np.ndarray:
        """Weighted out-degree (row sums of the stored adjacency)."""
        deg = np.zeros(self.num_nodes, dtype=np.float32)
        np.add.at(deg, np.asarray(self.src), np.asarray(self.val))
        return deg

    def in_degrees(self) -> np.ndarray:
        deg = np.zeros(self.num_nodes, dtype=np.float32)
        np.add.at(deg, np.asarray(self.dst), np.asarray(self.val))
        return deg

    def replace(self, **kw) -> "Graph":
        return dataclasses.replace(self, **kw)

    def edges(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Real (un-padded) edges as numpy arrays."""
        e = self.num_edges
        return (
            np.asarray(self.src)[:e],
            np.asarray(self.dst)[:e],
            np.asarray(self.val)[:e],
        )


# ---------------------------------------------------------------------------
# Lightweight typed node/edge sets, mirroring the reference API surface
# (``sgl/data/base_data.py:8-142``) without torch.
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Node:
    """A typed node set: features ``x``, labels ``y``, global ids."""

    node_type: str
    node_ids: np.ndarray
    x: Optional[np.ndarray] = None
    y: Optional[np.ndarray] = None

    @property
    def num_nodes(self) -> int:
        return int(len(self.node_ids))


@dataclasses.dataclass
class Edge:
    """A typed edge set in COO form (global node ids)."""

    edge_type: str
    src: np.ndarray
    dst: np.ndarray
    val: Optional[np.ndarray] = None

    def __post_init__(self):
        self.src = np.asarray(self.src, dtype=np.int64).reshape(-1)
        self.dst = np.asarray(self.dst, dtype=np.int64).reshape(-1)
        if self.val is None:
            self.val = np.ones(self.src.shape[0], dtype=np.float32)

    @property
    def num_edges(self) -> int:
        return int(self.src.shape[0])


class HeteroGraph:
    """Heterogeneous graph: typed node sets + typed edge sets with global
    node-id offsets per type (reference ``base_data.py:237-370``).

    Node ids are globally unique: type ``t`` occupies the contiguous range
    ``[offset[t], offset[t] + num_node[t])``.
    """

    def __init__(
        self,
        nodes: Dict[str, Node],
        edges: Dict[str, Edge],
    ):
        self.nodes = dict(nodes)
        self.edges = dict(edges)
        self.node_types = list(self.nodes.keys())
        self.edge_types = list(self.edges.keys())
        self.num_node = {t: n.num_nodes for t, n in self.nodes.items()}
        # global id offsets in insertion order
        self.offset: Dict[str, int] = {}
        acc = 0
        for t in self.node_types:
            self.offset[t] = acc
            acc += self.num_node[t]
        self.total_num_nodes = acc
        self.node_id_dict = {
            t: np.arange(self.offset[t], self.offset[t] + self.num_node[t])
            for t in self.node_types
        }

    @staticmethod
    def build(
        node_counts: Dict[str, int],
        edge_index_dict: Dict[Tuple[str, str, str], Tuple[np.ndarray, np.ndarray]],
        x_dict: Optional[Dict[str, np.ndarray]] = None,
        y_dict: Optional[Dict[str, np.ndarray]] = None,
        edge_val_dict: Optional[Dict[Tuple[str, str, str], np.ndarray]] = None,
    ) -> "HeteroGraph":
        """Build from per-type counts and local-id COO edge dicts.

        Edge keys are ``(src_type, relation, dst_type)``; local ids are
        shifted to global ids by the per-type offsets.
        """
        x_dict = x_dict or {}
        y_dict = y_dict or {}
        edge_val_dict = edge_val_dict or {}
        offsets: Dict[str, int] = {}
        acc = 0
        for t, n in node_counts.items():
            offsets[t] = acc
            acc += n
        nodes = {
            t: Node(
                node_type=t,
                node_ids=np.arange(offsets[t], offsets[t] + n),
                x=x_dict.get(t),
                y=y_dict.get(t),
            )
            for t, n in node_counts.items()
        }
        edges = {}
        for (st, rel, dt), (s, d) in edge_index_dict.items():
            name = f"{st}__{rel}__{dt}"
            s = np.asarray(s, dtype=np.int64) + offsets[st]
            d = np.asarray(d, dtype=np.int64) + offsets[dt]
            edges[name] = Edge(name, s, d, edge_val_dict.get((st, rel, dt)))
        return HeteroGraph(nodes, edges)

    def __getitem__(self, node_type: str) -> Node:
        return self.nodes[node_type]

    def edge_type_parts(self, edge_type: str) -> Tuple[str, str, str]:
        st, rel, dt = edge_type.split("__")
        return st, rel, dt

    def sample_by_edge_type(
        self,
        edge_types: Sequence[str],
        pad_multiple: int = 1024,
    ) -> Tuple[Graph, np.ndarray]:
        """Union subgraph over a relation subset, re-indexed to local ids and
        made undirected (reference ``base_dataset.py:237-311``).

        Returns ``(graph, node_id)`` where ``node_id[i]`` is the global id of
        local node ``i``.  Nodes are ordered by global id so each node type
        is a contiguous local-id block.
        """
        srcs: List[np.ndarray] = []
        dsts: List[np.ndarray] = []
        types_in: List[str] = []
        for et in edge_types:
            e = self.edges[et]
            st, _, dt = self.edge_type_parts(et)
            types_in += [st, dt]
            srcs.append(e.src)
            dsts.append(e.dst)
        src = np.concatenate(srcs)
        dst = np.concatenate(dsts)
        # every node of every participating type (not only touched nodes):
        # keeps per-type blocks contiguous, matching the reference.
        node_id = np.concatenate(
            [self.node_id_dict[t] for t in self.node_types if t in set(types_in)]
        )
        node_id = np.sort(node_id)
        remap = -np.ones(self.total_num_nodes, dtype=np.int64)
        remap[node_id] = np.arange(node_id.shape[0])
        ls, ld = remap[src], remap[dst]
        # undirect
        us = np.concatenate([ls, ld])
        ud = np.concatenate([ld, ls])
        uniq = np.unique(np.stack([us, ud], axis=1), axis=0)
        g = Graph.from_coo(
            uniq[:, 0],
            uniq[:, 1],
            num_nodes=int(node_id.shape[0]),
            pad_multiple=pad_multiple,
        )
        return g, node_id


# ---------------------------------------------------------------------------
# scipy interop
# ---------------------------------------------------------------------------


def from_scipy(adj, x=None, y=None, pad_multiple: int = 1024) -> Graph:
    """Build a Graph from any scipy sparse matrix (reference ingests CSR)."""
    coo = adj.tocoo()
    return Graph.from_coo(
        coo.row,
        coo.col,
        coo.data,
        num_nodes=int(adj.shape[0]),
        x=x,
        y=y,
        pad_multiple=pad_multiple,
    )


def to_scipy(graph: Graph):
    import scipy.sparse as sp

    s, d, v = graph.edges()
    return sp.csr_matrix(
        (np.asarray(v), (np.asarray(s), np.asarray(d))),
        shape=(graph.num_nodes, graph.num_nodes),
    )
