"""Block-diagonal graph batching for graph-level tasks.

The reference stubs graph-level support out entirely
(``sgl/data/base_dataset.py:124-126``); this module implements it the
TPU-natural way: a batch of small graphs IS one big graph whose adjacency
is block-diagonal, so the existing propagation stack (normalization, the
Pallas SpMM, hop scans) applies unchanged with **one kernel launch for the
whole batch**, and per-graph readout is a single ``segment_sum``/``max``
over a static ``graph_ids`` vector.  No per-graph Python loops, no ragged
shapes: node counts pad into the standard padded-COO layout.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

from sgl_tpu.graph.graph import Graph


@dataclasses.dataclass
class GraphBatch:
    """A set of graphs packed as one block-diagonal :class:`Graph`.

    ``graph_ids[i]`` is the graph owning node row ``i`` (padding rows, if
    any, map to ``num_graphs - 1`` with zero features and no edges — they
    only dilute mean readout by a known factor of zero rows, so sum/max
    readouts are exact and mean readout divides by *real* node counts).
    """

    graph: Graph
    graph_ids: np.ndarray  # (N_total,) int32
    node_counts: np.ndarray  # (num_graphs,) int32 real nodes per graph
    num_graphs: int
    y: Optional[np.ndarray] = None  # (num_graphs,) graph labels

    @property
    def num_nodes(self) -> int:
        return self.graph.num_nodes

    @property
    def num_features(self) -> int:
        return self.graph.num_features


def batch_graphs(
    graphs: Sequence[Graph],
    y=None,
    pad_multiple: int = 1024,
) -> GraphBatch:
    """Pack ``graphs`` into one block-diagonal :class:`GraphBatch`.

    Node ids of graph ``g`` shift by the cumulative node count; edge
    weights/values are preserved.  Features are concatenated (all graphs
    must share a feature dimension, or all have none).
    """
    if not graphs:
        raise ValueError("batch_graphs needs at least one graph")
    counts = np.asarray([g.num_nodes for g in graphs], np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    n_total = int(offsets[-1])

    srcs, dsts, vals = [], [], []
    for g, off in zip(graphs, offsets[:-1]):
        s, d, v = g.edges()
        srcs.append(s.astype(np.int64) + off)
        dsts.append(d.astype(np.int64) + off)
        vals.append(v)
    src = np.concatenate(srcs) if srcs else np.zeros(0, np.int64)
    dst = np.concatenate(dsts)
    val = np.concatenate(vals)

    has_x = graphs[0].x is not None
    if any((g.x is not None) != has_x for g in graphs):
        raise ValueError("either all graphs have features or none do")
    x = np.concatenate([np.asarray(g.x) for g in graphs]) if has_x else None

    graph_ids = np.repeat(
        np.arange(len(graphs), dtype=np.int32), counts.astype(np.int64)
    )
    batched = Graph.from_coo(
        src, dst, val, num_nodes=n_total, x=x, pad_multiple=pad_multiple
    )
    return GraphBatch(
        graph=batched,
        graph_ids=graph_ids,
        node_counts=counts.astype(np.int32),
        num_graphs=len(graphs),
        y=None if y is None else np.asarray(y),
    )
