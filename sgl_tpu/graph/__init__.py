from sgl_tpu.graph.graph import Graph, HeteroGraph, Node, Edge, from_scipy, to_scipy
from sgl_tpu.graph.normalize import (
    symmetric_normalized_weights,
    ppr_weights,
    row_normalized_weights,
)
from sgl_tpu.graph.transforms import (
    add_self_loops,
    remove_self_loops,
    delete_repeated_edges,
    random_drop_edges,
    biased_drop_edges,
    random_drop_nodes,
    drop_edges,
    add_edges,
    mask_features,
    get_subgraph,
    sort_edges,
    to_undirected,
)

__all__ = [
    "Graph",
    "HeteroGraph",
    "Node",
    "Edge",
    "from_scipy",
    "to_scipy",
    "symmetric_normalized_weights",
    "ppr_weights",
    "row_normalized_weights",
    "add_self_loops",
    "remove_self_loops",
    "delete_repeated_edges",
    "random_drop_edges",
    "biased_drop_edges",
    "random_drop_nodes",
    "drop_edges",
    "add_edges",
    "mask_features",
    "get_subgraph",
    "sort_edges",
    "to_undirected",
]
