from sgl_tpu.datasets.base import NodeDataset, HeteroNodeDataset, random_split
from sgl_tpu.datasets.synthetic import (
    PlantedPartition,
    random_power_law_graph,
    synthetic_hetero,
    SyntheticHeteroDataset,
)
from sgl_tpu.datasets.choose_edge_type import (
    choose_edge_type,
    choose_multi_subgraphs,
    remove_duplicate_edge_types,
)
