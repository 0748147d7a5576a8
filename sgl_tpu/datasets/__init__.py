from sgl_tpu.datasets.base import NodeDataset, HeteroNodeDataset, random_split
from sgl_tpu.datasets.synthetic import (
    PlantedPartition,
    random_power_law_graph,
    synthetic_hetero,
)
