"""Training-free NAFS node clustering (reference examples/nafs_node_cluster.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from sgl_tpu.tasks import NodeClusteringNAFS

try:
    from sgl_tpu.datasets import Planetoid

    dataset = Planetoid("pubmed", "./data/", "official")
except IOError:
    from sgl_tpu.datasets import PlantedPartition

    dataset = PlantedPartition(num_nodes=1000, feat_dim=64, num_classes=3)

task = NodeClusteringNAFS(dataset, hops=20, method="mean")
print(f"acc: {task.acc}, nmi: {task.nmi}, ari: {task.adjscore}")
