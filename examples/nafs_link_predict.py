"""Training-free NAFS link prediction (reference examples/nafs_link_predict.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from sgl_tpu.tasks import LinkPredictionNAFS

try:
    from sgl_tpu.datasets import Planetoid

    dataset = Planetoid("pubmed", "./data/", "official")
except IOError:
    from sgl_tpu.datasets import PlantedPartition

    dataset = PlantedPartition(num_nodes=1000, feat_dim=64, num_classes=3)

task = LinkPredictionNAFS(dataset, hops=20, method="mean")
print(f"test roc-auc: {task.test_roc_auc}, avg precision: {task.test_avg_prec}")
