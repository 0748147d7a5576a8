"""NARS heterogeneous classification (reference sgl/etc/hetero_test.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from sgl_tpu.models import Fast_NARS_SGC_WithLearnableWeights
from sgl_tpu.tasks import HeteroNodeClassification

try:
    from sgl_tpu.datasets import OgbnMag

    dataset = OgbnMag("./data/")
    predict_class = "paper"
except IOError:
    from sgl_tpu.datasets import SyntheticHeteroDataset

    dataset = SyntheticHeteroDataset(seed=0)
    predict_class = "paper"

model = Fast_NARS_SGC_WithLearnableWeights(
    prop_steps=2, feat_dim=16, output_dim=dataset.num_classes,
    hidden_dim=64, num_layers=2, random_subgraph_num=2,
)
task = HeteroNodeClassification(
    dataset, predict_class, model, lr=0.05, weight_decay=5e-5, epochs=50,
    random_subgraph_num=2, subgraph_edge_type_num=2,
    record_subgraph_weight=True,
)
print(f"test acc: {task.test_acc}, subgraph weights: {task.subgraph_weight}")
