"""Graph classification — graph-level SGAP (beyond the reference, whose
``GraphDataset`` is an empty stub).  The whole dataset propagates as ONE
block-diagonal SpMM; training is an MLP over pooled per-graph rows."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sgl_tpu.datasets import SyntheticGraphClassification
from sgl_tpu.models import GraphSGC
from sgl_tpu.tasks import GraphClassification

dataset = SyntheticGraphClassification(num_graphs=200)
model = GraphSGC(
    prop_steps=2,
    feat_dim=dataset.num_features,
    output_dim=dataset.num_classes,
    readout="max",
)
test_acc = GraphClassification(
    dataset, model, lr=0.1, weight_decay=5e-5, epochs=60, verbose=False
).test_acc
print(f"final test acc: {test_acc}")
