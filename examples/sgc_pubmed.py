"""SGC on pubmed — the canonical 3-line flow (reference examples/sgc_pubmed.py).

Falls back to a synthetic planted partition when the pubmed raw files are
absent (offline environments)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from sgl_tpu.models import SGC
from sgl_tpu.tasks import NodeClassification

try:
    from sgl_tpu.datasets import Planetoid

    dataset = Planetoid("pubmed", "./data/", "official")
except IOError:
    print("pubmed raw files missing; using a synthetic planted partition")
    from sgl_tpu.datasets import PlantedPartition

    dataset = PlantedPartition(num_nodes=2000, feat_dim=64, num_classes=3)

model = SGC(prop_steps=3, feat_dim=dataset.num_features, output_dim=dataset.num_classes)
test_acc = NodeClassification(
    dataset, model, lr=0.1, weight_decay=5e-5, epochs=200, device=None
).test_acc
print(f"final test acc: {test_acc}")
