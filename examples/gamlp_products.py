"""GAMLP on ogbn-products (reference examples/gamlp_products.py); synthetic
fallback for offline environments."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from sgl_tpu.models import GAMLP
from sgl_tpu.tasks import NodeClassification

try:
    from sgl_tpu.datasets import Ogbn

    dataset = Ogbn("products", "./data/", "official")
except IOError:
    print("ogbn-products raw files missing; using a synthetic graph")
    from sgl_tpu.datasets import PlantedPartition

    dataset = PlantedPartition(num_nodes=5000, feat_dim=100, num_classes=16)

model = GAMLP(
    prop_steps=3,
    feat_dim=dataset.num_features,
    output_dim=dataset.num_classes,
    hidden_dim=512,
    num_layers=3,
)
test_acc = NodeClassification(
    dataset, model, lr=0.1, weight_decay=5e-5, epochs=200, device=None,
    train_batch_size=50000, eval_batch_size=100000,
).test_acc
print(f"final test acc: {test_acc}")
