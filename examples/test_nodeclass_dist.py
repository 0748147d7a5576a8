"""Distributed node classification over a device mesh
(reference examples/test_nodeclass_dist.py, which spawns DDP workers).

On CPU, fake an 8-device mesh first:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/test_nodeclass_dist.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import jax

from sgl_tpu.models import SGCDist
from sgl_tpu.tasks import NodeClassificationDist
from sgl_tpu.utils import TrainConfig

cfg = TrainConfig.from_args()

try:
    from sgl_tpu.datasets import Planetoid

    dataset = Planetoid("pubmed", "./data/", "official")
except IOError:
    from sgl_tpu.datasets import PlantedPartition

    dataset = PlantedPartition(num_nodes=2000, feat_dim=64, num_classes=3)

n = len(jax.devices())
mesh_shape = (max(n // 4, 1), min(n, 4)) if n >= 4 else (1, n)
model = SGCDist(prop_steps=cfg.prop_steps, feat_dim=dataset.num_features,
                output_dim=dataset.num_classes)
task = NodeClassificationDist(
    dataset, model, lr=cfg.lr, weight_decay=cfg.weight_decay,
    epochs=cfg.epochs, mesh_shape=mesh_shape,
    train_batch_size=cfg.train_batch_size,
)
print(f"final test acc: {task.test_acc}")
