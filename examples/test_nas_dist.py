"""NAS with the distributed inner loop (reference examples/test_nas_dist.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import jax

from sgl_tpu.search import ConfigManagerDist, run_nas

try:
    from sgl_tpu.datasets import Planetoid

    dataset = Planetoid("cora", "./data/", "official")
except IOError:
    from sgl_tpu.datasets import PlantedPartition

    dataset = PlantedPartition(num_nodes=800, feat_dim=32, num_classes=4)

n = len(jax.devices())
mesh_shape = (max(n // 4, 1), min(n, 4)) if n >= 4 else (1, n)
configer = ConfigManagerDist(arch=[2, 1, 0, 1, 0, 0, 0])
configer._setParameters(dataset, None, 64, epochs=30, lr=1e-2, wd=5e-4,
                        mesh_shape=mesh_shape)
history = run_nas(configer, max_runs=10, optimizer="evolution", seed=1)
print(history.summary())
