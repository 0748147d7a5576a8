"""PaSca-style NAS (reference examples/test_nas.py).  Uses OpenBox SMBO when
installed, otherwise the built-in evolutionary Pareto search."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from sgl_tpu.search import ConfigManager, run_nas
from sgl_tpu.utils import TrainConfig

try:
    from sgl_tpu.datasets import Planetoid

    dataset = Planetoid("cora", "./data/", "official")
except IOError:
    from sgl_tpu.datasets import PlantedPartition

    dataset = PlantedPartition(num_nodes=800, feat_dim=32, num_classes=4)

initial_arch = [2, 1, 1, 2, 3, 1, 0]
# the same TrainConfig layer drives the NAS inner loop (CLI flags win)
cfg = TrainConfig.from_args(
    defaults=TrainConfig(lr=1e-2, weight_decay=5e-4, epochs=50, hidden_dim=128)
)
configer = ConfigManager(initial_arch)
configer._setParameters(dataset, None, restarts=2, config=cfg)
history = run_nas(configer, max_runs=30, optimizer="auto", seed=1)
print(history.summary())
