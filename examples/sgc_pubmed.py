"""SGC on pubmed — the canonical 3-line flow (reference examples/sgc_pubmed.py).

Falls back to a synthetic planted partition when the pubmed raw files are
absent (offline environments)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from sgl_tpu.models import SGC
from sgl_tpu.tasks import NodeClassification
from sgl_tpu.utils import TrainConfig

# one config layer serving kwargs/CLI/NAS (SURVEY §5): the shipped
# reference config is the default; CLI flags (--lr 0.2 --epochs 50) win
cfg = TrainConfig.from_args(
    defaults=TrainConfig(lr=0.1, weight_decay=5e-5, epochs=200, prop_steps=3)
)

try:
    from sgl_tpu.datasets import Planetoid

    dataset = Planetoid("pubmed", "./data/", "official")
except IOError:
    print("pubmed raw files missing; using a synthetic planted partition")
    from sgl_tpu.datasets import PlantedPartition

    dataset = PlantedPartition(num_nodes=2000, feat_dim=64, num_classes=3)

model = SGC(prop_steps=cfg.prop_steps, feat_dim=dataset.num_features,
            output_dim=dataset.num_classes)
test_acc = NodeClassification(dataset, model, config=cfg, device=None).test_acc
print(f"final test acc: {test_acc}")
