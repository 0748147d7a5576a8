"""bf16 precompute promotion study (reproduces docs/PERFORMANCE.md table).

Run on CPU:
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
        python dev/exp_bf16_study.py

Trains SGC / SIGN / GAMLP on two synthetic difficulty bands with f32 vs
bf16 precompute (3 seeds each) and prints mean test-accuracy deltas.
"""

import numpy as np
import jax.numpy as jnp

from sgl_tpu.datasets.synthetic import PlantedPartition
from sgl_tpu.models.homo import SGC, SIGN, GAMLP
from sgl_tpu.tasks.node_classification import NodeClassification

BANDS = [
    ("easy", dict(num_nodes=600, feat_dim=16, feature_noise=2.0, seed=3)),
    ("hard", dict(num_nodes=600, feat_dim=16, feature_noise=3.5, seed=5)),
]
MODELS = {
    "SGC": lambda ds: SGC(3, ds.num_features, ds.num_classes),
    "SIGN": lambda ds: SIGN(3, ds.num_features, ds.num_classes, hidden_dim=32, num_layers=2),
    "GAMLP": lambda ds: GAMLP(3, ds.num_features, ds.num_classes, hidden_dim=32, num_layers=2),
}
SEEDS = (42, 7, 19)


def main():
    for bname, cfg in BANDS:
        ds = PlantedPartition(**cfg)
        for mname, mk in MODELS.items():
            means = {}
            for dt_name, dt in [("f32", None), ("bf16", jnp.bfloat16)]:
                means[dt_name] = np.mean([
                    NodeClassification(
                        ds, mk(ds), lr=0.05, weight_decay=5e-5, epochs=80,
                        verbose=False, seed=s, precompute_dtype=dt,
                    ).test_acc
                    for s in SEEDS
                ])
            f, b = means["f32"], means["bf16"]
            print(f"{bname:5s} {mname:6s} f32={f:.4f} bf16={b:.4f} delta={b - f:+.4f}")


if __name__ == "__main__":
    main()
