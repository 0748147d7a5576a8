"""One-command reproduction of the BASELINE §(c) accuracy bands.

The build environment has zero egress, so the three real-dataset
workloads below — the only BASELINE rows that have never been checked
against real data — stand WIRE-READY: each downloads its dataset through
the loaders' encoded ``raw_urls`` (``sgl_tpu/datasets/base.py``), runs
the reference's shipped configuration, and compares the result against
the externally published band.  Run it unchanged the day egress exists:

    python examples/reproduce_accuracy.py [--root ./data/] [--workloads ...]

Reference configs: ``/root/reference/examples/sgc_pubmed.py:5-9``,
``gamlp_products.py:13-17``, ``nafs_link_predict.py:1-7``; bands from
BASELINE.md §(c).  The full download→process→train→band flow is
mock-network tested (tests/test_reproduce_accuracy.py).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_sgc_pubmed(root: str, epochs: int = 200, split: str = "official"):
    """SGC on pubmed (reference examples/sgc_pubmed.py:5-9)."""
    from sgl_tpu.datasets import Planetoid
    from sgl_tpu.models import SGC
    from sgl_tpu.tasks import NodeClassification

    ds = Planetoid("pubmed", root, split)
    model = SGC(
        prop_steps=3, feat_dim=ds.num_features, output_dim=ds.num_classes
    )
    return NodeClassification(
        ds, model, lr=0.1, weight_decay=5e-5, epochs=epochs, verbose=False
    ).test_acc


def run_gamlp_products(root: str, epochs: int = 200, split: str = "official"):
    """GAMLP on ogbn-products (reference examples/gamlp_products.py:13-17).

    ``split`` is accepted for signature uniformity but OGB only ships the
    official sales-ranking split, so it is always "official" here."""
    from sgl_tpu.datasets import Ogbn
    from sgl_tpu.models import GAMLP
    from sgl_tpu.tasks import NodeClassification

    ds = Ogbn("products", root, "official")
    model = GAMLP(
        prop_steps=3,
        feat_dim=ds.num_features,
        output_dim=ds.num_classes,
        hidden_dim=512,
        num_layers=3,
    )
    return NodeClassification(
        ds, model, lr=0.1, weight_decay=5e-5, epochs=epochs, verbose=False,
        train_batch_size=50000, eval_batch_size=100000,
    ).test_acc


def run_nafs_linkpred_pubmed(root: str, epochs: int = 0, split: str = "official"):
    """Training-free NAFS link prediction on pubmed (reference
    examples/nafs_link_predict.py:1-7); ``epochs`` unused."""
    from sgl_tpu.datasets import Planetoid
    from sgl_tpu.tasks import LinkPredictionNAFS

    ds = Planetoid("pubmed", root, split)
    return LinkPredictionNAFS(ds, hops=20, method="mean", verbose=False).test_roc_auc


def run_nafs_cluster_pubmed(root: str, epochs: int = 0, split: str = "official"):
    """Training-free NAFS node clustering on pubmed (reference
    examples/nafs_node_cluster.py:1-7); ``epochs`` unused."""
    from sgl_tpu.datasets import Planetoid
    from sgl_tpu.tasks import NodeClusteringNAFS

    ds = Planetoid("pubmed", root, split)
    return NodeClusteringNAFS(ds, hops=20, method="mean", verbose=False).acc


def _planetoid_classifier(model_cls, name, root, epochs, split, **model_kw):
    from sgl_tpu.datasets import Planetoid
    from sgl_tpu.tasks import NodeClassification

    ds = Planetoid(name, root, split)
    model = model_cls(
        prop_steps=3, feat_dim=ds.num_features, output_dim=ds.num_classes,
        **model_kw,
    )
    return NodeClassification(
        ds, model, lr=0.1, weight_decay=5e-5, epochs=epochs, verbose=False
    ).test_acc


def run_sign_cora(root, epochs=200, split="official"):
    from sgl_tpu.models import SIGN

    return _planetoid_classifier(SIGN, "cora", root, epochs, split,
                                 hidden_dim=128, num_layers=2)


def run_sign_citeseer(root, epochs=200, split="official"):
    from sgl_tpu.models import SIGN

    return _planetoid_classifier(SIGN, "citeseer", root, epochs, split,
                                 hidden_dim=128, num_layers=2)


def run_ssgc_cora(root, epochs=200, split="official"):
    from sgl_tpu.models import SSGC

    return _planetoid_classifier(SSGC, "cora", root, epochs, split)


def run_ssgc_citeseer(root, epochs=200, split="official"):
    from sgl_tpu.models import SSGC

    return _planetoid_classifier(SSGC, "citeseer", root, epochs, split)


def run_gbp_cora(root, epochs=200, split="official"):
    from sgl_tpu.models import GBP

    return _planetoid_classifier(GBP, "cora", root, epochs, split,
                                 hidden_dim=128, num_layers=2)


def run_gbp_citeseer(root, epochs=200, split="official"):
    from sgl_tpu.models import GBP

    return _planetoid_classifier(GBP, "citeseer", root, epochs, split,
                                 hidden_dim=128, num_layers=2)


def run_nas_cora(root, epochs=50, split="official"):
    """20-trial PaSca NAS smoke on cora (reference examples/test_nas.py:
    14-33 runs 3500 trials; 20 suffices to land a competitive arch on
    cora).  Uses OpenBox when installed, else the built-in evolutionary
    Pareto search — the same objective either way."""
    from sgl_tpu.datasets import Planetoid
    from sgl_tpu.search import ConfigManager, run_nas

    ds = Planetoid("cora", root, split)
    configer = ConfigManager(arch=[2, 1, 1, 2, 0, 0, 0])
    configer._setParameters(ds, None, 128, epochs=epochs, lr=0.1, wd=5e-5,
                            restarts=1)
    history = run_nas(configer, max_runs=NAS_SMOKE_TRIALS, optimizer="auto",
                      seed=1, verbose=False)
    return -history.best_accuracy_trial.objs[0]


NAS_SMOKE_TRIALS = 20  # the mock-network test shrinks this


def run_dist_sgc_pubmed(root, epochs=200, split="official"):
    """SGC on pubmed through the distributed runtime (reference
    examples/test_nodeclass_dist.py) — ring precompute + DP training on
    whatever mesh the host offers (1x1 on a single device)."""
    import jax

    from sgl_tpu.datasets import Planetoid
    from sgl_tpu.models import SGC
    from sgl_tpu.tasks import NodeClassificationDist

    ds = Planetoid("pubmed", root, split)
    model = SGC(prop_steps=3, feat_dim=ds.num_features,
                output_dim=ds.num_classes)
    n = len(jax.devices())
    shape = (max(n // 2, 1), 2) if n >= 2 else (1, 1)
    return NodeClassificationDist(
        ds, model, lr=0.1, weight_decay=5e-5, epochs=epochs,
        mesh_shape=shape, verbose=False,
    ).test_acc


# workload -> (runner, metric name, (low, high) published band, provenance)
WORKLOADS = {
    "sgc_pubmed": (
        run_sgc_pubmed, "test acc", (0.77, 0.82),
        "SGC paper (ICML'19): 0.789-0.799",
    ),
    "gamlp_products": (
        run_gamlp_products, "test acc", (0.82, 0.87),
        "GAMLP paper (KDD'22): 0.8459",
    ),
    "nafs_linkpred_pubmed": (
        run_nafs_linkpred_pubmed, "roc-auc", (0.93, 1.0),
        "NAFS paper (ICML'22): matches/beats GAE (pubmed AUC ~0.964)",
    ),
    "nafs_cluster_pubmed": (
        run_nafs_cluster_pubmed, "cluster acc", (0.60, 1.0),
        "NAFS paper (ICML'22): pubmed clustering acc ~0.69 without training",
    ),
    "sign_cora": (
        run_sign_cora, "test acc", (0.78, 0.85),
        "SIGN paper (ICML-W'20) / common planetoid reproductions: ~0.82",
    ),
    "sign_citeseer": (
        run_sign_citeseer, "test acc", (0.68, 0.76),
        "common planetoid reproductions: ~0.72",
    ),
    "ssgc_cora": (
        run_ssgc_cora, "test acc", (0.80, 0.86),
        "S2GC paper (ICLR'21): 0.830",
    ),
    "ssgc_citeseer": (
        run_ssgc_citeseer, "test acc", (0.70, 0.77),
        "S2GC paper (ICLR'21): 0.736",
    ),
    "gbp_cora": (
        run_gbp_cora, "test acc", (0.80, 0.87),
        "GBP paper (NeurIPS'20): 0.839",
    ),
    "gbp_citeseer": (
        run_gbp_citeseer, "test acc", (0.69, 0.76),
        "GBP paper (NeurIPS'20): 0.729",
    ),
    "nas_cora": (
        run_nas_cora, "best acc", (0.75, 0.88),
        "PaSca (WWW'22) search space on cora: discovered archs ~0.83; "
        "20-trial smoke bands generously below the 3500-trial result",
    ),
    "dist_sgc_pubmed": (
        run_dist_sgc_pubmed, "test acc", (0.77, 0.82),
        "same SGC band through the distributed runtime",
    ),
}


def main(
    workloads=None,
    root: str = "./data/",
    epochs: int = 200,
    split: str = "official",
    check_bands: bool = True,
):
    """Run the selected workloads; return ``[(name, metric, value, in_band)]``.

    ``split``/``epochs``/``check_bands`` exist so the mock-network test can
    drive the identical flow on tiny fixtures; production defaults
    reproduce the reference configs exactly.
    """
    rows = []
    for name in workloads or list(WORKLOADS):
        runner, metric, (lo, hi), provenance = WORKLOADS[name]
        try:
            value = float(runner(root, epochs=epochs, split=split))
        except IOError as exc:
            # dataset unreachable (offline / download failed): report and
            # keep going so partial runs still produce their rows
            print(f"[{name}] dataset unavailable: {exc}")
            rows.append((name, metric, None, None))
            continue
        in_band = (lo <= value <= hi) if check_bands else None
        rows.append((name, metric, value, in_band))
    width = max(len(n) for n, *_ in rows)
    print(f"{'workload':<{width}}  {'metric':<9} {'value':>7}  band          verdict")
    for name, metric, value, in_band in rows:
        lo, hi = WORKLOADS[name][2]
        if value is None:
            verdict, shown = "NO DATA", "      -"
        else:
            verdict = "-" if in_band is None else ("PASS" if in_band else "FAIL")
            shown = f"{value:>7.4f}"
        print(
            f"{name:<{width}}  {metric:<9} {shown}  "
            f"[{lo:.2f}, {hi:.2f}]  {verdict}"
        )
    return rows


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--root", default="./data/")
    ap.add_argument(
        "--workloads", nargs="+", choices=list(WORKLOADS), default=None
    )
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--no-check", action="store_true",
                    help="report values without band verdicts")
    ap.add_argument("--allow-missing", action="store_true",
                    help="exit 0 even when some datasets could not be "
                    "downloaded (default: NO DATA rows fail the run when "
                    "band checks are on, so CI cannot silently pass "
                    "without data)")
    args = ap.parse_args()
    results = main(
        workloads=args.workloads, root=args.root, epochs=args.epochs,
        check_bands=not args.no_check,
    )
    failed = any(in_band is False for *_, in_band in results)
    missing = any(value is None for _, _, value, _ in results)
    if failed or (missing and not args.no_check and not args.allow_missing):
        sys.exit(1)
