"""Synthetic datasets: deterministic, network-free, used by tests and bench.

The reference has no synthetic generators (all 24 loaders download); these
exist because (a) CI has zero egress, (b) benchmarks need size-controlled
graphs.  ``PlantedPartition`` generates an SBM whose communities are
recoverable by any sane SGAP model — the e2e accuracy tests assert a high
accuracy band on it, the TPU analog of the reference's "matches published
Planetoid numbers" validation.
"""

from __future__ import annotations

import numpy as np

from sgl_tpu.datasets.base import (
    GraphDataset,
    HeteroNodeDataset,
    NodeDataset,
    random_split,
)
from sgl_tpu.graph.graph import Graph, HeteroGraph


class PlantedPartition(NodeDataset):
    """Stochastic block model with class-correlated Gaussian features."""

    def __init__(
        self,
        num_nodes: int = 600,
        num_classes: int = 4,
        feat_dim: int = 32,
        p_in: float = 0.05,
        p_out: float = 0.002,
        feature_noise: float = 2.0,
        seed: int = 0,
        train_ratio: float = 0.3,
        val_ratio: float = 0.2,
    ):
        self._n = num_nodes
        self._c = num_classes
        self._d = feat_dim
        self._p_in = p_in
        self._p_out = p_out
        self._noise = feature_noise
        self._seed = seed
        self._train_ratio = train_ratio
        self._val_ratio = val_ratio
        super().__init__(name=f"sbm_{num_nodes}_{seed}", use_cache=False)

    def _raw_exists(self) -> bool:
        return True

    def _process(self) -> Graph:
        rng = np.random.default_rng(self._seed)
        n, c, d = self._n, self._c, self._d
        y = rng.integers(0, c, n)
        # class centroids + noise
        centroids = rng.normal(size=(c, d)).astype(np.float32)
        x = centroids[y] + self._noise * rng.normal(size=(n, d)).astype(np.float32)
        # SBM edges via sparse sampling
        same = y[:, None] == y[None, :]
        # sample edge candidates in blocks to stay O(n^2) only for small n
        probs = np.where(same, self._p_in, self._p_out)
        upper = np.triu(rng.random((n, n)) < probs, k=1)
        s, t = np.nonzero(upper)
        src = np.concatenate([s, t]).astype(np.int32)
        dst = np.concatenate([t, s]).astype(np.int32)
        return Graph.from_coo(src, dst, num_nodes=n, x=x, y=y, pad_multiple=1024)

    def _split(self) -> None:
        self.train_idx, self.val_idx, self.test_idx = random_split(
            self._n, self._train_ratio, self._val_ratio, seed=self._seed
        )


def random_power_law_graph(
    num_nodes: int,
    avg_degree: int,
    feat_dim: int,
    num_classes: int = 16,
    seed: int = 0,
    alpha: float = 1.2,
    pad_multiple: int = 4096,
) -> Graph:
    """Degree-skewed random graph (Zipf-ish) for SpMM benchmarking — the
    degree skew is what stresses row-tiling (SURVEY.md §7 hard parts)."""
    rng = np.random.default_rng(seed)
    e = num_nodes * avg_degree // 2
    # preferential-attachment-like weights
    w = (np.arange(1, num_nodes + 1, dtype=np.float64)) ** (-alpha)
    w /= w.sum()
    src = rng.choice(num_nodes, size=e, p=w).astype(np.int32)
    dst = rng.integers(0, num_nodes, e).astype(np.int32)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    src_u = np.concatenate([src, dst])
    dst_u = np.concatenate([dst, src])
    x = rng.normal(size=(num_nodes, feat_dim)).astype(np.float32)
    y = rng.integers(0, num_classes, num_nodes)
    return Graph.from_coo(
        src_u, dst_u, num_nodes=num_nodes, x=x, y=y, pad_multiple=pad_multiple
    )


class SyntheticPowerLaw(NodeDataset):
    """Homophilous power-law graph in the ``NodeDataset`` lifecycle.

    The degree distribution is Zipf-skewed like the OGB-scale graphs
    (products / papers100M — SURVEY.md §7 names the skew as THE hard
    part for row tiling), and edges prefer same-class endpoints
    (``homophily``) with class-correlated features, so propagation adds
    signal and the pipeline demos train to a recoverable target instead
    of noise.  Used by ``examples/papers100m_pipeline.py`` to rehearse
    the papers100M recipe offline at any size.
    """

    def __init__(
        self,
        num_nodes: int = 100_000,
        avg_degree: int = 14,
        feat_dim: int = 128,
        num_classes: int = 16,
        alpha: float = 1.2,
        homophily: float = 0.8,
        feature_noise: float = 2.0,
        seed: int = 0,
        train_ratio: float = 0.1,
        val_ratio: float = 0.05,
        pad_multiple: int = 4096,
    ):
        self._n = num_nodes
        self._deg = avg_degree
        self._d = feat_dim
        self._c = num_classes
        self._alpha = alpha
        self._hom = homophily
        self._noise = feature_noise
        self._seed = seed
        self._train_ratio = train_ratio
        self._val_ratio = val_ratio
        self._pad = pad_multiple
        super().__init__(name=f"powerlaw_{num_nodes}_{seed}", use_cache=False)

    def _raw_exists(self) -> bool:
        return True

    def _process(self) -> Graph:
        rng = np.random.default_rng(self._seed)
        n, c, d = self._n, self._c, self._d
        y = rng.integers(0, c, n)
        centroids = rng.normal(size=(c, d)).astype(np.float32)
        x = centroids[y] + self._noise * rng.normal(size=(n, d)).astype(
            np.float32
        )
        e = n * self._deg // 2
        # Zipf-weighted sources (hubs), uniform destinations ...
        w = np.arange(1, n + 1, dtype=np.float64) ** (-self._alpha)
        w /= w.sum()
        src = rng.choice(n, size=e, p=w).astype(np.int64)
        dst = rng.integers(0, n, e).astype(np.int64)
        # ... then homophilous edges redraw dst within the source's class
        hom = rng.random(e) < self._hom
        if hom.any():
            cls_nodes = [np.flatnonzero(y == k) for k in range(c)]
            src_cls = y[src]
            for k in range(c):
                m = hom & (src_cls == k)
                if m.any() and cls_nodes[k].size:
                    dst[m] = rng.choice(cls_nodes[k], size=int(m.sum()))
        keep = src != dst
        src, dst = src[keep], dst[keep]
        src_u = np.concatenate([src, dst]).astype(np.int32)
        dst_u = np.concatenate([dst, src]).astype(np.int32)
        return Graph.from_coo(
            src_u, dst_u, num_nodes=n, x=x, y=y, pad_multiple=self._pad
        )

    def _split(self) -> None:
        self.train_idx, self.val_idx, self.test_idx = random_split(
            self._n, self._train_ratio, self._val_ratio, seed=self._seed
        )


class SyntheticHeteroDataset(HeteroNodeDataset):
    """Wraps :func:`synthetic_hetero` in the ``HeteroNodeDataset`` lifecycle
    with a random split over the predict-class nodes (local ids)."""

    def __init__(self, predict_class: str = "paper", seed: int = 0, **kw):
        self._gen_kw = dict(kw, seed=seed)
        self._predict_class = predict_class
        self._seed = seed
        super().__init__(name=f"synth_hetero_{seed}", use_cache=False)

    def _raw_exists(self) -> bool:
        return True

    def _process(self) -> HeteroGraph:
        return synthetic_hetero(**self._gen_kw)

    def _split(self) -> None:
        n = self.data.num_node[self._predict_class]
        self.train_idx, self.val_idx, self.test_idx = random_split(
            n, 0.5, 0.25, seed=self._seed
        )

    @property
    def num_classes(self) -> int:
        y = np.asarray(self.data[self._predict_class].y)
        return int(y.max()) + 1


def synthetic_hetero(
    counts=None,
    avg_degree: int = 6,
    feat_dim: int = 16,
    num_classes: int = 3,
    seed: int = 0,
):
    """Small random heterogeneous graph (ACM-like schema) for NARS tests."""
    rng = np.random.default_rng(seed)
    counts = counts or {"paper": 120, "author": 80, "subject": 20}
    schema = [
        ("paper", "cite", "paper"),
        ("author", "writes", "paper"),
        ("paper", "has", "subject"),
    ]
    edges = {}
    for st, rel, dt in schema:
        e = counts[st] * avg_degree
        edges[(st, rel, dt)] = (
            rng.integers(0, counts[st], e),
            rng.integers(0, counts[dt], e),
        )
    y = rng.integers(0, num_classes, counts["paper"])
    centroids = rng.normal(size=(num_classes, feat_dim)).astype(np.float32)
    x_dict = {
        t: rng.normal(size=(n, feat_dim)).astype(np.float32)
        for t, n in counts.items()
    }
    # class-correlated paper features so models can beat chance
    x_dict["paper"] = (
        centroids[y] + 1.0 * rng.normal(size=(counts["paper"], feat_dim))
    ).astype(np.float32)
    y_dict = {"paper": y}
    return HeteroGraph.build(counts, edges, x_dict=x_dict, y_dict=y_dict)


class SyntheticGraphClassification(GraphDataset):
    """Graph-classification dataset where the signal is STRUCTURAL: classes
    differ only in edge density, while per-node features are class-agnostic
    (a constant column + noise).  Hop-0 readouts are therefore at chance;
    any accuracy above it must come through propagation — the graph-level
    analog of :class:`PlantedPartition`'s recoverability guarantee.
    """

    def __init__(
        self,
        num_graphs: int = 200,
        num_classes: int = 2,
        nodes_per_graph=(20, 40),
        feat_dim: int = 8,
        base_p: float = 0.08,
        seed: int = 0,
    ):
        self._g = num_graphs
        self._c = num_classes
        self._nrange = nodes_per_graph
        self._d = feat_dim
        self._base_p = base_p
        self._seed = seed
        super().__init__(name=f"synth_graphs_{num_graphs}_{seed}", use_cache=False)

    def _raw_exists(self) -> bool:
        return True

    def _process(self):
        rng = np.random.default_rng(self._seed)
        graphs, ys = [], []
        lo, hi = self._nrange
        for _ in range(self._g):
            y = int(rng.integers(0, self._c))
            n = int(rng.integers(lo, hi + 1))
            p = self._base_p * (1 + 2 * y)  # density encodes the class
            upper = np.triu(rng.random((n, n)) < p, k=1)
            s, t = np.nonzero(upper)
            src = np.concatenate([s, t]).astype(np.int32)
            dst = np.concatenate([t, s]).astype(np.int32)
            x = np.concatenate(
                [
                    np.ones((n, 1), np.float32),
                    rng.normal(size=(n, self._d - 1)).astype(np.float32),
                ],
                axis=1,
            )
            graphs.append(
                Graph.from_coo(src, dst, num_nodes=n, x=x, pad_multiple=64)
            )
            ys.append(y)
        return graphs, np.asarray(ys, np.int64)

    def _split(self) -> None:
        self.train_idx, self.val_idx, self.test_idx = random_split(
            self._g, 0.5, 0.25, seed=self._seed
        )
