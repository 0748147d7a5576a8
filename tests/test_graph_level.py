"""Graph-level support: block-diagonal batching, readout, e2e task.

The reference stubs graph-level tasks out (``sgl/data/base_dataset.py:
124-126``); these tests cover the implemented extension.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sgl_tpu.datasets.synthetic import SyntheticGraphClassification
from sgl_tpu.graph import batch_graphs, symmetric_normalized_weights
from sgl_tpu.kernels import spmm
from sgl_tpu.models.graph_level import GraphSGC, GraphSIGN, segment_readout
from sgl_tpu.tasks import GraphClassification
from tests.conftest import random_graph


def _graphs(k=4, seed=0):
    return [random_graph(n=30 + 7 * i, avg_deg=5, d=6, seed=seed + i) for i in range(k)]


def test_batched_propagation_matches_per_graph():
    """One SpMM over the block-diagonal batch == per-graph SpMMs."""
    graphs = _graphs()
    batch = batch_graphs(graphs)
    adj_b = symmetric_normalized_weights(batch.graph)
    out_b = np.asarray(spmm(adj_b, jnp.asarray(batch.graph.x)))
    off = 0
    for g in graphs:
        adj = symmetric_normalized_weights(g)
        want = np.asarray(spmm(adj, jnp.asarray(g.x)))
        got = out_b[off : off + g.num_nodes]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        off += g.num_nodes


@pytest.mark.parametrize("kind", ["mean", "sum", "max"])
def test_segment_readout_matches_loop(kind):
    graphs = _graphs()
    batch = batch_graphs(graphs)
    h = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch.num_nodes, 5)).astype(np.float32)
    )
    got = np.asarray(
        segment_readout(
            h,
            jnp.asarray(batch.graph_ids),
            batch.num_graphs,
            jnp.asarray(batch.node_counts),
            kind,
        )
    )
    off = 0
    for i, g in enumerate(graphs):
        rows = np.asarray(h)[off : off + g.num_nodes]
        want = {
            "mean": rows.mean(0),
            "sum": rows.sum(0),
            "max": rows.max(0),
        }[kind]
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-6)
        off += g.num_nodes


def test_batch_graphs_validates():
    graphs = _graphs(2)
    with pytest.raises(ValueError):
        batch_graphs([])
    no_x = graphs[1].replace(x=None)
    with pytest.raises(ValueError):
        batch_graphs([graphs[0], no_x])


def test_graph_classification_structural_signal():
    """Classes differ only in structure; hop-0 features are class-agnostic,
    so above-chance accuracy must come through propagation."""
    ds = SyntheticGraphClassification(num_graphs=120, seed=3)
    # max readout: propagation shrinks per-node feature variance in
    # proportion to density, and the per-graph max reads that directly;
    # mean readout cannot see it (symmetric normalization cancels degree
    # effects and zero-mean features pool to ~0)
    model = GraphSGC(
        prop_steps=2, feat_dim=ds.num_features, output_dim=ds.num_classes,
        readout="max",
    )
    task = GraphClassification(
        ds, model, lr=0.1, weight_decay=5e-5, epochs=60, verbose=False
    )
    assert task.test_acc > 0.8, task.test_acc

    # sanity: with zero hops (no propagation) the same pipeline is ~chance
    model0 = GraphSGC(
        prop_steps=0, feat_dim=ds.num_features, output_dim=ds.num_classes,
        readout="max",
    )
    task0 = GraphClassification(
        ds, model0, lr=0.1, weight_decay=5e-5, epochs=60, verbose=False
    )
    assert task0.test_acc < task.test_acc


def test_graph_sign_runs():
    ds = SyntheticGraphClassification(num_graphs=80, seed=1)
    model = GraphSIGN(
        prop_steps=2,
        feat_dim=ds.num_features,
        output_dim=ds.num_classes,
        hidden_dim=32,
        readout="max",
    )
    task = GraphClassification(
        ds, model, lr=0.05, weight_decay=5e-5, epochs=40, verbose=False
    )
    assert task.test_acc > 0.7, task.test_acc


def test_graph_level_learnable_msg_op():
    """Learnable hop attention pools inside the train step."""
    from sgl_tpu.models.blocks import LogisticRegression
    from sgl_tpu.models.graph_level import GraphLevelSGAPModel
    from sgl_tpu.ops import LaplacianGraphOp, LearnableWeightedMessageOp

    ds = SyntheticGraphClassification(num_graphs=60, seed=2)
    model = GraphLevelSGAPModel(
        prop_steps=2,
        feat_dim=ds.num_features,
        output_dim=ds.num_classes,
        readout="max",
        pre_graph_op=LaplacianGraphOp(2, r=0.5),
        pre_msg_op=LearnableWeightedMessageOp(
            start=0, end=3, combination_type="simple", prop_steps=2
        ),
        base_model=LogisticRegression(output_dim=ds.num_classes),
    )
    task = GraphClassification(
        ds, model, lr=0.1, weight_decay=5e-5, epochs=40, verbose=False
    )
    assert task.test_acc > 0.6, task.test_acc


def test_tu_dataset_parser(tmp_path):
    """Synthetic TUDataset raw layout parses into graphs + labels."""
    from sgl_tpu.datasets import TUDataset

    raw = tmp_path / "TOY" / "raw"
    raw.mkdir(parents=True)
    # two triangle graphs + one 2-path; labels 1, -1, 1
    edges = [  # 1-based, undirected both directions
        (1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1),
        (4, 5), (5, 4), (5, 6), (6, 5), (4, 6), (6, 4),
        (7, 8), (8, 7),
    ]
    (raw / "TOY_A.txt").write_text("\n".join(f"{a}, {b}" for a, b in edges))
    (raw / "TOY_graph_indicator.txt").write_text(
        "\n".join(["1"] * 3 + ["2"] * 3 + ["3"] * 2)
    )
    (raw / "TOY_graph_labels.txt").write_text("1\n-1\n1\n")
    (raw / "TOY_node_labels.txt").write_text("\n".join("01201201"))
    (raw / "TOY_node_attributes.txt").write_text(
        "\n".join(f"{i}.5, {-i}.25" for i in range(8))
    )
    ds = TUDataset("TOY", root=str(tmp_path) + "/", use_cache=False)
    assert ds.num_graphs == 3
    assert ds.num_classes == 2
    np.testing.assert_array_equal(np.asarray(ds.y), [1, 0, 1])
    # features = 2 attrs + 3 one-hot node-label columns
    assert ds.num_features == 5
    assert [g.num_nodes for g in ds.graphs] == [3, 3, 2]
    assert [g.num_edges for g in ds.graphs] == [6, 6, 2]
    # third graph's edges are re-indexed locally
    s, d, _ = ds.graphs[2].edges()
    assert set(zip(s.tolist(), d.tolist())) == {(0, 1), (1, 0)}
    # batched form round-trips
    batch = ds.batch()
    assert batch.num_graphs == 3 and batch.num_nodes == 8
    # the full task stack runs on it
    from sgl_tpu.models import GraphSGC
    from sgl_tpu.tasks import GraphClassification

    model = GraphSGC(1, ds.num_features, ds.num_classes)
    task = GraphClassification(
        ds, model, lr=0.1, weight_decay=0.0, epochs=3, verbose=False
    )
    assert 0.0 <= task.test_acc <= 1.0
