"""NARS heterogeneous pipeline tests: subgraph sampling, propagation,
both model templates, and the hetero classification task."""

import warnings

import numpy as np
import pytest

from sgl_tpu.datasets.choose_edge_type import (
    choose_edge_type,
    choose_multi_subgraphs,
    remove_duplicate_edge_types,
)
from sgl_tpu.datasets.synthetic import SyntheticHeteroDataset
from sgl_tpu.models.hetero import Fast_NARS_SGC_WithLearnableWeights, NARS_SIGN
from sgl_tpu.tasks.hetero_node_classification import HeteroNodeClassification

DS = SyntheticHeteroDataset(seed=1)


def test_edge_type_chooser_connectivity():
    rng = np.random.default_rng(0)
    ets = remove_duplicate_edge_types(DS.edge_types)
    combo = choose_edge_type(2, ets, "paper", rng)
    assert combo
    touched = set()
    for et in combo:
        parts = et.split("__")
        touched.update((parts[0], parts[-1]))
    assert "paper" in touched


def test_choose_multi_subgraphs_distinct():
    combos = choose_multi_subgraphs(3, 2, DS.edge_types, "paper", seed=0)
    assert len(combos) == len(set(combos))
    assert all(len(c) == 2 for c in combos)


def test_sample_by_edge_type_structure():
    g, feats, node_id = DS.sample_by_edge_type(["paper__cite__paper"])
    assert g.num_nodes == len(node_id) == DS.data.num_node["paper"]
    assert feats.shape[0] == g.num_nodes
    # undirected: every edge exists in both directions
    src, dst, _ = g.edges()
    pairs = set(zip(src.tolist(), dst.tolist()))
    assert all((b, a) in pairs for a, b in pairs)


def test_sample_by_meta_path():
    m = DS.sample_by_meta_path(["author__writes__paper", "paper__has__subject"])
    assert m.shape == (DS.data.num_node["author"], DS.data.num_node["subject"])
    assert m.nnz > 0


def test_nars_sign_e2e():
    model = NARS_SIGN(
        prop_steps=2,
        feat_dim=16,
        output_dim=DS.num_classes,
        hidden_dim=16,
        num_layers=2,
        random_subgraph_num=2,
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        task = HeteroNodeClassification(
            DS,
            "paper",
            model,
            lr=0.05,
            weight_decay=5e-5,
            epochs=20,
            random_subgraph_num=2,
            subgraph_edge_type_num=2,
            verbose=False,
        )
    assert task.test_acc > 0.5, task.test_acc  # 3 classes, chance = 1/3


def test_fast_nars_sgc_with_subgraph_weight():
    model = Fast_NARS_SGC_WithLearnableWeights(
        prop_steps=2,
        feat_dim=16,
        output_dim=DS.num_classes,
        hidden_dim=16,
        num_layers=2,
        random_subgraph_num=2,
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        task = HeteroNodeClassification(
            DS,
            "paper",
            model,
            lr=0.05,
            weight_decay=5e-5,
            epochs=20,
            random_subgraph_num=2,
            subgraph_edge_type_num=2,
            record_subgraph_weight=True,
            verbose=False,
        )
    assert task.test_acc > 0.5, task.test_acc
    assert task.subgraph_weight is not None
    assert task.subgraph_weight.shape == (2,)


def test_hetero_search_grid():
    from sgl_tpu.etc.auto_select_edge_type_for_nars import hetero_search

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        res = hetero_search(
            DS, "paper", [(2, 2), (1, 2)], feat_dim=16,
            output_dim=DS.num_classes, epochs=5,
        )
    assert set(res) == {(2, 2), (1, 2)}
    assert all(0.0 <= v <= 1.0 for v in res.values())


def test_batched_subgraph_propagation_matches_per_subgraph():
    """The block-diagonal NARS precompute must equal per-subgraph loops."""
    import jax.numpy as jnp

    from sgl_tpu.datasets.synthetic import SyntheticHeteroDataset
    from sgl_tpu.models.hetero import _HeteroPreprocessMixin
    from sgl_tpu.ops import LaplacianGraphOp

    ds = SyntheticHeteroDataset(seed=5)
    sub_dict = ds.nars_preprocess(ds.edge_types, "paper", 3, 2, seed=7)
    subgraph_list = list(sub_dict.items())

    mixin = _HeteroPreprocessMixin()
    mixin.pre_graph_op = LaplacianGraphOp(2, r=0.5)
    got = np.asarray(
        mixin._propagate_subgraphs(ds, "paper", subgraph_list=subgraph_list)
    )

    hg = ds.data
    predict_start = hg.offset["paper"]
    n_pred = hg.num_node["paper"]
    op = LaplacianGraphOp(2, r=0.5)
    wants = []
    for key, (graph, feature, node_id) in subgraph_list:
        endpoints = set()
        for et in key:
            parts = et.split("__")
            endpoints.update((parts[0], parts[-1]))
        if "paper" not in endpoints:
            continue
        hops = op.propagate(graph, feature)
        start = int(np.searchsorted(np.asarray(node_id), predict_start))
        wants.append(np.asarray(hops[:, start : start + n_pred, :]))
    want = np.stack(wants, axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
