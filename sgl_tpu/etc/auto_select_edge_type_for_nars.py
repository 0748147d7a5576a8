"""NARS relation-subset selection study
(reference ``sgl/etc/auto_select_edge_type_for_nars.py``): briefly train
Fast-NARS-SGC with learnable subgraph weights, read the learned weights, and
keep the top-k subgraphs for the real run."""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from sgl_tpu.models.hetero import Fast_NARS_SGC_WithLearnableWeights
from sgl_tpu.tasks.hetero_node_classification import HeteroNodeClassification


def select_top_subgraphs(
    dataset,
    predict_class: str,
    random_subgraph_num: int,
    subgraph_edge_type_num: int,
    top_k: int,
    feat_dim: int,
    output_dim: int,
    probe_epochs: int = 20,
    hidden_dim: int = 64,
    prop_steps: int = 2,
    seed: int = 42,
) -> Tuple[List[Tuple[str, ...]], np.ndarray]:
    """Returns (top_k subgraph combos, their learned weights)."""
    subgraph_dict = dataset.nars_preprocess(
        dataset.edge_types,
        predict_class,
        random_subgraph_num,
        subgraph_edge_type_num,
        seed=seed,
    )
    subgraph_list = list(subgraph_dict.items())
    model = Fast_NARS_SGC_WithLearnableWeights(
        prop_steps=prop_steps,
        feat_dim=feat_dim,
        output_dim=output_dim,
        hidden_dim=hidden_dim,
        num_layers=2,
        random_subgraph_num=len(subgraph_list),
    )
    task = HeteroNodeClassification(
        dataset,
        predict_class,
        model,
        lr=0.05,
        weight_decay=5e-5,
        epochs=probe_epochs,
        subgraph_list=subgraph_list,
        record_subgraph_weight=True,
        verbose=False,
    )
    weights = np.asarray(task.subgraph_weight)
    order = np.argsort(-weights)[:top_k]
    combos = [subgraph_list[i][0] for i in order]
    return combos, weights[order]


def subgraph_weight_stability(
    dataset, predict_class: str, runs: int = 3, **kw
) -> np.ndarray:
    """Stability study (reference ``etc/stability_of_subgraph_weight.py``):
    learned weights across seeds, stacked (runs, top_k)."""
    outs = []
    for s in range(runs):
        _, w = select_top_subgraphs(dataset, predict_class, seed=42 + s, **kw)
        outs.append(w)
    return np.stack(outs)


def hetero_search(
    dataset,
    predict_class: str,
    subgraph_configs,
    feat_dim: int,
    output_dim: int,
    epochs: int = 30,
    hidden_dim: int = 64,
    prop_steps: int = 2,
    seed: int = 42,
):
    """Grid study over (random_subgraph_num, subgraph_edge_type_num) configs
    (reference ``sgl/etc/hetero_search.py``): returns
    ``{config: best_test_acc}``."""
    results = {}
    for cfg in subgraph_configs:
        n_sub, n_et = cfg
        model = Fast_NARS_SGC_WithLearnableWeights(
            prop_steps=prop_steps,
            feat_dim=feat_dim,
            output_dim=output_dim,
            hidden_dim=hidden_dim,
            num_layers=2,
            random_subgraph_num=n_sub,
        )
        task = HeteroNodeClassification(
            dataset,
            predict_class,
            model,
            lr=0.05,
            weight_decay=5e-5,
            epochs=epochs,
            random_subgraph_num=n_sub,
            subgraph_edge_type_num=n_et,
            seed=seed,
            verbose=False,
        )
        results[tuple(cfg)] = task.test_acc
    return results
