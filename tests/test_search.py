"""NAS subsystem tests: arch->model compiler, inner loop, search drivers."""

import numpy as np
import pytest

from sgl_tpu.datasets.synthetic import PlantedPartition
from sgl_tpu.search import (
    ConfigManager,
    EvolutionarySearch,
    SearchManager,
    SearchModel,
    run_nas,
)

DS = PlantedPartition(num_nodes=200, feat_dim=12, p_in=0.08, seed=4)


@pytest.mark.parametrize(
    "arch",
    [
        [2, 1, 0, 1, 0, 0, 0],  # SGC-like, no post
        [2, 2, 1, 2, 0, 0, 0],  # PPR + concat + ResMLP
        [3, 1, 7, 2, 2, 4, 1],  # gate msg op + PPR post-propagation
        [2, 1, 6, 1, 1, 1, 5],  # alpha weights + laplacian post
    ],
)
def test_search_model_archs_run(arch):
    model = SearchModel(arch, DS.num_features, DS.num_classes, hidden_dim=16)
    acc, elapsed = SearchManager(
        DS, model, lr=0.05, weight_decay=5e-5, epochs=5, restarts=2
    )._execute()
    assert acc > 0.5, (arch, acc)
    assert elapsed > 0


def test_search_model_invalid_arch():
    with pytest.raises(ValueError):
        SearchModel([2, 9, 0, 1, 0, 0, 0], 12, 4, 16)


def test_nas_loop_evolutionary():
    configer = ConfigManager(arch=[2, 1, 0, 1, 0, 0, 0], prop_steps=(1, 3),
                             num_layers=(1, 2), post_steps=(0, 2))
    configer._setParameters(DS, None, 16, epochs=4, lr=0.05, wd=5e-5, restarts=1)
    history = run_nas(configer, max_runs=5, optimizer="evolution", verbose=False)
    assert len(history.trials) == 5
    best = history.best_accuracy_trial
    assert -best.objs[0] > 0.5
    assert len(history.pareto_front()) >= 1
    assert "best acc" in history.summary()


def test_nas_successive_halving():
    from sgl_tpu.search import run_sha

    configer = ConfigManager(arch=[2, 1, 0, 1, 0, 0, 0], prop_steps=(1, 3),
                             num_layers=(1, 2), post_steps=(0, 2))
    configer._setParameters(DS, None, 16, epochs=4, lr=0.05, wd=5e-5, restarts=1)
    history = run_sha(
        configer, n_configs=4, eta=2, min_epochs=2, seed=0, verbose=False
    )
    # rungs: 4 @ 2 epochs + 2 @ 4 epochs + 1 @ 8 epochs = 7 trials
    assert len(history.trials) == 7
    assert -history.best_accuracy_trial.objs[0] > 0.5
    # the epoch override must not leak out of the driver
    assert configer._epochs == 4
