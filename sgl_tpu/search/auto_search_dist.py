"""Distributed NAS twins (reference ``sgl/search/{auto_search_dist,
search_config_dist,search_models_dist}.py``).

The reference duplicates the whole NAS stack to swap DDP in; here the same
``SearchModel`` trains through the mesh runtime, so the 'dist twin' is a
thin wrapper that evaluates candidates with ``NodeClassificationDist``.
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import numpy as np

from sgl_tpu.search.search_config import ConfigManager
from sgl_tpu.search.search_models import SearchModel
from sgl_tpu.tasks.node_classification_dist import NodeClassificationDist

# API-parity alias: arch->model compilation is identical in the dist path
SearchModelDist = SearchModel


class SearchManagerDist:
    """Inner NAS loop over the distributed runtime."""

    def __init__(
        self,
        dataset,
        model,
        lr: float,
        weight_decay: float,
        epochs: int,
        mesh_shape: Optional[Tuple[int, int]] = None,
        seed: int = 42,
    ):
        self._dataset = dataset
        self._model = model
        self._lr = lr
        self._weight_decay = weight_decay
        self._epochs = epochs
        self._mesh_shape = mesh_shape
        self._seed = seed

    def _execute(self):
        t0 = time.time()
        task = NodeClassificationDist(
            self._dataset,
            self._model,
            lr=self._lr,
            weight_decay=self._weight_decay,
            epochs=self._epochs,
            mesh_shape=self._mesh_shape,
            seed=self._seed,
            verbose=False,
        )
        return task.test_acc, time.time() - t0


class ConfigManagerDist(ConfigManager):
    """NAS objective evaluated through the mesh runtime
    (reference ``search_config_dist.py:7``)."""

    def _setParameters(self, dataset, device, hiddim, epochs, lr, wd, restarts=10, mesh_shape=None):  # noqa: N802
        super()._setParameters(dataset, device, hiddim, epochs, lr, wd, restarts)
        self._mesh_shape = mesh_shape

    def _configTarget(self, arch):  # noqa: N802
        model = SearchModel(
            arch,
            self._dataset.num_features,
            int(self._dataset.num_classes),
            self._hiddim,
        )
        acc, elapsed = SearchManagerDist(
            self._dataset,
            model,
            lr=self._lr,
            weight_decay=self._wd,
            epochs=self._epochs,
            mesh_shape=self._mesh_shape,
        )._execute()
        return {"objs": np.stack([-acc, elapsed], axis=-1)}
