"""Node classification + Correct&Smooth post-processing
(reference ``sgl/tasks/correct_and_smooth.py:13-125``).

Standard SGAP training; whenever validation improves, the full-graph softmax
is snapshotted; after training the best snapshot is corrected (residual
propagation) and smoothed (label propagation) over separately-normalized
adjacencies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sgl_tpu.graph.normalize import symmetric_normalized_weights
from sgl_tpu.tasks.node_classification import NodeClassification, _make_apply
from sgl_tpu.tasks.utils import TrainState, make_logits_fn
from sgl_tpu.tricks.correct_and_smooth import CorrectAndSmooth


class NodeClassificationWithCorrectAndSmooth(NodeClassification):
    def __init__(
        self,
        dataset,
        model,
        lr: float,
        weight_decay: float,
        epochs: int,
        num_correct_layers: int,
        correct_alpha: float,
        num_smooth_layers: int,
        smooth_alpha: float,
        autoscale: bool = True,
        scale: float = 1.0,
        correct_r: float = 0.5,
        smooth_r: float = 0.5,
        device=None,
        **kw,
    ):
        self._cs = CorrectAndSmooth(
            num_correct_layers,
            correct_alpha,
            num_smooth_layers,
            smooth_alpha,
            autoscale,
            scale,
        )
        self._correct_r = correct_r
        self._smooth_r = smooth_r
        self._best_y_soft = None
        super().__init__(dataset, model, lr, weight_decay, epochs, device=device, **kw)

    def _on_best(self, state: TrainState) -> None:
        model = self._model
        logits_fn = make_logits_fn(_make_apply(model))
        all_idx = jnp.arange(self._dataset.num_node)
        logits = logits_fn(state.params, model.batch_input(all_idx))
        self._best_y_soft = jax.nn.softmax(logits, axis=1)

    def _postprocess(self, state, labels, val_idx, test_idx):
        if self._best_y_soft is None:
            self._on_best(state)
        ds = self._dataset
        correct_adj = symmetric_normalized_weights(ds.graph, r=self._correct_r)
        smooth_adj = symmetric_normalized_weights(ds.graph, r=self._smooth_r)
        train_idx = np.asarray(ds.train_idx)
        out = self._cs.correct(self._best_y_soft, labels, train_idx, correct_adj)
        out = self._cs.smooth(out, labels, train_idx, smooth_adj)
        val_idx = jnp.asarray(np.asarray(val_idx))
        test_idx = jnp.asarray(np.asarray(test_idx))
        acc_val = float(
            jnp.mean(jnp.argmax(out[val_idx], axis=1) == labels[val_idx])
        )
        acc_test = float(
            jnp.mean(jnp.argmax(out[test_idx], axis=1) == labels[test_idx])
        )
        if self._verbose:
            print(f"After C&S, acc_val: {acc_val:.4f} acc_test: {acc_test:.4f}")
        return acc_val, acc_test


# reference-style alias
NodeClassification_With_CorrectAndSmooth = NodeClassificationWithCorrectAndSmooth
