"""Correct & Smooth post-processing (reference ``sgl/tricks/correct_and_smooth.py:6-60``).

Training-free label-propagation post-processing: 'correct' propagates the
train-set residual error (clamped to [-1, 1], optionally autoscaled),
'smooth' clamp-propagates the corrected soft labels with the true train
labels substituted in.  Runs fully on device (the reference forces CPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sgl_tpu.kernels.sparse import SparseAdj
from sgl_tpu.tricks.utils import label_propagation


def _one_hot_like(y_true: jnp.ndarray, y_soft: jnp.ndarray) -> jnp.ndarray:
    if jnp.issubdtype(y_true.dtype, jnp.integer):
        return jax.nn.one_hot(y_true.reshape(-1), y_soft.shape[-1]).astype(
            y_soft.dtype
        )
    return y_true.astype(y_soft.dtype)


class CorrectAndSmooth:
    def __init__(
        self,
        num_correct_layers: int,
        correct_alpha: float,
        num_smooth_layers: int,
        smooth_alpha: float,
        autoscale: bool = True,
        scale: float = 1.0,
    ):
        self._num_correct_layers = num_correct_layers
        self._correct_alpha = correct_alpha
        self._num_smooth_layers = num_smooth_layers
        self._smooth_alpha = smooth_alpha
        self._autoscale = autoscale
        self._scale = scale

    def correct(self, y_soft, y_true, mask, adj: SparseAdj) -> jnp.ndarray:
        """Propagate the train residual error and add it back
        (reference ``correct_and_smooth.py:19-45``).  ``mask`` is an index
        array of training nodes."""
        y_soft = jnp.asarray(y_soft)
        y_true = _one_hot_like(jnp.asarray(y_true), y_soft)
        mask = np.asarray(mask)
        error = jnp.zeros_like(y_soft)
        error = error.at[mask].set(y_true[mask] - y_soft[mask])
        num_true = mask.shape[0] if mask.dtype != bool else int(mask.sum())

        if self._autoscale:
            smoothed = label_propagation(
                error,
                adj,
                self._num_correct_layers,
                self._correct_alpha,
                post_process=lambda x: jnp.clip(x, -1.0, 1.0),
            )
            sigma = jnp.abs(error[mask]).sum() / num_true
            scale = sigma / jnp.abs(smoothed).sum(axis=1, keepdims=True)
            scale = jnp.where(jnp.isinf(scale) | (scale > 1000), 1.0, scale)
            return y_soft + smoothed * scale

        def fix_input(x):
            return x.at[mask].set(error[mask])

        smoothed = label_propagation(
            error,
            adj,
            self._num_correct_layers,
            self._correct_alpha,
            post_process=fix_input,
        )
        return y_soft + smoothed * self._scale

    def smooth(self, y_soft, y_true, mask, adj: SparseAdj) -> jnp.ndarray:
        """Clamp-propagate corrected soft labels with the true train labels
        substituted in (reference ``correct_and_smooth.py:47-60``)."""
        y_soft = jnp.asarray(y_soft)
        y_true = _one_hot_like(jnp.asarray(y_true), y_soft)
        mask = np.asarray(mask)
        y_soft = y_soft.at[mask].set(y_true[mask])
        return label_propagation(
            y_soft, adj, self._num_smooth_layers, self._smooth_alpha
        )
