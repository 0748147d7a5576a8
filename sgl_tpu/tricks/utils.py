"""Trick utilities: label propagation and Loge losses.

Parity with reference ``sgl/tricks/utils.py``; the losses also live in
``sgl_tpu.tasks.utils`` (re-exported here for API parity).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

import numpy as np

from sgl_tpu.kernels.sparse import SparseAdj, ensure_device_layout, spmm


def loge_cross_entropy_loss(logits, labels, epsilon: float = 1.0 - np.log(2)):
    """Loge-CE (reference ``sgl/tricks/utils.py:7-10``): the log transform
    ``log(ε + ·) - log(ε)`` is applied to the MEAN cross-entropy, exactly as
    the reference does (``F.cross_entropy`` reduces first)."""
    import optax

    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    return jnp.log(epsilon + ce) - np.log(epsilon)


def loge_bce_loss(logits, target, epsilon: float = 1.0 - np.log(2)):
    """Loge-BCE on LOGITS (reference ``tricks/utils.py:12-14`` calls
    ``binary_cross_entropy_with_logits``), transform applied to the mean."""
    bce = jnp.mean(
        jnp.clip(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    return jnp.log(epsilon + bce) - np.log(epsilon)


def _default_post(x):
    return jnp.clip(x, 0.0, 1.0)


def label_propagation(
    labels: jnp.ndarray,
    adj: SparseAdj,
    num_layers: int,
    alpha: float,
    post_process: Callable = _default_post,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """``out = post(α·Â·out + (1-α)·out₀)`` iterated ``num_layers`` times
    (reference ``sgl/tricks/utils.py:41-60``), jit-compiled.

    ``labels`` may be int class ids (one-hot encoded on entry) or soft
    labels; ``mask`` zeroes rows outside the mask before propagating.
    """
    if jnp.issubdtype(labels.dtype, jnp.integer):
        labels = jax.nn.one_hot(labels.reshape(-1), int(labels.max()) + 1)
    labels = jnp.asarray(labels, jnp.float32)
    adj = ensure_device_layout(adj)  # Pallas layout on accelerators (cached)
    out = labels
    if mask is not None:
        out = jnp.zeros_like(labels).at[mask].set(labels[mask])
    res = (1.0 - alpha) * out
    for _ in range(num_layers):
        out = post_process(alpha * spmm(adj, out) + res)
    return out
