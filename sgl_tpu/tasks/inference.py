"""Serving-path inference: a compiled predictor over precomputed features.

The reference has no inference story beyond re-running ``model_forward``
eagerly.  For production serving the SGAP structure is a gift: stage-1
features are precomputed once, so online prediction is a gather + MLP.  The
``Predictor`` compiles that once per batch *bucket* (powers of two) so
arbitrary request sizes never trigger recompilation, and pads within a
bucket — the standard TPU serving recipe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _bucket(n: int, min_bucket: int = 8, max_bucket: int = 65536) -> int:
    b = min_bucket
    while b < n and b < max_bucket:
        b *= 2
    return b


class Predictor:
    """Batched, bucket-padded node predictor.

    ``Predictor(model, params)`` after training (``model.preprocess`` must
    have run); ``predict(node_ids)`` returns logits for arbitrary id arrays
    with at most ``log2(max/min)`` distinct compilations.
    """

    def __init__(self, model, params, apply_fn=None):
        self._model = model
        self._params = params
        net = model.net

        def default_apply(params, feats):
            return net.apply(params, feats, train=False)

        self._apply = jax.jit(apply_fn or default_apply)

    def predict(self, node_ids) -> np.ndarray:
        idx = np.asarray(node_ids).reshape(-1)
        n = idx.shape[0]
        b = _bucket(n)
        padded = np.zeros(b, idx.dtype)
        padded[:n] = idx
        feats = self._model.batch_input(jnp.asarray(padded))
        logits = self._apply(self._params, feats)
        return np.asarray(logits[:n])

    def predict_proba(self, node_ids) -> np.ndarray:
        logits = self.predict(node_ids)
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        return e / e.sum(axis=1, keepdims=True)


    def save(self, path: str) -> None:
        """Persist the full serving artifact — model structure, trained
        params, and the precomputed stage-1 features — as one file.  A
        server process restores it with :meth:`Predictor.load` and serves
        without touching the graph or re-running the precompute."""
        import pickle

        m = self._model
        feats = np.asarray(m.processed_feature)
        saved_feats = m.processed_feature
        m.processed_feature = None  # keep the pickle free of device arrays
        for op in (getattr(m, "pre_graph_op", None), getattr(m, "post_graph_op", None)):
            # drop weakref'd adjacency caches (unpicklable, rebuilt lazily)
            if op is not None and getattr(op, "_adj_cache", None) is not None:
                op._adj_cache = None
        try:
            blob = {
                "model": m,
                "params": jax.tree.map(np.asarray, self._params),
                "features": feats,
            }
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump(blob, f)
            import os

            os.replace(tmp, path)  # atomic, like the dataset cache
        finally:
            m.processed_feature = saved_feats

    @classmethod
    def load(cls, path: str) -> "Predictor":
        import pickle

        with open(path, "rb") as f:
            blob = pickle.load(f)
        model = blob["model"]
        model.processed_feature = jnp.asarray(blob["features"])
        return cls(model, jax.tree.map(jnp.asarray, blob["params"]))


def predictor_from_task(task) -> Predictor:
    """Build a Predictor from a finished task (uses its final train state)."""
    state = getattr(task, "state", None)
    if state is None:
        raise ValueError("task exposes no train state")
    return Predictor(task._model, state.params)
