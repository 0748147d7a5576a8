"""Graph classification task — graph-level functionality the reference
stubs out (``sgl/data/base_dataset.py:124-126``).

Same constructor-runs UX as the node tasks.  The loop is **full-batch over
graphs with split masks**: the precompute already reduced every graph to
one pooled row (non-learnable message ops) or one hop stack (learnable),
so each epoch is a single jitted step whose loss/accuracy are weighted by
the train mask — no ragged per-graph batching anywhere.
"""

from __future__ import annotations

import time
from typing import Callable

import jax.numpy as jnp
import numpy as np

from sgl_tpu.models.graph_level import GraphLevelSGAPModel
from sgl_tpu.tasks.base_task import BaseTask
from sgl_tpu.tasks.utils import (
    adam_l2,
    init_train_state,
    make_eval_step,
    make_train_step,
    set_seed,
    weighted_cross_entropy,
)


class GraphClassification(BaseTask):
    def __init__(
        self,
        dataset,
        model: GraphLevelSGAPModel,
        lr: float,
        weight_decay: float,
        epochs: int,
        device=None,  # API parity; placement is JAX's job
        loss_fn: Callable = weighted_cross_entropy,
        seed: int = 42,
        verbose: bool = True,
        precompute_dtype=None,
    ):
        super().__init__()
        self._dataset = dataset
        self._model = model
        self._lr = lr
        self._weight_decay = weight_decay
        self._epochs = epochs
        self._loss_fn = loss_fn
        self._seed = seed
        self._verbose = verbose
        self._precompute_dtype = precompute_dtype
        self._test_acc = self._execute()

    @property
    def test_acc(self) -> float:
        return self._test_acc

    def _execute(self) -> float:
        ds, model = self._dataset, self._model
        rng = set_seed(self._seed)

        t0 = time.time()
        batch = ds.batch()
        model.preprocess(batch, dtype=self._precompute_dtype)
        if self._verbose:
            print(f"Preprocessing done in {time.time() - t0:.4f}s")

        g = batch.num_graphs
        labels = jnp.asarray(np.asarray(ds.y).reshape(-1), jnp.int32)

        def mask(idx):
            m = np.zeros(g, np.float32)
            m[np.asarray(idx)] = 1.0
            return jnp.asarray(m)

        w_train = mask(ds.train_idx)
        w_val = mask(ds.val_idx)
        w_test = mask(ds.test_idx)

        params = model.init(rng)
        tx = adam_l2(self._lr, self._weight_decay)
        state = init_train_state(rng, params, tx)

        net = model.net
        feats, gids, counts = model.net_inputs()

        def apply_fn(p, f, train: bool, rngs=None):
            return net.apply(p, f, gids, counts, train=train, rngs=rngs)

        train_step = make_train_step(apply_fn, tx, self._loss_fn)
        eval_step = make_eval_step(apply_fn)

        best_val, best_test = 0.0, 0.0
        t_total = time.time()
        for epoch in range(self._epochs):
            t = time.time()
            state, loss_train, acc_train = train_step(
                state, feats, labels, w_train
            )
            cv, tv = eval_step(state.params, feats, labels, w_val)
            ct, tt = eval_step(state.params, feats, labels, w_test)
            acc_val = float(cv) / max(float(tv), 1.0)
            acc_test = float(ct) / max(float(tt), 1.0)
            if self._verbose:
                print(
                    f"Epoch: {epoch + 1:03d} loss_train: {float(loss_train):.4f} "
                    f"acc_train: {float(acc_train):.4f} acc_val: {acc_val:.4f} "
                    f"acc_test: {acc_test:.4f} time: {time.time() - t:.4f}s"
                )
            if acc_val > best_val:
                best_val, best_test = acc_val, acc_test

        if self._verbose:
            print("Optimization Finished!")
            print(f"Total time elapsed: {time.time() - t_total:.4f}s")
            print(f"Best val: {best_val:.4f}, best test: {best_test:.4f}")
        self.state = state
        return best_test
