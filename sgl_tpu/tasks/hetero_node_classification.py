"""Heterogeneous (NARS) node classification
(reference ``sgl/tasks/node_classification.py:115-226``).

Same loop as :class:`NodeClassification` with NARS subgraph plumbing and
optional subgraph-weight recording for the relation-importance studies
(reference ``sgl/etc/auto_select_edge_type_for_nars.py``).
"""

from __future__ import annotations

import time

import jax.numpy as jnp
import numpy as np

from sgl_tpu.tasks.base_task import BaseTask
from sgl_tpu.tasks.utils import (
    adam_l2,
    batch_iterator,
    init_train_state,
    make_eval_step,
    make_train_step,
    set_seed,
    weighted_cross_entropy,
)


class HeteroNodeClassification(BaseTask):
    def __init__(
        self,
        dataset,
        predict_class: str,
        model,
        lr: float,
        weight_decay: float,
        epochs: int,
        device=None,
        loss_fn=weighted_cross_entropy,
        seed: int = 42,
        train_batch_size=None,
        eval_batch_size=None,
        random_subgraph_num: int = -1,
        subgraph_edge_type_num: int = -1,
        subgraph_list=None,
        record_subgraph_weight: bool = False,
        verbose: bool = True,
    ):
        super().__init__()
        self._dataset = dataset
        self._predict_class = predict_class
        self._model = model
        self._lr = lr
        self._weight_decay = weight_decay
        self._epochs = epochs
        self._loss_fn = loss_fn
        self._seed = seed
        self._train_batch_size = train_batch_size
        self._eval_batch_size = eval_batch_size
        self._verbose = verbose
        self._test_acc, self._subgraph_weight = self._execute(
            random_subgraph_num,
            subgraph_edge_type_num,
            subgraph_list,
            record_subgraph_weight,
        )

    test_acc = property(lambda self: self._test_acc)
    subgraph_weight = property(lambda self: self._subgraph_weight)

    def _execute(
        self,
        random_subgraph_num,
        subgraph_edge_type_num,
        subgraph_list,
        record_subgraph_weight,
    ):
        ds, model = self._dataset, self._model
        rng = set_seed(self._seed)
        np_rng = np.random.default_rng(self._seed)

        t0 = time.time()
        model.preprocess(
            ds,
            self._predict_class,
            random_subgraph_num=random_subgraph_num,
            subgraph_edge_type_num=subgraph_edge_type_num,
            subgraph_list=subgraph_list,
            seed=self._seed,
        )
        if self._verbose:
            print(f"Preprocessing done in {time.time() - t0:.4f}s")

        labels_np = np.asarray(ds.data[self._predict_class].y).reshape(-1)
        labels = jnp.asarray(labels_np, jnp.int32)
        train_idx = np.asarray(ds.train_idx)
        val_idx = np.asarray(ds.val_idx)
        test_idx = np.asarray(ds.test_idx)

        params = model.init(rng)
        tx = adam_l2(self._lr, self._weight_decay)
        state = init_train_state(rng, params, tx)
        net = model.net
        apply_fn = lambda p, f, train, rngs: net.apply(  # noqa: E731
            p, f, train=train, rngs=rngs
        )
        train_step = make_train_step(apply_fn, tx, self._loss_fn)
        eval_step = make_eval_step(apply_fn)

        def eval_on(params, idx):
            correct, total = 0.0, 0.0
            for b_idx, w in batch_iterator(
                idx, self._eval_batch_size, shuffle=False, rng=np_rng
            ):
                feats = model.batch_input(jnp.asarray(b_idx))
                c, t = eval_step(
                    params, feats, labels[jnp.asarray(b_idx)], jnp.asarray(w)
                )
                correct += float(c)
                total += float(t)
            return correct / max(total, 1.0)

        best_val, best_test = 0.0, 0.0
        best_weight = None
        for epoch in range(self._epochs):
            t = time.time()
            losses, accs, weights = [], [], []
            for b_idx, w in batch_iterator(
                train_idx, self._train_batch_size, shuffle=True, rng=np_rng
            ):
                feats = model.batch_input(jnp.asarray(b_idx))
                state, loss, acc = train_step(
                    state, feats, labels[jnp.asarray(b_idx)], jnp.asarray(w)
                )
                losses.append(float(loss))
                accs.append(float(acc))
                weights.append(float(w.sum()))
            acc_val = eval_on(state.params, val_idx)
            acc_test = eval_on(state.params, test_idx)
            if self._verbose:
                print(
                    f"Epoch: {epoch + 1:03d} "
                    f"loss_train: {np.average(losses, weights=weights):.4f} "
                    f"acc_train: {np.average(accs, weights=weights):.4f} "
                    f"acc_val: {acc_val:.4f} acc_test: {acc_test:.4f} "
                    f"time: {time.time() - t:.4f}s"
                )
            if acc_val > best_val:
                best_val, best_test = acc_val, acc_test
                if record_subgraph_weight:
                    best_weight = np.asarray(model.subgraph_weight(state.params))
        if self._verbose:
            print(f"Best val: {best_val:.4f}, best test: {best_test:.4f}")
        self.state = state
        return best_test, best_weight
