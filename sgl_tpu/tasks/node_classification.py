"""Node classification task (reference ``sgl/tasks/node_classification.py:11-113``).

Same 3-line UX — ``NodeClassification(dataset, model, lr, wd, epochs)`` runs
to completion and exposes ``.test_acc`` — but the epoch loop drives jitted
step functions over device-resident features: preprocessing, every train and
eval step, and post-processing all execute as compiled XLA programs; the
Python loop only sequences them and tracks the best validation accuracy.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from sgl_tpu.models.base import SGAPModel
from sgl_tpu.tasks.base_task import BaseTask
from sgl_tpu.tasks.utils import (
    TrainState,
    adam_l2,
    batch_iterator,
    init_train_state,
    make_eval_step,
    make_logits_fn,
    make_train_step,
    set_seed,
    weighted_cross_entropy,
)


class NodeClassification(BaseTask):
    def __init__(
        self,
        dataset,
        model: SGAPModel,
        lr: Optional[float] = None,
        weight_decay: Optional[float] = None,
        epochs: Optional[int] = None,
        device=None,  # accepted for API parity; placement is JAX's job
        loss_fn: Callable = weighted_cross_entropy,
        seed: Optional[int] = None,
        train_batch_size: Optional[int] = None,
        eval_batch_size: Optional[int] = None,
        verbose: bool = True,
        precompute_dtype=None,  # e.g. jnp.bfloat16: +25% SpMM, half hop memory
        config=None,  # TrainConfig: defaults for the Nones above
    ):
        super().__init__()
        from sgl_tpu.utils.config import TrainConfig

        r = (config or TrainConfig()).resolve(
            lr=lr, weight_decay=weight_decay, epochs=epochs, seed=seed,
            train_batch_size=train_batch_size,
            eval_batch_size=eval_batch_size,
        )
        self._dataset = dataset
        self._model = model
        self._lr = r["lr"]
        self._weight_decay = r["weight_decay"]
        self._epochs = r["epochs"]
        self._loss_fn = loss_fn
        self._seed = r["seed"]
        self._train_batch_size = r["train_batch_size"]
        self._eval_batch_size = r["eval_batch_size"]
        self._verbose = verbose
        self._precompute_dtype = precompute_dtype
        self._test_acc = self._execute()

    @property
    def test_acc(self) -> float:
        return self._test_acc

    # ------------------------------------------------------------------
    def _execute(self) -> float:
        ds, model = self._dataset, self._model
        rng = set_seed(self._seed)
        np_rng = np.random.default_rng(self._seed)

        t0 = time.time()
        model.preprocess(ds.graph, ds.x, dtype=self._precompute_dtype)
        if self._verbose:
            print(f"Preprocessing done in {time.time() - t0:.4f}s")

        labels = jnp.asarray(np.asarray(ds.y).reshape(-1), jnp.int32)
        train_idx = np.asarray(ds.train_idx)
        val_idx = np.asarray(ds.val_idx)
        test_idx = np.asarray(ds.test_idx)

        params = model.init(rng, jnp.asarray(train_idx[:2]))
        tx = adam_l2(self._lr, self._weight_decay)
        state = init_train_state(rng, params, tx)

        apply_fn = _make_apply(model)
        train_step = make_train_step(apply_fn, tx, self._loss_fn)
        eval_step = make_eval_step(apply_fn)

        def eval_on(params, idx):
            correct, total = 0.0, 0.0
            for b_idx, w in batch_iterator(
                idx, self._eval_batch_size, shuffle=False, rng=np_rng
            ):
                feats = model.batch_input(jnp.asarray(b_idx))
                c, t = eval_step(params, feats, labels[jnp.asarray(b_idx)], jnp.asarray(w))
                correct += float(c)
                total += float(t)
            return correct / max(total, 1.0)

        best_val, best_test = 0.0, 0.0
        t_total = time.time()
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
            loss_train = float(np.average(losses, weights=weights))
            acc_train = float(np.average(accs, weights=weights))
            acc_val = eval_on(state.params, val_idx)
            acc_test = eval_on(state.params, test_idx)
            if self._verbose:
                print(
                    f"Epoch: {epoch + 1:03d} loss_train: {loss_train:.4f} "
                    f"acc_train: {acc_train:.4f} acc_val: {acc_val:.4f} "
                    f"acc_test: {acc_test:.4f} time: {time.time() - t:.4f}s"
                )
            if acc_val > best_val:
                best_val, best_test = acc_val, acc_test
                self._on_best(state)

        acc_val, acc_test = self._postprocess(state, labels, val_idx, test_idx)
        if acc_val > best_val:
            best_val, best_test = acc_val, acc_test

        if self._verbose:
            print("Optimization Finished!")
            print(f"Total time elapsed: {time.time() - t_total:.4f}s")
            print(f"Best val: {best_val:.4f}, best test: {best_test:.4f}")
        self.state = state
        return best_test

    def _on_best(self, state: TrainState) -> None:
        """Hook called whenever validation accuracy improves (subclasses track
        best-epoch outputs, e.g. Correct&Smooth)."""

    def _postprocess(self, state: TrainState, labels, val_idx, test_idx):
        ds, model = self._dataset, self._model
        logits_fn = make_logits_fn(_make_apply(model))
        all_idx = jnp.arange(ds.num_node)
        outputs = logits_fn(state.params, model.batch_input(all_idx))
        final = model.postprocess(ds.graph, outputs)
        acc_val = float(
            jnp.mean(
                (jnp.argmax(final[jnp.asarray(val_idx)], axis=1) == labels[jnp.asarray(val_idx)])
            )
        )
        acc_test = float(
            jnp.mean(
                (jnp.argmax(final[jnp.asarray(test_idx)], axis=1) == labels[jnp.asarray(test_idx)])
            )
        )
        return acc_val, acc_test


def _make_apply(model: SGAPModel):
    net = model.net

    def apply_fn(params, feats, train: bool, rngs=None):
        return net.apply(params, feats, train=train, rngs=rngs)

    return apply_fn
