"""Node classification with label use / label reuse
(reference ``sgl/tasks/node_classification_with_label_use.py:15-160``).

Label use: each epoch, a random half of the train labels are one-hot
concatenated onto the features (the model trains to predict the other half).
Label reuse: after ``reuse_start_epoch``, predicted soft labels of unlabeled
nodes replace their zero label-channels and features are re-propagated per
iteration.  NOTE: the model's ``feat_dim`` must be ``num_features +
num_classes``.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from sgl_tpu.tasks.base_task import BaseTask
from sgl_tpu.tasks.node_classification import _make_apply
from sgl_tpu.tasks.utils import (
    adam_l2,
    add_labels,
    batch_iterator,
    init_train_state,
    make_eval_step,
    make_logits_fn,
    make_train_step,
    set_seed,
    weighted_cross_entropy,
)


class NodeClassificationWithLabelUse(BaseTask):
    def __init__(
        self,
        dataset,
        model,
        lr: float,
        weight_decay: float,
        epochs: int,
        device=None,
        loss_fn=weighted_cross_entropy,
        seed: int = 42,
        train_batch_size=None,
        eval_batch_size=None,
        label_reuse_batch_size=None,
        mask_rate: float = 0.5,
        use_labels: bool = True,
        reuse_start_epoch: int = 0,
        label_iters: int = 0,
        verbose: bool = True,
    ):
        super().__init__()
        if label_iters > 0 and not use_labels:
            raise ValueError(
                "When using label reuse, it's essential to enable label use!"
            )
        self._dataset = dataset
        self._model = model
        self._lr = lr
        self._weight_decay = weight_decay
        self._epochs = epochs
        self._loss_fn = loss_fn
        self._seed = seed
        self._train_batch_size = train_batch_size
        self._eval_batch_size = eval_batch_size
        self._mask_rate = mask_rate
        self._use_labels = use_labels
        self._reuse_start_epoch = reuse_start_epoch
        self._label_iters = label_iters
        self._verbose = verbose
        self._test_acc = self._execute()

    test_acc = property(lambda self: self._test_acc)

    def _execute(self):
        ds, model = self._dataset, self._model
        rng = set_seed(self._seed)
        np_rng = np.random.default_rng(self._seed)
        labels_np = np.asarray(ds.y).reshape(-1)
        labels = jnp.asarray(labels_np, jnp.int32)
        train_idx = np.asarray(ds.train_idx)
        val_idx = np.asarray(ds.val_idx)
        test_idx = np.asarray(ds.test_idx)
        num_classes = ds.num_classes

        # initialize params against the label-augmented feature width
        features0 = (
            add_labels(ds.x, labels_np, train_idx[:0], num_classes)
            if self._use_labels
            else np.asarray(ds.x)
        )
        model.preprocess(ds.graph, features0)
        params = model.init(rng)
        tx = adam_l2(self._lr, self._weight_decay)
        state = init_train_state(rng, params, tx)
        apply_fn = _make_apply(model)
        train_step = make_train_step(apply_fn, tx, self._loss_fn)
        eval_step = make_eval_step(apply_fn)
        logits_fn = make_logits_fn(apply_fn)

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
        train_pred_idx = train_idx
        for epoch in range(self._epochs):
            if self._use_labels:
                mask = np_rng.random(train_idx.shape[0]) < self._mask_rate
                train_labels_idx = train_idx[mask]
                train_pred_idx = train_idx[~mask]
                features = add_labels(ds.x, labels_np, train_labels_idx, num_classes)
            else:
                features = np.asarray(ds.x)

            t0 = time.time()
            model.preprocess(ds.graph, features)
            if self._verbose:
                print(f"Feature Propagate done in {time.time() - t0:.4f}s")

            if self._label_iters > 0 and epoch > self._reuse_start_epoch:
                unlabeled = np.concatenate([train_pred_idx, val_idx, test_idx])
                for _ in range(self._label_iters):
                    all_idx = jnp.arange(ds.num_node)
                    pred = logits_fn(state.params, model.batch_input(all_idx))
                    soft = np.asarray(jax.nn.softmax(pred, axis=-1))
                    features[unlabeled, -num_classes:] = soft[unlabeled]
                    model.preprocess(ds.graph, features)

            t = time.time()
            losses, accs, weights = [], [], []
            for b_idx, w in batch_iterator(
                train_pred_idx, self._train_batch_size, shuffle=True, rng=np_rng
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

        # postprocess with optional post-propagation
        all_idx = jnp.arange(ds.num_node)
        outputs = logits_fn(state.params, model.batch_input(all_idx))
        final = model.postprocess(ds.graph, outputs)
        vi, ti = jnp.asarray(val_idx), jnp.asarray(test_idx)
        acc_val = float(jnp.mean(jnp.argmax(final[vi], axis=1) == labels[vi]))
        acc_test = float(jnp.mean(jnp.argmax(final[ti], axis=1) == labels[ti]))
        if acc_val > best_val:
            best_val, best_test = acc_val, acc_test
        if self._verbose:
            print(f"Best val: {best_val:.4f}, best test: {best_test:.4f}")
        return best_test
