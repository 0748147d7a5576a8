"""Task-layer utilities: seeds, metrics, optimizers, jitted step builders.

Parity with reference ``sgl/tasks/utils.py`` re-designed for JAX: the
train/evaluate helpers become *compiled step functions* built once per task
(slice rows → forward → loss → grad → Adam update, all inside one ``jit``),
instead of per-epoch Python driving torch autograd.
"""

from __future__ import annotations

import random
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


def set_seed(seed: int) -> jax.Array:
    """Seed python/numpy and return a JAX PRNG key
    (reference ``tasks/utils.py:19-26`` seeds torch/cuda instead)."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Fraction of argmax predictions equal to labels
    (reference ``tasks/utils.py:12-16``)."""
    return jnp.mean((jnp.argmax(logits, axis=1) == labels).astype(jnp.float32))


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax cross-entropy ≡ torch ``nn.CrossEntropyLoss``."""
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


# Loge losses live canonically in sgl_tpu.tricks.utils (reference parity);
# re-exported here for convenience
from sgl_tpu.tricks.utils import loge_bce_loss, loge_cross_entropy_loss  # noqa: F401,E402


def bce_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    pred = jnp.clip(pred, 1e-7, 1 - 1e-7)
    return -jnp.mean(target * jnp.log(pred) + (1 - target) * jnp.log1p(-pred))


def adam_l2(lr: float, weight_decay: float) -> optax.GradientTransformation:
    """torch.optim.Adam semantics: L2 penalty added to the gradient *before*
    the Adam moments (not decoupled AdamW)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.adam(lr),
    )


def warmup_lr_schedule(lr: float, warmup_epochs: int = 50):
    """Linear LR warmup over the first ``warmup_epochs`` steps — the analog
    of the reference's ``adjust_learning_rate`` (``tasks/utils.py:28-31``),
    expressed as an optax schedule instead of mutating optimizer state."""

    def schedule(step):
        frac = jnp.minimum((step + 1) / warmup_epochs, 1.0)
        return lr * frac

    return schedule


def adam_l2_warmup(
    lr: float, weight_decay: float, warmup_epochs: int = 50
) -> optax.GradientTransformation:
    """adam_l2 with the reference-style linear warmup."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(warmup_lr_schedule(lr, warmup_epochs)),
    )


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    rng: jax.Array


def init_train_state(
    rng: jax.Array, params, tx: optax.GradientTransformation
) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params), rng=rng)


def weighted_cross_entropy(logits, labels, w):
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)


def weighted_accuracy(logits, labels, w):
    hit = (jnp.argmax(logits, axis=1) == labels).astype(jnp.float32)
    return jnp.sum(hit * w) / jnp.maximum(jnp.sum(w), 1.0)


def fast_dropout_key(key: jax.Array) -> jax.Array:
    """Derive an XLA-RngBitGenerator ('rbg') key from a threefry key.

    Threefry dropout-mask generation costs ~5 ms/step for a (100k, 512)
    MLP on v5e — half the full-batch GAMLP step; rbg bits are ~3x faster
    (85 -> 130 epochs/s measured).  The train-state key stays threefry
    (raw uint32, picklable, backend-portable); only the per-step mask key
    is rbg.  rbg streams are deterministic per backend+compile but not
    across backends — fine for dropout, which only needs distributional
    correctness (the torch reference's RNG stream differs anyway).
    """
    data = jax.random.bits(key, (4,), jnp.uint32)
    return jax.random.wrap_key_data(data, impl="rbg")


def make_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    loss_fn: Callable = weighted_cross_entropy,
):
    """Build a jitted train step.

    ``apply_fn(params, feats, train, rngs)`` must return logits for a batch
    of pre-sliced features.  ``w`` carries per-example weights (all-ones for
    full batch; zeros mask wrap-padded tail examples in mini-batch mode).
    Returns ``step(state, feats, labels, w) -> (state, loss, acc)``.
    """

    @jax.jit
    def step(state: TrainState, feats, labels, w):
        rng, dropout_rng = jax.random.split(state.rng)
        dropout_rng = fast_dropout_key(dropout_rng)

        def objective(params):
            logits = apply_fn(
                params, feats, train=True, rngs={"dropout": dropout_rng}
            )
            return loss_fn(logits, labels, w), logits

        (loss, logits), grads = jax.value_and_grad(objective, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params, opt_state, rng),
            loss,
            weighted_accuracy(logits, labels, w),
        )

    return step


def make_eval_step(apply_fn: Callable):
    """Build a jitted eval step: ``(params, feats, labels, w) ->
    (correct_count, weight_sum)`` so mini-batch results aggregate exactly."""

    @jax.jit
    def step(params, feats, labels, w):
        logits = apply_fn(params, feats, train=False, rngs=None)
        hit = (jnp.argmax(logits, axis=1) == labels).astype(jnp.float32)
        return jnp.sum(hit * w), jnp.sum(w)

    return step


def make_logits_fn(apply_fn: Callable):
    @jax.jit
    def logits(params, feats):
        return apply_fn(params, feats, train=False, rngs=None)

    return logits


def add_labels(features, labels, idx, num_classes: int):
    """Concat one-hot labels of ``idx`` rows onto features
    (reference ``tasks/utils.py:33-36``; label-use trick)."""
    features = np.asarray(features)
    onehot = np.zeros((features.shape[0], num_classes), features.dtype)
    labels = np.asarray(labels)
    idx = np.asarray(idx)
    onehot[idx, labels[idx]] = 1
    return np.concatenate([features, onehot], axis=-1)


def batch_iterator(idx: np.ndarray, batch_size: Optional[int], shuffle: bool, rng):
    """Static-shape mini-batch iterator: drops nothing, pads the tail by
    wrapping (XLA-friendly fixed batch shapes), returns (batch_idx, weight)
    pairs where weight masks wrapped duplicates out of metrics/loss."""
    idx = np.asarray(idx)
    n = idx.shape[0]
    if batch_size is None or batch_size >= n:
        yield idx, np.ones(n, np.float32)
        return
    order = rng.permutation(n) if shuffle else np.arange(n)
    for s in range(0, n, batch_size):
        chunk = order[s : s + batch_size]
        pad = batch_size - chunk.shape[0]
        w = np.ones(batch_size, np.float32)
        if pad:
            chunk = np.concatenate([chunk, order[:pad]])
            w[batch_size - pad :] = 0.0
        yield idx[chunk], w
