"""Data-parallel training over a device mesh.

Replaces the reference's NCCL DDP path (``tasks/node_classification_dist.py``,
``models/base_model_dist.py``): instead of one process per GPU with an
implicit gradient all-reduce, the jitted train step runs under GSPMD with
batch rows sharded over the ``data`` axis and params replicated — XLA emits
the grad psum over ICI.  Unlike the reference (whose spawned workers' weights
are *discarded*, SURVEY.md §3.2), the updated state is the state.
"""

from __future__ import annotations

from typing import Callable

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sgl_tpu.tasks.utils import (
    TrainState,
    weighted_accuracy,
    weighted_cross_entropy,
)


def make_parallel_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    loss_fn: Callable = weighted_cross_entropy,
    batch_axes=("data",),
    node_major_feats: bool = False,
):
    """Jitted DP train step: feats/labels/w sharded on the batch dim over
    ``batch_axes``, state replicated.  Signature matches
    :func:`sgl_tpu.tasks.utils.make_train_step`.  ``node_major_feats``
    marks 3-D feats as (B, K, D) (batch axis 0) instead of (K, B, D)."""
    batch_spec = P(batch_axes)
    repl = NamedSharding(mesh, P())

    def shard_batch(feats, labels, w):
        # hop-stacked feats are (K, B, D): batch is axis 1; else axis 0
        if feats.ndim == 3 and not node_major_feats:
            fspec = P(None, batch_axes)
        else:
            fspec = batch_spec
        feats = jax.device_put(feats, NamedSharding(mesh, fspec))
        labels = jax.device_put(labels, NamedSharding(mesh, batch_spec))
        w = jax.device_put(w, NamedSharding(mesh, batch_spec))
        return feats, labels, w

    @jax.jit
    def step(state: TrainState, feats, labels, w):
        # stays threefry (no fast_dropout_key): rbg bits are not stable
        # across GSPMD partitionings, and this step's contract is
        # bit-identity with the single-device step (tested)
        rng, dropout_rng = jax.random.split(state.rng)

        def objective(params):
            logits = apply_fn(params, feats, train=True, rngs={"dropout": dropout_rng})
            return loss_fn(logits, labels, w), logits

        (loss, logits), grads = jax.value_and_grad(objective, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, rng)
        return (
            jax.lax.with_sharding_constraint(
                new_state, jax.tree.map(lambda _: repl, new_state)
            ),
            loss,
            weighted_accuracy(logits, labels, w),
        )

    return step, shard_batch


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    repl = NamedSharding(mesh, P())
    return jax.device_put(state, jax.tree.map(lambda _: repl, state))
