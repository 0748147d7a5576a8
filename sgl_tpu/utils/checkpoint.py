"""Checkpoint / resume (SURVEY.md §5: the reference only persists the NAS
best model via ``torch.save``; the rebuild checkpoints (propagated feature
shards, model params, optimizer state) and supports hop-level restartable
precompute)."""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    """Atomic pickle of a pytree with numpy leaves."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host = jax.tree.map(np.asarray, tree)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(host, f)
    os.replace(tmp, path)


def load_pytree(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_train_state(path: str, state) -> None:
    """Persist (params, opt_state, rng) — full resume, unlike the
    reference's model-only ``torch.save`` (``search/auto_search.py:48``)."""
    save_pytree(path, {"params": state.params, "opt_state": state.opt_state,
                       "rng": state.rng})


def load_train_state(path: str, state):
    """Restore into an existing TrainState template (keeps tree structure)."""
    d = load_pytree(path)
    return type(state)(
        params=jax.tree.map(jnp.asarray, d["params"]),
        opt_state=jax.tree.map(jnp.asarray, d["opt_state"]),
        rng=jnp.asarray(d["rng"]),
    )


class HopCheckpointer:
    """Restartable pre-propagation: persists each hop's features so a killed
    precompute resumes at the last completed hop (SURVEY.md §5 'failure
    detection / elastic recovery')."""

    def __init__(self, directory: str):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)

    def _hop_path(self, k: int) -> str:
        return os.path.join(self.directory, f"hop_{k}.npy")

    def last_completed_hop(self) -> int:
        k = -1
        while os.path.exists(self._hop_path(k + 1)):
            k += 1
        return k

    def save_hop(self, k: int, feats) -> None:
        tmp = self._hop_path(k) + ".tmp.npy"
        np.save(tmp, np.asarray(feats))
        os.replace(tmp, self._hop_path(k))

    def load_hop(self, k: int):
        return np.load(self._hop_path(k))

    def propagate_resumable(self, adj, x, prop_steps: int, spmm_fn=None):
        """k-hop propagation that checkpoints every hop and resumes."""
        from sgl_tpu.kernels.sparse import spmm

        spmm_fn = spmm_fn or spmm
        last = self.last_completed_hop()
        if last < 0:
            self.save_hop(0, x)
            last = 0
        h = jnp.asarray(self.load_hop(last))
        for k in range(last + 1, prop_steps + 1):
            h = spmm_fn(adj, h)
            self.save_hop(k, h)
        return jnp.stack(
            [jnp.asarray(self.load_hop(k)) for k in range(prop_steps + 1)]
        )
