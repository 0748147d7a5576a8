"""Link prediction tasks (reference ``sgl/tasks/link_prediction.py:14-284``).

``LinkPredictionGAE``: GAE-style — embed nodes with an SGAP model, score an
edge (u, v) as ``σ(<z_u, z_v>)``, train with BCE over positive/negative edge
samples.  ``LinkPredictionNAFS``: training-free NAFS smoothing then dot
scoring.

Deviations from the reference (documented):
* ``mask_test_edges`` is vectorized rejection sampling (the reference's
  per-edge Python ``while`` loops, ``tasks/utils.py:151-246``, are O(E²)
  with set lookups);
* edge scores are computed per edge via a gather-dot instead of
  materializing the full ``Z @ Z^T`` (O(N²) memory);
* ROC-AUC/AP are computed from probabilities, not thresholded binary
  predictions (``tasks/utils.py:300-302`` thresholds first, which degrades
  AUC to a single operating point).
"""

from __future__ import annotations

import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from sklearn.metrics import average_precision_score, roc_auc_score

from sgl_tpu.graph.graph import Graph
from sgl_tpu.tasks.base_task import BaseTask
from sgl_tpu.tasks.node_classification import _make_apply
from sgl_tpu.tasks.node_clustering import nafs_smooth_features, nafs_smooth_sweep
from sgl_tpu.tasks.utils import (
    TrainState,
    adam_l2,
    fast_dropout_key,
    init_train_state,
    set_seed,
)


def _sample_negative_edges(num_nodes: int, count: int, forbidden: set, rng):
    """Vectorized rejection sampling of ``count`` distinct non-edges."""
    out = []
    have = set()
    while len(out) < count:
        m = max(2 * (count - len(out)), 1024)
        s = rng.integers(0, num_nodes, m)
        t = rng.integers(0, num_nodes, m)
        for a, b in zip(s, t):
            if a == b:
                continue
            key = (int(a), int(b))
            rkey = (int(b), int(a))
            if key in forbidden or key in have or rkey in have:
                continue
            have.add(key)
            out.append(key)
            if len(out) == count:
                break
    return np.asarray(out, dtype=np.int64)


def mask_test_edges(graph: Graph, seed: int = 0):
    """Edge split: 10% test / 5% val positives + matched negatives
    (reference ``tasks/utils.py:148-259``).  Returns
    ``(train_graph, train_edges, train_neg, val_edges, val_neg, test_edges,
    test_neg)`` with single-direction edge lists."""
    rng = np.random.default_rng(seed)
    src, dst, _ = graph.edges()
    keep = src < dst  # upper triangle, drops self loops
    es, ed = src[keep], dst[keep]
    n_e = es.shape[0]
    n_test = n_e // 10
    n_val = n_e // 20
    perm = rng.permutation(n_e)
    val_i = perm[:n_val]
    test_i = perm[n_val : n_val + n_test]
    train_i = perm[n_val + n_test :]
    all_set = set(zip(src.tolist(), dst.tolist()))
    train_edges = np.stack([es[train_i], ed[train_i]], axis=1)
    val_edges = np.stack([es[val_i], ed[val_i]], axis=1)
    test_edges = np.stack([es[test_i], ed[test_i]], axis=1)
    train_neg = _sample_negative_edges(graph.num_nodes, len(train_edges), all_set, rng)
    val_neg = _sample_negative_edges(graph.num_nodes, len(val_edges), all_set, rng)
    test_neg = _sample_negative_edges(graph.num_nodes, len(test_edges), all_set, rng)
    ts, td = train_edges[:, 0], train_edges[:, 1]
    train_graph = Graph.from_coo(
        np.concatenate([ts, td]),
        np.concatenate([td, ts]),
        num_nodes=graph.num_nodes,
        x=graph.x,
        y=graph.y,
    )
    return train_graph, train_edges, train_neg, val_edges, val_neg, test_edges, test_neg


def edge_scores(z: jnp.ndarray, edges: np.ndarray) -> jnp.ndarray:
    e = jnp.asarray(edges)
    return jnp.sum(z[e[:, 0]] * z[e[:, 1]], axis=1)


def _auc_ap(z, pos, neg):
    scores = np.concatenate(
        [np.asarray(jax.nn.sigmoid(edge_scores(z, pos))),
         np.asarray(jax.nn.sigmoid(edge_scores(z, neg)))]
    )
    labels = np.concatenate([np.ones(len(pos)), np.zeros(len(neg))])
    return roc_auc_score(labels, scores), average_precision_score(labels, scores)


class LinkPredictionGAE(BaseTask):
    def __init__(
        self,
        dataset,
        model,
        lr: float,
        weight_decay: float,
        epochs: int,
        device=None,
        seed: int = 42,
        train_batch_size=None,
        eval_batch_size=None,
        threshold: float = 0.5,
        verbose: bool = True,
    ):
        super().__init__()
        self._dataset = dataset
        self._model = model
        self._lr = lr
        self._weight_decay = weight_decay
        self._epochs = epochs
        self._seed = seed
        self._threshold = threshold
        self._verbose = verbose
        self._test_roc_auc, self._test_avg_prec = self._execute()

    test_roc_auc = property(lambda self: self._test_roc_auc)
    test_avg_prec = property(lambda self: self._test_avg_prec)

    def _execute(self):
        ds, model = self._dataset, self._model
        rng = set_seed(self._seed)
        (
            train_graph,
            tr_pos,
            tr_neg,
            va_pos,
            va_neg,
            te_pos,
            te_neg,
        ) = mask_test_edges(ds.graph, seed=self._seed)
        if self._verbose:
            print("Edge split finished!")

        t0 = time.time()
        model.preprocess(train_graph, ds.x)
        if self._verbose:
            print(f"Preprocessing done in {time.time() - t0:.4f}s")

        all_idx = jnp.arange(ds.num_node)
        feats = model.batch_input(all_idx)
        params = model.init(rng)
        has_params = len(jax.tree_util.tree_leaves(params)) > 0
        tx = adam_l2(self._lr, self._weight_decay)
        state = init_train_state(rng, params, tx)
        apply_fn = _make_apply(model)

        tr_edges = jnp.asarray(np.concatenate([tr_pos, tr_neg]))
        tr_labels = jnp.concatenate(
            [jnp.ones(len(tr_pos)), jnp.zeros(len(tr_neg))]
        )

        @jax.jit
        def embed(params, feats):
            return apply_fn(params, feats, train=False, rngs=None)

        @jax.jit
        def train_step(state: TrainState, feats, tr_edges, tr_labels):
            rng, dropout = jax.random.split(state.rng)
            dropout = fast_dropout_key(dropout)

            def objective(p):
                z = apply_fn(p, feats, train=True, rngs={"dropout": dropout})
                logits = jnp.sum(z[tr_edges[:, 0]] * z[tr_edges[:, 1]], axis=1)
                return optax.sigmoid_binary_cross_entropy(logits, tr_labels).mean()

            loss, grads = jax.value_and_grad(objective)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, rng), loss

        best = {"auc": (0.0, 0.0), "ap": (0.0, 0.0)}  # (val, test)
        for epoch in range(self._epochs):
            t = time.time()
            if has_params:
                state, loss = train_step(state, feats, tr_edges, tr_labels)
                loss = float(loss)
            else:
                loss = float("nan")
            z = embed(state.params, feats)
            auc_val, ap_val = _auc_ap(z, va_pos, va_neg)
            auc_test, ap_test = _auc_ap(z, te_pos, te_neg)
            if self._verbose:
                print(
                    f"Epoch: {epoch + 1:03d} loss_train: {loss:.4f} "
                    f"roc_auc_val: {auc_val:.4f} avg_prec_val: {ap_val:.4f} "
                    f"roc_auc_test: {auc_test:.4f} avg_prec_test: {ap_test:.4f} "
                    f"time: {time.time() - t:.4f}s"
                )
            if auc_val > best["auc"][0]:
                best["auc"] = (auc_val, auc_test)
            if ap_val > best["ap"][0]:
                best["ap"] = (ap_val, ap_test)
            if not has_params:
                break  # training-free model: metrics cannot change

        # postprocess (optional post-propagation on embeddings)
        z = embed(state.params, feats)
        final = model.postprocess(train_graph, z)
        auc_val, ap_val = _auc_ap(final, va_pos, va_neg)
        auc_test, ap_test = _auc_ap(final, te_pos, te_neg)
        if auc_val > best["auc"][0]:
            best["auc"] = (auc_val, auc_test)
        if ap_val > best["ap"][0]:
            best["ap"] = (ap_val, ap_test)
        if self._verbose:
            print(
                f"Best roc_auc_test: {best['auc'][1]:.4f}, "
                f"best avg_prec_test: {best['ap'][1]:.4f}"
            )
        return best["auc"][1], best["ap"][1]


class LinkPredictionNAFS(BaseTask):
    """Training-free NAFS link prediction (reference ``link_prediction.py:159-284``)."""

    def __init__(
        self,
        dataset,
        hops=20,
        method: str = "mean",
        seed: int = 42,
        r_list: Sequence[float] = (0.5, 0.4, 0.3, 0.2, 0.1, 0.0),
        threshold: float = 0.5,
        verbose: bool = True,
    ):
        super().__init__()
        method = method.lower()
        if method not in ("mean", "max", "concat", "simple"):
            raise ValueError(
                "Method not Suppoted! Choose 'mean', 'max' or 'concat' !"
            )
        if not isinstance(hops, (list, int, range)):
            raise ValueError("hops type not supported!")
        self._dataset = dataset
        self._method = method
        self._r_list = list(r_list)
        self._hops = range(hops) if isinstance(hops, int) else hops
        self._seed = seed
        self._verbose = verbose
        (
            self._best_hop_roc_auc,
            self._best_hop_avg_prec,
            self._test_roc_auc,
            self._test_avg_prec,
        ) = self._execute()

    test_roc_auc = property(lambda self: self._test_roc_auc)
    test_avg_prec = property(lambda self: self._test_avg_prec)
    best_hop_roc_auc = property(lambda self: self._best_hop_roc_auc)
    best_hop_avg_prec = property(lambda self: self._best_hop_avg_prec)

    def _execute(self):
        set_seed(self._seed)
        ds = self._dataset
        train_graph, _, _, _, _, te_pos, te_neg = mask_test_edges(
            ds.graph, seed=self._seed
        )
        if self._verbose:
            print("Edge split finished!")
        best_auc, best_ap = 0.0, 0.0
        best_hop_auc, best_hop_ap = 0, 0
        t = time.time()
        for hop, z in nafs_smooth_sweep(
            train_graph, ds.x, self._hops, self._r_list, self._method
        ):
            auc, ap = _auc_ap(z, te_pos, te_neg)
            if self._verbose:
                print(
                    f"hops:{hop:2d} roc_auc_score: {auc:.4f} "
                    f"avg_precision: {ap:.4f} time: {time.time() - t:.4f} seconds"
                )
            if auc > best_auc:
                best_auc, best_hop_auc = auc, hop
            if ap > best_ap:
                best_ap, best_hop_ap = ap, hop
            t = time.time()
        if self._verbose:
            print(
                f"best_roc_auc_score: {best_auc:.4f}, "
                f"best_avg_precision: {best_ap:.4f}"
            )
        return best_hop_auc, best_hop_ap, best_auc, best_ap
