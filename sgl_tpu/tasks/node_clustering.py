"""Node clustering tasks (reference ``sgl/tasks/node_clustering.py:12-258``).

``NodeClustering``: per-epoch KMeans on model embeddings + the reference's
cluster loss driving a jitted gradient step.  ``NodeClusteringNAFS``:
training-free multi-hop NAFS smoothing with an r-ensemble, fully vectorized
(the reference's per-node Python loops become einsums; per-r propagation is
one jitted k-hop scan).
"""

from __future__ import annotations

import functools
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from sklearn.cluster import KMeans

from sgl_tpu.graph.normalize import symmetric_normalized_weights
from sgl_tpu.kernels.sparse import spmm
from sgl_tpu.ops.graph_ops import k_hop_propagate
from sgl_tpu.tasks.base_task import BaseTask
from sgl_tpu.tasks.clustering_metrics import clustering_metrics
from sgl_tpu.tasks.node_classification import _make_apply
from sgl_tpu.tasks.utils import (
    TrainState,
    adam_l2,
    fast_dropout_key,
    init_train_state,
    set_seed,
)


def cluster_loss(train_output, y_pred, cluster_centers):
    """Reference ``tasks/utils.py:101-113``: pull embeddings toward their
    assigned centroid, push from the mean distance."""
    dist = jnp.linalg.norm(
        train_output[:, None, :] - cluster_centers[None, :, :], axis=-1
    )  # (N, C)
    picked = jnp.take_along_axis(dist, y_pred[:, None], axis=1).squeeze(1)
    loss = -dist.mean(axis=1).sum() + 2.0 * picked.sum()
    return loss / dist.shape[0]


class NodeClustering(BaseTask):
    def __init__(
        self,
        dataset,
        model,
        lr: float,
        weight_decay: float,
        epochs: int,
        device=None,
        loss_fn=cluster_loss,
        seed: int = 42,
        train_batch_size=None,
        eval_batch_size=None,
        n_init: int = 20,
        verbose: bool = True,
    ):
        super().__init__()
        if train_batch_size is not None or eval_batch_size is not None:
            raise ValueError("clustering task does not support batch training")
        self._dataset = dataset
        self._model = model
        self._lr = lr
        self._weight_decay = weight_decay
        self._epochs = epochs
        self._loss_fn = loss_fn
        self._seed = seed
        self._n_clusters = dataset.num_classes
        self._n_init = n_init
        self._verbose = verbose
        self._acc, self._nmi, self._adjscore = self._execute()

    @property
    def acc(self):
        return self._acc

    @property
    def nmi(self):
        return self._nmi

    @property
    def adjscore(self):
        return self._adjscore

    def _execute(self):
        ds, model = self._dataset, self._model
        rng = set_seed(self._seed)
        t0 = time.time()
        model.preprocess(ds.graph, ds.x)
        if self._verbose:
            print(f"Preprocessing done in {time.time() - t0:.4f}s")

        labels = np.asarray(ds.y).reshape(-1)
        all_idx = jnp.arange(ds.num_node)
        feats = model.batch_input(all_idx)
        params = model.init(rng)
        has_params = len(jax.tree_util.tree_leaves(params)) > 0
        tx = adam_l2(self._lr, self._weight_decay)
        state = init_train_state(rng, params, tx)
        apply_fn = _make_apply(model)
        loss_fn = self._loss_fn

        @jax.jit
        def embed(params, feats):
            return apply_fn(params, feats, train=False, rngs=None)

        @jax.jit
        def grad_step(state: TrainState, feats, y_pred, centers):
            rng, dropout = jax.random.split(state.rng)
            dropout = fast_dropout_key(dropout)

            def objective(p):
                out = apply_fn(p, feats, train=True, rngs={"dropout": dropout})
                return loss_fn(out, y_pred, centers)

            loss, grads = jax.value_and_grad(objective)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, rng), loss

        best = [0.0, 0.0, 0.0]
        for epoch in range(self._epochs):
            t = time.time()
            out = np.asarray(embed(state.params, feats))
            km = KMeans(n_clusters=self._n_clusters, n_init=self._n_init)
            y_pred = km.fit_predict(out)
            centers = jnp.asarray(km.cluster_centers_)
            if has_params:
                state, loss = grad_step(state, feats, jnp.asarray(y_pred), centers)
                loss = float(loss)
            else:
                loss = float(
                    loss_fn(jnp.asarray(out), jnp.asarray(y_pred), centers)
                )
            cm = clustering_metrics(labels, y_pred)
            acc, nmi, adjscore = cm.evaluationClusterModelFromLabel()
            if self._verbose:
                print(
                    f"Epoch: {epoch + 1:03d} loss_train: {loss:.4f} acc: {acc:.4f} "
                    f"nmi: {nmi:.4f} adjscore: {adjscore:.4f} time: {time.time() - t:.4f}s"
                )
            best = [max(b, v) for b, v in zip(best, (acc, nmi, adjscore))]

        # postprocess: cluster the final (optionally post-propagated) embeddings
        out = embed(state.params, feats)
        final = self._model.postprocess(ds.graph, out)
        km = KMeans(n_clusters=self._n_clusters, n_init=self._n_init)
        y_pred = km.fit_predict(np.asarray(final))
        acc, nmi, adjscore = clustering_metrics(
            labels, y_pred
        ).evaluationClusterModelFromLabel()
        best = [max(b, v) for b, v in zip(best, (acc, nmi, adjscore))]
        if self._verbose:
            print(
                f"Best acc: {best[0]:.4f}, best_nmi: {best[1]:.4f}, "
                f"best_adjscore: {best[2]:.4f}"
            )
        return tuple(best)


def _nafs_weight_of(xr, h):
    x0, rn = xr
    norms = jnp.linalg.norm(h, axis=-1) + 1e-10  # (R, N)
    cos = jnp.einsum("nd,rnd->rn", x0, h) / (norms * rn[None])
    return jnp.exp(cos)


def _nafs_prop_pallas(ws, h):
    # per-r kernels with diag/hub splits: measured 2.9x faster than one
    # wide multi-weight kernel (splits remove 40% of gathered rows and the
    # narrow d=128 kernel pipelines better than d=R*128) and 3x faster
    # than per-r segment_sum (dev log 2026-08-19, 50k nodes / 1M edges)
    from sgl_tpu.kernels.pallas_spmm import spmm_pallas

    return jnp.stack([spmm_pallas(ch, h[i]) for i, ch in enumerate(ws)])


def _nafs_prop_segment(ws, h, sorted_by_dst: bool = True):
    # inline multi-weight gather + segment_sum (one gather for all r)
    src, dst, w_stack = ws
    r, n, d = h.shape
    xs = jnp.moveaxis(h, 0, 1).reshape(n, r * d)
    gathered = jnp.take(xs, src, axis=0)
    msgs = gathered.reshape(-1, r, d) * w_stack.T[:, :, None]
    y = jax.ops.segment_sum(
        msgs.reshape(-1, r * d),
        dst,
        num_segments=n,
        indices_are_sorted=sorted_by_dst,
    )
    return jnp.moveaxis(y.reshape(n, r, d), 1, 0)


def _nafs_step(prop, ws, xr, carry):
    h, num, den = carry
    h = prop(ws, h)
    e = _nafs_weight_of(xr, h)
    return h, num + e[..., None] * h, den + e


# module-level jits: cached across calls (a per-call closure jit would
# recompile every invocation — measured 5x regression)
@jax.jit
def _nafs_step_pallas(ws, xr, carry):
    return _nafs_step(_nafs_prop_pallas, ws, xr, carry)


@functools.partial(jax.jit, static_argnames=("sorted_by_dst",))
def _nafs_step_segment(ws, xr, carry, sorted_by_dst: bool = True):
    prop = functools.partial(_nafs_prop_segment, sorted_by_dst=sorted_by_dst)
    return _nafs_step(prop, ws, xr, carry)


@functools.partial(jax.jit, static_argnames=("hops", "pallas", "sorted_by_dst"))
def _nafs_smooth_scan(ws, xr, carry, hops: int, pallas: bool, sorted_by_dst: bool = True):
    if pallas:
        prop = _nafs_prop_pallas
    else:
        prop = functools.partial(_nafs_prop_segment, sorted_by_dst=sorted_by_dst)

    def body(c, _):
        return _nafs_step(prop, ws, xr, c), None

    (h, num, den), _ = jax.lax.scan(body, carry, None, length=hops)
    return num / den[..., None]


_MACHINE_CACHE: list = []  # [(graph_ref, r_key, use_pallas, w_arg)]


def _nafs_machine(graph, x, r_list: Sequence[float]):
    """Shared NAFS machinery: multi-r propagation + online hop softmax.

    All r share the edge structure, so the whole ensemble propagates as
    ONE multi-weight SpMM per hop (the per-edge row gather is payload-
    size-independent — R feature blocks cost the same gather as one), and
    the softmax-over-hops weighting runs ONLINE: exp(cos) is bounded
    (cos ∈ [-1, 1]), so accumulating numerator/denominator is the exact
    softmax without materializing the (K+1, R, N, D) hop stack.

    Scatter backend on accelerators: one diag/hub-split one-hot MXU
    kernel per r (measured fastest — see ``_nafs_prop_pallas``); CPU uses
    the shared-gather multi-weight segment path.

    Returns ``(use_pallas, w_arg, xref, init_carry)`` — on the segment
    path ``w_arg`` is ``((src, dst, w_stack), sorted_by_dst)``.  The prepared
    adjacency is cached per (graph, r_list) — preparation is host-side
    and worth reusing across sweep hops and repeated calls.  Every array
    is threaded through jit as an ARGUMENT, never a closure (a closure
    would constant-fold megabytes of edge data into the program).
    """
    import weakref

    x = jnp.asarray(x, jnp.float32)
    r_key = tuple(float(r) for r in r_list)
    use_pallas = jax.default_backend() not in ("cpu",)

    w_arg = None
    for ref, key, pal, cached in _MACHINE_CACHE:
        if ref() is graph and key == r_key and pal == use_pallas:
            w_arg = cached
            break
    if w_arg is None:
        adjs = [symmetric_normalized_weights(graph, r=r) for r in r_list]
        if use_pallas:
            from sgl_tpu.kernels.pallas_spmm import prepare_chunked

            w_arg = tuple(prepare_chunked(a) for a in adjs)
        else:
            w_arg = (
                adjs[0].src,
                adjs[0].dst,
                jnp.stack([a.w for a in adjs]),
            )
            srt = bool(adjs[0].sorted_by_dst)
            w_arg = (w_arg, srt)
        _MACHINE_CACHE.append((weakref.ref(graph), r_key, use_pallas, w_arg))
        del _MACHINE_CACHE[:-4]  # keep the cache tiny

    ref_norm = jnp.linalg.norm(x, axis=1) + 1e-10  # (N,)
    xref = (x, ref_norm)
    h0 = jnp.broadcast_to(x[None], (len(r_list), *x.shape))
    e0 = _nafs_weight_of(xref, h0)
    init_carry = (h0, e0[..., None] * h0, e0)
    return use_pallas, w_arg, xref, init_carry


_NAFS_OUT = {}  # method -> module-level jitted carry->features (cache-stable)


def _nafs_ensemble(stack: jnp.ndarray, method: str) -> jnp.ndarray:
    if method == "mean":
        return stack.mean(axis=0)
    if method == "max":
        return stack.max(axis=0)
    if method == "concat":
        return jnp.moveaxis(stack, 0, 1).reshape(stack.shape[1], -1)
    raise ValueError("Method not Suppoted! Choose 'mean', 'max' or 'concat' !")


for _m in ("mean", "max", "concat"):
    _NAFS_OUT[_m] = jax.jit(
        lambda c, _m=_m: _nafs_ensemble(c[1] / c[2][..., None], _m)
    )


def nafs_smooth_features(
    graph, x, hops: int, r_list: Sequence[float], method: str
) -> jnp.ndarray:
    """NAFS hop-adaptive smoothing with an r-ensemble, vectorized
    (reference loops at ``node_clustering.py:205-252`` / ``link_prediction.py:233-280``).

    For each r: propagate ``hops`` steps, weight hops per node by softmaxed
    cosine similarity to hop 0; then ensemble over r by mean/max/concat
    ('simple' = last hop of the first r, no weighting).
    """
    x = jnp.asarray(x, jnp.float32)
    if method == "simple":
        adj = symmetric_normalized_weights(graph, r=r_list[0])
        return k_hop_propagate(adj, x, hops)[-1]

    use_pallas, w_arg, xref, init_carry = _nafs_machine(graph, x, r_list)
    if use_pallas:
        stack = _nafs_smooth_scan(w_arg, xref, init_carry, hops, True)
    else:
        ws, srt = w_arg
        stack = _nafs_smooth_scan(
            ws, xref, init_carry, hops, False, sorted_by_dst=srt
        )
    return _nafs_ensemble(stack, method)


def nafs_smooth_sweep(graph, x, hops, r_list: Sequence[float], method: str):
    """Yield ``(hop, smoothed_features)`` for every requested hop count,
    sharing propagation across the sweep.

    Hop ``h+1``'s online-softmax accumulators extend hop ``h``'s, so a
    sweep over ``hops`` costs ``max(hops)`` SpMM steps total instead of
    ``sum(hops)`` (the NAFS tasks sweep 0..19: 19 steps instead of 190),
    with ONE compiled step function instead of one scan per hop count.
    """
    hops = sorted({int(h) for h in hops})
    if method == "simple":
        adj = symmetric_normalized_weights(graph, r=r_list[0])
        if jax.default_backend() not in ("cpu",):
            from sgl_tpu.kernels.pallas_spmm import prepare_chunked

            adj = prepare_chunked(adj)
        h = jnp.asarray(x, jnp.float32)
        one = jax.jit(lambda h: spmm(adj, h))
        cur = 0
        for target in hops:
            while cur < target:
                h = one(h)
                cur += 1
            yield target, h
        return

    use_pallas, w_arg, xref, carry = _nafs_machine(graph, x, r_list)
    if use_pallas:
        jit_step = lambda c: _nafs_step_pallas(w_arg, xref, c)
    else:
        ws, srt = w_arg
        jit_step = lambda c: _nafs_step_segment(ws, xref, c, sorted_by_dst=srt)
    out_of = _NAFS_OUT[method]
    cur = 0
    for target in hops:
        while cur < target:
            carry = jit_step(carry)
            cur += 1
        yield target, out_of(carry)


class NodeClusteringNAFS(BaseTask):
    """Training-free NAFS clustering (reference ``node_clustering.py:121-258``)."""

    def __init__(
        self,
        dataset,
        hops=20,
        method: str = "mean",
        seed: int = 42,
        n_init: int = 20,
        r_list: Sequence[float] = (0.5, 0.4, 0.3, 0.2, 0.1, 0.0),
        verbose: bool = True,
    ):
        super().__init__()
        method = method.lower()
        if method not in ("mean", "max", "concat", "simple"):
            raise ValueError(
                "Method not Suppoted! Choose 'mean', 'max' or 'concat' !"
            )
        self._dataset = dataset
        self._method = method
        self._r_list = list(r_list)
        self._hops = range(hops) if isinstance(hops, int) else hops
        self._seed = seed
        self._n_clusters = dataset.num_classes
        self._n_init = n_init
        self._verbose = verbose
        (
            self._best_hop_acc,
            self._best_hop_nmi,
            self._best_hop_adjscore,
            self._acc,
            self._nmi,
            self._adjscore,
        ) = self._execute()

    acc = property(lambda self: self._acc)
    nmi = property(lambda self: self._nmi)
    adjscore = property(lambda self: self._adjscore)
    best_hop_acc = property(lambda self: self._best_hop_acc)
    best_hop_nmi = property(lambda self: self._best_hop_nmi)
    best_hop_adjscore = property(lambda self: self._best_hop_adjscore)

    def _execute(self):
        set_seed(self._seed)
        ds = self._dataset
        labels = np.asarray(ds.y).reshape(-1)
        best = {"acc": (0, 0.0), "nmi": (0, 0.0), "ari": (0, 0.0)}
        t = time.time()
        for hop, feats in nafs_smooth_sweep(
            ds.graph, ds.x, self._hops, self._r_list, self._method
        ):
            km = KMeans(
                n_clusters=self._n_clusters,
                n_init=self._n_init,
                random_state=self._seed,
            )
            y_pred = km.fit_predict(np.asarray(feats))
            acc, nmi, ari = clustering_metrics(
                labels, y_pred
            ).evaluationClusterModelFromLabel()
            if self._verbose:
                print(
                    f"hops:{hop:2d} acc: {acc:.4f} nmi: {nmi:.4f} "
                    f"adjscore: {ari:.4f} time: {time.time() - t:.4f} seconds"
                )
            for key, v in zip(("acc", "nmi", "ari"), (acc, nmi, ari)):
                if v > best[key][1]:
                    best[key] = (hop, v)
            t = time.time()
        return (
            best["acc"][0],
            best["nmi"][0],
            best["ari"][0],
            best["acc"][1],
            best["nmi"][1],
            best["ari"][1],
        )
