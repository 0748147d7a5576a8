"""Distributed node classification (reference ``sgl/tasks/node_classification_dist.py:27-124``).

The reference spawns one process per GPU with NCCL DDP over the MLP, and
famously *discards* the spawned workers' trained weights (SURVEY.md §3.2).
Here distribution is declarative: one process, one ``(data, graph)`` mesh —
pre-propagation runs ring-edge-partitioned over the ``graph`` axis, training
runs data-parallel over ``data`` with grads psum'd by GSPMD, and the updated
replicated state IS the result.  Multi-host: call
``jax.distributed.initialize()`` first; nothing else changes.
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sgl_tpu.models.base import SGAPModel, eager_aggregate
from sgl_tpu.tasks.base_task import BaseTask
from sgl_tpu.tasks.utils import (
    adam_l2,
    batch_iterator,
    init_train_state,
    set_seed,
    weighted_cross_entropy,
)


class NodeClassificationDist(BaseTask):
    def __init__(
        self,
        dataset,
        model: SGAPModel,
        lr: Optional[float] = None,
        weight_decay: Optional[float] = None,
        epochs: Optional[int] = None,
        mesh_shape: Optional[Tuple[int, int]] = None,
        loss_fn=weighted_cross_entropy,
        seed: Optional[int] = None,
        train_batch_size: Optional[int] = None,
        verbose: bool = True,
        sharded_hops: bool = True,
        precompute_dtype=None,  # jnp.bfloat16: half ICI ring volume + cache
        config=None,  # TrainConfig: defaults for the Nones above
    ):
        super().__init__()
        from sgl_tpu.utils.config import TrainConfig

        r = (config or TrainConfig()).resolve(
            lr=lr, weight_decay=weight_decay, epochs=epochs, seed=seed,
            train_batch_size=train_batch_size,
        )
        self._dataset = dataset
        self._model = model
        self._lr = r["lr"]
        self._weight_decay = r["weight_decay"]
        self._epochs = r["epochs"]
        self._loss_fn = loss_fn
        self._seed = r["seed"]
        self._train_batch_size = r["train_batch_size"]
        self._verbose = verbose
        # keep the hop stack node-sharded over the graph axis end-to-end
        # (per-device memory O(N/P·D·K)); False restores the replicated
        # (K+1, N, D) cache for debugging/tiny graphs
        self._sharded_hops = sharded_hops
        self._precompute_dtype = precompute_dtype
        # deferred import: sgl_tpu.parallel imports tasks.utils, which would
        # cycle through the tasks package __init__
        from sgl_tpu.parallel import make_mesh

        self._mesh = make_mesh(mesh_shape)
        self._test_acc = self._execute()

    test_acc = property(lambda self: self._test_acc)

    @staticmethod
    def _chunked_partition_kwargs(x, precompute_dtype) -> dict:
        """Layout-picker inputs for ``partition_adj_chunked``.

        The (tile_rows, chunk) picker needs the feature width to keep its
        VMEM bound honest at wide D, and ``measure="auto"`` settles
        wide-vs-128 block decisions by a real on-device A/B (seconds, once
        per task) instead of the cost model's margin.  Two invariants,
        both round-5 review fixes:

        * the measured pipeline is whatever actually rides the ring — the
          precompute dtype when set, else the features' OWN dtype (bf16
          features take the single-pass kernel, whose gather/MXU balance
          differs from f32's hi/lo pair);
        * multi-PROCESS runs keep the deterministic cost model: a
          per-host A/B could settle close candidates differently under
          chip noise, and the processes would then compile different
          static ring layouts (divergent shapes under shard_map = a hung
          collective).
        """
        # shape/dtype only — no np.asarray, which would round-trip a
        # device-resident feature matrix through the host
        xh = x if hasattr(x, "dtype") and hasattr(x, "shape") else np.asarray(x)
        return {
            "feat_dim": int(xh.shape[1]),
            "feat_dtype": precompute_dtype or np.dtype(xh.dtype),
            "measure": "auto" if jax.process_count() == 1 else False,
        }

    def _execute(self) -> float:
        from sgl_tpu.parallel import (
            k_hop_propagate_dist,
            make_parallel_train_step,
            partition_adj,
            partition_adj_chunked,
            replicate_state,
        )

        ds, model, mesh = self._dataset, self._model, self._mesh
        rng = set_seed(self._seed)
        np_rng = np.random.default_rng(self._seed)
        n_graph = mesh.shape["graph"]

        # stage 1: distributed pre-propagation over the graph axis.  On TPU
        # each device runs the Pallas chunk-layout kernel per ring bucket
        # (5x the XLA segment path per chip); CPU test meshes keep segment.
        on_tpu = jax.default_backend() not in ("cpu",)
        partition = partition_adj_chunked if on_tpu else partition_adj
        t0 = time.time()
        adj = model.pre_graph_op.construct_adj(ds.graph)
        kw = (
            self._chunked_partition_kwargs(ds.x, self._precompute_dtype)
            if partition is partition_adj_chunked
            else {}
        )
        dadj = partition(adj, n_graph, **kw)
        x_in = jnp.asarray(ds.x)
        if self._precompute_dtype is not None:
            # bf16 rides the ring as-is (pad_features preserves it):
            # half the per-hop ICI rotation volume, half the hop cache
            x_in = x_in.astype(self._precompute_dtype)
        hops = k_hop_propagate_dist(
            mesh, dadj, x_in, model.pre_graph_op.prop_steps, axis="graph",
            keep_sharded=self._sharded_hops,
        )
        if self._sharded_hops:
            # the stack stays node-sharded (ShardedHops); batch rows come
            # out through its psum lookup in model.batch_input.  Eager
            # aggregation runs inside the sharded domain too.
            if model.pre_msg_learnable:
                model.processed_feature = hops
            else:
                model.processed_feature = hops.aggregate(
                    lambda h: eager_aggregate(model.pre_msg_op, h)
                )
        elif model.pre_msg_learnable:
            # match SGAPModel.preprocess: node-major cache when the op
            # supports the transpose-free attention layout
            model.processed_feature = (
                jnp.moveaxis(hops, 0, 1) if model.node_major else hops
            )
        else:
            model.processed_feature = eager_aggregate(model.pre_msg_op, hops)
        if self._verbose:
            print(f"Distributed preprocessing done in {time.time() - t0:.4f}s")

        labels = jnp.asarray(np.asarray(ds.y).reshape(-1), jnp.int32)
        train_idx = np.asarray(ds.train_idx)
        val_idx = np.asarray(ds.val_idx)
        test_idx = np.asarray(ds.test_idx)

        # stage 2: data-parallel training
        net = model.net
        params = model.init(rng)
        tx = adam_l2(self._lr, self._weight_decay)
        state = replicate_state(init_train_state(rng, params, tx), mesh)
        step, shard_batch = make_parallel_train_step(
            lambda p, f, train, rngs: net.apply(p, f, train=train, rngs=rngs),
            tx,
            mesh,
            loss_fn=self._loss_fn,
            node_major_feats=model.node_major,
        )

        @jax.jit
        def logits_of(params, feats):
            return net.apply(params, feats, train=False)

        def _head(rows_l, params):
            f = rows_l
            if f.ndim == 3 and model.node_major:
                f = jnp.moveaxis(f, 0, 1)
            return net.apply(params, f, train=False)

        if self._sharded_hops:
            # evaluate ALL nodes per-shard (the hop rows never leave their
            # devices; only the small (N, C) logits assemble), then read
            # off val/test predictions — O(N·C) instead of a per-eval
            # (K+1, B, D) psum gather
            pf_eval = self._model.processed_feature

            def eval_accs(params, idxs):
                # ONE full-graph forward per epoch, shared by every split
                # (val + test) — the O(N) pass is the dominant eval cost
                logits_pad = pf_eval.map_rows(_head, params)
                preds = jnp.argmax(logits_pad, axis=1)
                out = []
                for idx in idxs:
                    idx = jnp.asarray(idx)
                    lookup = idx if pf_eval.new_of is None else jnp.take(
                        pf_eval.new_of, idx
                    )
                    out.append(
                        float(jnp.mean(jnp.take(preds, lookup) == labels[idx]))
                    )
                return out
        else:
            def eval_accs(params, idxs):
                out = []
                for idx in idxs:
                    feats = model.batch_input(jnp.asarray(idx))
                    lg = logits_of(params, feats)
                    out.append(float(jnp.mean(
                        jnp.argmax(lg, axis=1) == labels[jnp.asarray(idx)]
                    )))
                return out

        n_data = mesh.shape["data"]

        def _pad_batch(b_idx, w):
            """Pad to a multiple of the data axis with zero-weight wrap
            rows (the weighted loss ignores them) so every batch shards."""
            rem = (-len(b_idx)) % n_data
            if rem:
                # np.resize tiles cyclically — a batch SMALLER than the
                # data axis (tiny train split) still fills all rem rows
                b_idx = np.concatenate([b_idx, np.resize(b_idx, rem)])
                w = np.concatenate([w, np.zeros(rem, w.dtype)])
            return b_idx, w

        best_val, best_test = 0.0, 0.0
        for epoch in range(self._epochs):
            t = time.time()
            losses = []
            for b_idx, w in batch_iterator(
                train_idx, self._train_batch_size, shuffle=True, rng=np_rng
            ):
                b_idx, w = _pad_batch(np.asarray(b_idx), np.asarray(w))
                feats = model.batch_input(jnp.asarray(b_idx))
                f, l, wj = shard_batch(
                    feats, labels[jnp.asarray(b_idx)], jnp.asarray(w)
                )
                state, loss, acc = step(state, f, l, wj)
                losses.append(float(loss))
            acc_val, acc_test = eval_accs(state.params, (val_idx, test_idx))
            if self._verbose:
                print(
                    f"Epoch: {epoch + 1:03d} loss_train: {np.mean(losses):.4f} "
                    f"acc_val: {acc_val:.4f} acc_test: {acc_test:.4f} "
                    f"time: {time.time() - t:.4f}s"
                )
            if acc_val > best_val:
                best_val, best_test = acc_val, acc_test

        # stage 3: post-propagation (distributed, same ring partition)
        if model.post_graph_op is not None:
            pf = model.processed_feature
            if self._sharded_hops:
                # full-graph logits WITHOUT replicating the hop stack: the
                # net runs on each device's owned rows (map_rows keeps the
                # node axis sharded); only the small (N, C) logits are
                # un-permuted back to dataset order
                logits_pad = pf.map_rows(_head, state.params)
                outputs = logits_pad[: ds.num_node]
                if pf.new_of is not None:
                    outputs = jnp.take(outputs, pf.new_of, axis=0)
            else:
                all_idx = jnp.arange(ds.num_node)
                outputs = logits_of(state.params, model.batch_input(all_idx))
            probs = jax.nn.softmax(outputs, axis=1)
            post_adj = model.post_graph_op.construct_adj(ds.graph)
            post_dadj = partition(post_adj, n_graph)
            post_hops = k_hop_propagate_dist(
                mesh, post_dadj, probs, model.post_graph_op.prop_steps, axis="graph"
            )
            final = eager_aggregate(model.post_msg_op, post_hops)
            acc_val = float(
                jnp.mean(jnp.argmax(final[jnp.asarray(val_idx)], 1) == labels[jnp.asarray(val_idx)])
            )
            acc_test = float(
                jnp.mean(jnp.argmax(final[jnp.asarray(test_idx)], 1) == labels[jnp.asarray(test_idx)])
            )
            if acc_val > best_val:
                best_val, best_test = acc_val, acc_test

        if self._verbose:
            print(f"Best val: {best_val:.4f}, best test: {best_test:.4f}")
        self.state = state  # trained weights are kept, not discarded
        return best_test
