"""SGAP model composition template, TPU-native.

The reference's ``BaseSGAPModel`` (``sgl/models/base_model.py:8-67``) is a
stateful ``nn.Module`` whose ``preprocess`` caches propagated features and
whose ``forward(idx, device)`` slices host rows and copies to device per
step.  Here the template splits cleanly along the JAX functional boundary:

* ``preprocess(graph)`` — runs the (training-free) propagation once on
  device, caching either the eagerly aggregated features (non-learnable
  message op) or the stacked ``(K+1, N, D)`` hop tensor (learnable op).
  This preserves the reference's eager-vs-lazy split exactly
  (``base_model.py:27-33``) — SURVEY.md flags it as accuracy-critical.
* ``net`` — a Flax module (learnable msg op + base net) whose params are
  owned by the task's train state, applied inside one jitted step.
* ``batch_input(idx)`` — pure slicing of cached device arrays; inside a
  jitted step this is a device-side gather, not a host copy.
* ``postprocess(graph, logits)`` — softmax → propagate → aggregate
  (``base_model.py:38-50``), run on device (the reference forces CPU numpy).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sgl_tpu.graph.graph import Graph
from sgl_tpu.ops.graph_ops import GraphOp
from sgl_tpu.ops.message_ops import LEARNABLE_AGGR_TYPES, MessageOp


class SGAPNet(nn.Module):
    """The trainable stage-2 network: (learnable msg op ∘) base model.

    ``node_major=True`` means batch features arrive as ``(B, K, D)``
    (transpose-free layout for per-node hop attention; see
    ``LearnableWeightedMessageOp``)."""

    msg_op: Optional[MessageOp]  # None when aggregation was eager
    base_model: nn.Module
    node_major: bool = False

    @nn.compact
    def __call__(self, feats, train: bool = False):
        h = feats
        if self.msg_op is not None:
            # only learnable message ops live inside the net; all take `train`
            if self.node_major:
                h = self.msg_op(h, train=train, node_major=True)
            else:
                h = self.msg_op(h, train=train)
        return _apply_base(self.base_model, h, train)


def _apply_base(base: nn.Module, h, train: bool):
    import inspect

    sig = inspect.signature(type(base).__call__)
    if "train" in sig.parameters:
        return base(h, train=train)
    return base(h)


def eager_aggregate(op: MessageOp, hops: jnp.ndarray) -> jnp.ndarray:
    """Apply a parameter-free message op outside a param context."""
    return op.apply({}, hops)


class SGAPModel:
    """Composable SGAP model: pre graph-op, pre message-op, base net,
    optional post graph-op + message-op."""

    def __init__(
        self,
        prop_steps: int,
        feat_dim: int,
        output_dim: int,
        *,
        pre_graph_op: Optional[GraphOp] = None,
        pre_msg_op: Optional[MessageOp] = None,
        base_model: Optional[nn.Module] = None,
        post_graph_op: Optional[GraphOp] = None,
        post_msg_op: Optional[MessageOp] = None,
    ):
        self.prop_steps = prop_steps
        self.feat_dim = feat_dim
        self.output_dim = output_dim
        self.pre_graph_op = pre_graph_op
        self.pre_msg_op = pre_msg_op
        self.base_model = base_model
        self.post_graph_op = post_graph_op
        self.post_msg_op = post_msg_op

        self.pre_msg_learnable: bool = bool(
            pre_msg_op is not None and pre_msg_op.aggr_type in LEARNABLE_AGGR_TYPES
        )
        # node_major=True caches the hop stack as (N, K+1, D) and runs the
        # attention ops transpose-free.  Measured on v5e it LOSES to
        # hop-major (GAMLP fwd 2.6 vs 0.9 ms): with K+1 ≈ 4 in the sublane
        # dimension the (B, K, D) tiles are mostly padding, while XLA fuses
        # the hop-major transposes well.  Kept as an opt-in (flip before
        # preprocess) for deep-hop regimes where K+1 fills the 8-sublane
        # tile; requires a pre_msg_op with supports_node_major.
        self.node_major: bool = False
        self.processed_feature: Optional[jnp.ndarray] = None  # (N,D') / (K+1,N,D) / (N,K+1,D)
        # set by preprocess(prop_cache=...): amortized preprocess seconds
        self.preprocess_time_estimate: Optional[float] = None

    # -- stage 1: pre-propagation (training-free) --------------------------
    def preprocess(self, graph: Graph, x=None, dtype=None, prop_cache=None) -> None:
        """Run the training-free propagation and cache the result.

        ``dtype=jnp.bfloat16`` opts the whole precompute into bf16:
        the Pallas SpMM takes a single-pass kernel variant (+25%
        throughput measured) and the cached hop stack halves in memory.
        Default keeps f32 fidelity (reference-faithful numerics).

        ``prop_cache`` (a :class:`sgl_tpu.search.prop_cache.PropagationCache`)
        shares the hop stack across models on the same graph/op config —
        used by NAS, where the reference recomputes the full propagation
        per trial.  Sets ``self.preprocess_time_estimate`` (amortized
        seconds, for the NAS time objective)."""
        if hasattr(self.processed_feature, "rows"):
            # externally precomputed cache (HostHops from an out-of-core
            # run / ShardedHops from the distributed runtime): it cannot
            # be re-derived here, and re-preprocessing would defeat the
            # point — keep it
            return
        if x is None:
            x = graph.x
        if dtype is not None:
            x = jnp.asarray(x, dtype)
        if prop_cache is not None and self.pre_graph_op is not None:
            hops, est = prop_cache.hops_for(graph, x, self.pre_graph_op, dtype=dtype)
            self.preprocess_time_estimate = est
            if self.pre_msg_learnable:
                if self.node_major:
                    hops = jnp.moveaxis(hops, 0, 1)
                self.processed_feature = hops
            else:
                # the stack already exists in the cache, so the fused
                # O(N·D) propagate_aggregate path buys nothing here —
                # aggregate eagerly from the shared stack
                self.processed_feature = eager_aggregate(self.pre_msg_op, hops)
            return
        if self.pre_graph_op is not None:
            if self.pre_msg_learnable:
                hops = self.pre_graph_op.propagate(graph, x)
                if self.node_major:
                    hops = jnp.moveaxis(hops, 0, 1)  # one-time (N, K+1, D)
                self.processed_feature = hops
                return
            # linear aggregations fuse into the propagation scan: peak
            # memory O(N·D) instead of O((K+1)·N·D)
            w = self.pre_msg_op.linear_weights(self.pre_graph_op.prop_steps + 1)
            if w is not None:
                self.processed_feature = self.pre_graph_op.propagate_aggregate(
                    graph, x, w
                )
            else:
                hops = self.pre_graph_op.propagate(graph, x)
                self.processed_feature = eager_aggregate(self.pre_msg_op, hops)
        else:
            self.pre_msg_learnable = False
            self.processed_feature = jnp.asarray(x, dtype or jnp.float32)

    def attach_host_hops(self, host_hops) -> None:
        """Use a host-resident hop store (``utils.hop_store.HostHops``,
        e.g. memmaps written by an out-of-core precompute) as this model's
        feature cache — training then touches O(batch) rows per step and
        the stack never enters device memory whole.  Non-learnable message
        ops aggregate per gathered batch on device."""
        if host_hops.num_hops != self.prop_steps + 1:
            raise ValueError(
                f"store has {host_hops.num_hops} hops, model expects "
                f"{self.prop_steps + 1}"
            )
        if not self.pre_msg_learnable and host_hops.agg is None:
            host_hops.agg = lambda stack: eager_aggregate(
                self.pre_msg_op, stack
            )
        self.processed_feature = host_hops

    # -- stage 2: training network -----------------------------------------
    @property
    def net(self) -> SGAPNet:
        return SGAPNet(
            msg_op=self.pre_msg_op if self.pre_msg_learnable else None,
            base_model=self.base_model,
            node_major=self.node_major,
        )

    def batch_input(self, idx) -> jnp.ndarray:
        """Slice cached features for a node-index batch (device gather)."""
        if self.processed_feature is None:
            raise RuntimeError("call preprocess() before training")
        if hasattr(self.processed_feature, "rows"):
            # node-sharded hop cache (parallel.ShardedHops): rows come out
            # through a psum lookup, never by replicating the stack
            feats = self.processed_feature.rows(idx)
            if self.pre_msg_learnable and self.node_major and feats.ndim == 3:
                feats = jnp.moveaxis(feats, 0, 1)
            return feats
        if self.pre_msg_learnable and not self.node_major:
            return jnp.take(self.processed_feature, idx, axis=1)
        return jnp.take(self.processed_feature, idx, axis=0)

    def init(self, rng: jax.Array, example_idx=None) -> Any:
        if example_idx is None:
            example_idx = jnp.arange(min(2, self._num_cached_nodes()))
        feats = self.batch_input(example_idx)
        return self.net.init(rng, feats, train=False)

    def apply(self, params, idx, train: bool = False, rngs=None) -> jnp.ndarray:
        feats = self.batch_input(idx)
        return self.net.apply(params, feats, train=train, rngs=rngs)

    def _num_cached_nodes(self) -> int:
        pf = self.processed_feature
        if hasattr(pf, "num_nodes"):  # sharded hop cache
            return int(pf.num_nodes)
        hop_major = self.pre_msg_learnable and not self.node_major
        return int(pf.shape[1] if hop_major else pf.shape[0])

    # -- stage 3: post-propagation (training-free) --------------------------
    def postprocess(self, graph: Graph, logits: jnp.ndarray) -> jnp.ndarray:
        if self.post_graph_op is None:
            return logits
        if self.post_msg_op.aggr_type in LEARNABLE_AGGR_TYPES:
            raise ValueError(
                "Learnable weighted message operator is not supported in the "
                "post-processing phase!"
            )
        probs = jax.nn.softmax(logits, axis=1)
        hops = self.post_graph_op.propagate(graph, probs)
        return eager_aggregate(self.post_msg_op, hops)
