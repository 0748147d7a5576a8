"""Graph-level SGAP models: propagate → aggregate hops → pool per graph → MLP.

Extends the SGAP paradigm (pre-propagate / train / post) to graph
classification — functionality the reference stubs out
(``sgl/data/base_dataset.py:124-126``).  The design keeps SGAP's scaling
property: the graph structure is only touched in the training-free
precompute, which runs ONCE over the block-diagonal batch of all graphs
(one SpMM pipeline for the whole dataset); training is an MLP over pooled
per-graph rows.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sgl_tpu.graph.batch import GraphBatch
from sgl_tpu.models.base import _apply_base, eager_aggregate
from sgl_tpu.models.blocks import LogisticRegression, MultiLayerPerceptron
from sgl_tpu.ops.graph_ops import GraphOp, LaplacianGraphOp
from sgl_tpu.ops.message_ops import (
    ConcatMessageOp,
    LEARNABLE_AGGR_TYPES,
    LastMessageOp,
    MessageOp,
)

READOUTS = ("mean", "sum", "max")


def segment_readout(
    h: jnp.ndarray,
    graph_ids: jnp.ndarray,
    num_graphs: int,
    node_counts: jnp.ndarray,
    kind: str = "mean",
) -> jnp.ndarray:
    """Pool node rows ``(N, D)`` into per-graph rows ``(G, D)``.

    ``mean`` divides by the REAL node count per graph so padding rows
    (zero-featured, assigned to the last graph) cannot dilute it.
    """
    if kind == "mean":
        s = jax.ops.segment_sum(h, graph_ids, num_segments=num_graphs)
        return s / jnp.maximum(node_counts[:, None], 1).astype(s.dtype)
    if kind == "sum":
        return jax.ops.segment_sum(h, graph_ids, num_segments=num_graphs)
    if kind == "max":
        return jax.ops.segment_max(h, graph_ids, num_segments=num_graphs)
    raise ValueError(f"unknown readout {kind!r}; choose from {READOUTS}")


class GraphReadoutNet(nn.Module):
    """Trainable stage 2 for graph-level SGAP: (learnable msg op ∘)
    per-graph readout ∘ base model.  ``readout=None`` means the cached
    features are already pooled (non-learnable msg op path)."""

    msg_op: Optional[MessageOp]
    base_model: nn.Module
    readout: Optional[str]
    num_graphs: int = 0

    @nn.compact
    def __call__(self, feats, graph_ids=None, node_counts=None, train: bool = False):
        h = feats
        if self.msg_op is not None:
            h = self.msg_op(h, train=train)
        if self.readout is not None:
            h = segment_readout(
                h, graph_ids, self.num_graphs, node_counts, self.readout
            )
        return _apply_base(self.base_model, h, train)


class GraphLevelSGAPModel:
    """SGAP composition for graph classification.

    ``preprocess(batch)`` propagates the block-diagonal batch once; with a
    non-learnable message op the hop aggregation AND the readout both fold
    into the precompute (cached input is ``(G, D')`` — training touches
    nothing graph-shaped), while a learnable op keeps the ``(K+1, N, D)``
    hop stack and pools inside the train step.
    """

    def __init__(
        self,
        prop_steps: int,
        feat_dim: int,
        output_dim: int,
        *,
        readout: str = "mean",
        pre_graph_op: Optional[GraphOp] = None,
        pre_msg_op: Optional[MessageOp] = None,
        base_model: Optional[nn.Module] = None,
    ):
        if readout not in READOUTS:
            raise ValueError(f"unknown readout {readout!r}")
        self.prop_steps = prop_steps
        self.feat_dim = feat_dim
        self.output_dim = output_dim
        self.readout = readout
        self.pre_graph_op = pre_graph_op
        self.pre_msg_op = pre_msg_op
        self.base_model = base_model
        self.pre_msg_learnable: bool = bool(
            pre_msg_op is not None
            and pre_msg_op.aggr_type in LEARNABLE_AGGR_TYPES
        )
        self.processed_feature: Optional[jnp.ndarray] = None
        self._batch: Optional[GraphBatch] = None

    # -- stage 1 -------------------------------------------------------------
    def preprocess(self, batch: GraphBatch, dtype=None) -> None:
        self._batch = batch
        x = batch.graph.x
        if dtype is not None:
            x = jnp.asarray(x, dtype)
        hops = self.pre_graph_op.propagate(batch.graph, x)
        if self.pre_msg_learnable:
            self.processed_feature = hops  # (K+1, N, D)
            return
        h = eager_aggregate(self.pre_msg_op, hops)  # (N, D')
        self.processed_feature = segment_readout(
            h,
            jnp.asarray(batch.graph_ids),
            batch.num_graphs,
            jnp.asarray(batch.node_counts),
            self.readout,
        )  # (G, D')

    # -- stage 2 -------------------------------------------------------------
    @property
    def net(self) -> GraphReadoutNet:
        if self.pre_msg_learnable:
            return GraphReadoutNet(
                msg_op=self.pre_msg_op,
                base_model=self.base_model,
                readout=self.readout,
                num_graphs=self._batch.num_graphs,
            )
        return GraphReadoutNet(
            msg_op=None, base_model=self.base_model, readout=None
        )

    def net_inputs(self):
        """(feats, graph_ids, node_counts) for a full-batch step: the pooled
        ``(G, D')`` cache (ids None), or the hop stack plus segment ids."""
        if self.processed_feature is None:
            raise RuntimeError("call preprocess() before training")
        if self.pre_msg_learnable:
            return (
                self.processed_feature,
                jnp.asarray(self._batch.graph_ids),
                jnp.asarray(self._batch.node_counts),
            )
        return self.processed_feature, None, None

    def init(self, rng: jax.Array) -> Any:
        feats, gids, counts = self.net_inputs()
        return self.net.init(rng, feats, gids, counts, train=False)


class GraphSGC(GraphLevelSGAPModel):
    """SGC for graphs: Laplacian propagation, last hop, readout, LogReg."""

    def __init__(self, prop_steps, feat_dim, output_dim, readout="mean", r=0.5):
        super().__init__(
            prop_steps,
            feat_dim,
            output_dim,
            readout=readout,
            pre_graph_op=LaplacianGraphOp(prop_steps, r=r),
            pre_msg_op=LastMessageOp(),
            base_model=LogisticRegression(output_dim=output_dim),
        )


class GraphSIGN(GraphLevelSGAPModel):
    """SIGN for graphs: concat all hops, readout, MLP."""

    def __init__(
        self,
        prop_steps,
        feat_dim,
        output_dim,
        hidden_dim=64,
        num_layers=2,
        readout="mean",
        r=0.5,
    ):
        super().__init__(
            prop_steps,
            feat_dim,
            output_dim,
            readout=readout,
            pre_graph_op=LaplacianGraphOp(prop_steps, r=r),
            pre_msg_op=ConcatMessageOp(start=0, end=prop_steps + 1),
            base_model=MultiLayerPerceptron(
                hidden_dim=hidden_dim,
                num_layers=num_layers,
                output_dim=output_dim,
            ),
        )
