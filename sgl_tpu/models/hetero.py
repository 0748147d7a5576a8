"""Heterogeneous (NARS-style) SGAP models
(reference ``sgl/models/base_model.py:69-222`` + ``sgl/models/hetero/``).

NARS recipe: sample relation-subset subgraphs, propagate features per
subgraph, learn per-subgraph weights.  The reference stores ragged Python
lists of per-subgraph tensors; here every propagated subgraph slice is the
same ``(K+1, N_pred, D)`` shape (prediction-class rows), so the whole
precompute stacks into one ``(K+1, S, N_pred, D)`` array and the
aggregators become einsums.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sgl_tpu.models.blocks import (
    FastOneDimConvolution,
    MultiLayerPerceptron,
    OneDimConvolution,
)
from sgl_tpu.ops.graph_ops import GraphOp, LaplacianGraphOp
from sgl_tpu.ops.message_ops import (
    LEARNABLE_AGGR_TYPES,
    MessageOp,
    ProjectedConcatMessageOp,
)


class HeteroSGAPNet(nn.Module):
    """Trainable stage: subgraph aggregator → message op → base model."""

    aggregator: nn.Module
    msg_op: Optional[MessageOp]
    base_model: nn.Module

    @nn.compact
    def __call__(self, feats, train: bool = False):
        # feats: (K+1, S, B, D) -> aggregator layout (K+1, B, D, S)
        h = jnp.transpose(feats, (0, 2, 3, 1))
        agg = self.aggregator(h)  # (K+1, B, D)
        if self.msg_op is not None:
            if self.msg_op.aggr_type in LEARNABLE_AGGR_TYPES:
                agg = self.msg_op(agg, train=train)
            else:
                agg = self.msg_op(agg)
        return self.base_model(agg, train=train)


class FastHeteroSGAPNet(nn.Module):
    """Fast stage: one matmul over packed ``(B, D, S*(K+1))`` features."""

    aggregator: nn.Module
    base_model: nn.Module

    @nn.compact
    def __call__(self, feats, train: bool = False):
        return self.base_model(self.aggregator(feats), train=train)


class _HeteroPreprocessMixin:
    """Shared NARS preprocessing (reference ``base_model.py:85-125``)."""

    def _propagate_subgraphs(
        self,
        dataset,
        predict_class: str,
        random_subgraph_num: int = -1,
        subgraph_edge_type_num: int = -1,
        subgraph_list=None,
        seed: int = 42,
    ) -> jnp.ndarray:
        if subgraph_list is None and (
            random_subgraph_num == -1 or subgraph_edge_type_num == -1
        ):
            raise ValueError(
                "Either subgraph_list or (random_subgraph_num, "
                "subgraph_edge_type_num) should be provided!"
            )
        if subgraph_list is not None and (
            random_subgraph_num != -1 or subgraph_edge_type_num != -1
        ):
            raise ValueError(
                "subgraph_list is provided, random_subgraph_num and "
                "subgraph_edge_type_num will be ignored!"
            )
        if predict_class not in dataset.node_types:
            raise ValueError("Please input valid node class for prediction!")

        if subgraph_list is None:
            subgraph_dict = dataset.nars_preprocess(
                dataset.edge_types,
                predict_class,
                random_subgraph_num,
                subgraph_edge_type_num,
                seed=seed,
            )
            subgraph_list = list(subgraph_dict.items())

        hg = dataset.data
        predict_start = hg.offset[predict_class]
        n_pred = hg.num_node[predict_class]
        kept = []
        for key, value in subgraph_list:
            endpoints = set()
            for et in key:
                parts = et.split("__")
                endpoints.update((parts[0], parts[-1]))
            if predict_class not in endpoints:
                continue
            kept.append(value)
        if not kept:
            raise ValueError("no sampled subgraph touches the predict class")
        # ONE block-diagonal propagation for all subgraphs (one compilation,
        # one SpMM pipeline per hop) instead of a per-subgraph loop whose
        # differing node counts would each recompile the scan.  Block-
        # diagonal symmetric normalization equals per-block normalization,
        # so the result is identical to per-subgraph propagation (tested).
        from sgl_tpu.graph.batch import batch_graphs

        batch = batch_graphs(
            [g.replace(x=np.asarray(f)) for g, f, _ in kept]
        )
        hops = self.pre_graph_op.propagate(batch.graph, batch.graph.x)
        offsets = np.concatenate([[0], np.cumsum(batch.node_counts)])
        per_subgraph = []
        for (graph, feature, node_id), off in zip(kept, offsets[:-1]):
            start = int(off) + int(
                np.searchsorted(np.asarray(node_id), predict_start)
            )
            per_subgraph.append(hops[:, start : start + n_pred, :])
        # (K+1, S, N_pred, D)
        return jnp.stack(per_subgraph, axis=1)


class HeteroSGAPModel(_HeteroPreprocessMixin):
    """NARS template (reference ``BaseHeteroSGAPModel``, ``base_model.py:69-141``)."""

    def __init__(
        self,
        prop_steps: int,
        feat_dim: int,
        output_dim: int,
        *,
        pre_graph_op: GraphOp,
        pre_msg_op: Optional[MessageOp],
        aggregator: nn.Module,
        base_model: nn.Module,
    ):
        self.prop_steps = prop_steps
        self.feat_dim = feat_dim
        self.output_dim = output_dim
        self.pre_graph_op = pre_graph_op
        self.pre_msg_op = pre_msg_op
        self.aggregator = aggregator
        self.base_model = base_model
        self.processed_feature: Optional[jnp.ndarray] = None

    def preprocess(self, dataset, predict_class, **kw) -> None:
        self.processed_feature = self._propagate_subgraphs(
            dataset, predict_class, **kw
        )

    @property
    def net(self) -> HeteroSGAPNet:
        return HeteroSGAPNet(
            aggregator=self.aggregator,
            msg_op=self.pre_msg_op,
            base_model=self.base_model,
        )

    def batch_input(self, idx) -> jnp.ndarray:
        return jnp.take(self.processed_feature, idx, axis=2)

    def init(self, rng, example_idx=None) -> Any:
        if example_idx is None:
            example_idx = jnp.arange(2)
        return self.net.init(rng, self.batch_input(example_idx), train=False)

    def postprocess(self, graph, logits):
        return logits


class FastHeteroSGAPModel(_HeteroPreprocessMixin):
    """Packed NARS template (reference ``FastBaseHeteroSGAPModel``,
    ``base_model.py:144-222``): features flattened to ``(N, D, S*(K+1))``
    (subgraph-major) for a single-matmul forward."""

    def __init__(
        self,
        prop_steps: int,
        feat_dim: int,
        output_dim: int,
        *,
        pre_graph_op: GraphOp,
        aggregator: nn.Module,
        base_model: nn.Module,
    ):
        self.prop_steps = prop_steps
        self.feat_dim = feat_dim
        self.output_dim = output_dim
        self.pre_graph_op = pre_graph_op
        self.aggregator = aggregator
        self.base_model = base_model
        self.processed_feature: Optional[jnp.ndarray] = None

    def preprocess(self, dataset, predict_class, **kw) -> None:
        hops = self._propagate_subgraphs(dataset, predict_class, **kw)
        k1, s, n, d = hops.shape
        # (K+1, S, N, D) -> (N, D, S, K+1) -> (N, D, S*(K+1)) subgraph-major
        packed = jnp.transpose(hops, (2, 3, 1, 0)).reshape(n, d, s * k1)
        self.processed_feature = packed
        self.num_subgraphs = s

    @property
    def net(self) -> FastHeteroSGAPNet:
        return FastHeteroSGAPNet(
            aggregator=self.aggregator, base_model=self.base_model
        )

    def batch_input(self, idx) -> jnp.ndarray:
        return jnp.take(self.processed_feature, idx, axis=0)

    def init(self, rng, example_idx=None) -> Any:
        if example_idx is None:
            example_idx = jnp.arange(2)
        return self.net.init(rng, self.batch_input(example_idx), train=False)

    def subgraph_weight(self, params):
        agg = params["params"]["aggregator"]
        return FastOneDimConvolution.subgraph_weight(
            agg, self.aggregator.num_subgraphs, self.aggregator.prop_steps
        )

    def postprocess(self, graph, logits):
        return logits


class NARS_SIGN(HeteroSGAPModel):
    """Laplacian / ProjectedConcat / OneDimConvolution + MLP
    (reference ``hetero/nars_sign.py:7``)."""

    def __init__(
        self,
        prop_steps: int,
        feat_dim: int,
        output_dim: int,
        hidden_dim: int,
        num_layers: int,
        random_subgraph_num: int,
    ):
        super().__init__(
            prop_steps,
            feat_dim,
            output_dim,
            pre_graph_op=LaplacianGraphOp(prop_steps, r=0.5),
            pre_msg_op=ProjectedConcatMessageOp(
                start=0,
                end=prop_steps + 1,
                hidden_dim=hidden_dim,
                num_layers=num_layers,
            ),
            aggregator=OneDimConvolution(
                num_subgraphs=random_subgraph_num,
                prop_steps=prop_steps + 1,
                feat_dim=feat_dim,
            ),
            base_model=MultiLayerPerceptron(
                hidden_dim=hidden_dim,
                num_layers=num_layers,
                output_dim=output_dim,
            ),
        )


class Fast_NARS_SGC_WithLearnableWeights(FastHeteroSGAPModel):  # noqa: N801
    """One learnable weight per (subgraph, hop) + MLP
    (reference ``hetero/fast_nars_sgc.py:6``)."""

    def __init__(
        self,
        prop_steps: int,
        feat_dim: int,
        output_dim: int,
        hidden_dim: int,
        num_layers: int,
        random_subgraph_num: int,
    ):
        super().__init__(
            prop_steps,
            feat_dim,
            output_dim,
            pre_graph_op=LaplacianGraphOp(prop_steps, r=0.5),
            aggregator=FastOneDimConvolution(
                num_subgraphs=random_subgraph_num, prop_steps=prop_steps + 1
            ),
            base_model=MultiLayerPerceptron(
                hidden_dim=hidden_dim,
                num_layers=num_layers,
                output_dim=output_dim,
            ),
        )
