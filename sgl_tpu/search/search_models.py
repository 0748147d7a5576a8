"""Arch-vector → SGAP model compiler (reference ``sgl/search/search_models.py:8-77``).

Arch vector: ``[prop_steps, prop_type, msg_type, num_layers, post_steps,
post_type, post_msg_type]``.  Dispatch tables identical to the reference
(PPR alphas 0.1/0.2/0.3, message types 0-8, post types 0-5); the 'simple'
learnable op receives ``prop_steps`` (the reference passes ``feat_dim`` into
the prop-steps slot — an argument-order quirk not replicated).
"""

from __future__ import annotations

from typing import Sequence

from sgl_tpu.models.base import SGAPModel
from sgl_tpu.models.blocks import LogisticRegression, ResMultiLayerPerceptron
from sgl_tpu.ops.graph_ops import LaplacianGraphOp, PprGraphOp
from sgl_tpu.ops.message_ops import (
    ConcatMessageOp,
    LastMessageOp,
    LearnableWeightedMessageOp,
    MaxMessageOp,
    MeanMessageOp,
    MinMessageOp,
    SimpleWeightedMessageOp,
    SumMessageOp,
)


def _graph_op(kind: int, steps: int):
    if kind == 1:
        return LaplacianGraphOp(steps, r=0.5)
    if kind == 2:
        return PprGraphOp(steps, r=0.5, alpha=0.1)
    if kind == 3:
        return PprGraphOp(steps, r=0.5, alpha=0.2)
    if kind == 4:
        return PprGraphOp(steps, r=0.5, alpha=0.3)
    raise ValueError(f"unknown graph op type {kind}")


class SearchModel(SGAPModel):
    def __init__(self, arch: Sequence[int], feat_dim: int, output_dim: int, hidden_dim: int):
        (
            prop_steps,
            prop_types,
            mesg_types,
            num_layers,
            post_steps,
            post_types,
            pmsg_types,
        ) = [int(a) for a in arch]

        pre_graph_op = _graph_op(prop_types, prop_steps)

        in_dim = feat_dim
        if mesg_types == 0:
            pre_msg_op = LastMessageOp()
        elif mesg_types == 1:
            pre_msg_op = ConcatMessageOp(start=0, end=prop_steps + 1)
            in_dim = feat_dim * (prop_steps + 1)
        elif mesg_types == 2:
            pre_msg_op = MeanMessageOp(start=0, end=prop_steps + 1)
        elif mesg_types == 3:
            pre_msg_op = SumMessageOp(start=0, end=prop_steps + 1)
        elif mesg_types == 4:
            pre_msg_op = MaxMessageOp(start=0, end=prop_steps + 1)
        elif mesg_types == 5:
            pre_msg_op = MinMessageOp(start=0, end=prop_steps + 1)
        elif mesg_types == 6:
            pre_msg_op = SimpleWeightedMessageOp(
                start=0, end=prop_steps + 1, combination_type="alpha", alpha=0.85
            )
        elif mesg_types == 7:
            pre_msg_op = LearnableWeightedMessageOp(
                start=1, end=prop_steps + 1, combination_type="gate", feat_dim=feat_dim
            )
        elif mesg_types == 8:
            pre_msg_op = LearnableWeightedMessageOp(
                start=1,
                end=prop_steps + 1,
                combination_type="simple",
                prop_steps=prop_steps,
            )
        else:
            raise ValueError(f"unknown message op type {mesg_types}")

        if num_layers == 1:
            base_model = LogisticRegression(output_dim=output_dim)
        else:
            base_model = ResMultiLayerPerceptron(
                hidden_dim=hidden_dim, num_layers=num_layers, output_dim=output_dim
            )

        post_graph_op, post_msg_op = None, None
        if post_types != 0 and post_steps != 0:
            post_graph_op = _graph_op(post_types, post_steps)
            if pmsg_types == 0:
                post_msg_op = LastMessageOp()
            elif pmsg_types == 1:
                post_msg_op = MeanMessageOp(start=0, end=post_steps + 1)
            elif pmsg_types == 2:
                post_msg_op = SumMessageOp(start=0, end=post_steps + 1)
            elif pmsg_types == 3:
                post_msg_op = MaxMessageOp(start=0, end=post_steps + 1)
            elif pmsg_types == 4:
                post_msg_op = MinMessageOp(start=0, end=post_steps + 1)
            elif pmsg_types == 5:
                post_msg_op = SimpleWeightedMessageOp(
                    start=0, end=post_steps + 1, combination_type="alpha", alpha=0.85
                )
            else:
                raise ValueError(f"unknown post message op type {pmsg_types}")

        super().__init__(
            prop_steps,
            in_dim,
            output_dim,
            pre_graph_op=pre_graph_op,
            pre_msg_op=pre_msg_op,
            base_model=base_model,
            post_graph_op=post_graph_op,
            post_msg_op=post_msg_op,
        )
        self.arch = tuple(int(a) for a in arch)
