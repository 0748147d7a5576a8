"""Homogeneous SGAP model zoo — parity with ``sgl/models/homo/``.

Each model is a thin composition over :class:`~sgl_tpu.models.base.SGAPModel`
mirroring the reference's graph-op / message-op / base-net choices exactly
(file:line cited per class).  Distributed twins (``SGCDist``/``GAMLPDist``,
reference ``homo/sgc_dist.py``/``gamlp_dist.py``) are unnecessary here: every
model trains data-parallel through ``sgl_tpu.parallel`` unchanged, so the
aliases exist only for API compatibility.
"""

from __future__ import annotations

from sgl_tpu.models.base import SGAPModel
from sgl_tpu.models.blocks import (
    IdenticalMapping,
    LogisticRegression,
    MultiLayerPerceptron,
    ResMultiLayerPerceptron,
)
from sgl_tpu.ops.graph_ops import LaplacianGraphOp, PprGraphOp
from sgl_tpu.ops.message_ops import (
    ConcatMessageOp,
    IterateLearnableWeightedMessageOp,
    LastMessageOp,
    LearnableWeightedMessageOp,
    MeanMessageOp,
    OverSmoothDistanceWeightedOp,
    SimpleWeightedMessageOp,
)


class SGC(SGAPModel):
    """Laplacian(r=.5) / Last / LogReg (reference ``homo/sgc.py:7``)."""

    def __init__(self, prop_steps: int, feat_dim: int, output_dim: int):
        super().__init__(
            prop_steps,
            feat_dim,
            output_dim,
            pre_graph_op=LaplacianGraphOp(prop_steps, r=0.5),
            pre_msg_op=LastMessageOp(),
            base_model=LogisticRegression(output_dim=output_dim),
        )


class SIGN(SGAPModel):
    """Laplacian / Concat / MLP((K+1)·D) (reference ``homo/sign.py:8``)."""

    def __init__(
        self, prop_steps: int, feat_dim: int, output_dim: int, hidden_dim: int, num_layers: int
    ):
        super().__init__(
            prop_steps,
            feat_dim,
            output_dim,
            pre_graph_op=LaplacianGraphOp(prop_steps, r=0.5),
            pre_msg_op=ConcatMessageOp(start=0, end=prop_steps + 1),
            base_model=MultiLayerPerceptron(
                hidden_dim=hidden_dim, num_layers=num_layers, output_dim=output_dim
            ),
        )


class SSGC(SGAPModel):
    """Laplacian / Mean / LogReg (S²GC; reference ``homo/ssgc.py:7``)."""

    def __init__(self, prop_steps: int, feat_dim: int, output_dim: int):
        super().__init__(
            prop_steps,
            feat_dim,
            output_dim,
            pre_graph_op=LaplacianGraphOp(prop_steps, r=0.5),
            pre_msg_op=MeanMessageOp(start=0, end=prop_steps + 1),
            base_model=LogisticRegression(output_dim=output_dim),
        )


class GBP(SGAPModel):
    """Laplacian / geometric α-weights / MLP (reference ``homo/gbp.py:7``)."""

    def __init__(
        self,
        prop_steps: int,
        feat_dim: int,
        output_dim: int,
        hidden_dim: int,
        num_layers: int,
        r: float = 0.5,
        alpha: float = 0.85,
    ):
        super().__init__(
            prop_steps,
            feat_dim,
            output_dim,
            pre_graph_op=LaplacianGraphOp(prop_steps, r=0.5),
            pre_msg_op=SimpleWeightedMessageOp(
                start=0, end=prop_steps + 1, combination_type="alpha", alpha=alpha
            ),
            base_model=MultiLayerPerceptron(
                hidden_dim=hidden_dim, num_layers=num_layers, output_dim=output_dim
            ),
        )


class GAMLP(SGAPModel):
    """Laplacian / JK attention / MLP (reference ``homo/gamlp.py:7``).

    ``compute_dtype=jnp.bfloat16`` enables mixed-precision MLP matmuls."""

    def __init__(
        self,
        prop_steps: int,
        feat_dim: int,
        output_dim: int,
        hidden_dim: int,
        num_layers: int,
        compute_dtype=None,
        dropout: float = 0.5,
    ):
        super().__init__(
            prop_steps,
            feat_dim,
            output_dim,
            pre_graph_op=LaplacianGraphOp(prop_steps, r=0.5),
            pre_msg_op=LearnableWeightedMessageOp(
                start=0,
                end=prop_steps + 1,
                combination_type="jk",
                prop_steps=prop_steps,
                feat_dim=feat_dim,
            ),
            base_model=MultiLayerPerceptron(
                hidden_dim=hidden_dim,
                num_layers=num_layers,
                output_dim=output_dim,
                compute_dtype=compute_dtype,
                dropout=dropout,
            ),
        )


class GAMLPRecursive(SGAPModel):
    """Laplacian / recursive gating / MLP (reference ``homo/gamlp_recursive.py:7``)."""

    def __init__(
        self, prop_steps: int, feat_dim: int, output_dim: int, hidden_dim: int, num_layers: int
    ):
        super().__init__(
            prop_steps,
            feat_dim,
            output_dim,
            pre_graph_op=LaplacianGraphOp(prop_steps, r=0.5),
            pre_msg_op=IterateLearnableWeightedMessageOp(
                start=0, end=prop_steps + 1, combination_type="recursive"
            ),
            base_model=MultiLayerPerceptron(
                hidden_dim=hidden_dim, num_layers=num_layers, output_dim=output_dim
            ),
        )


class NAFS(SGAPModel):
    """Laplacian / over-smooth-distance weights / Identity — training-free
    embeddings (reference ``homo/nafs.py:7``)."""

    def __init__(self, prop_steps: int, feat_dim: int, output_dim: int):
        super().__init__(
            prop_steps,
            feat_dim,
            output_dim,
            pre_graph_op=LaplacianGraphOp(prop_steps, r=0.5),
            pre_msg_op=OverSmoothDistanceWeightedOp(),
            base_model=IdenticalMapping(),
        )


class PASCA_V1(SGAPModel):
    """NAS-discovered arch V1 (reference ``homo/pasca_v1.py:7``).

    Note: the reference passes ``feat_dim`` where the 'simple' op expects
    ``prop_steps`` (an argument-order quirk); we pass ``prop_steps``."""

    def __init__(
        self, prop_steps: int, feat_dim: int, output_dim: int, hidden_dim: int, num_layers: int
    ):
        super().__init__(
            prop_steps,
            feat_dim,
            output_dim,
            pre_graph_op=PprGraphOp(prop_steps, r=0.5, alpha=0.1),
            pre_msg_op=LearnableWeightedMessageOp(
                start=1,
                end=prop_steps + 1,
                combination_type="simple",
                prop_steps=prop_steps,
            ),
            base_model=ResMultiLayerPerceptron(
                hidden_dim=hidden_dim,
                num_layers=num_layers,
                output_dim=output_dim,
                dropout=0.8,
            ),
        )


class PASCA_V2(SGAPModel):
    """NAS-discovered arch V2 (reference ``homo/pasca_v2.py:7``)."""

    def __init__(
        self, prop_steps: int, feat_dim: int, output_dim: int, hidden_dim: int, num_layers: int
    ):
        super().__init__(
            prop_steps,
            feat_dim,
            output_dim,
            pre_graph_op=LaplacianGraphOp(prop_steps, r=0.5),
            pre_msg_op=LearnableWeightedMessageOp(
                start=1, end=prop_steps + 1, combination_type="gate", feat_dim=feat_dim
            ),
            base_model=ResMultiLayerPerceptron(
                hidden_dim=hidden_dim,
                num_layers=num_layers,
                output_dim=output_dim,
                dropout=0.8,
            ),
        )


class PASCA_V3(SGAPModel):
    """NAS arch V3 with PPR post-propagation (reference ``homo/pasca_v3.py:7-15``)."""

    def __init__(
        self,
        prop_steps: int,
        post_steps: int,
        feat_dim: int,
        output_dim: int,
        hidden_dim: int,
        num_layers: int,
    ):
        super().__init__(
            prop_steps,
            feat_dim,
            output_dim,
            pre_graph_op=LaplacianGraphOp(prop_steps, r=0.5),
            pre_msg_op=LearnableWeightedMessageOp(
                start=1, end=prop_steps + 1, combination_type="gate", feat_dim=feat_dim
            ),
            base_model=ResMultiLayerPerceptron(
                hidden_dim=hidden_dim,
                num_layers=num_layers,
                output_dim=output_dim,
                dropout=0.8,
            ),
            post_graph_op=PprGraphOp(post_steps, r=0.5, alpha=0.3),
            post_msg_op=LastMessageOp(),
        )


# API-compat aliases: data parallelism is a property of the task runtime here,
# not of the model (reference ``homo/sgc_dist.py:7``, ``homo/gamlp_dist.py:7``).
SGCDist = SGC
GAMLPDist = GAMLP
