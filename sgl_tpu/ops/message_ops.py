"""Message ops: hop aggregation over the stacked ``(K+1, B, D)`` tensor.

Parity with the reference's 11-op family (``sgl/operators/message_op/``),
re-designed as Flax modules over one stacked hop tensor so every aggregation
is a single fused XLA reduction/einsum:

* the reference's per-node Python loop in the NAFS op
  (``over_smooth_distance_op.py:26-31``) becomes one einsum;
* ``one_dim_weighted_add`` / ``two_dim_weighted_add``
  (``operators/utils.py:91-116``) become tensordot/einsum;
* hop slicing ``[start:end)`` is static so XLA sees fixed shapes.

All ops are ``nn.Module`` (non-learnable ones just have no params) so the
SGAP model composes them into one parameter tree.  ``aggr_type`` tags drive
the eager-vs-lazy aggregation split exactly as in the reference
(``models/base_model.py:27-33``).

Deviation (documented): the reference's ``ori_ref``/``jk`` weighted ops
reshape gate outputs with ``.view(-1, K)`` (``learnable_weighted_messahe_op.py:78,86``),
which scrambles the (hop, node) axes — the learned gate is applied under a
fixed permutation.  We implement the intended per-node hop attention
(as in the GAMLP paper and the op's own ``gate`` branch at ``:71``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn
from jax.nn.initializers import normal

LEARNABLE_AGGR_TYPES = frozenset(
    {"proj_concat", "learnable_weighted", "iterate_learnable_weighted"}
)


class MessageOp(nn.Module):
    """Base: slices hops ``[start:end)`` then combines. Subclasses set
    ``aggr_type`` as a class attribute."""

    start: Optional[int] = None
    end: Optional[int] = None

    aggr_type: str = ""
    # ops that accept a (B, K, D) node-major hop stack (a transpose-free
    # layout for per-node attention) override this to True
    supports_node_major: bool = False

    def _slice(self, hops: jnp.ndarray) -> jnp.ndarray:
        return hops[self.start : self.end]

    @property
    def learnable(self) -> bool:
        return self.aggr_type in LEARNABLE_AGGR_TYPES

    def linear_weights(self, k_all: int):
        """Fixed per-hop weights ``w`` such that ``aggregate(hops) ==
        sum_k w[k] hops[k]``, or None when the op is not a static linear
        combination.  Enables the fused O(N·D)-memory propagate+aggregate
        path (``graph_ops.k_hop_aggregate``)."""
        return None

    def _slice_range(self, k_all: int):
        start = 0 if self.start is None else self.start
        end = k_all if self.end is None else self.end
        return start, end


class LastMessageOp(MessageOp):
    """``hops[-1]`` (SGC; reference ``last_message_op.py:4``)."""

    aggr_type: str = "last"

    def __call__(self, hops):
        return hops[-1]

    def linear_weights(self, k_all: int):
        import numpy as np

        w = np.zeros(k_all, np.float32)
        w[-1] = 1.0
        return w


class SumMessageOp(MessageOp):
    aggr_type: str = "sum"

    def __call__(self, hops):
        return jnp.sum(self._slice(hops), axis=0)

    def linear_weights(self, k_all: int):
        import numpy as np

        start, end = self._slice_range(k_all)
        w = np.zeros(k_all, np.float32)
        w[start:end] = 1.0
        return w


class MeanMessageOp(MessageOp):
    """Mean over hops (S²GC; reference ``mean_message_op.py:4``)."""

    aggr_type: str = "mean"

    def __call__(self, hops):
        return jnp.mean(self._slice(hops), axis=0)

    def linear_weights(self, k_all: int):
        import numpy as np

        start, end = self._slice_range(k_all)
        w = np.zeros(k_all, np.float32)
        w[start:end] = 1.0 / max(end - start, 1)
        return w


class MaxMessageOp(MessageOp):
    aggr_type: str = "max"

    def __call__(self, hops):
        return jnp.max(self._slice(hops), axis=0)


class MinMessageOp(MessageOp):
    aggr_type: str = "min"

    def __call__(self, hops):
        return jnp.min(self._slice(hops), axis=0)


class ConcatMessageOp(MessageOp):
    """Feature-axis concat in hop order (SIGN; reference ``concat_message_op.py:6``)."""

    aggr_type: str = "concat"

    def __call__(self, hops):
        h = self._slice(hops)  # (K, B, D)
        k, b, d = h.shape
        return jnp.moveaxis(h, 0, 1).reshape(b, k * d)


class ProjectedConcatMessageOp(MessageOp):
    """Per-hop MLP projection then concat (original SIGN; reference
    ``projected_concat_message_op.py:9-28``).  Quirk preserved: hop slice 0's
    projection is not ReLU'd, later ones are."""

    hidden_dim: int = 0
    num_layers: int = 2

    aggr_type: str = "proj_concat"

    @nn.compact
    def __call__(self, hops, train: bool = False):
        # deferred import: models.blocks ↔ ops.message_ops would otherwise cycle
        from sgl_tpu.models.blocks import MultiLayerPerceptron

        h = self._slice(hops)
        outs = []
        for i in range(h.shape[0]):
            proj = MultiLayerPerceptron(
                hidden_dim=self.hidden_dim,
                num_layers=self.num_layers,
                output_dim=self.hidden_dim,
            )(h[i], train=train)
            outs.append(proj if i == 0 else nn.relu(proj))
        return jnp.concatenate(outs, axis=-1)


class SimpleWeightedMessageOp(MessageOp):
    """Fixed scalar hop weights (reference ``simple_weighted_message_op.py:8-56``).

    ``alpha`` mode: geometric weights ``α(1-α)^k`` over the *full* hop list,
    then sliced (GBP).  ``hand_crafted`` mode: user-provided weights matching
    the sliced length.
    """

    combination_type: str = "alpha"
    alpha: float = 0.85
    weight_list: Optional[Sequence[float]] = None

    aggr_type: str = "simple_weighted"

    def __call__(self, hops):
        h = self._slice(hops)
        if self.combination_type == "alpha":
            if not 0.0 <= self.alpha <= 1.0:
                raise ValueError("The alpha must be a float in [0,1]!")
            k_all = hops.shape[0]
            w_full = self.alpha * (1.0 - self.alpha) ** jnp.arange(k_all)
            w = w_full[self.start : self.end]
        elif self.combination_type == "hand_crafted":
            w = jnp.asarray(self.weight_list, jnp.float32)
            if w.shape[0] != h.shape[0]:
                raise ValueError(
                    "The feature list and the weight list have different lengths!"
                )
        else:
            raise ValueError(
                "Invalid weighted combination type! Type must be 'alpha' or 'hand_crafted'."
            )
        return jnp.tensordot(w.astype(h.dtype), h, axes=1)

    def linear_weights(self, k_all: int):
        import numpy as np

        start, end = self._slice_range(k_all)
        w = np.zeros(k_all, np.float32)
        if self.combination_type == "alpha":
            full = self.alpha * (1.0 - self.alpha) ** np.arange(k_all)
            w[start:end] = full[start:end]
        elif self.combination_type == "hand_crafted":
            vals = np.asarray(self.weight_list, np.float32)
            if vals.shape[0] != end - start:
                return None
            w[start:end] = vals
        else:
            return None
        return w


class LearnableWeightedMessageOp(MessageOp):
    """Learnable hop weighting, 5 combination types (reference
    ``learnable_weighted_messahe_op.py:10-101``; GAMLP's JK attention = 'jk').

    ``node_major=True`` accepts the hop stack as ``(B, K, D)`` instead of
    ``(K, B, D)``.  Same math, same params — but the 'jk' reference concat
    becomes a free reshape instead of a (K·B·D) transpose, and every einsum
    runs in the batch-major layout.  At GAMLP full-batch scale the per-step
    transposes are ~200 MB each, a measurable slice of the train step;
    ``SGAPModel`` stores the cached hop tensor node-major when the message
    op supports it.
    """

    combination_type: str = "simple"
    prop_steps: int = 0  # required for 'simple'/'simple_allow_neg'/'jk'
    feat_dim: int = 0  # required for 'gate'/'ori_ref'/'jk'

    aggr_type: str = "learnable_weighted"
    supports_node_major: bool = True

    @nn.compact
    def __call__(self, hops, train: bool = False, node_major: bool = False):
        hop_ax = 1 if node_major else 0
        h = (
            hops[:, self.start : self.end] if node_major else self._slice(hops)
        )  # (B, K, D) or (K, B, D)
        d = h.shape[-1]
        ct = self.combination_type
        if ct in ("simple", "simple_allow_neg"):
            # xavier_normal on a (1, prop_steps+1) tensor (reference :32-35)
            std = (2.0 / (1 + self.prop_steps + 1)) ** 0.5
            w_full = self.param("hop_weight", normal(std), (self.prop_steps + 1,))
            w = w_full[self.start : self.end]
            if ct == "simple":
                w = nn.softmax(nn.sigmoid(w))
            if node_major:
                return jnp.einsum("k,bkd->bd", w, h)
            return jnp.tensordot(w, h, axes=1)

        if ct == "gate":
            gate = nn.Dense(1)
            logits = jnp.squeeze(gate(h), axis=-1)  # (K, B) / (B, K)
            w = nn.softmax(nn.sigmoid(logits), axis=hop_ax)  # over hops, per node
            if node_major:
                return jnp.einsum("bk,bkd->bd", w, h)
            return jnp.einsum("kb,kbd->bd", w, h)

        # ori_ref / jk: gate(concat(reference, hop_k)).  The reference input
        # is identical for every hop, so the Dense kernel is split — the
        # reference half is applied ONCE instead of broadcasting and
        # materializing a (K, B, ref_dim + D) concat (for GAMLP's jk at
        # full batch that intermediate is gigabytes of HBM traffic).
        if ct in ("ori_ref", "jk"):
            if ct == "ori_ref":
                ref = hops[:, 0] if node_major else hops[0]  # (B, D)
            elif node_major:
                ref = hops.reshape(hops.shape[0], -1)  # free: already (B, K, D)
            else:
                b = hops.shape[1]
                ref = jnp.moveaxis(hops, 0, 1).reshape(b, -1)  # (B, (K+1)D)
            a_dim = ref.shape[-1]
            kernel = self.param(
                "gate_kernel", nn.initializers.lecun_normal(), (a_dim + d, 1)
            )
            bias = self.param("gate_bias", nn.initializers.zeros, (1,))
            ref_logit = ref @ kernel[:a_dim]  # (B, 1), hop-invariant
            if node_major:
                hop_logit = jnp.einsum("bkd,do->bko", h, kernel[a_dim:])
                logits = jnp.squeeze(ref_logit[:, None] + hop_logit + bias, -1)
                w = nn.softmax(nn.sigmoid(logits), axis=1)  # (B, K)
                return jnp.einsum("bk,bkd->bd", w, h)
            hop_logit = jnp.einsum("kbd,do->kbo", h, kernel[a_dim:])
            logits = jnp.squeeze(ref_logit[None] + hop_logit + bias, axis=-1)
            w = nn.softmax(nn.sigmoid(logits), axis=0)  # (K, B)
            return jnp.einsum("kb,kbd->bd", w, h)

        raise ValueError(
            "Invalid weighted combination type! Type must be 'simple', "
            "'simple_allow_neg', 'gate', 'ori_ref' or 'jk'."
        )


class IterateLearnableWeightedMessageOp(MessageOp):
    """GAMLP-Recursive: iteratively gate hop i against the running weighted
    sum, re-softmaxing all weights each step (reference
    ``iterate_learnable_weighted_message_op.py:28-51``)."""

    combination_type: str = "recursive"

    aggr_type: str = "iterate_learnable_weighted"
    supports_node_major: bool = True

    @nn.compact
    def __call__(self, hops, train: bool = False, node_major: bool = False):
        if self.combination_type != "recursive":
            raise ValueError(
                "Invalid weighted combination type! Type must be 'recursive'."
            )
        h = hops[:, self.start : self.end] if node_major else self._slice(hops)
        k = h.shape[1 if node_major else 0]
        hop = (lambda i: h[:, i]) if node_major else (lambda i: h[i])
        gate = nn.Dense(1)
        weighted = hop(0)
        # reference quirk preserved exactly: the accumulated weight list is
        # stored ALREADY-SOFTMAXED and the next raw sigmoid is appended to
        # those normalized values before re-softmaxing
        # (iterate_learnable_weighted_message_op.py:36-40)
        w = None  # (B, i+1) softmaxed weights so far
        for i in range(k):
            g = nn.sigmoid(gate(jnp.concatenate([hop(i), weighted], axis=-1)))
            w = g if w is None else jnp.concatenate([w, g], axis=1)
            w = nn.softmax(w, axis=1)  # (B, i+1)
            weighted = (
                jnp.einsum("bk,bkd->bd", w, h[:, : i + 1])
                if node_major
                else jnp.einsum("bk,kbd->bd", w, h[: i + 1])
            )
        return weighted


class OverSmoothDistanceWeightedOp(MessageOp):
    """NAFS: per-node softmax over hops of cosine similarity to hop 0
    (reference ``over_smooth_distance_op.py:6-33``).  The reference's O(N)
    per-node Python loop is one einsum here."""

    aggr_type: str = "over_smooth_dis_weighted"

    def __call__(self, hops):
        ref = hops[0]  # (B, D)
        ref_norm = jnp.linalg.norm(ref, axis=-1) + 1e-10  # (B,)
        norms = jnp.linalg.norm(hops, axis=-1) + 1e-10  # (K+1, B)
        cos = jnp.einsum("bd,kbd->kb", ref, hops) / (norms * ref_norm[None])
        w = nn.softmax(cos, axis=0)  # over hops, per node
        return jnp.einsum("kb,kbd->bd", w, hops)
