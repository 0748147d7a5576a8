"""Trainable building blocks (Flax) — parity with reference
``sgl/models/simple_models.py`` re-designed for XLA.

Initialization choices are deliberately kept faithful where SURVEY.md flags
accuracy sensitivity: the MLP uses xavier-uniform with ReLU gain and zero
bias (``simple_models.py:128-132``), PReLU starts at 0.25 (torch default),
and ``FastOneDimConvolution`` starts at all-ones (``simple_models.py:71-75``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.nn.initializers import variance_scaling, zeros

# xavier_uniform with gain sqrt(2) (torch: calculate_gain("relu"))
_xavier_relu = variance_scaling(2.0, "fan_avg", "uniform")


class PReLU(nn.Module):
    """Parametric ReLU with a single shared slope, torch-init 0.25."""

    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        a = self.param("negative_slope", lambda k: jnp.asarray(self.init, jnp.float32))
        # cast the slope to the activation dtype: an f32 scalar would
        # silently promote bf16 activations to f32 and force a cast
        # round-trip of the whole (B, hidden) tensor every layer
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


class FastDropout(nn.Module):
    """Inverted dropout from uint8 random bits.

    ``nn.Dropout`` draws a uint32 per element; on full-batch graph
    training (every node every step) mask generation is a measurable
    slice of the train step.  A keep/drop decision needs far fewer bits:
    draw uint8, keep where ``bits < round(keep_prob * 256)``, and scale
    by the *quantized* keep probability so the expectation stays exact.
    The keep probability itself is quantized to 1/256 (exact for the
    default rate 0.5; off by <0.4% relative for rate 0.8), which is
    statistically immaterial for dropout regularization.
    """

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if self.rate == 0.0 or deterministic:
            return x
        if self.rate >= 1.0:
            return jnp.zeros_like(x)
        keep_q = min(max(int(round((1.0 - self.rate) * 256.0)), 1), 255)
        bits = jax.random.bits(self.make_rng("dropout"), x.shape, jnp.uint8)
        # scale in x.dtype: an f32 scalar would upcast bf16 activations
        scale = jnp.asarray(256.0 / keep_q, x.dtype)
        return jnp.where(bits < jnp.uint8(keep_q), x * scale, jnp.zeros_like(x))


class IdenticalMapping(nn.Module):
    """Identity base model for training-free pipelines (NAFS)."""

    def __call__(self, x):
        return x


class LogisticRegression(nn.Module):
    """Single linear layer (reference ``simple_models.py:93``)."""

    output_dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Dense(self.output_dim)(x)


class MultiLayerPerceptron(nn.Module):
    """PReLU + dropout (+ optional BN) MLP (reference ``simple_models.py:103``).

    ``compute_dtype=jnp.bfloat16`` runs the matmuls in bf16 on the MXU
    (params stay f32; logits are cast back) — the TPU mixed-precision
    recipe, opt-in to keep default numerics reference-faithful."""

    hidden_dim: int
    num_layers: int
    output_dim: int
    dropout: float = 0.5
    bn: bool = False
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.num_layers < 2:
            raise ValueError("MLP must have at least two layers!")
        dt = self.compute_dtype
        prelu = PReLU()  # single shared slope across layers, like torch nn.PReLU()
        if dt is not None:
            x = x.astype(dt)
        for i in range(self.num_layers - 1):
            x = nn.Dense(
                self.hidden_dim, kernel_init=_xavier_relu, bias_init=zeros, dtype=dt
            )(x)
            if self.bn:
                x = nn.BatchNorm(use_running_average=not train, dtype=dt)(x)
            x = prelu(x)
            x = FastDropout(self.dropout)(x, deterministic=not train)
        out = nn.Dense(
            self.output_dim, kernel_init=_xavier_relu, bias_init=zeros, dtype=dt
        )(x)
        return out.astype(jnp.float32) if dt is not None else out


class ResMultiLayerPerceptron(nn.Module):
    """Residual MLP, dropout-first (reference ``simple_models.py:147``)."""

    hidden_dim: int
    num_layers: int
    output_dim: int
    dropout: float = 0.8
    bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.num_layers < 2:
            raise ValueError("ResMLP must have at least two layers!")
        drop = lambda h: FastDropout(self.dropout)(h, deterministic=not train)  # noqa: E731
        x = drop(x)
        x = nn.Dense(self.hidden_dim)(x)
        if self.bn:
            x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        residual = x
        for _ in range(1, self.num_layers - 1):
            h = drop(x)
            h = nn.Dense(self.hidden_dim)(h)
            if self.bn:
                h = nn.BatchNorm(use_running_average=not train)(h)
            h_act = nn.relu(h)
            x = h_act + residual
            residual = h_act
        x = drop(x)
        return nn.Dense(self.output_dim)(x)


class OneDimConvolution(nn.Module):
    """Per-hop, per-feature learnable subgraph mixing (NARS aggregator,
    reference ``simple_models.py:5-31``).

    Input: hop-major stacked subgraph features ``(K, B, D, S)``; output list
    semantics collapse to a stacked ``(K, B, D)`` mean over subgraphs.
    """

    num_subgraphs: int
    prop_steps: int
    feat_dim: int

    @nn.compact
    def __call__(self, feats_khsd: jnp.ndarray) -> jnp.ndarray:
        w = self.param(
            "weight",
            variance_scaling(1.0, "fan_avg", "uniform"),
            (self.prop_steps, self.feat_dim, self.num_subgraphs),
        )
        # (K,B,D,S) * (K,1,D,S) -> mean over S
        return jnp.mean(feats_khsd * w[:, None, :, :], axis=-1)


class OneDimConvolutionWeightSharedAcrossFeatures(nn.Module):
    """As above with one weight per (hop, subgraph)
    (reference ``simple_models.py:34-61``)."""

    num_subgraphs: int
    prop_steps: int

    @nn.compact
    def __call__(self, feats_khsd: jnp.ndarray) -> jnp.ndarray:
        w = self.param(
            "weight",
            variance_scaling(1.0, "fan_avg", "uniform"),
            (self.prop_steps, 1, self.num_subgraphs),
        )
        return jnp.mean(feats_khsd * w[:, None, :, :], axis=-1)


class FastOneDimConvolution(nn.Module):
    """One learnable weight per (subgraph, hop) pair applied as a single
    matmul over ``(B, D, S*K)`` (reference ``simple_models.py:64-84``).

    Ones-init is load-bearing for accuracy stability (reference comment)."""

    num_subgraphs: int
    prop_steps: int

    @nn.compact
    def __call__(self, feats_bdsk: jnp.ndarray) -> jnp.ndarray:
        w = self.param(
            "weight",
            lambda k: jnp.ones((self.num_subgraphs * self.prop_steps, 1), jnp.float32),
        )
        return jnp.squeeze(feats_bdsk @ w, axis=2)

    @staticmethod
    def subgraph_weight(params, num_subgraphs: int, prop_steps: int):
        w = params["weight"]
        return w.reshape(num_subgraphs, prop_steps).sum(axis=1)
