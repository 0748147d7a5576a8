"""Message-op semantics vs straightforward numpy references."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgl_tpu.ops import (
    ConcatMessageOp,
    IterateLearnableWeightedMessageOp,
    LastMessageOp,
    LearnableWeightedMessageOp,
    MaxMessageOp,
    MeanMessageOp,
    MinMessageOp,
    OverSmoothDistanceWeightedOp,
    ProjectedConcatMessageOp,
    SimpleWeightedMessageOp,
    SumMessageOp,
)
from sgl_tpu.models.base import eager_aggregate


@pytest.fixture
def hops():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(4, 7, 5)).astype(np.float32))


def test_simple_reductions(hops):
    h = np.asarray(hops)
    np.testing.assert_allclose(eager_aggregate(LastMessageOp(), hops), h[-1])
    np.testing.assert_allclose(
        eager_aggregate(SumMessageOp(start=0, end=4), hops), h.sum(0), rtol=1e-6
    )
    np.testing.assert_allclose(
        eager_aggregate(MeanMessageOp(start=1, end=3), hops),
        h[1:3].mean(0),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        eager_aggregate(MaxMessageOp(start=0, end=4), hops), h.max(0)
    )
    np.testing.assert_allclose(
        eager_aggregate(MinMessageOp(start=0, end=4), hops), h.min(0)
    )


def test_concat_hop_order(hops):
    h = np.asarray(hops)
    got = np.asarray(eager_aggregate(ConcatMessageOp(start=0, end=4), hops))
    want = np.concatenate([h[k] for k in range(4)], axis=1)  # torch.hstack order
    np.testing.assert_allclose(got, want)


def test_simple_weighted_alpha(hops):
    h = np.asarray(hops)
    alpha = 0.85
    op = SimpleWeightedMessageOp(start=0, end=4, combination_type="alpha", alpha=alpha)
    got = np.asarray(eager_aggregate(op, hops))
    w = np.array([alpha * (1 - alpha) ** k for k in range(4)], np.float32)
    want = np.tensordot(w, h, axes=1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_simple_weighted_handcrafted_slice(hops):
    h = np.asarray(hops)
    op = SimpleWeightedMessageOp(
        start=1, end=3, combination_type="hand_crafted", weight_list=[0.25, 0.75]
    )
    got = np.asarray(eager_aggregate(op, hops))
    want = 0.25 * h[1] + 0.75 * h[2]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_simple_weighted_bad_type(hops):
    with pytest.raises(ValueError):
        eager_aggregate(
            SimpleWeightedMessageOp(start=0, end=4, combination_type="nope"), hops
        )


@pytest.mark.parametrize("ct", ["simple", "simple_allow_neg", "gate", "ori_ref", "jk"])
def test_learnable_weighted_shapes_and_grads(hops, ct):
    op = LearnableWeightedMessageOp(
        start=0, end=4, combination_type=ct, prop_steps=3, feat_dim=5
    )
    params = op.init(jax.random.PRNGKey(0), hops)

    def loss(p):
        return jnp.sum(op.apply(p, hops) ** 2)

    out = op.apply(params, hops)
    assert out.shape == (7, 5)
    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in flat)
    assert sum(float(jnp.abs(l).sum()) for l in flat) > 0


def test_learnable_simple_is_convex_combo(hops):
    """'simple' weights are softmax(sigmoid(w)): output lies inside the
    per-element min/max envelope of the hops."""
    op = LearnableWeightedMessageOp(
        start=0, end=4, combination_type="simple", prop_steps=3
    )
    params = op.init(jax.random.PRNGKey(1), hops)
    out = np.asarray(op.apply(params, hops))
    h = np.asarray(hops)
    assert (out <= h.max(0) + 1e-5).all() and (out >= h.min(0) - 1e-5).all()


def test_gate_weights_sum_to_one_per_node(hops):
    """gate: per-node softmax over hops — verify via a linearity trick:
    aggregating all-ones hops must return all-ones."""
    ones = jnp.ones_like(hops)
    op = LearnableWeightedMessageOp(
        start=0, end=4, combination_type="gate", feat_dim=5
    )
    params = op.init(jax.random.PRNGKey(2), ones)
    out = np.asarray(op.apply(params, ones))
    np.testing.assert_allclose(out, 1.0, rtol=1e-5)


def test_iterate_learnable(hops):
    op = IterateLearnableWeightedMessageOp(start=0, end=4)
    params = op.init(jax.random.PRNGKey(3), hops)
    out = op.apply(params, hops)
    assert out.shape == (7, 5)
    # convexity: recursive weights are softmaxed per node
    h = np.asarray(hops)
    o = np.asarray(out)
    assert (o <= h.max(0) + 1e-5).all() and (o >= h.min(0) - 1e-5).all()


def test_proj_concat(hops):
    op = ProjectedConcatMessageOp(start=0, end=4, hidden_dim=6, num_layers=2)
    params = op.init(jax.random.PRNGKey(4), hops)
    out = op.apply(params, hops)
    assert out.shape == (7, 24)


def test_nafs_matches_reference_loop(hops):
    """Vectorized NAFS equals the reference's per-node loop
    (over_smooth_distance_op.py:11-33), re-implemented in numpy."""
    h = np.asarray(hops).astype(np.float64)
    k, n, d = h.shape
    ref_norm = np.linalg.norm(h[0], axis=1) + 1e-10
    weights = np.zeros((n, k))
    for j in range(k):
        cur_norm = np.linalg.norm(h[j], axis=1) + 1e-10
        weights[:, j] = (h[0] * h[j]).sum(1) / cur_norm / ref_norm
    e = np.exp(weights - weights.max(1, keepdims=True))
    w = e / e.sum(1, keepdims=True)
    want = np.einsum("nk,knd->nd", w, h)
    got = np.asarray(eager_aggregate(OverSmoothDistanceWeightedOp(), hops))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_linear_aggregation_matches_eager():
    """k_hop_aggregate (O(N·D) memory) == propagate + eager aggregate."""
    import numpy as np
    from sgl_tpu.ops.graph_ops import LaplacianGraphOp
    from tests.conftest import random_graph

    g = random_graph(n=120, seed=41)
    op = LaplacianGraphOp(3)
    hops_arr = op.propagate(g, g.x)
    for msg in [
        LastMessageOp(),
        SumMessageOp(start=0, end=4),
        MeanMessageOp(start=1, end=3),
        SimpleWeightedMessageOp(start=0, end=4, combination_type="alpha", alpha=0.85),
        SimpleWeightedMessageOp(
            start=1, end=3, combination_type="hand_crafted", weight_list=[0.2, 0.8]
        ),
    ]:
        w = msg.linear_weights(4)
        assert w is not None
        fused = np.asarray(op.propagate_aggregate(g, g.x, w))
        want = np.asarray(eager_aggregate(msg, hops_arr))
        np.testing.assert_allclose(fused, want, rtol=1e-4, atol=1e-5)
    # non-linear ops opt out
    assert MaxMessageOp(start=0, end=4).linear_weights(4) is None
    assert OverSmoothDistanceWeightedOp().linear_weights(4) is None


@pytest.mark.parametrize(
    "op",
    [
        LearnableWeightedMessageOp(combination_type="simple", prop_steps=3),
        LearnableWeightedMessageOp(combination_type="gate", feat_dim=5),
        LearnableWeightedMessageOp(
            combination_type="ori_ref", prop_steps=3, feat_dim=5
        ),
        LearnableWeightedMessageOp(combination_type="jk", prop_steps=3, feat_dim=5),
        IterateLearnableWeightedMessageOp(),
    ],
)
def test_node_major_layout_equivalence(op, hops):
    """node_major=True on the (B, K, D) transpose must produce exactly the
    hop-major result with the same params (the fast GAMLP training layout)."""
    assert op.supports_node_major
    rng = jax.random.PRNGKey(3)
    params = op.init(rng, hops, train=False)
    want = op.apply(params, hops, train=False)
    hops_nm = jnp.moveaxis(hops, 0, 1)
    got = op.apply(params, hops_nm, train=False, node_major=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)
