"""End-to-end golden tests: every homo model trains on an easy SBM and
recovers the communities (SURVEY.md §4 test pyramid, level 3).

The SBM is separable enough that any correct SGAP pipeline reaches ≥0.8
test accuracy in a few epochs; a broken eager/lazy aggregation split,
normalization, or train step shows up as chance-level accuracy.
"""

import numpy as np
import pytest

from sgl_tpu.datasets.synthetic import PlantedPartition
from sgl_tpu.models import homo
from sgl_tpu.tasks.node_classification import NodeClassification

DS = PlantedPartition(num_nodes=400, feat_dim=16, seed=1)


def _run(model, epochs=30, lr=0.1, wd=5e-5, **task_kw):
    task = NodeClassification(
        DS, model, lr=lr, weight_decay=wd, epochs=epochs, verbose=False, **task_kw
    )
    return task.test_acc


def test_sgc():
    acc = _run(homo.SGC(3, DS.num_features, DS.num_classes))
    assert acc > 0.85, acc


def test_ssgc():
    acc = _run(homo.SSGC(3, DS.num_features, DS.num_classes))
    assert acc > 0.85, acc


def test_sign():
    acc = _run(homo.SIGN(3, DS.num_features, DS.num_classes, hidden_dim=32, num_layers=2))
    assert acc > 0.85, acc


def test_gbp():
    # alpha weights hops geometrically toward hop 0; the SBM's raw features
    # are noisy by construction, so test with a smoothing-heavy alpha
    # (alpha=0.85 tops out ~0.67 here purely from feature noise).
    acc = _run(
        homo.GBP(
            3, DS.num_features, DS.num_classes, hidden_dim=32, num_layers=2, alpha=0.15
        )
    )
    assert acc > 0.85, acc


def test_gamlp_lazy_aggregation():
    model = homo.GAMLP(3, DS.num_features, DS.num_classes, hidden_dim=32, num_layers=2)
    assert model.pre_msg_learnable  # must take the lazy path
    acc = _run(model, epochs=40, lr=0.05)
    assert acc > 0.85, acc


def test_gamlp_node_major_opt_in():
    """The opt-in (N, K+1, D) cache layout trains to the same band."""
    model = homo.GAMLP(3, DS.num_features, DS.num_classes, hidden_dim=32, num_layers=2)
    model.node_major = True
    acc = _run(model, epochs=40, lr=0.05)
    assert acc > 0.85, acc


def test_gamlp_recursive():
    model = homo.GAMLPRecursive(
        3, DS.num_features, DS.num_classes, hidden_dim=32, num_layers=2
    )
    assert model.pre_msg_learnable
    acc = _run(model, epochs=40, lr=0.05)
    assert acc > 0.85, acc


def test_pasca_v3_post_propagation():
    model = homo.PASCA_V3(
        3, 2, DS.num_features, DS.num_classes, hidden_dim=32, num_layers=2
    )
    acc = _run(model, epochs=40, lr=0.05)
    assert acc > 0.8, acc


def test_mini_batch_matches_full_batch_quality():
    model = homo.SGC(3, DS.num_features, DS.num_classes)
    acc = _run(model, epochs=30, train_batch_size=48, eval_batch_size=64)
    assert acc > 0.85, acc


def test_pasca_v1():
    acc = _run(
        homo.PASCA_V1(3, DS.num_features, DS.num_classes, hidden_dim=32, num_layers=2),
        epochs=40,
        lr=0.05,
    )
    assert acc > 0.8, acc


def test_pasca_v2():
    acc = _run(
        homo.PASCA_V2(3, DS.num_features, DS.num_classes, hidden_dim=32, num_layers=2),
        epochs=40,
        lr=0.05,
    )
    assert acc > 0.8, acc


def test_dist_aliases():
    assert homo.SGCDist is homo.SGC
    assert homo.GAMLPDist is homo.GAMLP


def test_nafs_model_embeddings_cluster():
    """NAFS as a model: training-free embeddings must preserve class
    structure (nearest-centroid accuracy well above chance)."""
    import numpy as np

    m = homo.NAFS(3, DS.num_features, DS.num_features)
    m.preprocess(DS.graph, DS.x)
    z = np.asarray(m.processed_feature)
    y = np.asarray(DS.y)
    cents = np.stack([z[y == c].mean(0) for c in range(DS.num_classes)])
    pred = np.argmin(
        ((z[:, None, :] - cents[None]) ** 2).sum(-1), axis=1
    )
    assert (pred == y).mean() > 0.7


def test_bf16_precompute_trains_to_band():
    """precompute_dtype=bf16 halves the hop cache and takes the single-pass
    SpMM; quality must stay in the same band as f32."""
    import jax.numpy as jnp

    model = homo.SGC(3, DS.num_features, DS.num_classes)
    acc = _run(model, epochs=30, precompute_dtype=jnp.bfloat16)
    assert model.processed_feature.dtype == jnp.bfloat16
    assert acc > 0.85, acc

    # lazy (learnable msg-op) path caches the bf16 hop stack too
    g = homo.GAMLP(3, DS.num_features, DS.num_classes, hidden_dim=32, num_layers=2)
    g.preprocess(DS.graph, DS.x, dtype=jnp.bfloat16)
    assert g.processed_feature.dtype == jnp.bfloat16


def test_fast_dropout_statistics():
    """FastDropout (uint8 masks) must keep inverted-dropout semantics:
    exact expectation, correct zero fraction, identity when deterministic."""
    import jax
    import jax.numpy as jnp

    from sgl_tpu.models.blocks import FastDropout

    x = jnp.ones((2000, 64), jnp.float32)
    for rate in (0.5, 0.8):
        m = FastDropout(rate)
        y = np.asarray(
            m.apply({}, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(3)})
        )
        zeros = (y == 0).mean()
        assert abs(zeros - rate) < 0.01, (rate, zeros)
        assert abs(y.mean() - 1.0) < 0.02, (rate, y.mean())
        kept = y[y != 0]
        # every kept element carries the same inverted-dropout scale
        assert np.allclose(kept, kept[0])
    m = FastDropout(0.5)
    y = m.apply({}, x, deterministic=True, rngs={"dropout": jax.random.PRNGKey(3)})
    assert np.asarray(y == 1.0).all()
    # bf16 activations stay bf16 (no silent f32 upcast)
    xb = x.astype(jnp.bfloat16)
    yb = m.apply({}, xb, deterministic=False, rngs={"dropout": jax.random.PRNGKey(4)})
    assert yb.dtype == jnp.bfloat16
