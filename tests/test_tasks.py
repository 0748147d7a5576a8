"""E2E tests for the non-classification tasks and tricks."""

import numpy as np
import jax.numpy as jnp
import pytest

from sgl_tpu.datasets.synthetic import PlantedPartition
from sgl_tpu.graph import symmetric_normalized_weights
from sgl_tpu.models.homo import NAFS, SGC, SIGN
from sgl_tpu.tasks import (
    NodeClassification,
    LinkPredictionGAE,
    LinkPredictionNAFS,
    NodeClassificationWithCorrectAndSmooth,
    NodeClassificationWithLabelUse,
    NodeClustering,
    NodeClusteringNAFS,
    mask_test_edges,
)
from sgl_tpu.tricks import label_propagation

DS = PlantedPartition(num_nodes=300, feat_dim=16, p_in=0.08, seed=3)


def test_label_propagation_bounds():
    adj = symmetric_normalized_weights(DS.graph)
    y = np.asarray(DS.y).reshape(-1)
    out = np.asarray(label_propagation(jnp.asarray(y), adj, 5, 0.9))
    assert out.shape == (300, DS.num_classes)
    assert (out >= 0).all() and (out <= 1).all()
    # propagated labels should predict the true communities well on an SBM
    acc = (out.argmax(1) == y).mean()
    assert acc > 0.8, acc


def test_correct_and_smooth_improves_or_holds():
    model = SGC(2, DS.num_features, DS.num_classes)
    task = NodeClassificationWithCorrectAndSmooth(
        DS,
        model,
        lr=0.1,
        weight_decay=5e-5,
        epochs=15,
        num_correct_layers=10,
        correct_alpha=0.8,
        num_smooth_layers=10,
        smooth_alpha=0.8,
        verbose=False,
    )
    assert task.test_acc > 0.85, task.test_acc


def test_node_clustering_trainable():
    """Trainable path: cluster loss drives a jitted grad step; metrics are
    well-formed (quality of a 3-epoch random-init logit space is not the
    point — the NAFS test below covers quality)."""
    model = SIGN(2, DS.num_features, DS.num_classes, hidden_dim=16, num_layers=2)
    task = NodeClustering(
        DS, model, lr=0.01, weight_decay=5e-5, epochs=3, n_init=4, verbose=False
    )
    assert 0.0 <= task.acc <= 1.0
    assert 0.0 <= task.nmi <= 1.0 and 0.0 <= task.adjscore <= 1.0


def test_node_clustering_training_free_model():
    """NAFS model (no params) exercises the parameter-free branch and must
    recover communities from smoothed features."""
    model = NAFS(3, DS.num_features, DS.num_features)
    task = NodeClustering(
        DS, model, lr=0.01, weight_decay=5e-5, epochs=2, n_init=4, verbose=False
    )
    assert task.nmi > 0.3, task.nmi


def test_node_clustering_nafs_training_free():
    task = NodeClusteringNAFS(
        DS, hops=[2, 3], method="mean", n_init=4, r_list=[0.5, 0.3], verbose=False
    )
    assert task.nmi > 0.3, task.nmi


def test_mask_test_edges_disjoint_and_valid():
    g = DS.graph
    train_g, tr, trn, va, van, te, ten = mask_test_edges(g, seed=1)
    all_pos = set(map(tuple, np.concatenate([tr, va, te]).tolist()))
    # negatives must not collide with real edges in either direction
    src, dst, _ = g.edges()
    real = set(zip(src.tolist(), dst.tolist()))
    for neg in (trn, van, ten):
        for a, b in neg.tolist():
            assert (a, b) not in real and (b, a) not in real and a != b
    # val/test positives must not be in the train graph
    ts, td, _ = train_g.edges()
    train_set = set(zip(ts.tolist(), td.tolist()))
    for a, b in np.concatenate([va, te]).tolist():
        assert (a, b) not in train_set and (b, a) not in train_set
    # counts: 10% test, 5% val of upper-tri edges
    n_upper = int((src < dst).sum())
    assert len(te) == n_upper // 10 and len(va) == n_upper // 20


def test_link_prediction_gae():
    model = SGC(2, DS.num_features, 16)  # 16-dim embeddings
    task = LinkPredictionGAE(
        DS, model, lr=0.01, weight_decay=5e-5, epochs=20, verbose=False
    )
    assert task.test_roc_auc > 0.7, task.test_roc_auc


def test_link_prediction_nafs():
    task = LinkPredictionNAFS(
        DS, hops=[2, 3], method="mean", r_list=[0.5, 0.3], verbose=False
    )
    assert task.test_roc_auc > 0.7, task.test_roc_auc


def test_label_use_and_reuse():
    model = SGC(2, DS.num_features + DS.num_classes, DS.num_classes)
    task = NodeClassificationWithLabelUse(
        DS,
        model,
        lr=0.1,
        weight_decay=5e-5,
        epochs=12,
        mask_rate=0.5,
        use_labels=True,
        label_iters=1,
        reuse_start_epoch=5,
        verbose=False,
    )
    assert task.test_acc > 0.8, task.test_acc


def test_predictor_bucketing():
    from sgl_tpu.tasks.inference import predictor_from_task

    model = SGC(2, DS.num_features, DS.num_classes)
    task = NodeClassification(
        DS, model, lr=0.1, weight_decay=5e-5, epochs=10, verbose=False
    )
    pred = predictor_from_task(task)
    # odd request sizes share bucket compilations and return correct shapes
    for n in (1, 3, 8, 13, 100):
        out = pred.predict(np.arange(n))
        assert out.shape == (n, DS.num_classes)
    proba = pred.predict_proba([0, 5, 7])
    np.testing.assert_allclose(proba.sum(1), 1.0, rtol=1e-5)
    # predictions agree with the task's eval path
    logits = pred.predict(np.arange(DS.num_node))
    acc = (logits.argmax(1) == np.asarray(DS.y))[np.asarray(DS.test_idx)].mean()
    assert acc > 0.8


def test_nafs_online_softmax_matches_stacked():
    """The online multi-r smoother == the straightforward per-r formulation."""
    import jax
    import jax.numpy as jnp

    from sgl_tpu.graph import symmetric_normalized_weights
    from sgl_tpu.ops.graph_ops import k_hop_propagate
    from sgl_tpu.tasks import nafs_smooth_features
    from tests.conftest import random_graph

    g = random_graph(n=120, avg_deg=6, d=8, seed=4)
    x = jnp.asarray(np.asarray(g.x), jnp.float32)
    hops, r_list = 5, (0.5, 0.2)
    for method in ("mean", "max", "concat"):
        got = np.asarray(nafs_smooth_features(g, x, hops, r_list, method))
        per_r = []
        for r in r_list:
            adj = symmetric_normalized_weights(g, r=r)
            hops_arr = k_hop_propagate(adj, x, hops)
            ref_norm = jnp.linalg.norm(x, axis=1) + 1e-10
            norms = jnp.linalg.norm(hops_arr, axis=-1) + 1e-10
            cos = jnp.einsum("nd,knd->kn", x, hops_arr) / (norms * ref_norm[None])
            w = jax.nn.softmax(cos, axis=0)
            per_r.append(jnp.einsum("kn,knd->nd", w, hops_arr))
        stack = jnp.stack(per_r)
        want = {
            "mean": stack.mean(axis=0),
            "max": stack.max(axis=0),
            "concat": jnp.moveaxis(stack, 0, 1).reshape(stack.shape[1], -1),
        }[method]
        np.testing.assert_allclose(got, np.asarray(want), rtol=2e-4, atol=2e-5)


def test_nafs_sweep_matches_single_shot():
    """Each sweep emission equals an independent nafs_smooth_features call."""
    from sgl_tpu.tasks import nafs_smooth_features, nafs_smooth_sweep
    from tests.conftest import random_graph

    g = random_graph(n=90, avg_deg=5, d=7, seed=9)
    r_list = (0.5, 0.2)
    for method in ("mean", "concat", "simple"):
        for hop, feats in nafs_smooth_sweep(g, g.x, [0, 2, 4], r_list, method):
            want = nafs_smooth_features(g, g.x, hop, r_list, method)
            np.testing.assert_allclose(
                np.asarray(feats), np.asarray(want), rtol=2e-4, atol=2e-5
            )


def test_predictor_save_load_roundtrip(tmp_path):
    """The serving artifact restores to identical predictions without the
    graph or a re-precompute."""
    from sgl_tpu.datasets.synthetic import PlantedPartition
    from sgl_tpu.models.homo import SGC
    from sgl_tpu.tasks import NodeClassification, predictor_from_task
    from sgl_tpu.tasks.inference import Predictor

    ds = PlantedPartition(num_nodes=300)
    model = SGC(prop_steps=2, feat_dim=ds.num_features, output_dim=ds.num_classes)
    task = NodeClassification(
        ds, model, lr=0.1, weight_decay=5e-5, epochs=5, verbose=False
    )
    pred = predictor_from_task(task)
    ids = np.asarray([3, 7, 250, 11])
    want = pred.predict(ids)

    p = str(tmp_path / "artifact.pkl")
    pred.save(p)
    restored = Predictor.load(p)
    got = restored.predict(ids)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_plot_clusters_tsne(tmp_path):
    """plotClusters twin (reference clustering_metrics.py:72-86): t-SNE
    projection written to disk via the headless Agg backend."""
    pytest.importorskip("matplotlib")
    from sgl_tpu.tasks.clustering_metrics import clustering_metrics

    rng = np.random.default_rng(0)
    emb = rng.normal(size=(40, 8)).astype(np.float32)
    labels = rng.integers(0, 3, 40)
    cm = clustering_metrics(labels, labels)
    out = cm.plotClusters(emb, labels, path=str(tmp_path / "plot.png"))
    assert (tmp_path / "plot.png").stat().st_size > 0
    assert out.endswith("plot.png")


def test_node_classification_from_train_config():
    """SURVEY §5 'one dataclass layer serving all three roles': the task
    constructs from a TrainConfig, and explicit kwargs still override."""
    from sgl_tpu.datasets.synthetic import PlantedPartition
    from sgl_tpu.models.homo import SGC
    from sgl_tpu.tasks.node_classification import NodeClassification
    from sgl_tpu.utils import TrainConfig

    ds = PlantedPartition(num_nodes=200, feat_dim=8, p_in=0.1, seed=2)
    cfg = TrainConfig(lr=0.1, weight_decay=5e-5, epochs=10, seed=7)
    model = SGC(prop_steps=2, feat_dim=ds.num_features,
                output_dim=ds.num_classes)
    t = NodeClassification(ds, model, config=cfg, verbose=False)
    assert t._epochs == 10 and t._lr == 0.1 and t._seed == 7
    assert t.test_acc > 0.6
    # kwarg overrides win over the config
    model2 = SGC(prop_steps=2, feat_dim=ds.num_features,
                 output_dim=ds.num_classes)
    t2 = NodeClassification(ds, model2, epochs=3, config=cfg, verbose=False)
    assert t2._epochs == 3 and t2._lr == 0.1


def test_config_manager_from_train_config():
    from sgl_tpu.datasets.synthetic import PlantedPartition
    from sgl_tpu.search import ConfigManager
    from sgl_tpu.utils import TrainConfig

    ds = PlantedPartition(num_nodes=128, feat_dim=8, p_in=0.1, seed=3)
    cfg = TrainConfig(lr=0.05, weight_decay=1e-4, epochs=4, hidden_dim=24)
    configer = ConfigManager(arch=[2, 1, 0, 1, 0, 0, 0])
    configer._setParameters(ds, None, epochs=6, config=cfg)  # kwarg wins
    assert configer._epochs == 6
    assert configer._lr == 0.05 and configer._wd == 1e-4
    assert configer._hiddim == 24
