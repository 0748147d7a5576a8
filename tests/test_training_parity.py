"""End-to-end TRAINING parity against the reference implementation.

Forward parity with copied params (``test_model_forward_parity.py``) cannot
catch divergence in training *dynamics* — optimizer step order, weight
decay placement, dropout streams, init scales.  Here both frameworks train
to completion on one identical synthetic graph + split (the reference loop
``sgl/tasks/node_classification.py:45-92`` / ``sgl/tasks/utils.py:67-78``
vs our jitted Optax loop) and the final best-val test accuracies must
agree within ±2 points, averaged over seeds (RNG streams are framework-
specific, so per-seed runs differ; the mean must not).
"""

import contextlib
import io

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# importing this module installs the (missing-only) reference stubs and
# patches the BaseSGAPModelDist import quirk
from tests.test_model_forward_parity import HAVE_REF

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference not importable")

if HAVE_REF:
    import sgl.operators.base_op as ref_base_op
    from sgl.models.homo import GAMLP as RefGAMLP, SGC as RefSGC
    from sgl.tasks import NodeClassification as RefNC

from sgl_tpu.datasets.synthetic import PlantedPartition
from sgl_tpu.graph import to_scipy
from sgl_tpu.models.homo import GAMLP, SGC
from sgl_tpu.tasks.node_classification import NodeClassification


@pytest.fixture(autouse=True)
def _force_scipy_fallback(monkeypatch):
    """The reference's compiled .so is absent; route its propagate through
    the scipy path (reference base_op.py:30-34)."""
    monkeypatch.setattr(ref_base_op.platform, "system", lambda: "Darwin")


class _RefDS:
    """Duck-typed dataset for the reference task (it only reads these
    attributes in the full-batch path, ``node_classification.py:16-36``)."""

    def __init__(self, ds):
        self.adj = to_scipy(ds.graph).tocsr()
        self.x = np.asarray(ds.x)
        self.y = torch.LongTensor(np.asarray(ds.y))
        self.train_idx = torch.LongTensor(np.asarray(ds.train_idx))
        self.val_idx = torch.LongTensor(np.asarray(ds.val_idx))
        self.test_idx = torch.LongTensor(np.asarray(ds.test_idx))
        self.num_node = ds.num_node


@pytest.fixture(scope="module")
def ds():
    return PlantedPartition(num_nodes=500, feat_dim=16, feature_noise=2.5, seed=11)


def _ref_acc(ds, make_model, lr, seeds, epochs=100):
    rds = _RefDS(ds)
    accs = []
    for seed in seeds:
        # seed BEFORE building the model: the reference task only seeds in
        # its constructor, i.e. after init weights are drawn — without
        # this, ref accuracy depends on whatever torch RNG state earlier
        # tests left behind (measured order-dependent band flakiness)
        torch.manual_seed(seed)
        model = make_model()
        with contextlib.redirect_stdout(io.StringIO()):  # per-epoch prints
            accs.append(
                RefNC(
                    rds,
                    model,
                    lr=lr,
                    weight_decay=5e-5,
                    epochs=epochs,
                    device="cpu",
                    seed=seed,
                ).test_acc
            )
    return float(np.mean(accs))


def _our_acc(ds, make_model, lr, seeds, epochs=100):
    return float(
        np.mean(
            [
                NodeClassification(
                    ds,
                    make_model(),
                    lr=lr,
                    weight_decay=5e-5,
                    epochs=epochs,
                    verbose=False,
                    seed=seed,
                ).test_acc
                for seed in seeds
            ]
        )
    )


def test_sgc_training_parity(ds):
    """Eager-aggregated LogReg: deterministic-ish dynamics, tight band."""
    seeds = (42, 7)
    ref = _ref_acc(ds, lambda: RefSGC(3, ds.num_features, ds.num_classes), 0.1, seeds)
    got = _our_acc(ds, lambda: SGC(3, ds.num_features, ds.num_classes), 0.1, seeds)
    assert abs(got - ref) <= 0.02, (got, ref)


def test_gamlp_products_shaped_training_parity():
    """Products-SHAPED band (VERDICT r2 next #8): ≈100 feat dims, 47
    classes, official-split-sized train fraction (196,615 of 2.4M ≈ 8%),
    hidden 512 × 3 layers at the reference's shipped lr/wd
    (/root/reference/examples/gamlp_products.py:13-17) — closing the gap
    between parity-on-tiny-SBMs and the BASELINE §(d) products row.
    Node count is scaled down for CPU; every shape signature that affects
    training dynamics (class count, feature dim, split fractions, model
    size, optimizer config) matches the real workload."""
    pds = PlantedPartition(
        num_nodes=3000, num_classes=47, feat_dim=100,
        p_in=0.15, p_out=0.001, feature_noise=4.0, seed=13,
        train_ratio=0.08, val_ratio=0.02,
    )
    seeds = (42, 7, 19)
    ref = _ref_acc(
        pds,
        lambda: RefGAMLP(3, pds.num_features, pds.num_classes, 512, 3),
        0.1,
        seeds,
        epochs=60,
    )
    got = _our_acc(
        pds,
        lambda: GAMLP(3, pds.num_features, pds.num_classes,
                      hidden_dim=512, num_layers=3),
        0.1,
        seeds,
        epochs=60,
    )
    assert 0.3 < ref < 0.98, ref  # the config must stay in the sensitive band
    assert abs(got - ref) <= 0.02, (got, ref)


def test_gamlp_training_parity(ds):
    """Learnable JK attention + dropout MLP: the full lazy-aggregation
    training path (per-step aggregation inside the grad graph)."""
    seeds = (42, 7, 19)
    ref = _ref_acc(
        ds,
        lambda: RefGAMLP(3, ds.num_features, ds.num_classes, 32, 2),
        0.01,
        seeds,
    )
    got = _our_acc(
        ds,
        lambda: GAMLP(3, ds.num_features, ds.num_classes, hidden_dim=32, num_layers=2),
        0.01,
        seeds,
    )
    assert abs(got - ref) <= 0.02, (got, ref)


def test_gamlp_products_shaped_training_parity_bf16():
    """bf16-precompute variant of the products-shaped band (VERDICT r3 #8):
    the bf16 precompute is the documented production default, so its
    TRAINING-parity — not just the feature-delta study — is pinned with
    the same ±2-point band against the reference trained on f32."""
    import jax.numpy as jnp

    pds = PlantedPartition(
        num_nodes=3000, num_classes=47, feat_dim=100,
        p_in=0.15, p_out=0.001, feature_noise=4.0, seed=13,
        train_ratio=0.08, val_ratio=0.02,
    )
    seeds = (42, 7, 19)
    ref = _ref_acc(
        pds,
        lambda: RefGAMLP(3, pds.num_features, pds.num_classes, 512, 3),
        0.1,
        seeds,
        epochs=60,
    )
    got = float(
        np.mean(
            [
                NodeClassification(
                    pds,
                    GAMLP(3, pds.num_features, pds.num_classes,
                          hidden_dim=512, num_layers=3),
                    lr=0.1,
                    weight_decay=5e-5,
                    epochs=60,
                    verbose=False,
                    seed=seed,
                    precompute_dtype=jnp.bfloat16,
                ).test_acc
                for seed in seeds
            ]
        )
    )
    assert 0.3 < ref < 0.98, ref
    assert abs(got - ref) <= 0.02, (got, ref)
