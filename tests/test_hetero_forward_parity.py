"""Whole-model forward parity for the hetero (NARS) templates.

Both frameworks are fed the SAME relation-subset subgraph list (sampled by
our ``nars_preprocess``), the reference via its ``subgraph_list=`` argument
(``sgl/models/base_model.py:85-125``), with the reference's torch parameters
copied into our Flax tree.  This pins the stacked ``(K+1, S, N_pred, D)``
layout, the block-diagonal batched propagation, the subgraph-major feature
packing of the fast model, and both aggregators against the reference's
ragged-list implementation.
"""

import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

torch = pytest.importorskip("torch")

# reuse the dependency stubs + import-order workarounds
from tests.test_model_forward_parity import HAVE_REF, _copy_block, _dense  # noqa: E402

if HAVE_REF:
    import sgl.operators.base_op as ref_base_op
    from sgl.data.base_dataset import HeteroNodeDataset as RefHeteroNodeDataset
    from sgl.models.hetero.fast_nars_sgc import (
        Fast_NARS_SGC_WithLearnableWeights as RefFastNARS,
    )
    from sgl.models.hetero.nars_sign import NARS_SIGN as RefNARS_SIGN
    from sgl.models.simple_models import MultiLayerPerceptron as RefMLP

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference not importable")

from sgl_tpu.datasets.synthetic import SyntheticHeteroDataset
from sgl_tpu.graph import to_scipy
from sgl_tpu.models.hetero import Fast_NARS_SGC_WithLearnableWeights, NARS_SIGN

K = 2
D = 16
C = 3
HID = 12
LAYERS = 2
PREDICT = "paper"


@pytest.fixture(autouse=True)
def _force_scipy_fallback(monkeypatch):
    monkeypatch.setattr(ref_base_op.platform, "system", lambda: "Darwin")


class _RefDatasetShim(RefHeteroNodeDataset):
    """Bypass the download/process lifecycle: the reference's hetero
    ``preprocess`` only reads node_types / node_id_dict / num_node when a
    ``subgraph_list`` is supplied."""

    def __init__(self, node_types, node_id_dict, num_node):
        self._data = types.SimpleNamespace(
            node_types=node_types, node_id_dict=node_id_dict, num_node=num_node
        )


def _setup():
    ds = SyntheticHeteroDataset(seed=5)
    sub = ds.nars_preprocess(ds.edge_types, PREDICT, 3, 2, seed=11)
    # keep only subsets touching the predict class, in sampling order, so the
    # subgraph count S is identical on both sides
    kept = []
    for key, val in sub.items():
        endpoints = set()
        for et in key:
            parts = et.split("__")
            endpoints.update((parts[0], parts[-1]))
        if PREDICT in endpoints:
            kept.append((key, val))
    assert kept, "sampled subgraphs must touch the predict class"

    ours_list = kept
    ref_list = [
        (key, (to_scipy(g).tocsr(), np.asarray(f, np.float32), np.asarray(nid)))
        for key, (g, f, nid) in kept
    ]
    hg = ds.data
    shim = _RefDatasetShim(hg.node_types, hg.node_id_dict, hg.num_node)
    return ds, shim, ours_list, ref_list, len(kept)


def _ref_logits(ref_model, shim, ref_list, idx):
    ref_model.eval()
    ref_model.preprocess(shim, PREDICT, subgraph_list=ref_list)
    with torch.no_grad():
        return ref_model.model_forward(torch.LongTensor(idx), "cpu").numpy()


def test_nars_sign_forward_parity():
    ds, shim, ours_list, ref_list, s = _setup()
    ref_model = RefNARS_SIGN(K, D, C, HID, LAYERS, s)
    our_model = NARS_SIGN(K, D, C, HID, LAYERS, s)
    our_model.preprocess(ds, PREDICT, subgraph_list=ours_list)

    # copy: aggregator ParameterList -> (K+1, D, S); per-hop projection MLPs
    # -> MultiLayerPerceptron_i; base MLP -> base_model
    agg_w = jnp.stack(
        [jnp.asarray(p.detach().numpy()) for p in ref_model._aggregator.parameters()]
    )
    proj_mlps = [
        m for m in ref_model._pre_msg_op.modules() if isinstance(m, RefMLP)
    ]
    params = {
        "params": {
            "aggregator": {"weight": agg_w},
            "msg_op": {
                f"MultiLayerPerceptron_{i}": _copy_block(m)
                for i, m in enumerate(proj_mlps)
            },
            "base_model": _copy_block(ref_model._base_model),
        }
    }

    n_pred = ds.data.num_node[PREDICT]
    for idx in (np.arange(n_pred), np.random.default_rng(2).choice(n_pred, 23, False)):
        want = _ref_logits(ref_model, shim, ref_list, idx)
        got = np.asarray(
            our_model.net.apply(
                params, our_model.batch_input(jnp.asarray(idx)), train=False
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fast_nars_forward_and_subgraph_weight_parity():
    ds, shim, ours_list, ref_list, s = _setup()
    ref_model = RefFastNARS(K, D, C, HID, LAYERS, s)
    our_model = Fast_NARS_SGC_WithLearnableWeights(K, D, C, HID, LAYERS, s)
    our_model.preprocess(ds, PREDICT, subgraph_list=ours_list)

    # perturb the reference's ones-init so the subgraph-major packing order
    # (s*(K+1)+k) is actually exercised by the copy
    ref_w = list(ref_model._aggregator.parameters())[0]
    with torch.no_grad():
        ref_w.copy_(torch.randn_like(ref_w))

    params = {
        "params": {
            "aggregator": {"weight": jnp.asarray(ref_w.detach().numpy())},
            "base_model": _copy_block(ref_model._base_model),
        }
    }

    n_pred = ds.data.num_node[PREDICT]
    for idx in (np.arange(n_pred), np.random.default_rng(3).choice(n_pred, 23, False)):
        want = _ref_logits(ref_model, shim, ref_list, idx)
        got = np.asarray(
            our_model.net.apply(
                params, our_model.batch_input(jnp.asarray(idx)), train=False
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # learned per-subgraph importance readout (reference fast_nars_sgc.py:17-19)
    want_sw = ref_model.subgraph_weight.detach().numpy()
    got_sw = np.asarray(our_model.subgraph_weight(params))
    np.testing.assert_allclose(got_sw, want_sw, rtol=1e-5)
