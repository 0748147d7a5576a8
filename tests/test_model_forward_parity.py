"""Whole-model forward parity against the reference implementation.

``test_reference_parity.py`` pins each operator/block numerically; these
tests pin the *composition*: for every homo model whose semantics the
rebuild reproduces exactly, run the reference model's full
``preprocess -> model_forward`` (and ``postprocess`` where present,
``sgl/models/base_model.py:23-67``) with its randomly-initialised torch
parameters, copy those parameters into our Flax tree, and assert the
logits are allclose.  This exercises the eager-vs-lazy aggregation split,
the fused propagate+aggregate path (GBP), batch-row slicing, and the
post-propagation stage end-to-end.

Intentional deviations NOT covered here (documented in PARITY.md):
 * GAMLP 'jk' / 'ori_ref' gates — the reference's ``.view(-1, K)`` axis
   scramble (``learnable_weighted_messahe_op.py:78,86``) is not replicated;
   we implement the intended per-node attention.
 * PASCA_V1 — the reference passes ``feat_dim`` where the 'simple' op
   expects ``prop_steps`` (argument-order quirk).
"""

import importlib.machinery
import importlib.util
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

torch = pytest.importorskip("torch")


class _Stub(types.ModuleType):
    """Attribute-producing stand-in for the reference's unused heavyweight
    dataset dependencies (torch_geometric, ogb, gensim, ...)."""

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return type(name, (), {})


_WANT_STUBS = [
    "torch_geometric",
    "torch_geometric.datasets",
    "torch_geometric.data",
    "torch_geometric.io",
    "ogb",
    "ogb.nodeproppred",
    "munkres",
    "gensim",
    "gensim.models",
    "networkx",
    "torch_sparse",
    "googledrivedownloader",
    "pandas",
]

# Stub ONLY packages that are genuinely absent (decided for the top-level
# name BEFORE any stub is installed — find_spec would otherwise see our own
# parent stub and skip the submodules).  Stubbing installed packages
# (networkx, pandas) poisons the whole pytest session: this module is
# imported at collection, so every later test sees the stub.  Stubs also
# carry a real ModuleSpec — torch._dynamo probes ``find_spec('networkx')``
# and raises on modules whose __spec__ is None.
_missing_tops = {
    top
    for top in {m.split(".")[0] for m in _WANT_STUBS}
    if importlib.util.find_spec(top) is None
}

try:
    for _m in _WANT_STUBS:
        if _m.split(".")[0] not in _missing_tops:
            continue
        mod = _Stub(_m)
        mod.__spec__ = importlib.machinery.ModuleSpec(_m, None)
        sys.modules.setdefault(_m, mod)
    # Importing sgl.models first trips a circular import between
    # sgl.data.base_dataset and sgl.dataset.__init__ — load datasets first.
    import sgl.dataset  # noqa: F401
    import sgl.models.base_model as _ref_bm
    import sgl.models.base_model_dist as _ref_bmd

    # sgl/models/homo/sgc_dist.py:1 imports BaseSGAPModelDist from the wrong
    # module (a latent reference bug); patch it in so homo/__init__ loads.
    _ref_bm.BaseSGAPModelDist = _ref_bmd.BaseSGAPModelDist
    import sgl.operators.base_op as ref_base_op
    from sgl.models.homo import (
        GAMLPRecursive as RefGAMLPRecursive,
        GBP as RefGBP,
        NAFS as RefNAFS,
        SGC as RefSGC,
        SIGN as RefSIGN,
        SSGC as RefSSGC,
    )

    # the PaSca archs are not exported from homo/__init__.py
    from sgl.models.homo.pasca_v2 import PASCA_V2 as RefPASCA_V2
    from sgl.models.homo.pasca_v3 import PASCA_V3 as RefPASCA_V3

    HAVE_REF = True
except Exception:  # reference not importable in this environment
    HAVE_REF = False

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference not importable")

from sgl_tpu.graph import to_scipy
from sgl_tpu.models.homo import (
    GAMLPRecursive,
    GBP,
    NAFS,
    PASCA_V2,
    PASCA_V3,
    SGC,
    SIGN,
    SSGC,
)
from tests.conftest import random_graph

K = 3
D = 10
C = 4
HID = 16
LAYERS = 3


@pytest.fixture(autouse=True)
def _force_scipy_fallback(monkeypatch):
    """The reference's compiled .so is absent; route its propagate through
    the scipy path (reference base_op.py:30-34)."""
    monkeypatch.setattr(ref_base_op.platform, "system", lambda: "Darwin")


@pytest.fixture
def g():
    return random_graph(n=150, avg_deg=8, d=D, seed=41)


def _dense(lin):
    return {
        "kernel": jnp.asarray(lin.weight.detach().numpy().T),
        "bias": jnp.asarray(lin.bias.detach().numpy()),
    }


def _copy_block(ref_mod):
    """Torch submodule -> flax param dict (Dense_i in order, shared PReLU)."""
    out = {
        f"Dense_{i}": _dense(lin)
        for i, lin in enumerate(
            m for m in ref_mod.modules() if isinstance(m, torch.nn.Linear)
        )
    }
    prelus = [m for m in ref_mod.modules() if isinstance(m, torch.nn.PReLU)]
    if prelus:
        out["PReLU_0"] = {
            "negative_slope": jnp.asarray(
                prelus[0].weight.detach().numpy().reshape(())
            )
        }
    return out


def _randomize_prelus(ref_model):
    """Move every PReLU slope off torch's constant 0.25 init so the copied-
    param comparison actually exercises the shared-slope handling (a wrong
    param read or missing cast would pass at the default)."""
    gen = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for m in ref_model.modules():
            if isinstance(m, torch.nn.PReLU):
                m.weight.copy_(torch.rand(m.weight.shape, generator=gen) * 0.8 + 0.05)


def _copied_params(ref_model, our_model, g):
    _randomize_prelus(ref_model)
    our_model.preprocess(g)
    tree = {"base_model": _copy_block(ref_model._base_model)}
    if our_model.pre_msg_learnable:
        tree["msg_op"] = _copy_block(ref_model._pre_msg_op)
    return {"params": tree}


def _ref_logits(ref_model, g, idx):
    ref_model.eval()
    ref_model.preprocess(to_scipy(g).tocsr(), np.asarray(g.x))
    with torch.no_grad():
        return ref_model.model_forward(torch.LongTensor(idx), "cpu").numpy()


def _check_model(ref_model, our_model, g, atol=1e-5):
    n = g.num_nodes
    params = _copied_params(ref_model, our_model, g)
    for idx in (np.arange(n), np.random.default_rng(5).choice(n, 37, False)):
        want = _ref_logits(ref_model, g, idx)
        got = np.asarray(our_model.apply(params, jnp.asarray(idx), train=False))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=atol)
    return params


def test_sgc_forward_parity(g):
    _check_model(RefSGC(K, D, C), SGC(K, D, C), g)


def test_ssgc_forward_parity(g):
    _check_model(RefSSGC(K, D, C), SSGC(K, D, C), g)


def test_sign_forward_parity(g):
    _check_model(
        RefSIGN(K, D, C, HID, LAYERS), SIGN(K, D, C, HID, LAYERS), g
    )


def test_gbp_forward_parity(g):
    # also exercises our fused propagate_aggregate fast path for fixed
    # per-hop weights (models/base.py preprocess)
    _check_model(RefGBP(K, D, C, HID, LAYERS), GBP(K, D, C, HID, LAYERS), g)


def test_gamlp_recursive_forward_parity(g):
    _check_model(
        RefGAMLPRecursive(K, D, C, HID, LAYERS),
        GAMLPRecursive(K, D, C, HID, LAYERS),
        g,
    )


def test_pasca_v2_forward_parity(g):
    _check_model(
        RefPASCA_V2(K, D, C, HID, LAYERS), PASCA_V2(K, D, C, HID, LAYERS), g
    )


def test_pasca_v3_forward_and_postprocess_parity(g):
    """V3 adds PPR post-propagation (reference ``homo/pasca_v3.py:14-15``):
    check the full preprocess -> forward -> postprocess chain."""
    post_steps = 2
    ref_model = RefPASCA_V3(K, post_steps, D, C, HID, LAYERS)
    our_model = PASCA_V3(K, post_steps, D, C, HID, LAYERS)
    params = _check_model(ref_model, our_model, g)

    idx = np.arange(g.num_nodes)
    want_logits = _ref_logits(ref_model, g, idx)
    with torch.no_grad():
        want_post = ref_model.postprocess(
            to_scipy(g).tocsr(), torch.tensor(want_logits)
        ).numpy()
    got_logits = our_model.apply(params, jnp.asarray(idx), train=False)
    got_post = np.asarray(our_model.postprocess(g, got_logits))
    np.testing.assert_allclose(got_post, want_post, rtol=1e-4, atol=1e-5)


def test_nafs_embedding_parity(g):
    """Training-free NAFS embeddings through the whole-model path."""
    ref_model = RefNAFS(K, D, D)
    our_model = NAFS(K, D, D)
    _check_model(ref_model, our_model, g)
