"""Structural transform tests (reference sgl/data/transforms.py parity)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sgl_tpu.graph import (
    add_edges,
    add_self_loops,
    biased_drop_edges,
    delete_repeated_edges,
    drop_edges,
    get_subgraph,
    mask_features,
    random_drop_edges,
    random_drop_nodes,
    remove_self_loops,
    sort_edges,
    to_undirected,
)
from sgl_tpu.kernels import sddmm
from sgl_tpu.graph import Graph, symmetric_normalized_weights
from tests.conftest import random_graph


@pytest.fixture
def g():
    return random_graph(n=60, avg_deg=6, d=4, seed=8)


def test_drop_edges_mask(g):
    mask = np.zeros(g.num_edges, bool)
    mask[: g.num_edges // 2] = True
    out = drop_edges(g, mask)
    assert out.num_edges == g.num_edges // 2


def test_drop_edges_force_undirected(g):
    out = random_drop_edges(g, p=0.5, force_undirected=True, seed=1)
    s, d, _ = out.edges()
    pairs = set(zip(s.tolist(), d.tolist()))
    assert all((b, a) in pairs for a, b in pairs)


def test_random_drop_edges_p0(g):
    assert random_drop_edges(g, p=0.0) is g
    with pytest.raises(ValueError):
        random_drop_edges(g, p=1.5)


def test_biased_drop_and_add_edges(g):
    mask = np.ones(g.num_edges, bool)
    mask[0] = False
    out = biased_drop_edges(g, mask)
    assert out.num_edges == g.num_edges - 1
    out2 = add_edges(out, [0, 1], [2, 3])
    assert out2.num_edges == out.num_edges + 2
    with pytest.raises(ValueError):
        add_edges(g, [0], [999])


def test_delete_repeated_edges(g):
    s, d, v = g.edges()
    doubled = add_edges(g, s[:5], d[:5])
    deduped = delete_repeated_edges(doubled)
    assert deduped.num_edges == g.num_edges


def test_self_loops_roundtrip(g):
    with_loops = add_self_loops(g)
    assert with_loops.num_edges == g.num_edges + g.num_nodes
    without = remove_self_loops(with_loops)
    assert without.num_edges == g.num_edges  # original had none


def test_sort_edges(g):
    out = sort_edges(g, by_src=True)
    s, _, _ = out.edges()
    assert (np.diff(s) >= 0).all()


def test_mask_features(g):
    x = np.asarray(g.x)
    rows = np.zeros(g.num_nodes, bool)
    rows[:3] = True
    mx = mask_features(x, rows, kind=0)
    assert (mx[:3] == 0).all() and (mx[3:] == x[3:]).all()
    cols = np.zeros(x.shape[1], bool)
    cols[0] = True
    mc = mask_features(x, cols, kind=1)
    assert (mc[:, 0] == 0).all()
    with pytest.raises(ValueError):
        mask_features(x, rows, kind=5)


def test_get_subgraph_reindex(g):
    keep = np.zeros(g.num_nodes, bool)
    keep[:30] = True
    sub = get_subgraph(g, keep)
    assert sub.num_nodes == 30
    s, d, _ = sub.edges()
    if s.size:
        assert s.max() < 30 and d.max() < 30
    # keep_ids variant: numbering preserved, dropped rows zeroed
    sub2 = get_subgraph(g, keep, keep_ids=True)
    assert sub2.num_nodes == g.num_nodes
    assert (np.asarray(sub2.x)[~keep] == 0).all()


def test_random_drop_nodes(g):
    sub, mask = random_drop_nodes(g, p=0.3, seed=4)
    assert sub.num_nodes == int(mask.sum())


def test_sddmm_matches_dense(g):
    adj = symmetric_normalized_weights(g)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(g.num_nodes, 6)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(g.num_nodes, 6)), jnp.float32)
    scores = np.asarray(sddmm(adj, a, b))
    s = np.asarray(adj.src)
    d = np.asarray(adj.dst)
    want = (np.asarray(a)[s] * np.asarray(b)[d]).sum(1)
    np.testing.assert_allclose(scores, want, rtol=1e-5, atol=1e-6)


def test_reorder_nodes_preserves_propagation():
    """Propagating the reordered graph then un-permuting must equal the
    original propagation (exact relabeling invariance)."""
    import jax.numpy as jnp

    from sgl_tpu.graph import (
        degree_ordering,
        rcm_ordering,
        reorder_nodes,
        symmetric_normalized_weights,
    )
    from sgl_tpu.kernels import spmm

    g = random_graph(n=120, avg_deg=8, d=6, seed=51)
    base = np.asarray(spmm(symmetric_normalized_weights(g), jnp.asarray(g.x)))
    for perm in [rcm_ordering(g), degree_ordering(g),
                 np.random.default_rng(0).permutation(120)]:
        g2 = reorder_nodes(g, perm)
        out = np.asarray(
            spmm(symmetric_normalized_weights(g2), jnp.asarray(g2.x))
        )
        np.testing.assert_allclose(out[perm], base, rtol=1e-4, atol=1e-5)


def test_reorder_nodes_rejects_bad_perm():
    from sgl_tpu.graph import reorder_nodes

    g = random_graph(n=30, seed=5)
    with pytest.raises(ValueError):
        reorder_nodes(g, np.zeros(30, np.int64))


def test_rcm_reduces_bandwidth_on_path_graph():
    """A shuffled path graph must come back to ~unit bandwidth under RCM."""
    from sgl_tpu.graph import Graph, rcm_ordering, reorder_nodes

    n = 200
    rng = np.random.default_rng(3)
    shuffle = rng.permutation(n)
    src = shuffle[np.arange(n - 1)]
    dst = shuffle[np.arange(1, n)]
    g = Graph.from_coo(
        np.concatenate([src, dst]).astype(np.int32),
        np.concatenate([dst, src]).astype(np.int32),
        num_nodes=n,
        pad_multiple=64,
    )
    g2 = reorder_nodes(g, rcm_ordering(g))
    s, d, _ = g2.edges()
    assert int(np.abs(s - d).max()) <= 2
