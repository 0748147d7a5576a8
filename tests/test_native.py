"""Native C++ graph builder vs numpy reference."""

import numpy as np
import pytest

from sgl_tpu.graph import native


def _rand_edges(n_nodes=500, n_edges=5000, seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.integers(0, n_nodes, n_edges).astype(np.int32),
        rng.integers(0, n_nodes, n_edges).astype(np.int32),
        rng.random(n_edges).astype(np.float32),
    )


def test_native_compiles():
    assert native.native_available(), "g++ build of libsglgraph.so failed"


def test_sort_matches_numpy():
    src, dst, val = _rand_edges()
    s, d, v = native.sort_edges_by_dst(src, dst, val, 500)
    order = np.argsort(dst, kind="stable")
    np.testing.assert_array_equal(d, dst[order])
    np.testing.assert_array_equal(s, src[order])
    np.testing.assert_array_equal(v, val[order])


def test_degrees_and_weights_match_numpy():
    src, dst, val = _rand_edges(seed=3)
    deg = native.compute_degrees(src, val, 500)
    want = np.zeros(500, np.float32)
    np.add.at(want, src, val)
    np.testing.assert_allclose(deg, want, rtol=1e-5)

    w = native.normalized_weights(src, dst, val, deg, 0.5)
    with np.errstate(divide="ignore"):
        left = np.where(deg > 0, deg ** -0.5, 0.0)
    want_w = left[dst] * val * left[src]
    np.testing.assert_allclose(w, want_w, rtol=1e-4, atol=1e-6)


def test_full_build_matches_jax_normalize():
    import jax.numpy as jnp

    from sgl_tpu.graph import Graph, symmetric_normalized_weights
    from sgl_tpu.kernels import SparseAdj, spmm

    src, dst, val = _rand_edges(n_nodes=120, n_edges=800, seed=5)
    g = Graph.from_coo(src, dst, val, num_nodes=120, pad_multiple=256)
    adj_jax = symmetric_normalized_weights(g)
    rs, rd, rv = g.edges()
    s, d, w = native.build_normalized_adj_host(rs, rd, rv, 120, r=0.5)
    adj_native = SparseAdj(
        jnp.asarray(s), jnp.asarray(d), jnp.asarray(w), 120, sorted_by_dst=True
    )
    x = jnp.asarray(np.random.default_rng(0).normal(size=(120, 8)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(spmm(adj_native, x)),
        np.asarray(spmm(adj_jax, x)),
        rtol=1e-4,
        atol=1e-5,
    )
