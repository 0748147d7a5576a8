"""Kernel-layer unit tests: SpMM backends and normalization vs scipy.

Mirrors the rebuild test strategy in SURVEY.md §4: Pallas/XLA kernels are
checked ``allclose`` against a scipy reference, the same ground truth the
reference's C kernels were implicitly validated against.
"""

import numpy as np
import pytest
import scipy.sparse as sp
import jax
import jax.numpy as jnp

from sgl_tpu.graph import (
    symmetric_normalized_weights,
    ppr_weights,
    row_normalized_weights,
)
from sgl_tpu.kernels import prepare_chunked, spmm, spmm_pallas
from tests.conftest import random_graph, graph_to_csr


def reference_sym_norm(adj: sp.csr_matrix, r: float) -> sp.csr_matrix:
    """The reference's adj_to_symmetric_norm (operators/utils.py:76-89)."""
    adj = adj + sp.eye(adj.shape[0])
    deg = np.array(adj.sum(1)).flatten()
    left = np.power(deg, r - 1, where=deg > 0) * (deg > 0)
    right = np.power(deg, -r, where=deg > 0) * (deg > 0)
    return sp.diags(left) @ adj.T @ sp.diags(right)


@pytest.mark.parametrize("weighted", [False, True])
@pytest.mark.parametrize("r", [0.5, 0.3, 1.0])
def test_sym_norm_spmm_matches_scipy(weighted, r):
    g = random_graph(n=150, weighted=weighted, seed=3)
    csr = graph_to_csr(g)
    adj = symmetric_normalized_weights(g, r=r)
    got = np.asarray(spmm(adj, jnp.asarray(g.x)))
    want = reference_sym_norm(csr, r) @ g.x
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ppr_matches_scipy():
    g = random_graph(n=120, seed=5)
    csr = graph_to_csr(g)
    alpha = 0.3
    adj = ppr_weights(g, r=0.5, alpha=alpha)
    got = np.asarray(spmm(adj, jnp.asarray(g.x)))
    mat = (1 - alpha) * reference_sym_norm(csr, 0.5) + alpha * sp.eye(g.num_nodes)
    want = mat @ g.x
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_row_norm():
    g = random_graph(n=80, seed=7)
    csr = graph_to_csr(g) + sp.eye(80)
    deg = np.array(csr.sum(0)).flatten()  # in-degrees of dst
    adj = row_normalized_weights(g)
    got = np.asarray(spmm(adj, jnp.asarray(g.x)))
    # y_t = sum_s a[s,t] x_s / deg_in[t]  ==  D_in^-1 A^T x
    want = sp.diags(1.0 / deg) @ csr.T @ g.x
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_host_normalization_matches_jit():
    """The native/numpy host normalization (huge-graph path) must produce
    exactly the jitted edge weights, for both laplacian and PPR."""
    from sgl_tpu.graph import (
        ppr_weights,
        ppr_weights_host,
        symmetric_normalized_weights,
        symmetric_normalized_weights_host,
    )

    g = random_graph(n=250, avg_deg=9, seed=41)
    x = jnp.asarray(g.x)
    for jit_fn, host_fn in [
        (lambda: symmetric_normalized_weights(g, r=0.4),
         lambda: symmetric_normalized_weights_host(g, r=0.4)),
        (lambda: ppr_weights(g, r=0.5, alpha=0.25),
         lambda: ppr_weights_host(g, r=0.5, alpha=0.25)),
    ]:
        want = np.asarray(spmm(jit_fn(), x))
        host = host_fn()
        assert host.sorted_by_dst
        got = np.asarray(spmm(host, x))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_spmm_grad_flows():
    g = random_graph(n=60, seed=1)
    adj = symmetric_normalized_weights(g)

    def loss(x):
        return jnp.sum(spmm(adj, x) ** 2)

    grad = jax.grad(loss)(jnp.asarray(g.x))
    assert np.isfinite(np.asarray(grad)).all()
    assert np.abs(np.asarray(grad)).sum() > 0


def test_pallas_spmm_interpret_matches_segment():
    g = random_graph(n=300, avg_deg=12, d=20, seed=11)
    adj = symmetric_normalized_weights(g, sort=True)
    x = jnp.asarray(g.x)
    want = np.asarray(spmm(adj, x))
    got = np.asarray(spmm_pallas(prepare_chunked(adj), x, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_spmm_hub_node():
    """A hub with degree >> CHUNK exercises the multi-chunk tile path."""
    n = 400
    hub_src = np.arange(1, n, dtype=np.int32)
    hub_dst = np.zeros(n - 1, dtype=np.int32)
    src = np.concatenate([hub_src, hub_dst])
    dst = np.concatenate([hub_dst, hub_src])
    from sgl_tpu.graph import Graph

    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, 8)).astype(np.float32)
    g = Graph.from_coo(src, dst, num_nodes=n, x=x, pad_multiple=256)
    adj = symmetric_normalized_weights(g)
    want = np.asarray(spmm(adj, jnp.asarray(x)))
    got = np.asarray(spmm_pallas(prepare_chunked(adj), jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("hub_k", [0, 16, "auto"])
def test_pallas_spmm_split_paths(hub_k):
    """diag/hub-split layouts must match the unsplit result exactly."""
    g = random_graph(n=500, avg_deg=14, d=24, seed=17)
    adj = symmetric_normalized_weights(g, sort=True)
    x = jnp.asarray(g.x)
    want = np.asarray(spmm(adj, x))
    ch = prepare_chunked(adj, split_diag=True, hub_k=hub_k)
    if hub_k == 16:
        assert ch.hub_ids is not None and ch.hub_ids.shape[0] == 16
        assert ch.hub_m.shape == (g.num_nodes, 16)
    # the diag split is coupled to the hub split (measured de-fusion quirk)
    assert (ch.diag is not None) == (ch.hub_ids is not None)
    got = np.asarray(spmm_pallas(ch, x, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # the segment backend must honor the same extras
    got_seg = np.asarray(spmm(ch, x, backend="segment"))
    np.testing.assert_allclose(got_seg, want, rtol=1e-4, atol=1e-5)


def test_pallas_spmm_split_grad():
    """VJP through the split layout equals the dense-transpose product."""
    g = random_graph(n=200, avg_deg=10, d=8, seed=19)
    adj = symmetric_normalized_weights(g, sort=True)
    ch = prepare_chunked(adj, split_diag=True, hub_k=16)
    x = jnp.asarray(g.x)

    def loss(x):
        return jnp.sum(spmm_pallas(ch, x, True) ** 2)

    got = np.asarray(jax.grad(loss)(x))
    # reference: dense A^T (2 A x)
    csr = reference_sym_norm(graph_to_csr(g), 0.5)
    want = csr.T @ (2 * (csr @ g.x))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)


def test_streaming_spmm_matches_segment():
    """Multi-part streaming path (huge-graph mode) forced via a tiny part
    size; must equal the one-shot result."""
    from sgl_tpu.kernels import prepare_chunked_parts, spmm_pallas_streaming
    from sgl_tpu.kernels.pallas_spmm import CHUNK

    g = random_graph(n=700, avg_deg=10, d=12, seed=13)
    adj = symmetric_normalized_weights(g)
    x = jnp.asarray(g.x)
    want = np.asarray(spmm(adj, x))
    bundle = prepare_chunked_parts(adj, max_edges_per_part=2 * CHUNK)
    assert bundle[0].num_parts > 1, "part size did not force splitting"
    got = np.asarray(spmm_pallas_streaming(bundle, x, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_graph_op_adj_cache():
    from sgl_tpu.ops.graph_ops import LaplacianGraphOp

    g = random_graph(n=80, seed=21)
    op = LaplacianGraphOp(2)
    a1 = op._adj_for(g, None)
    a2 = op._adj_for(g, None)
    assert a1 is a2  # cache hit on same graph
    g2 = random_graph(n=80, seed=22)
    a3 = op._adj_for(g2, None)
    assert a3 is not a1  # different graph rebuilds


def test_pallas_spmm_bf16_single_pass():
    """bf16 features take the one-matmul kernel (no lo half) and match the
    f32 result to bf16 precision; output dtype follows the input."""
    g = random_graph(n=500, avg_deg=14, d=24, seed=23)
    adj = symmetric_normalized_weights(g, sort=True)
    ch = prepare_chunked(adj)
    x32 = jnp.asarray(g.x)
    want = np.asarray(spmm_pallas(ch, x32, interpret=True))
    got = spmm_pallas(ch, x32.astype(jnp.bfloat16), interpret=True)
    assert got.dtype == jnp.bfloat16
    scale = np.abs(want).max()
    np.testing.assert_allclose(
        np.asarray(got, np.float32), want, rtol=0, atol=2e-2 * scale
    )


def test_streaming_spmm_bf16_single_pass():
    """The streaming (huge-graph) path takes the same bf16 one-matmul
    dispatch and stays within bf16 tolerance of the f32 result."""
    from sgl_tpu.kernels import prepare_chunked_parts, spmm_pallas_streaming
    from sgl_tpu.kernels.pallas_spmm import CHUNK

    g = random_graph(n=700, avg_deg=12, d=16, seed=29)
    adj = symmetric_normalized_weights(g, sort=True)
    x32 = jnp.asarray(g.x)
    bundle = prepare_chunked_parts(adj, max_edges_per_part=2 * CHUNK)
    want = np.asarray(spmm_pallas_streaming(bundle, x32, interpret=True))
    got = spmm_pallas_streaming(bundle, x32.astype(jnp.bfloat16), interpret=True)
    assert got.dtype == jnp.bfloat16
    scale = np.abs(want).max()
    np.testing.assert_allclose(
        np.asarray(got, np.float32), want, rtol=0, atol=2e-2 * scale
    )


def test_segment_reduce_acc_semantics():
    """The aliased accumulator kernel (streaming parts): contributions
    land at the scalar-prefetch tile offset ON TOP of the live ``acc``
    values, and blocks the grid never visits keep ``acc`` bit-exactly —
    the overlap-add contract mid-tile part splits rely on.  Covers the
    wide-block (tile_r=256) variant and both hi/lo dispatches."""
    from sgl_tpu.kernels.pallas_spmm import _segment_reduce_mxu_acc

    rng = np.random.default_rng(7)
    chunk, d, n_chunks = 64, 128, 6
    for tile_r, off_t in ((128, 2), (256, 1)):
        total_tiles = 5
        ct = jnp.asarray(
            np.sort(rng.integers(0, 2, n_chunks)).astype(np.int32)
        )
        dst = rng.integers(0, tile_r, (n_chunks, chunk)).astype(np.int32)
        dst = dst + np.asarray(ct)[:, None] * tile_r
        msgs = rng.normal(size=(n_chunks * chunk, d)).astype(np.float32)
        acc = rng.normal(size=(total_tiles * tile_r, d)).astype(np.float32)
        expect = acc.copy()
        for c in range(n_chunks):
            for e in range(chunk):
                expect[int(dst[c, e]) + off_t * tile_r] += msgs[c * chunk + e]
        hi = jnp.asarray(msgs, jnp.bfloat16)
        lo = (jnp.asarray(msgs) - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        off = jnp.asarray([off_t], jnp.int32)
        for lo_arg, atol in ((lo, 1e-4), (None, 2e-2)):
            got = np.asarray(
                _segment_reduce_mxu_acc(
                    hi, lo_arg, jnp.asarray(dst.reshape(-1)), ct,
                    jnp.asarray(acc), off, interpret=True, tile_r=tile_r,
                )
            )
            scale = np.abs(expect).max()
            np.testing.assert_allclose(
                got, expect, rtol=0, atol=atol * scale
            )
            # unvisited blocks: bit-exact acc passthrough (tiles past
            # off_t+2 and before off_t are never in the grid's range)
            assert np.array_equal(
                got[(off_t + 2) * tile_r:], acc[(off_t + 2) * tile_r:]
            )
            assert np.array_equal(
                got[: off_t * tile_r], acc[: off_t * tile_r]
            )


def test_spmm_multi_matches_per_r():
    """One multi-weight pass == R independent SpMMs (shared structure)."""
    import jax.numpy as jnp

    from sgl_tpu.graph import symmetric_normalized_weights
    from sgl_tpu.kernels import spmm
    from sgl_tpu.kernels.sparse import spmm_multi
    from tests.conftest import random_graph

    g = random_graph(n=150, avg_deg=7, d=9, seed=11)
    r_list = (0.5, 0.3, 0.0)
    adjs = [symmetric_normalized_weights(g, r=r) for r in r_list]
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(150, 9)).astype(np.float32)
    )
    got = np.asarray(spmm_multi(adjs, x))
    for i, adj in enumerate(adjs):
        np.testing.assert_allclose(
            got[i], np.asarray(spmm(adj, x)), rtol=1e-4, atol=1e-5
        )
    # distinct x per r
    xs = jnp.asarray(
        np.random.default_rng(2).normal(size=(3, 150, 9)).astype(np.float32)
    )
    got = np.asarray(spmm_multi(adjs, xs))
    for i, adj in enumerate(adjs):
        np.testing.assert_allclose(
            got[i], np.asarray(spmm(adj, xs[i])), rtol=1e-4, atol=1e-5
        )


def test_spmm_pallas_multi_interpret_matches_segment_multi():
    import jax.numpy as jnp

    from sgl_tpu.graph import symmetric_normalized_weights
    from sgl_tpu.kernels.pallas_spmm import (
        prepare_chunked_multi,
        spmm_pallas_multi,
    )
    from sgl_tpu.kernels.sparse import spmm_multi
    from tests.conftest import random_graph

    g = random_graph(n=200, avg_deg=6, d=10, seed=21)
    adjs = [symmetric_normalized_weights(g, r=r) for r in (0.5, 0.1)]
    xs = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 200, 10)).astype(np.float32)
    )
    struct, w_stack = prepare_chunked_multi(adjs)
    got = np.asarray(spmm_pallas_multi(struct, w_stack, xs, interpret=True))
    want = np.asarray(spmm_multi(adjs, xs))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# out-of-core SpMM (features + edges host-resident; beyond reference, whose
# "billions of nodes" scaling runs the whole precompute in host RAM on CPU)
# ---------------------------------------------------------------------------


def test_out_of_core_matches_segment():
    from sgl_tpu.kernels import prepare_out_of_core, spmm_out_of_core
    from sgl_tpu.kernels.pallas_spmm import CHUNK

    g = random_graph(n=700, avg_deg=10, d=12, seed=17)
    adj = symmetric_normalized_weights(g)
    x = np.asarray(g.x)
    want = np.asarray(spmm(adj, jnp.asarray(x)))
    for split_diag in (True, False):
        oc = prepare_out_of_core(
            adj, max_edges_per_part=2 * CHUNK, split_diag=split_diag
        )
        assert oc.num_parts > 1, "part size did not force splitting"
        # the column workspace must be a strict subset of the features
        assert all(p.cols.shape[0] < g.num_nodes for p in oc.parts)
        got = spmm_out_of_core(oc, x, interpret=True)
        assert got.dtype == x.dtype
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_out_of_core_k_hop_and_sink():
    from sgl_tpu.kernels import k_hop_out_of_core, prepare_out_of_core
    from sgl_tpu.kernels.pallas_spmm import CHUNK
    from sgl_tpu.ops.graph_ops import LaplacianGraphOp

    g = random_graph(n=500, avg_deg=8, d=8, seed=23)
    op = LaplacianGraphOp(3)
    want = np.asarray(op.propagate(g, g.x, backend="segment"))
    oc = prepare_out_of_core(
        symmetric_normalized_weights(g), max_edges_per_part=2 * CHUNK
    )
    hops = k_hop_out_of_core(oc, np.asarray(g.x), 3, interpret=True)
    np.testing.assert_allclose(np.stack(hops), want, rtol=2e-4, atol=2e-5)

    sunk = {}
    out = k_hop_out_of_core(
        oc, np.asarray(g.x), 3,
        hop_sink=lambda k, arr: sunk.__setitem__(k, arr), interpret=True
    )
    assert out is None and sorted(sunk) == [0, 1, 2, 3]
    np.testing.assert_allclose(np.stack([sunk[k] for k in range(4)]), want,
                               rtol=2e-4, atol=2e-5)


def test_out_of_core_bf16_single_pass():
    from sgl_tpu.kernels import prepare_out_of_core, spmm_out_of_core
    from sgl_tpu.kernels.pallas_spmm import CHUNK

    g = random_graph(n=400, avg_deg=8, d=8, seed=29)
    adj = symmetric_normalized_weights(g)
    x32 = np.asarray(g.x)
    oc = prepare_out_of_core(adj, max_edges_per_part=2 * CHUNK)
    want = spmm_out_of_core(oc, x32, interpret=True)
    got = spmm_out_of_core(oc, x32.astype(jnp.bfloat16), interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        got.astype(np.float32), want, rtol=3e-2, atol=3e-2
    )


def test_out_of_core_device_edge_cache():
    from sgl_tpu.kernels import prepare_out_of_core, spmm_out_of_core
    from sgl_tpu.kernels.pallas_spmm import CHUNK

    g = random_graph(n=400, avg_deg=8, d=8, seed=31)
    adj = symmetric_normalized_weights(g)
    x = np.asarray(g.x)
    oc = prepare_out_of_core(adj, max_edges_per_part=2 * CHUNK)
    first = spmm_out_of_core(oc, x, interpret=True)  # populates the cache
    assert len(oc._dev_edges) == oc.num_parts
    second = spmm_out_of_core(oc, x, interpret=True)  # served from cache
    np.testing.assert_array_equal(first, second)
    oc2 = prepare_out_of_core(adj, max_edges_per_part=2 * CHUNK)
    uncached = spmm_out_of_core(oc2, x, interpret=True, max_device_edge_bytes=0)
    assert len(oc2._dev_edges) == 0
    np.testing.assert_array_equal(first, uncached)
    # a smaller budget on a later call evicts over-budget entries cached
    # by an earlier, larger-budget call (the bound holds across calls)
    shrunk = spmm_out_of_core(oc, x, interpret=True, max_device_edge_bytes=0)
    assert len(oc._dev_edges) == 0
    np.testing.assert_array_equal(first, shrunk)


def test_out_of_core_null_transfer_mode():
    """The measurement mode runs the same jitted step chain against one
    shared device workspace, skips host traffic, and leaves the real
    path untouched (its return value is NOT the SpMM result)."""
    from sgl_tpu.kernels import prepare_out_of_core, spmm_out_of_core
    from sgl_tpu.kernels.pallas_spmm import CHUNK

    g = random_graph(n=400, avg_deg=8, d=8, seed=31)
    adj = symmetric_normalized_weights(g)
    x = np.asarray(g.x)
    oc = prepare_out_of_core(adj, max_edges_per_part=2 * CHUNK)
    assert oc.num_parts > 1
    spmm_out_of_core(oc, x, interpret=True, null_transfer=True)
    assert len(oc._dev_ws) == 1  # one shared workspace, not one per part
    ws = next(iter(oc._dev_ws.values()))
    spmm_out_of_core(oc, x, interpret=True, null_transfer=True)
    assert next(iter(oc._dev_ws.values())) is ws  # reused across calls
    # the real path afterwards is still exact
    real = spmm_out_of_core(oc, x, interpret=True)
    import scipy.sparse as sp

    coo = sp.coo_matrix(
        (np.asarray(adj.w), (np.asarray(adj.dst), np.asarray(adj.src))),
        shape=(adj.num_nodes, adj.num_nodes),
    )
    np.testing.assert_allclose(real, coo @ x, rtol=1e-4, atol=1e-5)


def _scipy_of(adj):
    import scipy.sparse as sp

    return sp.coo_matrix(
        (np.asarray(adj.w), (np.asarray(adj.dst), np.asarray(adj.src))),
        shape=(adj.num_nodes, adj.num_nodes),
    )


@pytest.mark.parametrize("src_blocks,part_edges", [(1, 8 * 128), (4, 4 * 128), (8, 2 * 128)])
@pytest.mark.parametrize("step_mode", ["fused", "split"])
def test_out_of_core_2d_allclose(src_blocks, part_edges, step_mode):
    """2-D (dst-part × src-block) layout == scipy on a power-law graph:
    contiguous block workspaces (no host gather), per-subpart tile masks
    (empty cells/tiles skipped via select), tiny accumulator groups.
    Both dispatch structures (fused cell step / split gather+accumulate)
    must agree."""
    from sgl_tpu.datasets.synthetic import random_power_law_graph
    from sgl_tpu.kernels import prepare_out_of_core_2d, spmm_out_of_core_2d

    g = random_power_law_graph(3_000, 4, 6, seed=17, alpha=1.4,
                               pad_multiple=1024)
    adj = symmetric_normalized_weights(g)
    x = np.asarray(g.x)
    oc = prepare_out_of_core_2d(
        # tile_rows pinned at 128: the adversarial premise below (empty
        # cells/tiles exercising the mask path) needs narrow tiles — the
        # round-5 model pick chooses wide ones on this tiny graph
        adj, max_edges_per_part=part_edges, src_blocks=src_blocks, chunk=128,
        tile_rows=128,
    )
    if src_blocks > 1:
        assert any(s.n_edges == 0 for row in oc.parts for s in row) or any(
            s.tile_mask.min() == 0 for row in oc.parts for s in row
        ), "config not adversarial: no empty cells or tiles"
    got = spmm_out_of_core_2d(
        oc, x, interpret=True, max_device_acc_bytes=oc.n_rows * 6 * 4 * 2,
        step_mode=step_mode,
    )
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, _scipy_of(adj) @ x, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("tile_rows", [256, 512])
def test_out_of_core_2d_wide_tile_rows_allclose(tile_rows):
    """Multi-tile output blocks in the 2-D layout (round-5: the in-HBM
    (tile_rows, chunk) lever applied to the OOC cells) == scipy, in both
    step modes, with the layout's row bookkeeping in tile_rows units."""
    from sgl_tpu.datasets.synthetic import random_power_law_graph
    from sgl_tpu.kernels import prepare_out_of_core_2d, spmm_out_of_core_2d

    g = random_power_law_graph(3_000, 4, 6, seed=17, alpha=1.4,
                               pad_multiple=1024)
    adj = symmetric_normalized_weights(g)
    x = np.asarray(g.x)
    oc = prepare_out_of_core_2d(
        adj, max_edges_per_part=4 * 128, src_blocks=4, chunk=128,
        tile_rows=tile_rows,
    )
    assert oc.tile_rows == tile_rows
    assert oc.n_rows % tile_rows == 0
    want = _scipy_of(adj) @ x
    for mode in ("fused", "split"):
        got = spmm_out_of_core_2d(oc, x, interpret=True, step_mode=mode)
        assert np.isfinite(got).all()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_out_of_core_2d_bf16_and_no_diag():
    from sgl_tpu.datasets.synthetic import random_power_law_graph
    from sgl_tpu.kernels import prepare_out_of_core_2d, spmm_out_of_core_2d

    g = random_power_law_graph(2_000, 5, 8, seed=3, pad_multiple=1024)
    adj = symmetric_normalized_weights(g)
    x32 = np.asarray(g.x)
    oc = prepare_out_of_core_2d(adj, max_edges_per_part=512, src_blocks=4,
                                split_diag=False, chunk=128)
    assert oc.diag is None
    want = spmm_out_of_core_2d(oc, x32, interpret=True)
    np.testing.assert_allclose(want, _scipy_of(adj) @ x32, rtol=1e-4, atol=1e-5)
    got = spmm_out_of_core_2d(
        oc, x32.astype(jnp.bfloat16), interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), want, rtol=2e-2, atol=2e-2
    )


def test_out_of_core_2d_unsorted_input_falls_back_to_lexsort():
    """The dst-sorted fast path and the lexsort fallback build identical
    layouts (same product)."""
    from sgl_tpu.kernels import prepare_out_of_core_2d, spmm_out_of_core_2d

    g = random_graph(n=500, avg_deg=7, d=6, seed=13)
    adj = symmetric_normalized_weights(g)
    src, dst, w = np.asarray(adj.src), np.asarray(adj.dst), np.asarray(adj.w)
    x = np.asarray(g.x)
    sorted_oc = prepare_out_of_core_2d(
        (src, dst, w, adj.num_nodes), max_edges_per_part=512, src_blocks=3
    )
    perm = np.random.default_rng(0).permutation(src.shape[0])
    shuf_oc = prepare_out_of_core_2d(
        (src[perm], dst[perm], w[perm], adj.num_nodes),
        max_edges_per_part=512, src_blocks=3,
    )
    a = spmm_out_of_core_2d(sorted_oc, x, interpret=True)
    b = spmm_out_of_core_2d(shuf_oc, x, interpret=True)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(a, _scipy_of(adj) @ x, rtol=1e-4, atol=1e-5)


def test_out_of_core_2d_edge_cache_budget():
    """The byte-budget device cache caches under a big budget, evicts to
    zero under a zero budget on a later call, and stays exact."""
    from sgl_tpu.kernels import prepare_out_of_core_2d, spmm_out_of_core_2d

    g = random_graph(n=600, avg_deg=8, d=6, seed=19)
    adj = symmetric_normalized_weights(g)
    x = np.asarray(g.x)
    oc = prepare_out_of_core_2d(adj, max_edges_per_part=512, src_blocks=3)
    first = spmm_out_of_core_2d(oc, x, interpret=True)
    assert len(oc._dev_edges) > 0
    second = spmm_out_of_core_2d(
        oc, x, interpret=True, max_device_edge_bytes=0
    )
    assert len(oc._dev_edges) == 0
    np.testing.assert_array_equal(first, second)


def test_out_of_core_2d_matches_1d():
    """Both out-of-core layouts compute the same product."""
    from sgl_tpu.kernels import (
        prepare_out_of_core,
        prepare_out_of_core_2d,
        spmm_out_of_core,
        spmm_out_of_core_2d,
    )
    from sgl_tpu.kernels.pallas_spmm import CHUNK

    g = random_graph(n=700, avg_deg=9, d=10, seed=41)
    adj = symmetric_normalized_weights(g)
    x = np.asarray(g.x)
    y1 = spmm_out_of_core(
        prepare_out_of_core(adj, max_edges_per_part=2 * CHUNK), x,
        interpret=True,
    )
    y2 = spmm_out_of_core_2d(
        prepare_out_of_core_2d(adj, max_edges_per_part=2 * CHUNK,
                               src_blocks=3), x, interpret=True,
    )
    np.testing.assert_allclose(y1, y2, rtol=1e-5, atol=1e-6)


def test_graph_op_propagate_out_of_core():
    from sgl_tpu.ops.graph_ops import LaplacianGraphOp

    g = random_graph(n=400, avg_deg=8, d=8, seed=37)
    op = LaplacianGraphOp(2)
    want = np.asarray(op.propagate(g, g.x, backend="segment"))
    got = op.propagate_out_of_core(g, np.asarray(g.x), interpret=True)
    np.testing.assert_allclose(np.stack(got), want, rtol=2e-4, atol=2e-5)
    # layout is cached per graph: second call reuses the prepared parts
    oc_first = op._adj_cache[2]
    op.propagate_out_of_core(g, np.asarray(g.x), interpret=True)
    assert op._adj_cache[2] is oc_first
    # 2-D routing: same hops, and switching layouts swaps the cache entry
    got2 = op.propagate_out_of_core(
        g, np.asarray(g.x), interpret=True, layout="2d", src_blocks=3
    )
    np.testing.assert_allclose(np.stack(got2), want, rtol=2e-4, atol=2e-5)
    assert op._adj_cache[2] is not oc_first
    with pytest.raises(ValueError):
        op.propagate_out_of_core(g, np.asarray(g.x), layout="3d")


def test_out_of_core_2d_null_transfer_mode():
    """2-D measurement mode (VERDICT r3 #5): same per-cell step chain, one
    shared block workspace, no host traffic; real path stays exact after."""
    from sgl_tpu.datasets.synthetic import random_power_law_graph
    from sgl_tpu.kernels import prepare_out_of_core_2d, spmm_out_of_core_2d

    g = random_power_law_graph(3_000, 4, 6, seed=17, alpha=1.4,
                               pad_multiple=1024)
    adj = symmetric_normalized_weights(g)
    x = np.asarray(g.x)
    oc = prepare_out_of_core_2d(
        adj, max_edges_per_part=4 * 128, src_blocks=4, chunk=128
    )
    spmm_out_of_core_2d(oc, x, interpret=True, null_transfer=True)
    assert len(oc._dev_ws) == 1  # one shared workspace, not one per block
    ws = next(iter(oc._dev_ws.values()))
    spmm_out_of_core_2d(oc, x, interpret=True, null_transfer=True)
    assert next(iter(oc._dev_ws.values())) is ws  # reused across calls
    real = spmm_out_of_core_2d(oc, x, interpret=True)
    np.testing.assert_allclose(real, _scipy_of(adj) @ x, rtol=1e-4, atol=1e-5)


def test_out_of_core_2d_layout_cache(tmp_path):
    """Content-keyed on-disk layout cache: second build loads the saved
    layout (byte-identical result); a changed graph or config misses."""
    from sgl_tpu.datasets.synthetic import random_power_law_graph
    from sgl_tpu.kernels import prepare_out_of_core_2d, spmm_out_of_core_2d

    g = random_power_law_graph(2_000, 4, 6, seed=5, alpha=1.3,
                               pad_multiple=1024)
    adj = symmetric_normalized_weights(g)
    x = np.asarray(g.x)
    cd = str(tmp_path)
    oc1 = prepare_out_of_core_2d(
        adj, max_edges_per_part=4 * 128, src_blocks=4, cache_dir=cd
    )
    import os

    files = os.listdir(cd)
    assert len(files) == 1 and files[0].startswith("ooc2d_")
    oc2 = prepare_out_of_core_2d(
        adj, max_edges_per_part=4 * 128, src_blocks=4, cache_dir=cd
    )
    assert len(os.listdir(cd)) == 1  # cache hit, no second file
    assert oc2.num_nodes == oc1.num_nodes and oc2.n_rows == oc1.n_rows
    for r1, r2 in zip(oc1.parts, oc2.parts):
        for s1, s2 in zip(r1, r2):
            np.testing.assert_array_equal(s1.src, s2.src)
            np.testing.assert_array_equal(s1.w, s2.w)
            assert s1.n_edges == s2.n_edges
    got = spmm_out_of_core_2d(oc2, x, interpret=True)
    np.testing.assert_allclose(got, _scipy_of(adj) @ x, rtol=1e-4, atol=1e-5)
    # different config -> different key (no aliasing)
    prepare_out_of_core_2d(
        adj, max_edges_per_part=8 * 128, src_blocks=4, cache_dir=cd
    )
    assert len(os.listdir(cd)) == 2


def test_out_of_core_precompute_to_training(tmp_path):
    """papers100M-regime loop closed end-to-end at toy scale: out-of-core
    2-D precompute -> memmap hop store -> full training task, with the
    hop stack never entering device memory whole.  Accuracy matches the
    in-memory path on the same seed."""
    import jax.numpy as jnp

    from sgl_tpu.datasets.synthetic import PlantedPartition
    from sgl_tpu.models.homo import GAMLP, SGC
    from sgl_tpu.tasks import NodeClassification
    from sgl_tpu.utils import MemmapHopSink

    ds = PlantedPartition(num_nodes=300, feat_dim=8, p_in=0.08, seed=6)

    def run_ooc(model_cls, **kw):
        model = model_cls(2, ds.num_features, ds.num_classes, **kw)
        sink = MemmapHopSink(
            str(tmp_path / model_cls.__name__), num_nodes=ds.num_node,
            feat_dim=ds.num_features, prop_steps=2,
        )
        model.pre_graph_op.propagate_out_of_core(
            ds.graph, np.asarray(ds.x), hop_sink=sink, interpret=True,
            layout="2d", src_blocks=2, max_edges_per_part=8 * 128,
        )
        model.attach_host_hops(sink.hops())
        return NodeClassification(
            ds, model, lr=0.1, weight_decay=5e-5, epochs=8, verbose=False
        ).test_acc

    def run_mem(model_cls, **kw):
        model = model_cls(2, ds.num_features, ds.num_classes, **kw)
        return NodeClassification(
            ds, model, lr=0.1, weight_decay=5e-5, epochs=8, verbose=False
        ).test_acc

    # eager (SGC) and learnable (GAMLP) aggregation both train from disk
    acc_sgc_ooc, acc_sgc_mem = run_ooc(SGC), run_mem(SGC)
    assert acc_sgc_ooc > 0.6
    assert abs(acc_sgc_ooc - acc_sgc_mem) < 0.1, (acc_sgc_ooc, acc_sgc_mem)
    acc_g = run_ooc(GAMLP, hidden_dim=16, num_layers=2)
    assert acc_g > 0.6, acc_g


def test_prepare_chunked_hub_dtype_bf16():
    """Opt-in bf16 hub strip (keep-last pipelines): numerics within bf16
    tolerance, VJP finite, strip actually stored bf16."""
    import jax
    import jax.numpy as jnp

    from sgl_tpu.datasets.synthetic import random_power_law_graph
    from sgl_tpu.kernels import prepare_chunked
    from sgl_tpu.kernels.pallas_spmm import spmm_pallas
    from sgl_tpu.kernels.sparse import spmm_segment

    g = random_power_law_graph(2_000, 8, 8, seed=3, alpha=1.3,
                               pad_multiple=1024)
    adj = symmetric_normalized_weights(g)
    ch = prepare_chunked(adj, hub_dtype=jnp.bfloat16)
    assert ch.hub_ids is not None and ch.hub_m.dtype == jnp.bfloat16
    x16 = jnp.asarray(g.x, jnp.bfloat16)
    out = spmm_pallas(ch, x16, True).astype(jnp.float32)
    ref = np.asarray(spmm_segment(adj, jnp.asarray(g.x, jnp.float32)))
    err = np.abs(np.asarray(out) - ref).max() / (np.abs(ref).max() + 1e-30)
    assert err < 3e-2, err
    gx = jax.grad(lambda v: jnp.sum(spmm_pallas(ch, v, True) ** 2))(x16)
    assert bool(jnp.all(jnp.isfinite(gx.astype(jnp.float32))))


def test_out_of_core_2d_strict_guard_runs_on_cache_hit(tmp_path, monkeypatch):
    """The HBM cell-budget guard must fire on WARM cache loads too: a
    layout cached with strict=False (warn-only) still raises for a later
    strict=True caller instead of silently bypassing the check (round-4
    review fix)."""
    import pytest

    import sgl_tpu.kernels.spmm_ooc as mod
    from sgl_tpu.datasets.synthetic import random_power_law_graph
    from sgl_tpu.kernels import prepare_out_of_core_2d

    g = random_power_law_graph(2_000, 4, 6, seed=5, alpha=1.3,
                               pad_multiple=1024)
    adj = symmetric_normalized_weights(g)
    cd = str(tmp_path)
    monkeypatch.setattr(mod, "_CELL_SLOT_BUDGET", 64)  # every cell trips it
    with pytest.warns(UserWarning, match="densest cell"):
        prepare_out_of_core_2d(
            adj, max_edges_per_part=4 * 128, src_blocks=4, cache_dir=cd
        )
    import os

    assert len(os.listdir(cd)) == 1  # the layout itself was cached
    with pytest.raises(ValueError, match="densest cell"):
        prepare_out_of_core_2d(
            adj, max_edges_per_part=4 * 128, src_blocks=4, cache_dir=cd,
            strict=True,
        )


def test_out_of_core_2d_auto_layout():
    """Round 5: src_blocks='auto' sizes block workspaces under the
    measured gather-rate cliff (GATHER_OPERAND_BUDGET bytes at the
    feature width/dtype), and chunk/tile_rows default to the model pick.
    The auto layout must still match scipy."""
    import scipy.sparse as sp

    from sgl_tpu.datasets.synthetic import random_power_law_graph
    from sgl_tpu.kernels import prepare_out_of_core_2d, spmm_out_of_core_2d
    from sgl_tpu.kernels.spmm_ooc import GATHER_OPERAND_BUDGET, _auto_src_blocks

    # sizing math: at d_pad=128 f32 the budget allows 204,800 rows/block
    # (the resulting 102.4 MB blocks sit just under the measured cliff —
    # 200,064-row f32 operands probed at 4.10 ns/row)
    assert _auto_src_blocks(2_400_000, 100, np.float32) == 12
    assert _auto_src_blocks(2_400_000, 100, "bfloat16") == 6
    assert _auto_src_blocks(1_000, 128, np.float32) == 1  # under budget

    g = random_power_law_graph(3_000, 4, 6, seed=17, alpha=1.4,
                               pad_multiple=1024)
    adj = symmetric_normalized_weights(g)
    x = np.asarray(g.x)
    oc = prepare_out_of_core_2d(adj, max_edges_per_part=4 * 128)
    assert oc.num_blocks == 1  # 3k rows is far under the budget
    assert oc.block_rows * 128 * 4 <= GATHER_OPERAND_BUDGET
    got = spmm_out_of_core_2d(oc, x, interpret=True)
    a = sp.csr_matrix(
        (np.asarray(adj.w), (np.asarray(adj.dst), np.asarray(adj.src))),
        shape=(adj.num_nodes, adj.num_nodes),
    )
    np.testing.assert_allclose(got, a @ x, rtol=2e-4, atol=2e-5)


def test_out_of_core_2d_auto_cache_request_keyed(tmp_path):
    """The model-picked layout's cache key encodes the REQUEST (auto
    markers), so a warm hit skips the pick; a pinned build of the same
    resolved config uses the legacy key and must not alias it."""
    import os

    from sgl_tpu.datasets.synthetic import random_power_law_graph
    from sgl_tpu.kernels import prepare_out_of_core_2d

    g = random_power_law_graph(2_000, 4, 6, seed=3, alpha=1.3,
                               pad_multiple=512)
    adj = symmetric_normalized_weights(g)
    cd = str(tmp_path)
    oc1 = prepare_out_of_core_2d(adj, max_edges_per_part=4 * 128,
                                 cache_dir=cd)
    n_entries = len(os.listdir(cd))
    oc2 = prepare_out_of_core_2d(adj, max_edges_per_part=4 * 128,
                                 cache_dir=cd)
    assert len(os.listdir(cd)) == n_entries  # warm hit, no new entry
    assert oc2.tile_rows == oc1.tile_rows
    # pinned build of the resolved config: distinct (legacy-format) key
    oc3 = prepare_out_of_core_2d(
        adj, max_edges_per_part=4 * 128, src_blocks=oc1.num_blocks,
        chunk=oc1.parts[0][0].src.shape[0] // oc1.parts[0][0].chunk_tile.shape[0],
        tile_rows=oc1.tile_rows, cache_dir=cd,
    )
    assert len(os.listdir(cd)) == n_entries + 1
    assert oc3.tile_rows == oc1.tile_rows


@pytest.mark.parametrize("dtype", [np.float32, "bfloat16"])
def test_spmm_2d_resident_allclose(dtype):
    """Round 5: device-resident execution of the 2-D layout (the in-HBM
    gather-cliff fix) must match scipy, for f32 (hi/lo) and bf16
    (single-pass), including the diag split and multi-block slicing."""
    import ml_dtypes

    from sgl_tpu.datasets.synthetic import random_power_law_graph
    from sgl_tpu.kernels import prepare_out_of_core_2d, spmm_pallas_2d_resident

    npdt = np.float32 if dtype is np.float32 else np.dtype(ml_dtypes.bfloat16)
    g = random_power_law_graph(3_000, 4, 6, seed=17, alpha=1.4,
                               pad_multiple=1024)
    adj = symmetric_normalized_weights(g)
    x = np.asarray(g.x).astype(npdt)
    # force multiple blocks + narrow tiles so the dynamic-slice path and
    # the tile masks are both exercised
    oc = prepare_out_of_core_2d(adj, max_edges_per_part=4 * 128,
                                src_blocks=4, chunk=128, tile_rows=128)
    assert oc.diag is not None and oc.num_blocks == 4
    got = np.asarray(spmm_pallas_2d_resident(oc, jnp.asarray(x),
                                             interpret=True))
    a = sp.csr_matrix(
        (np.asarray(adj.w), (np.asarray(adj.dst), np.asarray(adj.src))),
        shape=(adj.num_nodes, adj.num_nodes),
    )
    want = a @ x.astype(np.float32)
    tol = dict(rtol=2e-4, atol=2e-5) if dtype is np.float32 else dict(
        rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got, np.float32), want, **tol)
    assert got.dtype == x.dtype
    # second call reuses the cached device stacks
    got2 = np.asarray(spmm_pallas_2d_resident(oc, jnp.asarray(x),
                                              interpret=True))
    np.testing.assert_allclose(np.asarray(got2, np.float32),
                               np.asarray(got, np.float32), rtol=0, atol=0)


def test_propagate_out_of_core_cache_keys_on_features():
    """Round-5 review: the cached OOC layout must rebuild when the
    features change width/dtype (the 2-D auto block sizing depends on
    them via the gather-cliff budget) — never silently reuse a layout
    sized for different features."""
    import ml_dtypes

    from sgl_tpu.datasets.synthetic import random_power_law_graph
    from sgl_tpu.ops.graph_ops import LaplacianGraphOp

    g = random_power_law_graph(2_000, 4, 6, seed=3, alpha=1.3,
                               pad_multiple=512)
    op = LaplacianGraphOp(1)
    x32 = np.asarray(g.x, np.float32)
    op.propagate_out_of_core(g, x32, max_edges_per_part=4 * 128,
                             layout="2d", interpret=True)
    oc_a = op._adj_cache[2]
    # same features: cache hit
    op.propagate_out_of_core(g, x32, max_edges_per_part=4 * 128,
                             layout="2d", interpret=True)
    assert op._adj_cache[2] is oc_a
    # different dtype: rebuild (auto sizing would differ at scale)
    xb = x32.astype(ml_dtypes.bfloat16)
    op.propagate_out_of_core(g, xb, max_edges_per_part=4 * 128,
                             layout="2d", interpret=True)
    assert op._adj_cache[2] is not oc_a


def test_pick_cell_layout_oversized_domain_falls_back(monkeypatch):
    """Round-5 review: when the dense (cells x tiles) count domain would
    exceed int32 keys (papers100M with many parts x blocks x tiles), the
    model pick must fall back to the measured-best fixed shape instead of
    overflowing or allocating tens of GB."""
    import sgl_tpu.kernels.spmm_ooc as mod

    real = mod._cell_tile_counts

    def tiny_domain(*a, **k):
        return None  # simulate the >=2**31 bail-out

    monkeypatch.setattr(mod, "_cell_tile_counts", tiny_domain)
    chunk, tr = mod._pick_cell_layout(
        np.zeros(4, np.int32), np.zeros(4, np.int32), 256, 2, 128,
        chunk_cands=(128, 256, 512), tr_cands=(128, 256, 512, 1024),
    )
    assert (chunk, tr) == (256, 512)
    monkeypatch.setattr(mod, "_cell_tile_counts", real)
    # and the detection itself: spread dst across 4 parts with a huge
    # block count so n_parts*k*n_tiles >= 2**31 — must return None from
    # the guard arithmetic, before any allocation
    n = 2**22
    dst = np.asarray([0, n // 4, n // 2, 3 * n // 4], np.int32)
    out = real(
        np.zeros(4, np.int32), dst, n=n, k=2**17,
        sb=32, max_edges_per_part=1, tr=128,
    )
    assert out is None
