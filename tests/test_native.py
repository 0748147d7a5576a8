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


class TestNativeCsvLoader:
    """csrc/csv_loader.cpp vs numpy.loadtxt (the fallback it replaces)."""

    def _roundtrip(self, tmp_path, arr, fmt, dtype, gz=True):
        import gzip

        p = str(tmp_path / ("t.csv" + (".gz" if gz else "")))
        opener = gzip.open if gz else open
        with opener(p, "wt") as f:
            np.savetxt(f, arr, delimiter=",", fmt=fmt)
        out = native.load_csv_native(p, dtype)
        assert out is not None, "native loader unavailable or refused file"
        with opener(p, "rt") as f:
            ref = np.loadtxt(f, delimiter=",", dtype=dtype, ndmin=2)
        assert out.dtype == ref.dtype and out.shape == ref.shape
        np.testing.assert_array_equal(out, ref)

    def test_int64_gz(self, tmp_path):
        rng = np.random.default_rng(0)
        self._roundtrip(
            tmp_path, rng.integers(-(2**40), 2**40, (500, 3)), "%d", np.int64
        )

    def test_float32_exponents(self, tmp_path):
        rng = np.random.default_rng(1)
        a = rng.normal(size=(300, 5)) * 10.0 ** rng.integers(-12, 12, (300, 5))
        self._roundtrip(tmp_path, a, "%.8g", np.float32, gz=False)

    def test_single_column(self, tmp_path):
        self._roundtrip(
            tmp_path, np.arange(123).reshape(-1, 1), "%d", np.int64
        )

    def test_special_floats(self, tmp_path):
        a = np.array([[np.nan, np.inf], [-np.inf, 0.0]])
        p = str(tmp_path / "s.csv")
        np.savetxt(p, a, delimiter=",")
        out = native.load_csv_native(p, np.float32)
        assert out is not None
        ref = np.loadtxt(p, delimiter=",", dtype=np.float32, ndmin=2)
        np.testing.assert_array_equal(np.isnan(out), np.isnan(ref))
        np.testing.assert_array_equal(
            out[~np.isnan(out)], ref[~np.isnan(ref)]
        )

    def test_malformed_returns_none(self, tmp_path):
        ragged = tmp_path / "bad.csv"
        ragged.write_text("1,2\n3\n")
        assert native.load_csv_native(str(ragged), np.float32) is None
        nonnum = tmp_path / "bad2.csv"
        nonnum.write_text("1,abc\n")
        assert native.load_csv_native(str(nonnum), np.float32) is None

    def test_read_csv_gz_uses_native_result(self, tmp_path):
        # the public dataset-layer entry point must agree with loadtxt
        import gzip

        from sgl_tpu.datasets.utils import read_csv_gz

        rng = np.random.default_rng(2)
        a = rng.normal(size=(50, 4)).astype(np.float32)
        p = str(tmp_path / "feat.csv.gz")
        with gzip.open(p, "wt") as f:
            np.savetxt(f, a, delimiter=",", fmt="%.7g")
        out = read_csv_gz(p, np.float32)
        with gzip.open(p, "rt") as f:
            ref = np.loadtxt(f, delimiter=",", dtype=np.float32, ndmin=2)
        np.testing.assert_array_equal(out, ref)

    def test_unsupported_dtype_falls_back(self, tmp_path):
        # float64 has no native code path -> load_csv_native returns None,
        # read_csv_gz silently falls back to loadtxt
        p = tmp_path / "d.csv"
        np.savetxt(str(p), np.eye(3), delimiter=",")
        assert native.load_csv_native(str(p), np.float64) is None
        from sgl_tpu.datasets.utils import read_csv_gz

        out = read_csv_gz(str(p), np.float64)
        np.testing.assert_array_equal(out, np.eye(3))


def test_gather_rows_matches_numpy():
    """Native parallel row gather == x[idx] for several dtypes/widths
    (the out-of-core workspace builder's hot op)."""
    from sgl_tpu.graph import native

    rng = np.random.default_rng(5)
    for dtype, d in [(np.float32, 7), (np.float32, 128), (np.float16, 33),
                     (np.int32, 5)]:
        x = (rng.normal(size=(300, d)) * 10).astype(dtype)
        idx = rng.integers(0, 300, 450).astype(np.int32)
        np.testing.assert_array_equal(native.gather_rows(x, idx), x[idx])
    # out= reuse
    x = rng.normal(size=(100, 8)).astype(np.float32)
    idx = rng.integers(0, 100, 64).astype(np.int32)
    out = np.empty((64, 8), np.float32)
    got = native.gather_rows(x, idx, out=out)
    assert got is out
    np.testing.assert_array_equal(out, x[idx])


def test_pack_cells_2d_matches_numpy_loop(monkeypatch):
    """Round 5: the native one-pass cell packer must produce byte-identical
    layouts to the numpy packing loop (the reference implementation), on an
    adversarial power-law graph with empty cells and multiple size
    classes."""
    import numpy as np

    from sgl_tpu.datasets.synthetic import random_power_law_graph
    from sgl_tpu.graph import native, symmetric_normalized_weights
    from sgl_tpu.kernels.spmm_ooc import prepare_out_of_core_2d

    if not native.native_available():
        import pytest

        pytest.skip("native library unavailable")

    g = random_power_law_graph(3_000, 4, 6, seed=17, alpha=1.4,
                               pad_multiple=1024)
    adj = symmetric_normalized_weights(g)
    kw = dict(max_edges_per_part=4 * 128, src_blocks=4, chunk=128,
              tile_rows=128)
    oc_native = prepare_out_of_core_2d(adj, **kw)
    # force the numpy fallback for both the sort and the packer
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_lib_failed", True)
    oc_numpy = prepare_out_of_core_2d(adj, **kw)
    assert oc_native.num_blocks == oc_numpy.num_blocks
    for row_a, row_b in zip(oc_native.parts, oc_numpy.parts):
        for a, b in zip(row_a, row_b):
            assert a.n_edges == b.n_edges
            np.testing.assert_array_equal(a.src, b.src)
            np.testing.assert_array_equal(a.dst, b.dst)
            np.testing.assert_array_equal(a.w, b.w)
            np.testing.assert_array_equal(a.chunk_tile, b.chunk_tile)
            np.testing.assert_array_equal(a.tile_mask, b.tile_mask)
