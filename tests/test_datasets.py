"""Dataset layer tests: offline-constructible loaders + raw-format parsers
exercised through synthetic raw files."""

import gzip
import json
import os
import numpy as np
import pytest
import scipy.sparse as sp

from sgl_tpu.datasets import Custom_Homo, Custom_Hetero, KarateClub, Planetoid, Ogbn


def test_karate_club_offline():
    ds = KarateClub(root="/tmp/sgl_data/")
    assert ds.num_node == 34
    assert ds.num_classes == 4
    assert ds.graph.num_edges > 0


def test_custom_homo_roundtrip(tmp_path):
    raw = tmp_path / "mygraph" / "raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(0)
    n = 30
    x = rng.normal(size=(n, 5)).astype(np.float32)
    row = rng.integers(0, n, 100)
    col = rng.integers(0, n, 100)
    np.save(raw / "x.npy", x)
    np.savez(raw / "adj_matrix.npz", row=row, col=col, data=np.ones(100, np.float32))
    np.save(raw / "label.npy", rng.integers(0, 3, n))
    np.savez(raw / "indices.npz", train_idx=np.arange(10), val_idx=np.arange(10, 20),
             test_idx=np.arange(20, 30))
    ds = Custom_Homo("mygraph", root=str(tmp_path) + "/")
    assert ds.num_node == n and ds.num_features == 5
    assert len(ds.train_idx) == 10
    # cache hit on second construction
    ds2 = Custom_Homo("mygraph", root=str(tmp_path) + "/")
    assert ds2.graph.num_edges == ds.graph.num_edges


def test_custom_hetero_roundtrip(tmp_path):
    raw = tmp_path / "myhetero" / "raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(0)
    np.save(raw / "x_a.npy", rng.normal(size=(20, 4)).astype(np.float32))
    np.save(raw / "x_b.npy", rng.normal(size=(10, 4)).astype(np.float32))
    np.save(raw / "label_a.npy", rng.integers(0, 2, 20))
    np.savez(raw / "adj_a__to__b.npz", row=rng.integers(0, 20, 40), col=rng.integers(0, 10, 40))
    ds = Custom_Hetero(
        "myhetero", "a", ["a", "b"], [("a", "to", "b")], root=str(tmp_path) + "/"
    )
    assert ds.data.num_node == {"a": 20, "b": 10}
    assert ds.num_classes == 2


def test_planetoid_format_parser(tmp_path):
    """Build tiny synthetic planetoid raw files and parse them."""
    import pickle

    name, n_train, n_test, d, c = "cora", 8, 6, 5, 3
    n_all = 20  # allx rows (train + unlabeled)
    raw = tmp_path / "Planetoid" / name / "raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(0)
    x = sp.csr_matrix(rng.random((n_train, d)).astype(np.float32))
    allx = sp.csr_matrix(rng.random((n_all, d)).astype(np.float32))
    tx = sp.csr_matrix(rng.random((n_test, d)).astype(np.float32))
    y = np.eye(c)[rng.integers(0, c, n_train)]
    ally = np.eye(c)[rng.integers(0, c, n_all)]
    ty = np.eye(c)[rng.integers(0, c, n_test)]
    n_total = n_all + n_test
    graph = {i: [int(j) for j in rng.integers(0, n_total, 3)] for i in range(n_total)}
    test_index = list(range(n_all, n_total))
    rng.shuffle(test_index)
    for nm, obj in [("x", x), ("tx", tx), ("allx", allx), ("y", y), ("ty", ty), ("ally", ally), ("graph", graph)]:
        with open(raw / f"ind.{name}.{nm}", "wb") as f:
            pickle.dump(obj, f)
    with open(raw / f"ind.{name}.test.index", "w") as f:
        f.write("\n".join(str(i) for i in test_index))
    ds = Planetoid(name, root=str(tmp_path) + "/", split="random")
    assert ds.num_node == n_total
    assert ds.num_features == d
    # row normalization: nonzero rows sum to 1
    sums = np.asarray(ds.x).sum(1)
    nz = sums > 0
    np.testing.assert_allclose(sums[nz], 1.0, rtol=1e-5)


def test_ogbn_format_parser(tmp_path):
    """Synthetic OGB raw layout (csv.gz) parses end to end."""
    d = tmp_path / "ogbn" / "arxiv" / "ogbn_arxiv"
    (d / "raw").mkdir(parents=True)
    (d / "split" / "time").mkdir(parents=True)
    rng = np.random.default_rng(0)
    n = 25
    edges = rng.integers(0, n, (60, 2))
    feats = rng.random((n, 4)).astype(np.float32)
    labels = rng.integers(0, 5, n)
    def write_gz(path, arr, fmt):
        with gzip.open(path, "wt") as f:
            np.savetxt(f, arr, delimiter=",", fmt=fmt)
    write_gz(d / "raw" / "edge.csv.gz", edges, "%d")
    write_gz(d / "raw" / "node-feat.csv.gz", feats, "%.6f")
    write_gz(d / "raw" / "node-label.csv.gz", labels[:, None], "%d")
    for part, idx in [("train", np.arange(10)), ("valid", np.arange(10, 18)), ("test", np.arange(18, 25))]:
        write_gz(d / "split" / "time" / f"{part}.csv.gz", idx[:, None], "%d")
    ds = Ogbn("arxiv", root=str(tmp_path) + "/")
    assert ds.num_node == n and ds.num_features == 4
    assert len(ds.train_idx) == 10 and len(ds.test_idx) == 7
    # undirected
    s, t, _ = ds.graph.edges()
    pairs = set(zip(s.tolist(), t.tolist()))
    assert all((b, a) in pairs for a, b in pairs)


def test_download_gated_error():
    with pytest.raises(IOError):
        Planetoid("pubmed", root="/tmp/sgl_data_nonexistent/")
