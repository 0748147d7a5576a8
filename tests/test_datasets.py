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


def _fabricate_planetoid_raw(name="cora", n_train=8, n_test=6, d=5, c=3, n_all=20):
    """Tiny synthetic planetoid raw files as ``{filename: bytes}``."""
    import pickle

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
    files = {
        f"ind.{name}.{nm}": pickle.dumps(obj)
        for nm, obj in [
            ("x", x), ("tx", tx), ("allx", allx),
            ("y", y), ("ty", ty), ("ally", ally), ("graph", graph),
        ]
    }
    files[f"ind.{name}.test.index"] = "\n".join(
        str(i) for i in test_index
    ).encode()
    return files, n_total


def test_planetoid_format_parser(tmp_path):
    """Build tiny synthetic planetoid raw files and parse them."""
    name, d = "cora", 5
    raw = tmp_path / "Planetoid" / name / "raw"
    raw.mkdir(parents=True)
    files, n_total = _fabricate_planetoid_raw(name, d=d)
    for fname, data in files.items():
        (raw / fname).write_bytes(data)
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


def test_download_gated_error(tmp_path, monkeypatch):
    """Offline, a loader with raw_urls still raises a clear IOError (no
    exit(1) like the reference, sgl/dataset/utils.py:29-35)."""
    import urllib.request

    def _no_net(*a, **k):
        raise OSError("no egress")

    monkeypatch.setattr(urllib.request, "urlopen", _no_net)
    with pytest.raises(IOError):
        Planetoid("pubmed", root=str(tmp_path) + "/")


def test_download_gated_error_no_known_source(tmp_path):
    """Loaders without raw_urls raise the place-files-manually error."""
    from sgl_tpu.datasets import Acm

    with pytest.raises(IOError, match="no download source"):
        Acm(root=str(tmp_path) + "/")


def test_download_bootstrap_mocked_urlopen(tmp_path, monkeypatch):
    """Full download -> process -> split lifecycle with a mocked network:
    Planetoid self-bootstraps from its reference URLs
    (sgl/dataset/planetoid.py:34-39) through datasets.utils.download_to."""
    import io
    import urllib.request

    name = "cora"
    files, n_total = _fabricate_planetoid_raw(name)
    base = "https://github.com/kimiyoung/planetoid/raw/master/data"
    served = {f"{base}/{fname}": data for fname, data in files.items()}
    fetched = []

    def fake_urlopen(url, *a, **k):
        fetched.append(url)
        return io.BytesIO(served[url])

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    ds = Planetoid(name, root=str(tmp_path) + "/", split="random")
    assert ds.num_node == n_total
    assert len(fetched) == len(files)  # every raw file came off the wire
    # files landed under raw/ so a second load is offline
    ds2 = Planetoid(name, root=str(tmp_path) + "/", split="random")
    assert ds2.num_node == n_total


def test_raw_urls_cover_raw_files():
    """Every loader that declares raw file names also declares a URL for
    each (keeps the bootstrap complete as loaders evolve)."""
    from sgl_tpu.datasets import Airports, Amazon, Coauthor

    for cls, name, expect in [
        (Airports, "usa", ["usa-airports.edgelist", "labels-usa-airports.txt"]),
        (Amazon, "photo", ["amazon_electronics_photo.npz"]),
        (Coauthor, "cs", ["ms_academic_cs.npz"]),
    ]:
        inst = cls.__new__(cls)  # raw_urls must need only name/raw_dir
        inst.name = name
        inst.raw_dir = "/tmp/raw"
        mapping = cls.raw_urls.fget(inst)
        assert sorted(mapping) == sorted(expect), cls.__name__
        assert all(u.startswith("http") for u in mapping.values())


def test_actor_format_parser(tmp_path):
    raw = tmp_path / "actor" / "actor" / "raw"
    raw.mkdir(parents=True)
    # geom-gcn film format: node_id \t col,col \t label
    (raw / "out1_node_feature_label.txt").write_text(
        "id\tfeat\tlabel\n0\t0,2\t1\n1\t1\t0\n2\t0,1,3\t2\n3\t2\t1\n"
    )
    (raw / "out1_graph_edges.txt").write_text("src\tdst\n0\t1\n1\t2\n2\t3\n")
    from sgl_tpu.datasets import Actor

    ds = Actor(root=str(tmp_path) + "/")
    assert ds.num_node == 4
    assert ds.num_features == 4  # max col 3 -> one-hot width 4
    x = np.asarray(ds.x)
    assert x[2, 0] == 1 and x[2, 1] == 1 and x[2, 3] == 1
    s, d, _ = ds.graph.edges()
    pairs = set(zip(s.tolist(), d.tolist()))
    assert (1, 0) in pairs  # undirected


def test_webkb_format_parser(tmp_path):
    raw = tmp_path / "webkb" / "cornell" / "raw"
    raw.mkdir(parents=True)
    (raw / "out1_node_feature_label.txt").write_text(
        "id\tfeat\tlabel\n0\t1.0,0.0\t1\n1\t0.5,0.5\t0\n2\t0.0,1.0\t1\n"
    )
    (raw / "out1_graph_edges.txt").write_text("src\tdst\n0\t1\n1\t2\n")
    from sgl_tpu.datasets import WebKB

    ds = WebKB("cornell", root=str(tmp_path) + "/")
    assert ds.num_node == 3 and ds.num_features == 2
    np.testing.assert_allclose(np.asarray(ds.x)[1], [0.5, 0.5])


def test_airports_format_parser(tmp_path):
    raw = tmp_path / "airports" / "usa" / "raw"
    raw.mkdir(parents=True)
    (raw / "labels-usa-airports.txt").write_text(
        "node label\n100 0\n200 1\n300 2\n"
    )
    (raw / "usa-airports.edgelist").write_text("100 200\n200 300\n")
    from sgl_tpu.datasets import Airports

    ds = Airports("usa", root=str(tmp_path) + "/")
    assert ds.num_node == 3
    assert np.asarray(ds.y).tolist() == [0, 1, 2]
    s, d, _ = ds.graph.edges()
    assert (0, 1) in set(zip(s.tolist(), d.tolist()))


def test_musae_npz_parser(tmp_path):
    raw = tmp_path / "github" / "github" / "raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(0)
    np.savez(
        raw / "github.npz",
        edges=rng.integers(0, 10, (30, 2)),
        features=rng.random((10, 6)).astype(np.float32),
        target=rng.integers(0, 2, 10),
    )
    from sgl_tpu.datasets import Github

    ds = Github(root=str(tmp_path) + "/")
    assert ds.num_node == 10 and ds.num_features == 6


def test_wikics_json_parser(tmp_path):
    import json as js

    raw = tmp_path / "wikics" / "wikics" / "raw"
    raw.mkdir(parents=True)
    data = {
        "features": [[1.0, 0.0], [0.0, 1.0], [0.5, 0.5]],
        "labels": [0, 1, 0],
        "links": [[1], [2], []],
    }
    (raw / "data.json").write_text(js.dumps(data))
    from sgl_tpu.datasets import Wikics

    ds = Wikics(root=str(tmp_path) + "/")
    assert ds.num_node == 3
    s, d, _ = ds.graph.edges()
    assert (1, 0) in set(zip(s.tolist(), d.tolist()))  # undirected


def test_hgb_pt_parser(tmp_path):
    """HGB hetero loader parses a synthetic geometric_data_processed.pt."""
    torch = pytest.importorskip("torch")
    raw = tmp_path / "hgb" / "acm" / "raw" / "hgb_acm" / "raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(0)
    n_paper, n_author, n_subject, n_term = 12, 8, 3, 5
    store = {
        "paper": {
            "x": torch.tensor(rng.random((n_paper, 4)).astype(np.float32)),
            "y": torch.tensor(rng.integers(0, 3, n_paper)),
            "train_mask": torch.tensor(
                np.array([True] * 8 + [False] * 4)
            ),
            "test_mask": torch.tensor(np.array([False] * 8 + [True] * 4)),
        },
        "author": {"num_nodes": n_author},
        "subject": {"num_nodes": n_subject},
        "term": {"num_nodes": n_term},
    }
    from sgl_tpu.datasets.hetero_datasets import Acm

    for et in Acm.EDGE_TYPES_TUPLE:
        ns = {"paper": n_paper, "author": n_author, "subject": n_subject, "term": n_term}
        e = np.stack(
            [rng.integers(0, ns[et[0]], 15), rng.integers(0, ns[et[2]], 15)]
        )
        store[et] = {"edge_index": torch.tensor(e)}
    torch.save(store, raw / "geometric_data_processed.pt")
    ds = Acm(root=str(tmp_path) + "/")
    assert ds.data.num_node["paper"] == n_paper
    assert ds.num_classes == 3
    assert len(ds.test_idx) == 4
    # featureless types got synthesized features
    assert ds.data["author"].x is not None
    assert ds.data["author"].x.shape == (n_author, 4)


def test_synthetic_power_law_dataset():
    """OGB-shaped homophilous power-law dataset: degree skew present,
    class signal recoverable by SGC (the papers100m_pipeline rehearsal
    graph must train to well above chance)."""
    import numpy as np

    from sgl_tpu.datasets import SyntheticPowerLaw
    from sgl_tpu.models.homo import SGC
    from sgl_tpu.tasks import NodeClassification

    ds = SyntheticPowerLaw(num_nodes=2_000, avg_degree=10, feat_dim=16,
                           num_classes=8, seed=1, train_ratio=0.3)
    src = np.asarray(ds.graph.src)[: ds.graph.num_edges]
    deg = np.bincount(src, minlength=ds.num_node)
    assert deg.max() > 20 * max(deg.mean(), 1e-9)  # zipf skew, not uniform
    acc = NodeClassification(
        ds, SGC(2, ds.num_features, ds.num_classes),
        lr=0.1, weight_decay=5e-5, epochs=15, verbose=False,
    ).test_acc
    assert acc > 0.5, acc  # 8 classes -> chance is 0.125
