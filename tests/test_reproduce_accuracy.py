"""Mock-network drive of examples/reproduce_accuracy.py — the wire-ready
BASELINE §(c) reproduction script (VERDICT r2 'missing' #1).

Serves fabricated pubmed planetoid raw files and a fabricated
ogbn-products OGB zip through a mocked ``urllib.request.urlopen``, then
runs the script's ``main()`` across all three workloads: the identical
download → extract → process → train → report flow that will run against
the real datasets the day egress exists."""

import gzip
import io
import os
import sys
import zipfile

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

from tests.test_datasets import _fabricate_planetoid_raw


def _fabricate_products_zip(n=60, d=6, c=4, e=300):
    """In-memory ogbn-products zip in the standard OGB layout (what
    Ogbn._post_download extracts: products/raw/*.csv.gz +
    products/split/sales_ranking/*.csv.gz)."""
    rng = np.random.default_rng(1)

    def gz_csv(arr, fmt):
        buf = io.BytesIO()
        with gzip.open(buf, "wt") as f:
            np.savetxt(f, arr, delimiter=",", fmt=fmt)
        return buf.getvalue()

    edges = rng.integers(0, n, (e, 2))
    files = {
        "products/raw/edge.csv.gz": gz_csv(edges, "%d"),
        "products/raw/node-feat.csv.gz": gz_csv(
            rng.random((n, d)).astype(np.float32), "%.6f"
        ),
        "products/raw/node-label.csv.gz": gz_csv(
            rng.integers(0, c, n)[:, None], "%d"
        ),
        "products/split/sales_ranking/train.csv.gz": gz_csv(
            np.arange(30)[:, None], "%d"
        ),
        "products/split/sales_ranking/valid.csv.gz": gz_csv(
            np.arange(30, 45)[:, None], "%d"
        ),
        "products/split/sales_ranking/test.csv.gz": gz_csv(
            np.arange(45, n)[:, None], "%d"
        ),
    }
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for path, data in files.items():
            zf.writestr(path, data)
    return buf.getvalue()


def test_reproduce_accuracy_full_flow_mocked_network(tmp_path, monkeypatch):
    import urllib.request

    import reproduce_accuracy as ra

    base = "https://github.com/kimiyoung/planetoid/raw/master/data"
    served = {}
    for name in ("pubmed", "cora", "citeseer"):
        files, _ = _fabricate_planetoid_raw(name, n_train=12, n_test=10,
                                            d=8, c=3, n_all=40)
        served.update({f"{base}/{f}": data for f, data in files.items()})
    served[
        "http://snap.stanford.edu/ogb/data/nodeproppred/products.zip"
    ] = _fabricate_products_zip()
    fetched = []
    monkeypatch.setattr(ra, "NAS_SMOKE_TRIALS", 3)  # 20 on real data

    def fake_urlopen(url, *a, **k):
        fetched.append(url)
        if url not in served:
            raise AssertionError(f"unexpected URL {url}")
        return io.BytesIO(served[url])

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    root = str(tmp_path) + "/"
    rows = ra.main(
        workloads=list(ra.WORKLOADS),
        root=root,
        epochs=3,
        split="random",       # tiny fixtures can't honor the official split
        check_bands=False,    # fixture accuracies are meaningless
    )
    assert len(rows) == len(ra.WORKLOADS)
    for name, metric, value, in_band in rows:
        assert np.isfinite(value), (name, value)
        assert 0.0 <= value <= 1.0, (name, value)
        assert in_band is None
    # the full BASELINE §(b)/(c) surface is covered: every model family
    # named in the verdict plus NAS and the distributed runtime
    names = set(ra.WORKLOADS)
    for expect in ("sgc_pubmed", "gamlp_products", "nafs_linkpred_pubmed",
                   "nafs_cluster_pubmed", "sign_cora", "ssgc_citeseer",
                   "gbp_cora", "nas_cora", "dist_sgc_pubmed"):
        assert expect in names, expect
    # every dataset came off the (mock) wire
    assert any("planetoid" in u for u in fetched)
    assert any(u.endswith("products.zip") for u in fetched)
    # and landed on disk, so a second run is fully offline
    monkeypatch.setattr(
        urllib.request, "urlopen",
        lambda *a, **k: (_ for _ in ()).throw(OSError("no egress")),
    )
    rows2 = ra.main(
        workloads=["sgc_pubmed"], root=root, epochs=3,
        split="random", check_bands=False,
    )
    assert np.isfinite(rows2[0][2])


def test_reproduce_accuracy_band_verdicts():
    """Band logic: in/out verdicts and the failing exit path's predicate."""
    import reproduce_accuracy as ra

    for name, (_, _, (lo, hi), _) in ra.WORKLOADS.items():
        assert 0.0 < lo < hi <= 1.0, name
    # the documented published values sit inside their bands
    assert ra.WORKLOADS["sgc_pubmed"][2][0] <= 0.79 <= ra.WORKLOADS["sgc_pubmed"][2][1]
    assert (
        ra.WORKLOADS["gamlp_products"][2][0]
        <= 0.8459
        <= ra.WORKLOADS["gamlp_products"][2][1]
    )
