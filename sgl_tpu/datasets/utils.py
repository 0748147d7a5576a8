"""Dataset parsing utilities (reference ``sgl/dataset/utils.py``).

Downloads are gated: this environment has no egress, so ``download_to``
raises a clear error instead of fetching; every loader works from raw files
placed under its ``raw/`` directory.
"""

from __future__ import annotations

import gzip
import os
import pickle
from typing import Tuple

import numpy as np
import scipy.sparse as sp


def download_to(url: str, path: str) -> None:
    """Fetch ``url`` into ``path``; raises when offline (always, here)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    try:
        import urllib.request
        import ssl

        context = ssl._create_unverified_context()
        data = urllib.request.urlopen(url, context=context, timeout=30)
        with open(path, "wb") as wf:
            wf.write(data.read())
    except Exception as e:  # zero-egress environment
        raise IOError(
            f"cannot download {url} (offline environment); place the file at {path}"
        ) from e


def pkl_read_file(filepath: str):
    with open(filepath, "rb") as rf:
        return pickle.load(rf, encoding="latin1")


def row_normalize(mx: sp.spmatrix) -> sp.spmatrix:
    """Row-normalize a sparse matrix (reference ``planetoid.py:40-47``)."""
    rowsum = np.asarray(mx.sum(1)).flatten()
    r_inv = np.divide(1.0, rowsum, out=np.zeros_like(rowsum, dtype=float), where=rowsum != 0)
    return sp.diags(r_inv) @ mx


def undirect_and_clean(src: np.ndarray, dst: np.ndarray):
    """Remove self loops, add reversed edges, dedup."""
    keep = src != dst
    src, dst = src[keep], dst[keep]
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    pairs = np.unique(np.stack([s, d], axis=1), axis=0)
    return pairs[:, 0], pairs[:, 1]


def read_npz(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Parse shchur gnn-benchmark npz (reference ``dataset/utils.py:69-90``):
    returns (x, src, dst, y) with binarized features and undirected edges."""
    with np.load(path, allow_pickle=True) as f:
        x = sp.csr_matrix(
            (f["attr_data"], f["attr_indices"], f["attr_indptr"]), f["attr_shape"]
        ).toarray()
        x = (x > 0).astype(np.float32)
        adj = sp.csr_matrix(
            (f["adj_data"], f["adj_indices"], f["adj_indptr"]), f["adj_shape"]
        ).tocoo()
        src, dst = undirect_and_clean(
            adj.row.astype(np.int64), adj.col.astype(np.int64)
        )
        y = f["labels"].astype(np.int64)
    return x, src, dst, y


def read_csv_gz(path: str, dtype=np.float32) -> np.ndarray:
    """Read a headerless (possibly gzipped) csv into a 2-D numpy array —
    the OGB raw format.

    Tries the native loader first (``csrc/csv_loader.cpp``: zlib stream +
    OpenMP-parallel parse — the host-side bottleneck of ogbn-products /
    papers100M ingestion is these multi-GB csv.gz files); falls back to
    ``numpy.loadtxt`` when the library or dialect doesn't apply.
    """
    from sgl_tpu.graph.native import load_csv_native

    out = load_csv_native(path, dtype)
    if out is not None:
        return out
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        return np.loadtxt(f, delimiter=",", dtype=dtype, ndmin=2)


def read_index_csv_gz(path: str) -> np.ndarray:
    return read_csv_gz(path, dtype=np.int64).reshape(-1)


def random_split_dataset(n_samples: int, seed=None):
    """60/20/20 random split (reference ``dataset/utils.py:92-96``)."""
    rng = np.random.default_rng(seed)
    val_idx = rng.choice(n_samples, size=int(n_samples * 0.2), replace=False)
    remain = np.setdiff1d(np.arange(n_samples), val_idx)
    test_idx = rng.choice(remain, size=int(n_samples * 0.2), replace=False)
    train_idx = np.setdiff1d(remain, test_idx)
    return train_idx, val_idx, test_idx
