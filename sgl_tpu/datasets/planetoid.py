"""Planetoid citation datasets (cora/citeseer/pubmed) and NELL
(reference ``sgl/dataset/planetoid.py`` / ``nell.py``).

Parses the kimiyoung/planetoid pickle format: ``ind.<name>.{x,tx,allx,y,ty,
ally,graph,test.index}``.  Raw files must be present under ``raw/``
(offline environment).  Features are row-normalized, matching the reference
quirk that only Planetoid normalizes hop-0 features.
"""

from __future__ import annotations

import os.path as osp

import numpy as np
import scipy.sparse as sp

from sgl_tpu.datasets.base import NodeDataset, random_split
from sgl_tpu.datasets.utils import pkl_read_file, row_normalize, undirect_and_clean
from sgl_tpu.graph.graph import Graph


class Planetoid(NodeDataset):
    RAW_NAMES = ["x", "tx", "allx", "y", "ty", "ally", "graph", "test.index"]

    def __init__(self, name: str = "cora", root: str = "./data/", split: str = "official"):
        if name not in ("cora", "citeseer", "pubmed"):
            raise ValueError("Dataset name not supported!")
        self._split_mode = split
        super().__init__(name=name, root=osp.join(root, "Planetoid"))

    @property
    def raw_file_paths(self):
        return [
            osp.join(self.raw_dir, f"ind.{self.name}.{n}") for n in self.RAW_NAMES
        ]

    def _raw_exists(self) -> bool:
        return all(osp.exists(p) for p in self.raw_file_paths)

    @property
    def raw_urls(self):
        # reference sgl/dataset/planetoid.py:34-39
        base = "https://github.com/kimiyoung/planetoid/raw/master/data"
        return {
            f"ind.{self.name}.{n}": f"{base}/ind.{self.name}.{n}"
            for n in self.RAW_NAMES
        }

    def _process(self) -> Graph:
        x, tx, allx, y, ty, ally = [
            pkl_read_file(p) for p in self.raw_file_paths[:6]
        ]
        graph = pkl_read_file(self.raw_file_paths[6])
        with open(self.raw_file_paths[7]) as rf:
            test_idx_reorder = [int(line.strip()) for line in rf if line.strip()]
        test_idx_range = np.sort(test_idx_reorder)

        if self.name == "citeseer":
            # isolated-node fix (reference planetoid.py:63-72)
            full = range(min(test_idx_reorder), max(test_idx_reorder) + 1)
            tx_ext = sp.lil_matrix((len(full), x.shape[1]))
            tx_ext[test_idx_range - min(test_idx_range), :] = tx
            tx = tx_ext
            ty_ext = np.zeros((len(full), y.shape[1]))
            ty_ext[test_idx_range - min(test_idx_range), :] = ty
            ty = ty_ext

        features = sp.vstack((allx, tx)).tolil()
        features[test_idx_reorder, :] = features[test_idx_range, :]
        features = np.asarray(row_normalize(features.tocsr()).todense(), np.float32)

        labels = np.vstack((ally, ty))
        labels[test_idx_reorder, :] = labels[test_idx_range, :]
        labels = np.argmax(labels, axis=1).astype(np.int64)

        src, dst = [], []
        for u, nbrs in graph.items():
            src += [u] * len(nbrs)
            dst += list(nbrs)
        s, d = undirect_and_clean(
            np.asarray(src, np.int64), np.asarray(dst, np.int64)
        )
        return Graph.from_coo(
            s, d, num_nodes=features.shape[0], x=features, y=labels
        )

    def _split(self) -> None:
        if self._split_mode == "official":
            c = self.num_classes
            self.train_idx = np.arange(c * 20)
            self.val_idx = np.arange(c * 20, c * 20 + 500)
            self.test_idx = np.arange(self.num_node - 1000, self.num_node)
        elif self._split_mode == "random":
            self.train_idx, self.val_idx, self.test_idx = random_split(self.num_node)
        else:
            raise ValueError("Please input valid split pattern!")


class Nell(Planetoid):
    """NELL knowledge-graph dataset — same planetoid pickle format
    (reference ``sgl/dataset/nell.py``)."""

    def __init__(self, name: str = "nell.0.001", root: str = "./data/", split: str = "official"):
        self._split_mode = split
        NodeDataset.__init__(self, name=name, root=osp.join(root, "Nell"))

    @property
    def raw_urls(self):
        # reference sgl/dataset/nell.py:36-37 (tarball; extracted below)
        return {
            "nell_data.tar.gz": "http://www.cs.cmu.edu/~zhiliny/data/nell_data.tar.gz"
        }

    def _post_download(self) -> None:
        """Extract the tarball and hoist this variant's files into raw/
        (reference ``nell.py:38-49``)."""
        import os
        import shutil
        import tarfile

        tar_path = osp.join(self.raw_dir, "nell_data.tar.gz")
        with tarfile.open(tar_path) as tf:
            tf.extractall(self.raw_dir, filter="data")
        os.unlink(tar_path)
        extracted = osp.join(self.raw_dir, "nell_data")
        for root_dir, _, files in os.walk(extracted, topdown=False):
            for f in files:
                if self.name in f:
                    shutil.move(osp.join(root_dir, f), self.raw_dir)
        shutil.rmtree(extracted, ignore_errors=True)

    def _split(self) -> None:
        if self._split_mode == "official":
            # official: 20 per class style split is not defined for NELL;
            # the reference uses the planetoid-style index layout
            c = self.num_classes
            self.train_idx = np.arange(c)
            self.val_idx = np.arange(c, c + 500)
            self.test_idx = np.arange(self.num_node - 1000, self.num_node)
        else:
            self.train_idx, self.val_idx, self.test_idx = random_split(self.num_node)
