"""OGB node-property datasets: ogbn-arxiv / -products / -papers100M and the
heterogeneous ogbn-mag (reference ``sgl/dataset/ogbn.py`` / ``ogbn_mag.py``).

The ``ogb`` package is not installed here, so these loaders parse the
**standard OGB raw layout** directly (exactly what ``ogb`` unzips):

    <root>/ogbn_<name>/raw/edge.csv.gz            # src,dst per line
    <root>/ogbn_<name>/raw/node-feat.csv.gz       # one row per node
    <root>/ogbn_<name>/raw/node-label.csv.gz
    <root>/ogbn_<name>/split/<split_name>/{train,valid,test}.csv.gz

papers100M ships .npy files instead; both are handled.  Graphs are
converted to undirected (reference ``ogbn.py:45``).
"""

from __future__ import annotations

import os.path as osp

import numpy as np

from sgl_tpu.datasets.base import HeteroNodeDataset, NodeDataset
from sgl_tpu.datasets.utils import (
    read_csv_gz,
    read_index_csv_gz,
    undirect_and_clean,
)
from sgl_tpu.graph.graph import Graph, HeteroGraph

_SPLIT_DIRS = {"arxiv": "time", "products": "sales_ranking", "papers100M": "time"}


class Ogbn(NodeDataset):
    def __init__(self, name: str = "arxiv", root: str = "./data/", split: str = "official"):
        if name not in ("arxiv", "products", "papers100M"):
            raise ValueError("Dataset name not found!")
        self._split_mode = split
        super().__init__(name=name, root=osp.join(root, "ogbn"))

    @property
    def dataset_dir(self) -> str:
        return osp.join(self.root, f"ogbn_{self.name}")

    def _raw_exists(self) -> bool:
        d = osp.join(self.dataset_dir, "raw")
        return osp.isdir(d) and bool(
            [f for f in __import__("os").listdir(d) if f.startswith("edge")]
        )

    @property
    def raw_urls(self):
        # where the reference's ogb dependency fetches from
        # (PygNodePropPredDataset, reference ogbn.py:31-34)
        zip_name = {"papers100M": "papers100M-bin"}.get(self.name, self.name)
        return {
            f"{zip_name}.zip": f"http://snap.stanford.edu/ogb/data/nodeproppred/{zip_name}.zip"
        }

    def _post_download(self) -> None:
        """Unzip into the OGB layout: the archive's top-level dir becomes
        ``ogbn_<name>/`` with raw/ + split/ inside."""
        import os
        import shutil
        import zipfile

        zip_name = {"papers100M": "papers100M-bin"}.get(self.name, self.name)
        path = osp.join(self.raw_dir, f"{zip_name}.zip")
        with zipfile.ZipFile(path) as zf:
            zf.extractall(self.root)
        os.unlink(path)
        extracted = osp.join(self.root, zip_name)
        if osp.isdir(extracted) and not osp.isdir(self.dataset_dir):
            shutil.move(extracted, self.dataset_dir)

    def _read(self, stem: str, dtype):
        raw = osp.join(self.dataset_dir, "raw")
        for ext, reader in (
            (".csv.gz", lambda p: read_csv_gz(p, dtype)),
            (".csv", lambda p: read_csv_gz(p, dtype)),
            (".npy", np.load),
        ):
            p = osp.join(raw, stem + ext)
            if osp.exists(p):
                return reader(p)
        raise IOError(f"missing OGB raw file {stem} under {raw}")

    def _process(self) -> Graph:
        edges = self._read("edge", np.int64)
        x = np.asarray(self._read("node-feat", np.float32), np.float32)
        y = np.asarray(self._read("node-label", np.float32)).reshape(-1)
        y = np.where(np.isnan(y), -1, y).astype(np.int64)
        src, dst = undirect_and_clean(edges[:, 0], edges[:, 1])
        return Graph.from_coo(src, dst, num_nodes=x.shape[0], x=x, y=y)

    def _split(self) -> None:
        if self._split_mode != "official":
            raise ValueError("Please input valid split pattern!")
        split_dir = osp.join(self.dataset_dir, "split", _SPLIT_DIRS[self.name])
        idx = {}
        for part in ("train", "valid", "test"):
            for ext in (".csv.gz", ".csv", ".npy"):
                p = osp.join(split_dir, part + ext)
                if osp.exists(p):
                    idx[part] = (
                        np.load(p) if ext == ".npy" else read_index_csv_gz(p)
                    )
                    break
            else:
                raise IOError(f"missing OGB split file {part} under {split_dir}")
        self.train_idx = idx["train"]
        self.val_idx = idx["valid"]
        self.test_idx = idx["test"]


class OgbnMag(HeteroNodeDataset):
    """ogbn-mag heterogeneous dataset.  Raw layout: per-relation edge files
    ``raw/relations/<src>___<rel>___<dst>/edge.csv.gz`` plus paper features
    ``raw/node-feat/paper/node-feat.csv.gz``, labels and venue split — the
    standard OGB hetero layout.  Featureless node types get neighbor-averaged
    features (reference ``ogbn_mag.py:48-68``)."""

    def __init__(self, root: str = "./data/", split: str = "official"):
        self._split_mode = split
        super().__init__(name="mag", root=osp.join(root, "ogbn"))

    @property
    def dataset_dir(self) -> str:
        return osp.join(self.root, "ogbn_mag")

    def _raw_exists(self) -> bool:
        return osp.isdir(osp.join(self.dataset_dir, "raw", "relations"))

    @property
    def raw_urls(self):
        return {"mag.zip": "http://snap.stanford.edu/ogb/data/nodeproppred/mag.zip"}

    def _post_download(self) -> None:
        import os
        import shutil
        import zipfile

        path = osp.join(self.raw_dir, "mag.zip")
        with zipfile.ZipFile(path) as zf:
            zf.extractall(self.root)
        os.unlink(path)
        extracted = osp.join(self.root, "mag")
        if osp.isdir(extracted) and not osp.isdir(self.dataset_dir):
            shutil.move(extracted, self.dataset_dir)

    def _process(self) -> HeteroGraph:
        import os

        raw = osp.join(self.dataset_dir, "raw")
        rel_dir = osp.join(raw, "relations")
        edge_index_dict = {}
        counts: dict = {}
        for rel in sorted(os.listdir(rel_dir)):
            st, rname, dt = rel.split("___")
            e = read_csv_gz(osp.join(rel_dir, rel, "edge.csv.gz"), np.int64)
            edge_index_dict[(st, rname, dt)] = (e[:, 0], e[:, 1])
            counts[st] = max(counts.get(st, 0), int(e[:, 0].max()) + 1)
            counts[dt] = max(counts.get(dt, 0), int(e[:, 1].max()) + 1)
        num_nodes_file = osp.join(raw, "num-node-dict.csv.gz")
        paper_x = np.asarray(
            read_csv_gz(osp.join(raw, "node-feat", "paper", "node-feat.csv.gz")),
            np.float32,
        )
        paper_y = read_index_csv_gz(
            osp.join(raw, "node-label", "paper", "node-label.csv.gz")
        )
        counts["paper"] = paper_x.shape[0]
        x_dict = {"paper": paper_x}
        hg = HeteroGraph.build(
            counts, edge_index_dict, x_dict=x_dict, y_dict={"paper": paper_y}
        )
        # synthesize features for featureless types by neighbor averaging
        d = paper_x.shape[1]
        for ntype in hg.node_types:
            if hg.nodes[ntype].x is not None:
                continue
            acc = np.zeros((hg.num_node[ntype], d), np.float32)
            cnt = np.zeros(hg.num_node[ntype], np.float32)
            for et, edge in hg.edges.items():
                st, _, dt = hg.edge_type_parts(et)
                if st == ntype and hg.nodes[dt].x is not None:
                    ls = edge.src - hg.offset[st]
                    ld = edge.dst - hg.offset[dt]
                    np.add.at(acc, ls, hg.nodes[dt].x[ld])
                    np.add.at(cnt, ls, 1.0)
                elif dt == ntype and hg.nodes[st].x is not None:
                    ls = edge.dst - hg.offset[dt]
                    ld = edge.src - hg.offset[st]
                    np.add.at(acc, ls, hg.nodes[st].x[ld])
                    np.add.at(cnt, ls, 1.0)
            cnt = np.maximum(cnt, 1.0)
            hg.nodes[ntype].x = acc / cnt[:, None]
        return hg

    def _split(self) -> None:
        split_dir = osp.join(self.dataset_dir, "split", "time", "paper")
        self.train_idx = read_index_csv_gz(osp.join(split_dir, "train.csv.gz"))
        self.val_idx = read_index_csv_gz(osp.join(split_dir, "valid.csv.gz"))
        self.test_idx = read_index_csv_gz(osp.join(split_dir, "test.csv.gz"))

    @property
    def num_classes(self) -> int:
        return int(np.asarray(self.data["paper"].y).max()) + 1
