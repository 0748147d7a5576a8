"""Remaining homogeneous loaders: geom-gcn text datasets (Actor, WebKB),
struc2vec Airports, graphmining.ai musae npz (Twitch, Facebook, Github),
WikiCS json, LINKX facebook100 .mat, and the built-in KarateClub
(reference ``sgl/dataset/{actor,webkb,airports,twitch,facebook,github,
wikics,linkx_dataset,karateclub}.py``).
"""

from __future__ import annotations

import json
import os.path as osp

import numpy as np

from sgl_tpu.datasets.base import NodeDataset, random_split
from sgl_tpu.datasets.utils import undirect_and_clean
from sgl_tpu.graph.graph import Graph


class Actor(NodeDataset):
    """geom-gcn film dataset: ``out1_node_feature_label.txt`` (sparse one-hot
    column lists) + ``out1_graph_edges.txt`` (reference ``actor.py``)."""

    def __init__(self, root: str = "./data/", split: str = "random", name: str = "actor"):
        self._split_mode = split
        super().__init__(name=name, root=osp.join(root, name))

    @property
    def raw_file_paths(self):
        return [
            osp.join(self.raw_dir, "out1_node_feature_label.txt"),
            osp.join(self.raw_dir, "out1_graph_edges.txt"),
        ]

    def _raw_exists(self):
        return all(osp.exists(p) for p in self.raw_file_paths)

    _GEOM_GCN = "https://raw.githubusercontent.com/graphdml-uiuc-jlu/geom-gcn/master"
    _GEOM_GCN_DIR = "film"  # reference actor.py:37-43

    @property
    def raw_urls(self):
        return {
            osp.basename(p): f"{self._GEOM_GCN}/new_data/{self._GEOM_GCN_DIR}/{osp.basename(p)}"
            for p in self.raw_file_paths
        }

    def _parse_features(self):
        with open(self.raw_file_paths[0]) as f:
            rows = [r.split("\t") for r in f.read().split("\n")[1:] if r]
        n = len(rows)
        # sparse one-hot feature columns
        max_col = max(int(c) for _, cols, _ in rows for c in cols.split(","))
        x = np.zeros((n, max_col + 1), np.float32)
        y = np.zeros(n, np.int64)
        for nid, cols, label in rows:
            x[int(nid), [int(c) for c in cols.split(",")]] = 1.0
            y[int(nid)] = int(label)
        return x, y

    def _process(self) -> Graph:
        x, y = self._parse_features()
        with open(self.raw_file_paths[1]) as f:
            data = [r.split("\t") for r in f.read().split("\n")[1:] if r]
        e = np.asarray(data, np.int64)
        src, dst = undirect_and_clean(e[:, 0], e[:, 1])
        return Graph.from_coo(src, dst, num_nodes=x.shape[0], x=x, y=y)

    def _split(self):
        self.train_idx, self.val_idx, self.test_idx = random_split(self.num_node)


class WebKB(Actor):
    """geom-gcn webkb (cornell/texas/wisconsin): dense comma-separated
    features (reference ``webkb.py``)."""

    def __init__(self, name: str = "cornell", root: str = "./data/", split: str = "random"):
        if name not in ("cornell", "texas", "wisconsin"):
            raise ValueError("Dataset name not supported!")
        self._split_mode = split
        NodeDataset.__init__(self, name=name, root=osp.join(root, "webkb"))

    @property
    def _GEOM_GCN_DIR(self):  # reference webkb.py:40-46
        return self.name

    def _parse_features(self):
        with open(self.raw_file_paths[0]) as f:
            rows = [r.split("\t") for r in f.read().split("\n")[1:] if r]
        x = np.asarray(
            [[float(v) for v in cols.split(",")] for _, cols, _ in rows], np.float32
        )
        y = np.asarray([int(label) for _, _, label in rows], np.int64)
        return x, y


class Airports(NodeDataset):
    """struc2vec airports (usa/brazil/europe): edgelist + label file;
    one-hot identity features (reference ``airports.py``)."""

    def __init__(self, name: str = "usa", root: str = "./data/", split: str = "random"):
        if name not in ("usa", "brazil", "europe"):
            raise ValueError("Dataset name not supported!")
        self._split_mode = split
        super().__init__(name=name, root=osp.join(root, "airports"))

    @property
    def raw_file_paths(self):
        return [
            osp.join(self.raw_dir, f"{self.name}-airports.edgelist"),
            osp.join(self.raw_dir, f"labels-{self.name}-airports.txt"),
        ]

    def _raw_exists(self):
        return all(osp.exists(p) for p in self.raw_file_paths)

    @property
    def raw_urls(self):
        # reference airports.py:38-47
        base = "https://github.com/leoribeiro/struc2vec/raw/master/graph"
        return {
            f"{self.name}-airports.edgelist": f"{base}/{self.name}-airports.edgelist",
            f"labels-{self.name}-airports.txt": f"{base}/labels-{self.name}-airports.txt",
        }

    def _process(self) -> Graph:
        index_map, ys = {}, []
        with open(self.raw_file_paths[1]) as f:
            for i, row in enumerate(r for r in f.read().split("\n")[1:] if r):
                idx, y = row.split()
                index_map[int(idx)] = i
                ys.append(int(y))
        y = np.asarray(ys, np.int64)
        x = np.eye(len(y), dtype=np.float32)
        src, dst = [], []
        with open(self.raw_file_paths[0]) as f:
            for row in (r for r in f.read().split("\n") if r):
                a, b = row.split()
                src.append(index_map[int(a)])
                dst.append(index_map[int(b)])
        s, d = undirect_and_clean(np.asarray(src, np.int64), np.asarray(dst, np.int64))
        return Graph.from_coo(s, d, num_nodes=len(y), x=x, y=y)

    def _split(self):
        self.train_idx, self.val_idx, self.test_idx = random_split(self.num_node)


class _MusaeNpz(NodeDataset):
    """graphmining.ai npz layout: edges / features / target."""

    # reference github.py:32 / facebook.py:32 / twitch.py:35
    _MUSAE_BASE = "https://graphmining.ai/datasets/ptg"

    def _raw_exists(self):
        return osp.exists(osp.join(self.raw_dir, f"{self.name}.npz"))

    @property
    def raw_urls(self):
        return {f"{self.name}.npz": f"{self._MUSAE_BASE}/{self.name}.npz"}

    def _process(self) -> Graph:
        data = np.load(osp.join(self.raw_dir, f"{self.name}.npz"))
        x = np.asarray(data["features"], np.float32)
        y = np.asarray(data["target"], np.int64)
        e = np.asarray(data["edges"], np.int64)
        src, dst = undirect_and_clean(e[:, 0], e[:, 1])
        return Graph.from_coo(src, dst, num_nodes=x.shape[0], x=x, y=y)

    def _split(self):
        self.train_idx, self.val_idx, self.test_idx = random_split(self.num_node)


class Github(_MusaeNpz):
    def __init__(self, root: str = "./data/", split: str = "random"):
        super().__init__(name="github", root=osp.join(root, "github"))


class Facebook(_MusaeNpz):
    def __init__(self, root: str = "./data/", split: str = "random"):
        super().__init__(name="facebook", root=osp.join(root, "facebook"))


class Twitch(_MusaeNpz):
    _MUSAE_BASE = "https://graphmining.ai/datasets/ptg/twitch"  # twitch.py:35

    def __init__(self, name: str = "EN", root: str = "./data/", split: str = "random"):
        if name not in ("DE", "EN", "ES", "FR", "PT", "RU"):
            raise ValueError("Dataset name not supported!")
        super().__init__(name=name, root=osp.join(root, "twitch"))


class Wikics(NodeDataset):
    """wiki-cs data.json: features / labels / links adjacency lists
    (reference ``wikics.py``)."""

    def __init__(self, root: str = "./data/", split: str = "random", is_undirected: bool = True):
        self._split_mode = split
        self._is_undirected = is_undirected
        super().__init__(name="wikics", root=osp.join(root, "wikics"))

    def _raw_exists(self):
        return osp.exists(osp.join(self.raw_dir, "data.json"))

    @property
    def raw_urls(self):
        # reference wikics.py:40-43
        return {
            "data.json": "https://github.com/pmernyei/wiki-cs-dataset/raw/master/dataset/data.json"
        }

    def _process(self) -> Graph:
        with open(osp.join(self.raw_dir, "data.json")) as f:
            data = json.load(f)
        x = np.asarray(data["features"], np.float32)
        y = np.asarray(data["labels"], np.int64)
        src = np.asarray(
            [i for i, js in enumerate(data["links"]) for _ in js], np.int64
        )
        dst = np.asarray([j for js in data["links"] for j in js], np.int64)
        if self._is_undirected:
            src, dst = undirect_and_clean(src, dst)
        return Graph.from_coo(src, dst, num_nodes=x.shape[0], x=x, y=y)

    def _split(self):
        self.train_idx, self.val_idx, self.test_idx = random_split(self.num_node)


class LINKXDataset(NodeDataset):
    """LINKX non-homophilous facebook100 .mat graphs (penn94 etc.):
    ``A`` adjacency + ``local_info`` demographics; label = gender column,
    remaining columns one-hot-encoded as features (reference
    ``linkx_dataset.py``)."""

    NAMES = ("penn94", "reed98", "amherst41", "cornell5", "johnshopkins55")
    FILES = {
        "penn94": "Penn94.mat",
        "reed98": "Reed98.mat",
        "amherst41": "Amherst41.mat",
        "cornell5": "Cornell5.mat",
        "johnshopkins55": "Johns Hopkins55.mat",
    }

    def __init__(self, name: str = "penn94", root: str = "./data/", split: str = "random"):
        if name not in self.NAMES:
            raise ValueError("Dataset name not supported!")
        self._split_mode = split
        super().__init__(name=name, root=osp.join(root, "linkx"))

    def _raw_exists(self):
        return osp.exists(osp.join(self.raw_dir, self.FILES[self.name]))

    @property
    def raw_urls(self):
        # reference linkx_dataset.py:56-64
        base = "https://github.com/CUAI/Non-Homophily-Large-Scale/raw/master/data/facebook100"
        fname = self.FILES[self.name]
        return {fname: f"{base}/{fname.replace(' ', '%20')}"}

    def _process(self) -> Graph:
        from scipy.io import loadmat

        mat = loadmat(osp.join(self.raw_dir, self.FILES[self.name]))
        adj = mat["A"].tocoo()
        meta = np.asarray(mat["local_info"], np.int64)
        y = meta[:, 1] - 1  # gender column; 0 -> unlabeled (-1)
        feats = np.concatenate([meta[:, :1], meta[:, 2:]], axis=1)
        # one-hot encode each categorical column
        cols = []
        for j in range(feats.shape[1]):
            vals, inv = np.unique(feats[:, j], return_inverse=True)
            onehot = np.zeros((feats.shape[0], len(vals)), np.float32)
            onehot[np.arange(feats.shape[0]), inv] = 1.0
            cols.append(onehot)
        x = np.concatenate(cols, axis=1)
        src, dst = undirect_and_clean(
            adj.row.astype(np.int64), adj.col.astype(np.int64)
        )
        return Graph.from_coo(src, dst, num_nodes=x.shape[0], x=x, y=y)

    def _split(self):
        self.train_idx, self.val_idx, self.test_idx = random_split(self.num_node)


class KarateClub(NodeDataset):
    """Zachary's karate club, built-in (no download; reference
    ``karateclub.py`` via networkx)."""

    LABELS = np.asarray(
        [1, 1, 1, 1, 3, 3, 3, 1, 0, 1, 3, 1, 1, 1, 0, 0, 3, 1, 0, 1, 0, 1,
         0, 0, 2, 2, 0, 0, 2, 0, 0, 2, 0, 0],
        np.int64,
    )

    def __init__(self, root: str = "./data/", split: str = "random"):
        self._split_mode = split
        super().__init__(name="karateclub", root=osp.join(root, "karateclub"), use_cache=False)

    def _raw_exists(self):
        return True

    def _process(self) -> Graph:
        import networkx as nx

        g = nx.karate_club_graph()
        src, dst = zip(*g.edges())
        s, d = undirect_and_clean(np.asarray(src, np.int64), np.asarray(dst, np.int64))
        n = g.number_of_nodes()
        x = np.eye(n, dtype=np.float32)
        return Graph.from_coo(s, d, num_nodes=n, x=x, y=self.LABELS)

    def _split(self):
        self.train_idx, self.val_idx, self.test_idx = random_split(self.num_node)
