"""User-supplied graph ingestion (reference ``sgl/dataset/custom_dataset.py``).

Fully offline format, unchanged from the reference:

Homogeneous (``Custom_Homo``), under ``<root>/<name>/raw/``:
    x.npy          # [N, D] features (optional if num_node given)
    adj_matrix.npz # arrays 'row', 'col', 'data' (COO, required)
    label.npy      # [N] ids or [N, C] one-hot (optional)
    indices.npz    # 'train_idx' / 'val_idx' / 'test_idx' (optional)

Heterogeneous (``Custom_Hetero``): per node type ``x_<type>.npy`` and
``label_<type>.npy``, per edge type ``adj_<src>__<rel>__<dst>.npz``
(local ids), plus ``indices.npz`` for the prediction type.
"""

from __future__ import annotations

import os.path as osp
from typing import List, Optional, Tuple

import numpy as np

from sgl_tpu.datasets.base import HeteroNodeDataset, NodeDataset, random_split
from sgl_tpu.graph.graph import Graph, HeteroGraph


class Custom_Homo(NodeDataset):  # noqa: N801 — reference-compatible name
    def __init__(
        self,
        name: str,
        root: str = "./data/",
        num_node: Optional[int] = None,
        node_type: str = "node",
        edge_type_tuple: Tuple[str, str, str] = ("node", "to", "node"),
        splitted: bool = True,
    ):
        self._num_node = num_node
        self._node_type = node_type
        self._edge_type_tuple = edge_type_tuple
        self._splitted = splitted
        super().__init__(name=name, root=root)

    def _raw_exists(self) -> bool:
        return osp.exists(osp.join(self.raw_dir, "adj_matrix.npz"))

    def _process(self) -> Graph:
        x = None
        xp = osp.join(self.raw_dir, "x.npy")
        if osp.exists(xp):
            x = np.asarray(np.load(xp), np.float32)
            if self._num_node and self._num_node != x.shape[0]:
                raise ValueError("every node should have a feature vector")
            self._num_node = x.shape[0]
        elif not self._num_node:
            raise ValueError(
                "please provide either feature matrix or number of node"
            )
        f = np.load(osp.join(self.raw_dir, "adj_matrix.npz"))
        row, col, data = f["row"], f["col"], f["data"]
        y = None
        lp = osp.join(self.raw_dir, "label.npy")
        if osp.exists(lp):
            y = np.load(lp)
            if y.ndim == 2:
                y = np.argmax(y, axis=1)
            y = y.astype(np.int64)
        return Graph.from_coo(
            row, col, data, num_nodes=self._num_node, x=x, y=y
        )

    def _split(self) -> None:
        self.train_idx = self.val_idx = self.test_idx = None
        ip = osp.join(self.raw_dir, "indices.npz")
        if self._splitted and osp.exists(ip):
            f = np.load(ip)
            self.train_idx = f.get("train_idx")
            self.val_idx = f.get("val_idx")
            self.test_idx = f.get("test_idx")
        if self.train_idx is None:
            self.train_idx, self.val_idx, self.test_idx = random_split(
                self._num_node
            )


class Custom_Hetero(HeteroNodeDataset):  # noqa: N801
    def __init__(
        self,
        name: str,
        type_of_node_to_predict: str,
        node_types: List[str],
        edge_types_tuple: List[Tuple[str, str, str]],
        root: str = "./data/",
        splitted: bool = True,
    ):
        if type_of_node_to_predict not in node_types:
            raise ValueError(
                "make sure that the type of center node is in type list"
            )
        self.NODE_TYPES = list(node_types)
        self.TYPE_OF_NODE_TO_PREDICT = type_of_node_to_predict
        self.EDGE_TYPES_TUPLE = list(edge_types_tuple)
        self._splitted = splitted
        super().__init__(name=name, root=root)

    def _raw_exists(self) -> bool:
        return all(
            osp.exists(osp.join(self.raw_dir, f"adj_{s}__{r}__{d}.npz"))
            for s, r, d in self.EDGE_TYPES_TUPLE
        )

    def _process(self) -> HeteroGraph:
        counts, x_dict, y_dict = {}, {}, {}
        for nt in self.NODE_TYPES:
            xp = osp.join(self.raw_dir, f"x_{nt}.npy")
            if osp.exists(xp):
                x_dict[nt] = np.asarray(np.load(xp), np.float32)
                counts[nt] = x_dict[nt].shape[0]
            lp = osp.join(self.raw_dir, f"label_{nt}.npy")
            if osp.exists(lp):
                y = np.load(lp)
                if y.ndim == 2:
                    y = np.argmax(y, axis=1)
                y_dict[nt] = y.astype(np.int64)
        edge_index_dict = {}
        for s, r, d in self.EDGE_TYPES_TUPLE:
            f = np.load(osp.join(self.raw_dir, f"adj_{s}__{r}__{d}.npz"))
            edge_index_dict[(s, r, d)] = (f["row"], f["col"])
            counts[s] = max(counts.get(s, 0), int(f["row"].max()) + 1)
            counts[d] = max(counts.get(d, 0), int(f["col"].max()) + 1)
        return HeteroGraph.build(
            counts, edge_index_dict, x_dict=x_dict, y_dict=y_dict
        )

    def _split(self) -> None:
        self.train_idx = self.val_idx = self.test_idx = None
        ip = osp.join(self.raw_dir, "indices.npz")
        if self._splitted and osp.exists(ip):
            f = np.load(ip)
            self.train_idx = f.get("train_idx")
            self.val_idx = f.get("val_idx")
            self.test_idx = f.get("test_idx")
        if self.train_idx is None:
            n = self.data.num_node[self.TYPE_OF_NODE_TO_PREDICT]
            self.train_idx, self.val_idx, self.test_idx = random_split(n)

    @property
    def num_classes(self) -> int:
        y = np.asarray(self.data[self.TYPE_OF_NODE_TO_PREDICT].y)
        return int(y.max()) + 1
