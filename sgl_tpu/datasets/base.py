"""Dataset abstractions with a download → process → cache lifecycle.

Parity with reference ``sgl/data/base_dataset.py:15-121`` (``NodeDataset``)
and ``:129-433`` (``HeteroNodeDataset``), minus torch: processed graphs are
pickled ``sgl_tpu.graph`` containers.  Downloads are gated — this build
environment has zero egress, so loaders raise a clear error when raw files
are absent instead of exiting (reference ``dataset/utils.py:29-35`` calls
``exit(1)``), and every dataset is constructible from local files.
"""

from __future__ import annotations

import os
import pickle
from typing import List, Optional, Sequence, Tuple

import numpy as np

from sgl_tpu.graph.graph import Graph, HeteroGraph


def _fetch_raw_urls(ds) -> None:
    """Shared download bootstrap: fetch every ``raw_urls`` entry into
    ``raw_dir`` then run the loader's ``_post_download`` hook (archive
    extraction).  Loaders without a known source (empty ``raw_urls``) raise
    the clear offline error instead — mirrors the reference behavior where
    each loader ships its concrete URLs (``sgl/dataset/planetoid.py:34``,
    ``flickr.py:32``) but without ``exit(1)`` on failure
    (``sgl/dataset/utils.py:29-35``)."""
    urls = ds.raw_urls
    if not urls:
        raise IOError(
            f"raw files for dataset {ds.name!r} not found under {ds.raw_dir}, "
            "and no download source is known for this loader; place the raw "
            "files there manually"
        )
    from sgl_tpu.datasets.utils import download_to

    for fname, url in urls.items():
        download_to(url, os.path.join(ds.raw_dir, fname))
    ds._post_download()


class NodeDataset:
    """Homogeneous node-level dataset.

    Subclasses implement ``_download()`` (fetch raw files) and
    ``_process() -> Graph``; processing results are pickle-cached so repeated
    runs are instant and idempotent (restartable precompute, SURVEY.md §5).
    """

    def __init__(self, name: str, root: str = "./data/", use_cache: bool = True):
        self.name = name
        self.root = os.path.join(root, name)
        self.raw_dir = os.path.join(self.root, "raw")
        self.processed_dir = os.path.join(self.root, "processed")
        self.graph: Optional[Graph] = None
        self.train_idx = None
        self.val_idx = None
        self.test_idx = None
        self._use_cache = use_cache
        self._preprocess()
        self._split()

    # -- lifecycle ---------------------------------------------------------
    @property
    def processed_path(self) -> str:
        return os.path.join(self.processed_dir, f"{self.name}.graph.pkl")

    def _preprocess(self) -> None:
        if self._use_cache and os.path.exists(self.processed_path):
            with open(self.processed_path, "rb") as f:
                self.graph = pickle.load(f)
            return
        if not self._raw_exists():
            self._download()
        self.graph = self._process()
        if self._use_cache:
            os.makedirs(self.processed_dir, exist_ok=True)
            tmp = self.processed_path + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump(self.graph, f)
            os.replace(tmp, self.processed_path)  # atomic: cache is idempotent

    def _raw_exists(self) -> bool:
        return os.path.isdir(self.raw_dir) and bool(os.listdir(self.raw_dir))

    @property
    def raw_urls(self) -> dict:
        """``{raw filename: source URL}`` for self-bootstrap; empty when the
        loader has no known source (user-provided data)."""
        return {}

    def _post_download(self) -> None:
        """Hook after raw files land (archive extraction etc.)."""

    def _download(self) -> None:
        _fetch_raw_urls(self)

    def _process(self) -> Graph:
        raise NotImplementedError

    def _split(self) -> None:
        raise NotImplementedError

    # -- accessors (reference base_dataset.py property surface) ------------
    @property
    def x(self):
        return self.graph.x

    @property
    def y(self):
        return self.graph.y

    @property
    def adj(self):
        return self.graph

    @property
    def num_node(self) -> int:
        return self.graph.num_nodes

    @property
    def num_features(self) -> int:
        return self.graph.num_features

    @property
    def num_classes(self) -> int:
        return self.graph.num_classes

    @property
    def data(self):  # reference exposes .data.num_node
        return self.graph


class HeteroNodeDataset:
    """Heterogeneous node-level dataset over a :class:`HeteroGraph`.

    Provides the NARS machinery: relation-subset subgraph sampling
    (``sample_by_edge_type``, reference ``base_dataset.py:237-311``),
    metapath adjacency (``sample_by_meta_path``, ``:313-397``) and random
    relation-subset generation (``nars_preprocess``, ``:399-433``).
    """

    def __init__(self, name: str, root: str = "./data/", use_cache: bool = True):
        self.name = name
        self.root = os.path.join(root, name)
        self.raw_dir = os.path.join(self.root, "raw")
        self.processed_dir = os.path.join(self.root, "processed")
        self.data: Optional[HeteroGraph] = None
        self.train_idx = None
        self.val_idx = None
        self.test_idx = None
        self._use_cache = use_cache
        self._preprocess()
        self._split()

    @property
    def processed_path(self) -> str:
        return os.path.join(self.processed_dir, f"{self.name}.hgraph.pkl")

    def _preprocess(self) -> None:
        if self._use_cache and os.path.exists(self.processed_path):
            with open(self.processed_path, "rb") as f:
                self.data = pickle.load(f)
            return
        if not self._raw_exists():
            self._download()
        self.data = self._process()
        if self._use_cache:
            os.makedirs(self.processed_dir, exist_ok=True)
            tmp = self.processed_path + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump(self.data, f)
            os.replace(tmp, self.processed_path)

    def _raw_exists(self) -> bool:
        return os.path.isdir(self.raw_dir) and bool(os.listdir(self.raw_dir))

    @property
    def raw_urls(self) -> dict:
        """``{raw filename: source URL}``; empty = no known source."""
        return {}

    def _post_download(self) -> None:
        """Hook after raw files land (archive extraction etc.)."""

    def _download(self) -> None:
        _fetch_raw_urls(self)

    def _process(self) -> HeteroGraph:
        raise NotImplementedError

    def _split(self) -> None:
        raise NotImplementedError

    @property
    def node_types(self) -> List[str]:
        return self.data.node_types

    @property
    def edge_types(self) -> List[str]:
        return self.data.edge_types

    # -- NARS machinery -----------------------------------------------------
    def sample_by_edge_type(self, edge_types: Sequence[str]):
        """Relation-subset subgraph with re-indexing and undirection; returns
        ``(graph, features, node_id)`` like the reference's
        ``(adj, feature, node_id)`` triple."""
        g, node_id = self.data.sample_by_edge_type(edge_types)
        feats = []
        for t in self.data.node_types:
            ids = self.data.node_id_dict[t]
            if ids.size and np.isin(ids[0], node_id):
                feats.append(self.data[t].x)
        feature = np.concatenate(feats, axis=0) if feats else None
        return g, feature, node_id

    def sample_by_meta_path(self, meta_path: Sequence[str]):
        """Chained sparse products along a metapath (reference
        ``base_dataset.py:313-397``): returns the (head-type × tail-type)
        adjacency as a scipy CSR over local ids."""
        import scipy.sparse as sp

        mats = []
        for et in meta_path:
            e = self.data.edges[et]
            st, _, dt = self.data.edge_type_parts(et)
            s = e.src - self.data.offset[st]
            d = e.dst - self.data.offset[dt]
            m = sp.csr_matrix(
                (np.ones(len(s)), (s, d)),
                shape=(self.data.num_node[st], self.data.num_node[dt]),
            )
            mats.append(m)
        out = mats[0]
        for m in mats[1:]:
            out = out @ m
        return out

    def nars_preprocess(
        self,
        edge_types: Sequence[str],
        predict_class: str,
        random_subgraph_num: int,
        subgraph_edge_type_num: int,
        seed: int = 42,
    ):
        """Sample ``random_subgraph_num`` distinct relation subsets of size
        ``subgraph_edge_type_num`` (reference ``base_dataset.py:399-433``)
        and materialize each subset's union subgraph."""
        from sgl_tpu.datasets.choose_edge_type import choose_multi_subgraphs

        combos = choose_multi_subgraphs(
            random_subgraph_num,
            subgraph_edge_type_num,
            list(edge_types),
            predict_class,
            seed=seed,
        )
        return {
            tuple(combo): self.sample_by_edge_type(combo) for combo in combos
        }

    @property
    def num_classes(self) -> int:
        raise NotImplementedError


def random_split(
    num_node: int,
    train_ratio: float = 0.6,
    val_ratio: float = 0.2,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Random train/val/test split (reference ``dataset/utils.py:92-96``)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(num_node)
    n_train = int(num_node * train_ratio)
    n_val = int(num_node * val_ratio)
    return (
        perm[:n_train],
        perm[n_train : n_train + n_val],
        perm[n_train + n_val :],
    )


class GraphDataset:
    """Graph-level dataset: a list of :class:`Graph` with per-graph labels.

    The reference leaves this an empty stub
    (``sgl/data/base_dataset.py:124-126``); here it is implemented with the
    same download→process→cache lifecycle as :class:`NodeDataset`.
    Subclasses provide ``_process() -> (List[Graph], labels)``; the batched
    block-diagonal form (one big graph + segment ids, see
    ``sgl_tpu.graph.batch``) is built lazily and reused.
    """

    def __init__(self, name: str, root: str = "./data/", use_cache: bool = True):
        self.name = name
        self.root = os.path.join(root, name)
        self.raw_dir = os.path.join(self.root, "raw")
        self.processed_dir = os.path.join(self.root, "processed")
        self.graphs = None
        self.y = None
        self.train_idx = None
        self.val_idx = None
        self.test_idx = None
        self._use_cache = use_cache
        self._batch = None
        self._preprocess()
        self._split()

    @property
    def processed_path(self) -> str:
        return os.path.join(self.processed_dir, f"{self.name}.graphs.pkl")

    def _preprocess(self) -> None:
        if self._use_cache and os.path.exists(self.processed_path):
            with open(self.processed_path, "rb") as f:
                self.graphs, self.y = pickle.load(f)
            return
        if not self._raw_exists():
            self._download()
        self.graphs, self.y = self._process()
        self.y = np.asarray(self.y)
        if self._use_cache:
            os.makedirs(self.processed_dir, exist_ok=True)
            tmp = self.processed_path + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump((self.graphs, self.y), f)
            os.replace(tmp, self.processed_path)

    def _raw_exists(self) -> bool:
        return os.path.isdir(self.raw_dir) and bool(os.listdir(self.raw_dir))

    @property
    def raw_urls(self) -> dict:
        """``{raw filename: source URL}``; empty = no known source."""
        return {}

    def _post_download(self) -> None:
        """Hook after raw files land (archive extraction etc.)."""

    def _download(self) -> None:
        _fetch_raw_urls(self)

    def _process(self):
        raise NotImplementedError

    def _split(self) -> None:
        self.train_idx, self.val_idx, self.test_idx = random_split(
            self.num_graphs, 0.6, 0.2, seed=0
        )

    def batch(self):
        """Block-diagonal :class:`~sgl_tpu.graph.batch.GraphBatch` of all
        graphs (built once, cached)."""
        if self._batch is None:
            from sgl_tpu.graph.batch import batch_graphs

            self._batch = batch_graphs(self.graphs, y=self.y)
        return self._batch

    # -- accessors -----------------------------------------------------------
    @property
    def num_graphs(self) -> int:
        return len(self.graphs)

    @property
    def num_features(self) -> int:
        return self.graphs[0].num_features

    @property
    def num_classes(self) -> int:
        y = np.asarray(self.y)
        return int(y.max()) + 1 if y.ndim == 1 else y.shape[1]
