"""Host-resident hop stacks for beyond-HBM training.

At papers100M scale the precomputed ``(K+1, N, D)`` hop stack cannot live
in device HBM (~228 GB at K=3, D=128 f32), and on a single host it may
not even fit RAM.  The out-of-core precompute already streams hops to a
``hop_sink`` (``kernels/spmm_ooc.k_hop_out_of_core``); this module closes
the loop so TRAINING can run from that store:

* :class:`MemmapHopSink` — a sink writing each hop to ``hop_k.npy``
  (``np.lib.format.open_memmap``), so peak host memory stays at two hop
  matrices during precompute and the OS page cache manages residency
  during training;
* :class:`HostHops` — the training-time view: ``rows(idx)`` gathers a
  batch's rows per hop on the host (native OMP ``gather_rows`` when
  built) and returns a device array — SGAP training touches only
  O(batch) rows per step (``sgl/models/base_model.py:55-63`` is the
  reference's host-slicing analog), so the full stack never moves.

``SGAPModel.batch_input`` recognizes any cache exposing ``rows`` (this
class and ``parallel.ShardedHops``), so tasks work unchanged:

    sink = MemmapHopSink(path, num_nodes=n, feat_dim=d, prop_steps=k)
    op.propagate_out_of_core(graph, x, hop_sink=sink, layout="2d")
    model.attach_host_hops(sink.hops())
    NodeClassification(ds, model, ...)   # preprocess() reuses the store
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import numpy as np


class HostHops:
    """Host-resident ``(K+1, N, D)`` hop stack (per-hop arrays/memmaps).

    ``agg`` (optional) is applied to the gathered ``(K+1, B, D)`` batch
    on device — non-learnable message ops aggregate per batch instead of
    materializing an aggregated (N, D') matrix on the host.
    """

    def __init__(self, hops: Sequence[np.ndarray], agg: Optional[Callable] = None):
        if not len(hops):
            raise ValueError("empty hop list")
        n, d = hops[0].shape
        for h in hops:
            if h.shape != (n, d):
                raise ValueError("hop shapes disagree")
        self._hops = list(hops)
        self.agg = agg

    @property
    def num_nodes(self) -> int:
        return int(self._hops[0].shape[0])

    @property
    def num_hops(self) -> int:
        return len(self._hops)

    def rows(self, idx):
        """Gather batch rows: host per-hop gather -> one (K+1, B, D)
        device array (``(B, D')`` after ``agg``)."""
        import jax.numpy as jnp

        from sgl_tpu.graph.native import gather_rows

        idx_np = np.asarray(idx, np.int32)
        # np.asarray on a memmap slice reads only the touched pages
        batch = np.stack(
            [gather_rows(np.asarray(h), idx_np) for h in self._hops]
        )
        out = jnp.asarray(batch)
        if self.agg is not None:
            out = self.agg(out)
        return out


class MemmapHopSink:
    """``hop_sink`` writing each hop to ``<root>/hop_<k>.npy``.

    Idempotent and restart-friendly: a hop already on disk with the right
    shape is overwritten in place (the precompute's ``HopCheckpointer``
    handles *skipping* completed hops; this class only owns storage).
    """

    def __init__(self, root, num_nodes: int, feat_dim: int, prop_steps: int,
                 dtype=np.float32):
        self.root = str(root)
        self.num_nodes = num_nodes
        self.feat_dim = feat_dim
        self.prop_steps = prop_steps
        self.dtype = np.dtype(dtype)
        os.makedirs(self.root, exist_ok=True)

    def path(self, k: int) -> str:
        return os.path.join(self.root, f"hop_{k}.npy")

    def _storage_dtype(self) -> np.dtype:
        # the .npy format cannot round-trip ml_dtypes types (bf16 loads
        # back as void "|V2"); store the raw bits as a same-width uint and
        # view them back on load — a view, so the memmap stays zero-copy
        if self.dtype.kind == "V" or self.dtype.name.startswith(
            ("bfloat16", "float8")
        ):
            return np.dtype(f"u{self.dtype.itemsize}")
        return self.dtype

    def __call__(self, k: int, arr: np.ndarray) -> None:
        storage = self._storage_dtype()
        mm = np.lib.format.open_memmap(
            self.path(k), mode="w+", dtype=storage,
            shape=(self.num_nodes, self.feat_dim),
        )
        arr = np.ascontiguousarray(arr, self.dtype)
        mm[:] = arr.view(storage) if storage != self.dtype else arr
        mm.flush()
        del mm

    def hops(self, agg: Optional[Callable] = None) -> HostHops:
        """Open the written hops read-only (memmapped)."""
        storage = self._storage_dtype()
        raw = [
            np.load(self.path(k), mmap_mode="r")
            for k in range(self.prop_steps + 1)
        ]
        if storage != self.dtype:
            raw = [m.view(self.dtype) for m in raw]
        return HostHops(raw, agg=agg)
