"""Device-mesh helpers.

The reference's entire distributed runtime is single-node NCCL DDP
(``sgl/tasks/node_classification_dist.py:35-96``).  Here parallelism is a
property of the mesh, not the model: axis ``data`` shards batch rows
(DP ≡ the reference's DDP grad-allreduce, emitted by GSPMD as a psum over
ICI), axis ``graph`` shards graph nodes/edges for distributed propagation
(the sequence-parallel analog, SURVEY.md §5).  Multi-host = the same code
after ``jax.distributed.initialize()``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data", "graph"),
    devices=None,
) -> Mesh:
    """Build a mesh over available devices.

    Default: all devices on one ``data × graph`` grid with ``graph`` taking
    as many devices as possible (propagation is the scaling bottleneck).
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if shape is None:
        shape = (1, n) if len(axis_names) == 2 else (n,)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    return Mesh(devices.reshape(shape), axis_names=tuple(axis_names))


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> bool:
    """Multi-host bootstrap: wraps ``jax.distributed.initialize``.

    Returns True when initialization ran.  With no explicit arguments it
    initializes only when a coordinator is configured in the environment
    (``JAX_COORDINATOR_ADDRESS``, or a TPU-pod metadata environment where
    auto-detection works — indicated by ``TPU_WORKER_HOSTNAMES``); plain
    single-process runs no-op, so the same script works on a laptop and a
    pod slice unchanged.
    """
    import os

    explicit = coordinator_address is not None
    if not explicit and not (
        os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("TPU_WORKER_HOSTNAMES")
    ):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    return True


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Batch-dim sharding over every mesh axis used for data parallelism."""
    return NamedSharding(mesh, PartitionSpec(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
