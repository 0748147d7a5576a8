"""sgl_tpu — a TPU-native scalable graph learning framework.

A from-scratch JAX/XLA/Pallas re-design of the SGAP paradigm
(Pre-propagate / Train / Post-propagate) pioneered by PKU-DAIR/SGL
(reference: /root/reference, see SURVEY.md). Nothing here is a port:
the compute path is built on

  * stacked-hop propagation as ``lax.scan`` over a sparse matmul
    (COO segment-sum + Pallas block-CSR kernels) instead of ctypes
    calls into OpenMP/AVX C kernels,
  * message ops as fused XLA reductions/einsums over a single
    ``(K+1, N, D)`` hop tensor instead of Python lists of tensors,
  * Flax modules + Optax jitted train steps instead of torch loops,
  * ``jax.sharding.Mesh`` + ``shard_map`` edge-partitioned propagation
    and data-parallel training instead of NCCL DDP.
"""

__version__ = "0.1.0"

from sgl_tpu.utils.compile_cache import enable_compilation_cache  # noqa: F401

# persistent XLA compile cache (NAS compiles dominate wall-clock; see
# utils/compile_cache.py) — disable with SGL_TPU_COMPILE_CACHE=0
enable_compilation_cache()

from sgl_tpu.graph import Graph  # noqa: F401
