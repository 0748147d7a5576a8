"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; XLA's host-platform device
count fakes an 8-device mesh so sharding/collective code paths compile and
execute for real (SURVEY.md §4).  Must run before jax is imported anywhere.
"""

import os

# force CPU even when the environment presets JAX_PLATFORMS=axon (the
# tunneled single TPU chip): the suite needs 8 virtual devices and fast
# eager dispatch, neither of which the tunnel provides.  jax may already be
# imported by a sitecustomize hook, so set the config directly too — the env
# var alone is latched at jax import time.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# isolate the persistent compile cache from the user's: test programs are
# tiny (caching them is noise) and CPU-AOT entries written under slightly
# different flag sets trigger machine-feature warnings on reload
os.environ.setdefault("SGL_TPU_COMPILE_CACHE", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import scipy.sparse as sp  # noqa: E402


def random_graph(n=200, avg_deg=8, d=16, num_classes=4, seed=0, weighted=False):
    """Small random undirected graph with features/labels, plus its scipy CSR."""
    from sgl_tpu.graph import Graph, to_undirected

    rng = np.random.default_rng(seed)
    e = n * avg_deg // 2
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    val = rng.random(src.shape[0]).astype(np.float32) + 0.5 if weighted else None
    x = rng.normal(size=(n, d)).astype(np.float32)
    y = rng.integers(0, num_classes, n)
    g = Graph.from_coo(src, dst, val, num_nodes=n, x=x, y=y, pad_multiple=256)
    g = to_undirected(g).replace(x=x, y=y)
    return g


def graph_to_csr(g) -> sp.csr_matrix:
    from sgl_tpu.graph import to_scipy

    return to_scipy(g).tocsr()


@pytest.fixture
def small_graph():
    return random_graph()
