"""Worker for the pod-scale virtual-device tests (VERDICT r4 item 4).

Run as ``python podscale_worker.py <P>``: forces a P-device virtual CPU
mesh (the conftest default is 8, too small for the wide-block layouts
that only engage at pod scale), builds the MODEL-PICKED chunked ring
layout on an adversarial power-law graph, and checks the distributed
k-hop propagation allclose against the single-device hop stack.  Prints
the picked (tile_rows, chunk) and padding ratio for the test to record.

Launched by ``tests/test_distributed.py::test_pod_scale_virtual_mesh``.
"""

import os
import sys

P = int(sys.argv[1])
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={P}"
os.environ["JAX_PLATFORMS"] = "cpu"

import warnings  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sgl_tpu.datasets.synthetic import random_power_law_graph  # noqa: E402
from sgl_tpu.graph import symmetric_normalized_weights  # noqa: E402
from sgl_tpu.ops.graph_ops import k_hop_propagate  # noqa: E402
from sgl_tpu.parallel import (  # noqa: E402
    k_hop_propagate_dist,
    make_mesh,
    partition_adj_chunked,
)
from sgl_tpu.parallel.spmm_dist import ring_padding_stats  # noqa: E402

assert len(jax.devices()) == P, len(jax.devices())

# adversarial: heavy-tailed degrees at a node count where the per-tile
# coverage floor dominates at this P, so the model picks wide blocks
g = random_power_law_graph(256 * P, 5, 8, seed=0, alpha=1.15)
adj = symmetric_normalized_weights(g)
with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    dadj = partition_adj_chunked(adj, P, feat_dim=8)
stats = ring_padding_stats(dadj)
print(
    f"P={P}: picked tile_rows={dadj.tile_rows} "
    f"e_b={dadj.w.shape[-1]} padding={stats['ratio']:.2f}x "
    f"({stats['real_edges']} real edges)",
    flush=True,
)

mesh = make_mesh((1, P))
got = np.asarray(
    k_hop_propagate_dist(mesh, dadj, g.x, prop_steps=2, interpret=True)
)
assert np.isfinite(got).all(), "non-finite values in distributed hops"
want = np.asarray(k_hop_propagate(adj, jnp.asarray(g.x), 2))
np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
print(f"P={P}: POD_WORKER_OK", flush=True)
