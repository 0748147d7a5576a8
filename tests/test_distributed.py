"""Distributed propagation + data-parallel training on the virtual 8-device
CPU mesh (SURVEY.md §4: fake N-device mesh ≡ the TPU-world fake backend)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_tpu.graph import symmetric_normalized_weights
from sgl_tpu.kernels import spmm
from sgl_tpu.parallel import (
    k_hop_propagate_dist,
    make_mesh,
    make_parallel_train_step,
    partition_adj,
    replicate_state,
)
from sgl_tpu.ops.graph_ops import k_hop_propagate
from sgl_tpu.tasks.utils import adam_l2, init_train_state, make_train_step
from tests.conftest import random_graph

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_ring_spmm_matches_single_device():
    g = random_graph(n=333, avg_deg=10, d=12, seed=21)
    adj = symmetric_normalized_weights(g)
    mesh = make_mesh((1, 8))
    dadj = partition_adj(adj, 8)
    got = np.asarray(k_hop_propagate_dist(mesh, dadj, g.x, prop_steps=3))
    want = np.asarray(k_hop_propagate(adj, jnp.asarray(g.x), 3))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("hub_k", [0, 16])
def test_ring_spmm_chunked_matches_single_device(hub_k):
    """The Pallas-layout ring path (per-device MXU kernel + diag/hub splits)
    must equal the single-device hop stack."""
    from sgl_tpu.parallel import partition_adj_chunked

    g = random_graph(n=300, avg_deg=11, d=12, seed=23)
    adj = symmetric_normalized_weights(g)
    mesh = make_mesh((1, 8))
    dadj = partition_adj_chunked(adj, 8, hub_k=hub_k, chunk=64)
    if hub_k:
        assert dadj.hub_ids is not None and dadj.diag is not None
    got = np.asarray(
        k_hop_propagate_dist(mesh, dadj, g.x, prop_steps=3, interpret=True)
    )
    want = np.asarray(k_hop_propagate(adj, jnp.asarray(g.x), 3))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_ring_spmm_chunked_uneven_nodes():
    from sgl_tpu.parallel import partition_adj_chunked

    g = random_graph(n=271, avg_deg=7, d=5, seed=29)
    adj = symmetric_normalized_weights(g)
    mesh = make_mesh((1, 8))
    dadj = partition_adj_chunked(adj, 8, hub_k=8, chunk=32)
    got = np.asarray(
        k_hop_propagate_dist(mesh, dadj, g.x, prop_steps=2, interpret=True)
    )
    want = np.asarray(k_hop_propagate(adj, jnp.asarray(g.x), 2))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_ring_spmm_uneven_nodes():
    """Node count not divisible by P exercises row padding."""
    g = random_graph(n=101, avg_deg=6, d=5, seed=3)
    adj = symmetric_normalized_weights(g)
    mesh = make_mesh((1, 8))
    dadj = partition_adj(adj, 8)
    got = np.asarray(k_hop_propagate_dist(mesh, dadj, g.x, prop_steps=2))
    want = np.asarray(k_hop_propagate(adj, jnp.asarray(g.x), 2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_parallel_train_step_matches_single_device():
    """One DP step over the mesh must equal the single-device step exactly
    (the reference's DDP path can't make this guarantee — it discards the
    spawned workers' weights, SURVEY.md §3.2)."""
    from sgl_tpu.models.homo import SGC
    from sgl_tpu.datasets.synthetic import PlantedPartition

    ds = PlantedPartition(num_nodes=160, feat_dim=8, seed=5)
    labels = jnp.asarray(np.asarray(ds.y), jnp.int32)

    def build():
        m = SGC(3, ds.num_features, ds.num_classes)
        m.preprocess(ds.graph, ds.x)
        rng = jax.random.PRNGKey(0)
        params = m.init(rng)
        tx = adam_l2(0.1, 5e-5)
        return m, init_train_state(rng, params, tx), tx

    idx = jnp.arange(0, 160)
    w = jnp.ones(160, jnp.float32)

    m1, state1, tx1 = build()
    net1 = m1.net
    step1 = make_train_step(
        lambda p, f, train, rngs: net1.apply(p, f, train=train, rngs=rngs), tx1
    )
    feats = m1.batch_input(idx)
    state1, loss1, acc1 = step1(state1, feats, labels[idx], w)

    m2, state2, tx2 = build()
    net2 = m2.net
    mesh = make_mesh((8, 1))
    state2 = replicate_state(state2, mesh)
    step2, shard_batch = make_parallel_train_step(
        lambda p, f, train, rngs: net2.apply(p, f, train=train, rngs=rngs),
        tx2,
        mesh,
    )
    feats2, labels2, w2 = shard_batch(m2.batch_input(idx), labels[idx], w)
    state2, loss2, acc2 = step2(state2, feats2, labels2, w2)

    assert np.isclose(float(loss1), float(loss2), rtol=1e-5)
    assert np.isclose(float(acc1), float(acc2), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(state1.params),
        jax.tree_util.tree_leaves(state2.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_full_2d_mesh_pipeline():
    """Propagate over the graph axis, train over the data axis, one mesh."""
    from sgl_tpu.models.homo import GAMLP
    from sgl_tpu.datasets.synthetic import PlantedPartition
    from sgl_tpu.models.base import SGAPNet

    ds = PlantedPartition(num_nodes=128, feat_dim=8, seed=6)
    mesh = make_mesh((2, 4))
    adj = symmetric_normalized_weights(ds.graph)
    dadj = partition_adj(adj, 4)
    hops = k_hop_propagate_dist(mesh, dadj, ds.x, prop_steps=2, axis="graph")
    assert hops.shape == (3, 128, 8)

    model = GAMLP(2, ds.num_features, ds.num_classes, hidden_dim=16, num_layers=2)
    net = SGAPNet(msg_op=model.pre_msg_op, base_model=model.base_model)
    rng = jax.random.PRNGKey(0)
    params = net.init(rng, hops[:, :2], train=False)
    tx = adam_l2(0.05, 5e-5)
    state = replicate_state(init_train_state(rng, params, tx), mesh)
    step, shard_batch = make_parallel_train_step(
        lambda p, f, train, rngs: net.apply(p, f, train=train, rngs=rngs), tx, mesh
    )
    labels = jnp.asarray(np.asarray(ds.y), jnp.int32)
    f, l, w = shard_batch(hops, labels, jnp.ones(128, jnp.float32))
    state, loss, acc = step(state, f, l, w)
    assert np.isfinite(float(loss))


def test_node_classification_dist_task():
    """Full distributed task on a (2,4) mesh: ring precompute + DP training
    + distributed post-propagation; weights kept (unlike the reference)."""
    from sgl_tpu.datasets.synthetic import PlantedPartition
    from sgl_tpu.models.homo import PASCA_V3
    from sgl_tpu.tasks.node_classification_dist import NodeClassificationDist

    ds = PlantedPartition(num_nodes=256, feat_dim=8, p_in=0.08, seed=9)
    model = PASCA_V3(2, 2, ds.num_features, ds.num_classes, hidden_dim=16, num_layers=2)
    task = NodeClassificationDist(
        ds, model, lr=0.05, weight_decay=5e-5, epochs=10,
        mesh_shape=(2, 4), verbose=False,
    )
    assert task.test_acc > 0.6, task.test_acc
    assert task.state is not None


def test_dist_nas_inner_loop():
    from sgl_tpu.datasets.synthetic import PlantedPartition
    from sgl_tpu.search import SearchManagerDist, SearchModelDist

    ds = PlantedPartition(num_nodes=128, feat_dim=8, p_in=0.1, seed=10)
    model = SearchModelDist([2, 1, 0, 1, 0, 0, 0], ds.num_features, ds.num_classes, 16)
    acc, elapsed = SearchManagerDist(
        ds, model, lr=0.1, weight_decay=5e-5, epochs=8, mesh_shape=(2, 4)
    )._execute()
    assert acc > 0.6, acc
    assert elapsed > 0


def test_init_distributed_noop_single_process(monkeypatch):
    from sgl_tpu.parallel import init_distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    assert init_distributed() is False  # same script runs unchanged solo


def test_ring_padding_stats_logged_on_zipf_graph(caplog):
    """Bucket padding on a power-law (zipf) graph at P=8 must be measured
    and logged, never silent (the per-bucket pad-to-max layout is the known
    skew cost — parallel/spmm_dist.py)."""
    import logging

    from sgl_tpu.graph import Graph, to_undirected
    from sgl_tpu.parallel import partition_adj_chunked, ring_padding_stats

    rng = np.random.default_rng(31)
    n, e = 512, 8000
    # zipf-weighted destination choice -> heavy-hub degree skew
    wz = 1.0 / np.arange(1, n + 1) ** 1.2
    wz /= wz.sum()
    src = rng.integers(0, n, e)
    dst = rng.choice(n, size=e, p=wz)
    keep = src != dst
    g = Graph.from_coo(src[keep], dst[keep], num_nodes=n, pad_multiple=256)
    g = to_undirected(g)
    adj = symmetric_normalized_weights(g)

    with caplog.at_level(logging.INFO, logger="sgl_tpu.parallel.spmm_dist"):
        dadj = partition_adj_chunked(adj, 8, hub_k=16, chunk=64)
    assert any("ring layout" in r.message for r in caplog.records)

    stats = ring_padding_stats(dadj)
    assert stats["real_edges"] > 0
    assert stats["padded_slots"] >= stats["real_edges"]
    assert stats["ratio"] == stats["padded_slots"] / stats["real_edges"]


def test_skip_empty_tiles_isolated_mask_path():
    """Empty-tile skipping with hubs DISABLED (hub_k=0, no diag split):
    every skipped tile's output block is uninitialized kernel memory, so
    this isolates the tile_mask select.  Must be finite and exact on a
    power-law graph (round-2 regression: the multiply-mask let interpret
    mode's NaN fill through — NaN*0=NaN; VERDICT r2 'What's weak' #1)."""
    from sgl_tpu.datasets.synthetic import random_power_law_graph
    from sgl_tpu.parallel import partition_adj_chunked, ring_padding_stats

    g = random_power_law_graph(20_000, 3, 6, seed=7)
    adj = symmetric_normalized_weights(g)
    mesh = make_mesh((1, 8))
    want = np.asarray(k_hop_propagate(adj, jnp.asarray(g.x, jnp.float32), 3))

    dadj = partition_adj_chunked(
        adj, 8, hub_k=0, split_diag=False, skip_empty_tiles=True
    )
    assert dadj.tile_mask is not None
    # the flag must actually skip something on this graph, or the test
    # proves nothing
    assert float(np.asarray(dadj.tile_mask).mean()) < 1.0
    got = np.asarray(
        k_hop_propagate_dist(mesh, dadj, g.x, 3, interpret=True)
    )
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    # layout invariant: skipping can never GROW the layout.  (Measured
    # round 3: it saves zero slots on every zipf graph/P probed — e_b is
    # set by the densest bucket, which has full tile coverage — which is
    # why skip_empty_tiles defaults to False; see partition_adj_chunked
    # docstring and docs/PERFORMANCE.md.)
    for p in (8, 16, 32):
        on = ring_padding_stats(
            partition_adj_chunked(adj, p, hub_k=0, split_diag=False,
                                  skip_empty_tiles=True)
        )["padded_slots"]
        off = ring_padding_stats(
            partition_adj_chunked(adj, p, hub_k=0, split_diag=False,
                                  skip_empty_tiles=False)
        )["padded_slots"]
        assert on <= off, (p, on, off)


def test_ring_dst_hub_split_allclose_and_bounded_padding():
    """The pod-scale padding mitigations (node shuffle + slot-minimizing
    chunk + dst super-hub strip) must keep the layout bounded on a
    power-law graph AND stay exact."""
    from sgl_tpu.datasets.synthetic import random_power_law_graph
    from sgl_tpu.parallel import partition_adj_chunked, ring_padding_stats

    g = random_power_law_graph(20_000, 15, 8, seed=1)
    adj = symmetric_normalized_weights(g)

    d8 = partition_adj_chunked(adj, 8)
    assert d8.hub_in_ids is not None and d8.order is not None
    got = np.asarray(k_hop_propagate_dist(mesh := make_mesh((1, 8)), d8, g.x, 3, interpret=True))
    want = np.asarray(k_hop_propagate(adj, jnp.asarray(g.x, jnp.float32), 3))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    # padding stays bounded as P grows (layout-only check, no mesh needed);
    # pre-mitigation this graph measured ~7x at P=8 growing ~linearly in P
    for p, bound in [(8, 2.5), (32, 4.0), (64, 8.0)]:
        ratio = ring_padding_stats(partition_adj_chunked(adj, p))["ratio"]
        assert ratio < bound, (p, ratio)


def test_sharded_hops_end_to_end():
    """VERDICT r3 #3: the hop stack stays PartitionSpec('graph')-sharded
    through training — per-device memory O(N/P·D·K), batch rows via the
    psum lookup, un-permute folded into the lookup."""
    from sgl_tpu.parallel import ShardedHops, partition_adj_chunked

    g = random_graph(600, 12, seed=3)
    adj = symmetric_normalized_weights(g)
    mesh = make_mesh((1, 8))
    dadj = partition_adj_chunked(adj, 8)  # shuffle active -> new_of in play
    x = jnp.asarray(g.x, jnp.float32)
    sh = k_hop_propagate_dist(
        mesh, dadj, x, 3, interpret=True, keep_sharded=True
    )
    assert isinstance(sh, ShardedHops)
    # 1) per-device memory is the sharded slice, not the full stack
    n_pad = 8 * dadj.block
    full_bytes = 4 * (3 + 1) * n_pad * x.shape[1]
    assert sh.data.shape == (4, n_pad, x.shape[1])
    shard_shapes = {s.data.shape for s in sh.data.addressable_shards}
    assert shard_shapes == {(4, dadj.block, x.shape[1])}
    assert sh.per_device_bytes * 8 == full_bytes
    # 2) row lookup == the replicated reference (un-permute folded in)
    want = k_hop_propagate(adj, x, 3)
    idx = np.random.default_rng(0).choice(g.num_nodes, 64, replace=False)
    got = sh.rows(jnp.asarray(idx))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want)[:, idx, :], rtol=2e-4, atol=2e-5
    )
    # 3) eager aggregation stays sharded
    from sgl_tpu.models.base import eager_aggregate
    from sgl_tpu.ops import MeanMessageOp

    agg = sh.aggregate(lambda h: eager_aggregate(MeanMessageOp(0, 4), h))
    assert agg.data.shape == (n_pad, x.shape[1])
    assert {s.data.shape for s in agg.data.addressable_shards} == {
        (dadj.block, x.shape[1])
    }
    got2 = agg.rows(jnp.asarray(idx))
    want2 = eager_aggregate(MeanMessageOp(0, 4), want)[idx]
    np.testing.assert_allclose(
        np.asarray(got2), np.asarray(want2), rtol=2e-4, atol=2e-5
    )
    # 4) gather_full round-trips for tests
    np.testing.assert_allclose(
        np.asarray(sh.gather_full()), np.asarray(want), rtol=2e-4, atol=2e-5
    )


def test_node_classification_dist_sharded_matches_replicated():
    """The sharded-hops task path (default) reproduces the replicated
    path's result on the same seed — semantics unchanged, memory sharded."""
    from sgl_tpu.datasets.synthetic import PlantedPartition
    from sgl_tpu.models.homo import GAMLP
    from sgl_tpu.tasks.node_classification_dist import NodeClassificationDist

    ds = PlantedPartition(num_nodes=256, feat_dim=8, p_in=0.08, seed=9)

    def run(sharded):
        model = GAMLP(2, ds.num_features, ds.num_classes, hidden_dim=16,
                      num_layers=2)
        task = NodeClassificationDist(
            ds, model, lr=0.05, weight_decay=5e-5, epochs=6,
            mesh_shape=(2, 4), verbose=False, sharded_hops=sharded,
        )
        return task.test_acc

    acc_s = run(True)
    acc_r = run(False)
    assert acc_s > 0.6, acc_s
    assert abs(acc_s - acc_r) < 0.15, (acc_s, acc_r)


def test_ring_spmm_bf16_features():
    """bf16 features through the ring: the rotating buffer stays bf16
    (half the per-hop ICI volume), the kernel takes its single-pass
    variant, accumulation stays f32 — result within bf16 tolerance of
    the f32 single-device path, for both layouts."""
    from sgl_tpu.parallel import partition_adj_chunked

    g = random_graph(500, 10, seed=8)
    adj = symmetric_normalized_weights(g)
    mesh = make_mesh((1, 8))
    x32 = jnp.asarray(g.x, jnp.float32)
    want = k_hop_propagate(adj, x32, 2)
    for dadj in (partition_adj(adj, 8), partition_adj_chunked(adj, 8)):
        sh = k_hop_propagate_dist(
            mesh, dadj, x32.astype(jnp.bfloat16), 2, interpret=True,
            keep_sharded=True,
        )
        assert sh.data.dtype == jnp.bfloat16  # sharded cache stays half-size
        got = np.asarray(sh.gather_full(), np.float32)
        ref = np.asarray(want)
        denom = np.abs(ref).max() + 1e-30
        assert np.isfinite(got).all()
        assert np.abs(got - ref).max() / denom < 3e-2


def test_node_classification_dist_bf16_precompute():
    """precompute_dtype=bf16 through the dist task: bf16 rides the ring
    (half ICI volume), the sharded cache is half-size, accuracy holds."""
    from sgl_tpu.datasets.synthetic import PlantedPartition
    from sgl_tpu.models.homo import GAMLP
    from sgl_tpu.tasks.node_classification_dist import NodeClassificationDist

    ds = PlantedPartition(num_nodes=256, feat_dim=8, p_in=0.08, seed=9)
    model = GAMLP(2, ds.num_features, ds.num_classes, hidden_dim=16,
                  num_layers=2)
    task = NodeClassificationDist(
        ds, model, lr=0.05, weight_decay=5e-5, epochs=6, mesh_shape=(2, 4),
        verbose=False, precompute_dtype=jnp.bfloat16,
    )
    assert model.processed_feature.data.dtype == jnp.bfloat16
    assert task.test_acc > 0.6, task.test_acc


def test_node_classification_dist_tiny_train_split():
    """A train split SMALLER than the data axis must still shard:
    ``_pad_batch`` tiles cyclically (``np.resize``) — the old single wrap
    slice under-padded and crashed ``shard_batch`` on the uneven axis
    (round-4 review fix)."""
    from sgl_tpu.datasets.synthetic import PlantedPartition
    from sgl_tpu.models.homo import SGC
    from sgl_tpu.tasks.node_classification_dist import NodeClassificationDist

    ds = PlantedPartition(num_nodes=256, feat_dim=8, p_in=0.08, seed=3,
                          train_ratio=0.012)
    n_train = len(np.asarray(ds.train_idx))
    assert 0 < n_train < 8, n_train  # smaller than the data axis below
    model = SGC(2, ds.num_features, ds.num_classes)
    task = NodeClassificationDist(
        ds, model, lr=0.05, weight_decay=5e-5, epochs=2,
        mesh_shape=(8, 1), verbose=False,
    )
    assert np.isfinite(task.test_acc)


def test_partition_chunked_feat_dim_caps_tile_rows():
    """The (tile_rows, chunk) picker must respect the kernel's VMEM blocks
    at wide D: the (R, d_pad) f32 output block alone outgrows VMEM for the
    2048-row candidates, so ``feat_dim`` filters them (128 stays the
    always-legal fallback)."""
    from sgl_tpu.datasets.synthetic import random_power_law_graph
    from sgl_tpu.parallel import partition_adj_chunked

    g = random_power_law_graph(20_480, 3, 8, seed=0, alpha=1.5)
    adj = symmetric_normalized_weights(g)
    wide = partition_adj_chunked(adj, 4, feat_dim=8192)
    d_pad = 8192
    r = wide.tile_rows
    chunk = wide.src.shape[2] // wide.chunk_tile.shape[2]
    assert r == 128 or (
        r * d_pad * 4 + r * chunk * 2 + 4 * chunk * d_pad * 2 <= (10 << 20)
    ), (r, chunk)
    # the narrow-D pick on the same graph is unconstrained (regression
    # guard: the filter must not change the D=128 behavior)
    narrow = partition_adj_chunked(adj, 4)
    default = partition_adj_chunked(adj, 4, feat_dim=128)
    assert narrow.tile_rows == default.tile_rows
    # r=128 is NOT exempt: its chunk-dependent message-block term can blow
    # the budget at wide D too, so the chosen chunk must fit (or be the
    # unconditional smallest-candidate fallback)
    if r == 128:
        assert chunk == 32 or (
            r * d_pad * 4 + r * chunk * 2 + 4 * chunk * d_pad * 2
            <= (10 << 20)
        ), chunk


def test_partition_chunked_pinned_tile_rows_never_typeerrors():
    """ADVICE r4: a pinned non-128 tile_rows whose every chunk candidate
    fails the VMEM bound must still build (the pin is honored; an
    infeasible pin fails at compile with the real resource error) instead
    of dying on ``best is None``."""
    from sgl_tpu.datasets.synthetic import random_power_law_graph
    from sgl_tpu.parallel import partition_adj_chunked

    g = random_power_law_graph(20_480, 3, 8, seed=0, alpha=1.5)
    adj = symmetric_normalized_weights(g)
    dadj = partition_adj_chunked(adj, 4, tile_rows=2048, feat_dim=8192)
    assert dadj.tile_rows == 2048


def test_dist_task_chunked_partition_kwargs(monkeypatch):
    """The dist task's layout-picker inputs (round-5 review fixes): the
    measured pipeline dtype is the one that actually rides the ring
    (precompute dtype when set, else the features' own dtype), and
    multi-PROCESS runs never measure — a per-host A/B under chip noise
    could compile divergent static ring layouts across processes."""
    import ml_dtypes
    from sgl_tpu.tasks.node_classification_dist import NodeClassificationDist

    kwargs = NodeClassificationDist._chunked_partition_kwargs
    x32 = np.zeros((16, 8), np.float32)
    xbf = x32.astype(ml_dtypes.bfloat16)

    kw = kwargs(x32, None)
    assert kw == {
        "feat_dim": 8, "feat_dtype": np.dtype(np.float32), "measure": "auto",
    }
    # bf16 features without an explicit precompute dtype ride the ring as
    # bf16 (single-pass kernel) — the A/B must time that pipeline
    assert kwargs(xbf, None)["feat_dtype"] == ml_dtypes.bfloat16
    # an explicit precompute dtype wins regardless of the input dtype
    assert kwargs(x32, jnp.bfloat16)["feat_dtype"] == jnp.bfloat16
    # device arrays contribute shape/dtype without a host round-trip
    # (jnp arrays expose both; the helper must not np.asarray them)
    assert kwargs(jnp.zeros((4, 8), jnp.float32), None)["feat_dim"] == 8

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    assert kwargs(x32, None)["measure"] is False


def test_two_process_cluster():
    """VERDICT r4 #2: REAL multi-process execution of the distributed
    runtime.  Launches two OS processes, each with 4 virtual CPU devices,
    rendezvoused through ``init_distributed`` (localhost coordinator, Gloo
    CPU collectives); the workers build one 8-device global mesh and check
    (a) ring propagation with the ppermute crossing the process boundary
    and (b) a DP train step whose grad psum crosses processes — both
    allclose vs single-device.  See tests/mp_worker.py."""
    import socket
    import subprocess
    import sys as _sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never touch the TPU relay
    env.pop("XLA_FLAGS", None)  # the worker pins its own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [_sys.executable, worker, str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert "MP_WORKER_OK" in out, f"proc {i} no OK marker:\n{out}"


def test_partition_chunked_measured_pick(caplog):
    """VERDICT r4 #3: ``measure=True`` replaces the cost model's 45% hand
    margin with a real A/B — when the raw model prefers a wide block, BOTH
    top candidates are built and their bucket work is timed, and the
    measured winner is returned.  The adversarial power-law config below
    makes the raw model prefer wide blocks, so the A/B branch runs (both
    'measured pick' lines in the log); the returned layout must still
    propagate correctly."""
    import logging

    from sgl_tpu.datasets.synthetic import random_power_law_graph
    from sgl_tpu.parallel import partition_adj_chunked

    g = random_power_law_graph(4096, 6, 8, seed=0, alpha=1.1)
    adj = symmetric_normalized_weights(g)
    with caplog.at_level(logging.INFO, logger="sgl_tpu.parallel.spmm_dist"):
        dadj = partition_adj_chunked(adj, 8, feat_dim=8, measure=True)
    picks = [r for r in caplog.records if "measured pick" in r.getMessage()]
    assert len(picks) == 2, "A/B branch must have timed both candidates"
    mesh = make_mesh((1, 8))
    got = np.asarray(
        k_hop_propagate_dist(mesh, dadj, g.x, prop_steps=1, interpret=True)
    )
    want = np.asarray(k_hop_propagate(adj, jnp.asarray(g.x), 1))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("p", [16, 32])
def test_pod_scale_virtual_mesh(p):
    """VERDICT r4 #4: the model-picked wide-block layouts only engage at
    pod-scale P, which the 8-device conftest mesh never exercises.  A
    subprocess with its own XLA_FLAGS builds a P-device virtual CPU mesh,
    partitions an adversarial power-law graph with the model-picked
    layout, and checks the ring propagation allclose + finite; the picked
    (tile_rows, padding) line is asserted into the test report."""
    import subprocess
    import sys as _sys

    worker = os.path.join(os.path.dirname(__file__), "podscale_worker.py")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)  # the worker pins its own device count
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [_sys.executable, worker, str(p)],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
    )
    assert out.returncode == 0, f"worker failed:\n{out.stdout}\n{out.stderr}"
    assert f"P={p}: POD_WORKER_OK" in out.stdout, out.stdout
    # record the layout line in the assertion context for -rA reports
    layout_line = [
        ln for ln in out.stdout.splitlines() if ln.startswith(f"P={p}: picked")
    ]
    assert layout_line, out.stdout
    print(layout_line[0])
