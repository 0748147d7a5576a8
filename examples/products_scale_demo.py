"""ogbn-products-scale precompute on one chip via streaming SpMM.

Generates a synthetic power-law graph at products scale (2.4M nodes, ~120M
directed edges, d=100) and runs the full SGAP precompute (3-hop propagation)
with the streaming Pallas kernel — message buffers never exceed one part's
footprint, so the graph that could not materialize an (E, D) buffer in HBM
runs anyway.  This is the single-chip leg of BASELINE.md's scalability
target; multi-chip extends it via sgl_tpu.parallel's ring partition.

Run on the TPU (default env):  python examples/products_scale_demo.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np


def _train_at_scale(hop_stack, num_classes=47, hidden=512, layers=3,
                    warmup=2, measured=6, seed=0):
    """GAMLP (JK attention) full-batch training on the precomputed hop
    stack — the reference's ogbn-products config (hidden 512, 3 layers,
    lr 0.1, wd 5e-5; ``/root/reference/examples/gamlp_products.py:13-17``)
    at full products scale on one chip.  Labels are synthetic (this
    environment has no network egress), so the measurement is step
    throughput, not accuracy; training-dynamics parity vs the reference
    is covered by tests/test_training_parity.py."""
    import jax

    from sgl_tpu.models.homo import GAMLP
    from sgl_tpu.tasks.node_classification import _make_apply
    from sgl_tpu.tasks.utils import adam_l2, init_train_state, make_train_step

    from sgl_tpu.tasks.utils import make_eval_step

    k1, n_nodes, d = hop_stack.shape
    model = GAMLP(prop_steps=k1 - 1, feat_dim=d, hidden_dim=hidden,
                  num_layers=layers, output_dim=num_classes)
    model.processed_feature = hop_stack  # hop-major, as preprocess caches it
    rng = jax.random.PRNGKey(seed)
    params = model.init(rng)
    state = init_train_state(rng, params, adam_l2(0.1, 5e-5))
    train_step = make_train_step(_make_apply(model), adam_l2(0.1, 5e-5))
    eval_step = make_eval_step(_make_apply(model))
    # ogbn-products trains on ~196k of the 2.4M nodes (the official split);
    # the full graph is touched only by the eval forward
    np_rng = np.random.default_rng(seed)
    tr_idx = jnp.asarray(
        np_rng.choice(n_nodes, size=min(196_615, n_nodes), replace=False)
    )
    tr_feats = model.batch_input(tr_idx)
    tr_labels = jnp.asarray(
        np_rng.integers(0, num_classes, tr_idx.shape[0]), jnp.int32
    )
    tr_w = jnp.ones(tr_idx.shape[0], jnp.float32)
    # slope timing: the tunneled dev backend's block_until_ready does not
    # synchronize, so time k1 vs k2 chained steps ending in a forced
    # scalar readback (same method as bench.py)
    def run_train(k):
        s = state
        t0 = time.time()
        for _ in range(k):
            s, loss, acc = train_step(s, tr_feats, tr_labels, tr_w)
        float(loss)
        return time.time() - t0

    run_train(warmup)  # compile
    k1, k2 = 3, 3 + measured
    dt = (run_train(k2) - run_train(k1)) / (k2 - k1)
    print(f"GAMLP train at scale: {tr_idx.shape[0]} train rows of "
          f"{n_nodes}, hidden {hidden}, {layers} layers -> "
          f"{dt * 1e3:.1f} ms/epoch ({1 / dt:.1f} epochs/s)")

    all_labels = jnp.zeros(n_nodes, jnp.int32)
    all_w = jnp.ones(n_nodes, jnp.float32)

    def run_eval(k):
        t0 = time.time()
        for _ in range(k):
            c, t = eval_step(state.params, hop_stack, all_labels, all_w)
            float(c)  # serialize: eval has no loop-carried dependence
        return time.time() - t0

    run_eval(1)  # compile
    dt_e = (run_eval(4) - run_eval(1)) / 3
    print(f"full-graph eval forward ({n_nodes} rows): {dt_e * 1e3:.0f} ms "
          f"(incl per-call dispatch)")


def main(n=2_400_000, avg_deg=25, d=100, hops=3, part_edges=6 << 20,
         dtype=None, ooc=False, train=False):
    from sgl_tpu.datasets.synthetic import random_power_law_graph
    from sgl_tpu.graph import symmetric_normalized_weights_host
    from sgl_tpu.kernels import prepare_chunked_parts, spmm_pallas_streaming

    t0 = time.time()
    g = random_power_law_graph(n, avg_deg, d, seed=0, pad_multiple=1 << 20)
    print(f"graph: {g.num_nodes} nodes, {g.num_edges} edges "
          f"({time.time() - t0:.1f}s to generate)")

    t0 = time.time()
    # host-side normalization (native OpenMP builder): no device round-trip
    adj = symmetric_normalized_weights_host(g)
    if ooc:
        return _main_ooc(g, adj, d, hops, part_edges, dtype, t0,
                         layout="2d" if "--2d" in sys.argv else "1d")
    bundle = prepare_chunked_parts(adj, max_edges_per_part=part_edges)
    print(f"normalized + partitioned into {bundle[0].num_parts} parts "
          f"({time.time() - t0:.1f}s)")

    x = jnp.asarray(g.x)
    if dtype is not None:  # bf16: the documented production default
        x = x.astype(dtype)
    hops_out = [x]
    t0 = time.time()
    times = []
    for k in range(hops):
        t_h = time.time()
        h = spmm_pallas_streaming(bundle, hops_out[-1])
        h.block_until_ready()
        hops_out.append(h)
        times.append(time.time() - t_h)
        print(f"hop {k + 1} done ({time.time() - t0:.1f}s cumulative)")
    nnz = int(np.sum(np.asarray(adj.w) != 0))
    # hop 1 absorbs compilation and the edge-array upload; steady state is
    # hops 2+.  (On the tunneled dev chip each part call also pays ~31 ms
    # fixed dispatch; production chips don't.)
    steady = min(times[1:]) if len(times) > 1 else times[0]
    print(f"precompute: first hop {times[0]:.1f}s (compile+upload), "
          f"steady {steady:.2f}s/hop -> {nnz / steady / 1e9:.3f} G edges/s")
    if train:
        stack = jnp.stack(hops_out)
        hops_out.clear()  # free the unstacked hop copies before training
        _train_at_scale(stack)


def _main_ooc(g, adj, d, hops, part_edges, dtype, t0, layout="1d"):
    """Feature-out-of-core mode (--ooc): x, y, and the edge arrays all stay
    in HOST memory; only one part's workspace+messages occupy HBM at a
    time.  This is the papers100M regime (features alone 57 GB) shrunk to
    demo scale — same code path, host-bounded memory.  ``--2d`` selects
    the src-block layout (contiguous column workspaces, no host gather,
    per-hop traffic of one feature volume — docs/PERFORMANCE.md
    "Out-of-core")."""
    from sgl_tpu.kernels import (
        prepare_out_of_core,
        prepare_out_of_core_2d,
        spmm_out_of_core,
        spmm_out_of_core_2d,
    )

    if layout == "2d":
        # src_blocks=4: the measured optimum at this scale (N/4 workspace
        # rows fit HBM comfortably; docs/PERFORMANCE.md 2-D sweep)
        oc = prepare_out_of_core_2d(
            adj, max_edges_per_part=part_edges, src_blocks=4
        )
        spmm_out_of_core = spmm_out_of_core_2d  # noqa: F811
    else:
        oc = prepare_out_of_core(adj, max_edges_per_part=part_edges)
    print(f"normalized + out-of-core layout: {oc.num_parts} parts "
          f"({time.time() - t0:.1f}s)")
    x = np.asarray(g.x)
    if dtype is not None:
        x = x.astype(dtype)
    nnz = int(np.sum(np.asarray(adj.w) != 0))
    times = []
    t0 = time.time()
    h = x
    for k in range(1, hops + 1):
        t_h = time.time()
        h = spmm_out_of_core(oc, h)
        times.append(time.time() - t_h)
        print(f"hop {k} done ({time.time() - t0:.1f}s cumulative)")
    steady = min(times[1:]) if len(times) > 1 else times[0]
    print(f"out-of-core precompute: first hop {times[0]:.1f}s, steady "
          f"{steady:.2f}s/hop -> {nnz / steady / 1e9:.4f} G edges/s "
          f"(host<->device streamed)")


if __name__ == "__main__":
    main(dtype=jnp.bfloat16 if "--bf16" in sys.argv else None,
         ooc="--ooc" in sys.argv, train="--train" in sys.argv)
