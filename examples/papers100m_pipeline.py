"""papers100M-regime pipeline on one chip: everything host-resident.

The reference's "billions of nodes" claim runs its precompute as a
single-process CPU SpMM with the hop list in host RAM
(`/root/reference/sgl/operators/base_op.py:19-36`,
`/root/reference/sgl/models/base_model.py:55-63` slices batches to the
GPU per step).  This script is the TPU-native rendition of that regime,
end to end, with the chip doing the SpMM work:

1. **Ingest** — a synthetic OGB-shaped homophilous power-law graph
   (`SyntheticPowerLaw`, any size), or the REAL ogbn-papers100M raw dump
   via ``--data`` (parsed without the `ogb` package; huge edge lists
   route through the native C++ builder automatically).
2. **Precompute out-of-core** — the 2-D src-block layout
   (`GraphOp.propagate_out_of_core(layout="2d")`): features, edges, and
   every hop matrix stay on the host; per-hop device traffic is one
   feature volume per accumulator group, no host gather.  The ~100 s
   products-scale layout build persists to ``--layout-cache``
   (content-keyed, warm loads in seconds).
3. **Store** — each finished hop streams to a memmap
   (`MemmapHopSink`): peak host memory stays at two hop matrices.
4. **Train** — `SGAPModel.attach_host_hops` + the standard
   `NodeClassification` task: every step host-gathers only its batch's
   rows (native OMP gather), so the (K+1, N, D) stack never enters
   device memory whole.

Offline rehearsal (CPU, ~1 min):   python examples/papers100m_pipeline.py --toy
Single-chip synthetic run (TPU):   python examples/papers100m_pipeline.py
Real data (when a raw dump exists): python examples/papers100m_pipeline.py \
    --data /path/to/data --nodes 0

Multi-chip extends stage 2/4 via ``sgl_tpu.parallel`` (ring precompute +
`ShardedHops`); see ``examples/test_nodeclass_dist.py``.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--nodes", type=int, default=200_000,
                    help="synthetic graph size (ignored with --data)")
    ap.add_argument("--avg-deg", type=int, default=14,
                    help="papers100M's ~14 edges/node")
    ap.add_argument("--d", type=int, default=128, help="feature width")
    ap.add_argument("--classes", type=int, default=32)
    ap.add_argument("--hops", type=int, default=3)
    ap.add_argument("--store", default="./papers100m_store",
                    help="memmap hop store directory")
    ap.add_argument("--layout-cache", default=None,
                    help="persist the 2-D layout build here")
    ap.add_argument(
        "--src-blocks", default="auto",
        type=lambda s: s if s == "auto" else int(s),
        help="column-block count; 'auto' (default) sizes block workspaces "
             "under the measured gather-rate cliff for the feature "
             "width/dtype")
    ap.add_argument("--part-edges", type=int, default=6 << 20,
                    help="edges per out-of-core part (measured optimum)")
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--batch", type=int, default=50_000)
    ap.add_argument("--data", default=None,
                    help="root holding a real ogbn-papers100M raw dump")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 features end-to-end: half the host->device "
                         "volume (the bound in this regime), half the hop "
                         "store, single-pass kernel")
    ap.add_argument("--toy", action="store_true",
                    help="2k nodes + interpret-mode kernels (CPU smoke)")
    args = ap.parse_args(argv)

    from sgl_tpu.models.homo import GAMLP
    from sgl_tpu.tasks import NodeClassification
    from sgl_tpu.utils import MemmapHopSink

    t0 = time.time()
    if args.data:
        from sgl_tpu.datasets import Ogbn

        ds = Ogbn("papers100M", root=args.data)
    else:
        from sgl_tpu.datasets import SyntheticPowerLaw

        n = 2_000 if args.toy else args.nodes
        ds = SyntheticPowerLaw(
            num_nodes=n, avg_degree=args.avg_deg,
            feat_dim=args.d, num_classes=args.classes, seed=0,
        )
    n, d = ds.num_node, ds.num_features
    print(f"[ingest] {n} nodes, {ds.graph.num_edges} edges, d={d} "
          f"({time.time() - t0:.1f}s)")

    model = GAMLP(args.hops, d, ds.num_classes, hidden_dim=256, num_layers=3)

    x_host = np.asarray(ds.x)
    if args.bf16:
        import ml_dtypes

        x_host = x_host.astype(ml_dtypes.bfloat16)

    t1 = time.time()
    sink = MemmapHopSink(args.store, num_nodes=n, feat_dim=d,
                         prop_steps=args.hops, dtype=x_host.dtype)
    model.pre_graph_op.propagate_out_of_core(
        ds.graph, x_host, hop_sink=sink, layout="2d",
        src_blocks=2 if args.toy else args.src_blocks,
        max_edges_per_part=8 * 128 if args.toy else args.part_edges,
        layout_cache_dir=args.layout_cache,
        interpret=args.toy,
    )
    t_pre = time.time() - t1
    stored = sum(
        os.path.getsize(sink.path(k)) for k in range(args.hops + 1)
    )
    print(f"[precompute] {args.hops} hops out-of-core -> {args.store} "
          f"({stored / 1e9:.2f} GB on disk, {t_pre:.1f}s, "
          f"{t_pre / args.hops:.2f}s/hop)")

    t2 = time.time()
    model.attach_host_hops(sink.hops())
    task = NodeClassification(
        ds, model, lr=0.01, weight_decay=5e-5, epochs=args.epochs,
        train_batch_size=min(args.batch, len(np.asarray(ds.train_idx))),
        verbose=True,
    )
    print(f"[train] {args.epochs} epochs from the host store in "
          f"{time.time() - t2:.1f}s; test acc {task.test_acc:.4f}")
    print(f"[total] {time.time() - t0:.1f}s")
    return task.test_acc


if __name__ == "__main__":
    main()
