"""Bound the out-of-core SpMM's NON-transfer overhead on the real chip.

Round 2 measured the OOC path only against the dev tunnel's ~26 MB/s bulk
bandwidth, so its 19-29 s/hop numbers price the tunnel, not the design
(docs/PERFORMANCE.md "Out-of-core").  This experiment isolates what
survives on a directly-attached host:

* **null-transfer steady state** — the identical per-part jitted step
  chain (real edges, shared device workspace, no feature H2D / readback
  D2H), slope-timed across hop counts to cancel the tunnel's fixed
  per-call dispatch;
* **host gather** — ``x[p.cols]`` across all parts, pure numpy (on a real
  host this overlaps the PCIe transfer; reported separately);
* **per-hop byte volumes** — from the layout, priced at tunnel/PCIe BW.

Run on the TPU (default env, nothing else running):

    python dev/exp_ooc_null.py           # products config (2.4M/60M, 100d)
    python dev/exp_ooc_null.py --small   # round-2 chip-validation config
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n=2_400_000, avg_deg=25, d=100, part_edges=6 << 20):
    from sgl_tpu.datasets.synthetic import random_power_law_graph
    from sgl_tpu.graph import symmetric_normalized_weights_host
    from sgl_tpu.kernels import prepare_out_of_core, spmm_out_of_core

    t0 = time.time()
    g = random_power_law_graph(n, avg_deg, d, seed=0, pad_multiple=1 << 20)
    adj = symmetric_normalized_weights_host(g)
    oc = prepare_out_of_core(adj, max_edges_per_part=part_edges)
    x = np.asarray(g.x)
    nnz = int(np.sum(np.asarray(adj.w) != 0))
    print(
        f"layout: {oc.num_parts} parts, {nnz} edges, "
        f"{oc.parts[0].cols.shape[0]} workspace rows/part "
        f"({time.time() - t0:.1f}s to build)"
    )

    # -- per-hop byte volumes (from the layout) ---------------------------
    bpe = np.dtype(x.dtype).itemsize
    h2d = sum(p.cols.shape[0] * d * bpe for p in oc.parts)
    d2h = sum(p.valid_rows * d * 4 for p in oc.parts)
    edge_once = oc.part_edge_nbytes() * oc.num_parts  # one-time (cached)
    print(
        f"per-hop traffic: H2D workspaces {h2d / 1e9:.2f} GB, "
        f"D2H outputs {d2h / 1e9:.2f} GB, edges (one-time) "
        f"{edge_once / 1e9:.2f} GB"
    )

    # -- null-transfer steady state (slope across hop counts) -------------
    def run_hops(k):
        t0 = time.time()
        for _ in range(k):
            spmm_out_of_core(oc, x, null_transfer=True)
        return time.time() - t0

    run_hops(1)  # compile + edge/workspace upload
    t_lo = min(run_hops(2) for _ in range(2))
    t_hi = min(run_hops(6) for _ in range(2))
    null_s = (t_hi - t_lo) / 4
    print(
        f"null-transfer steady state: {null_s:.3f} s/hop "
        f"({nnz / null_s / 1e9:.3f} G edges/s; includes "
        f"{oc.num_parts} per-part dispatches)"
    )

    # -- host gather (native OMP / numpy, overlappable with PCIe) ---------
    from sgl_tpu.graph.native import gather_rows, native_available

    def time_gather(fn):
        fn(oc.parts[0])  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            for p in oc.parts:
                fn(p)
            best = min(best, time.time() - t0)
        return best

    gather_np = time_gather(lambda p: np.take(x, p.cols, axis=0))
    gather_s = gather_np
    line = f"host gather: numpy {gather_np:.3f} s/hop"
    if native_available():
        gather_nat = time_gather(lambda p: gather_rows(x, p.cols))
        gather_s = min(gather_s, gather_nat)
        line += f", native OMP {gather_nat:.3f} s/hop ({os.cpu_count()} cores)"
    print(line + f" (all {oc.num_parts} parts)")

    # -- projection table --------------------------------------------------
    tunnel_bw = 26e6
    pcie_bw = 10e9
    vol = h2d + d2h
    print("\nprojection (steady s/hop at this config):")
    print(f"  compute-only (measured null-transfer) : {null_s:8.3f}")
    print(f"  + host gather (measured, serial)      : {null_s + gather_s:8.3f}")
    for name, bw in [("tunnel ~26 MB/s", tunnel_bw), ("PCIe 10 GB/s", pcie_bw)]:
        xfer = vol / bw
        overlapped = max(xfer, null_s) + gather_s
        serial = xfer + null_s + gather_s
        print(
            f"  {name:<22}: transfer {xfer:8.3f}  "
            f"overlapped {overlapped:8.3f}  serial {serial:8.3f}"
        )


def main_2d(n=2_400_000, avg_deg=25, d=100, part_edges=6 << 20,
            src_blocks="auto", hops=3):
    """REAL end-to-end hops through the 2-D layout (its per-hop traffic is
    one feature volume per accumulator group, so unlike the 1-D layout it
    is measurable through the dev tunnel, not just projectable)."""
    from sgl_tpu.datasets.synthetic import random_power_law_graph
    from sgl_tpu.graph import symmetric_normalized_weights_host
    from sgl_tpu.kernels import prepare_out_of_core_2d, spmm_out_of_core_2d

    t0 = time.time()
    g = random_power_law_graph(n, avg_deg, d, seed=0, pad_multiple=1 << 20)
    adj = symmetric_normalized_weights_host(g)
    oc = prepare_out_of_core_2d(
        adj, max_edges_per_part=part_edges, src_blocks=src_blocks,
        feat_dim=d,
    )
    x = np.asarray(g.x)
    nnz = int(np.sum(np.asarray(adj.w) != 0))
    cells = sum(1 for row in oc.parts for s in row if s.n_edges)
    print(
        f"2-D layout: {oc.num_parts} parts x {oc.num_blocks} blocks "
        f"({cells} non-empty cells), block workspace {oc.block_rows} rows, "
        f"{nnz} edges ({time.time() - t0:.1f}s to build)"
    )
    h = x
    times = []
    t0 = time.time()
    for k in range(1, hops + 1):
        t_h = time.time()
        h = spmm_out_of_core_2d(oc, h)
        times.append(time.time() - t_h)
        print(f"hop {k}: {times[-1]:.1f}s ({time.time() - t0:.1f}s cumulative)")
    steady = min(times[1:]) if len(times) > 1 else times[0]
    print(
        f"2-D out-of-core steady: {steady:.2f} s/hop over the ~26 MB/s "
        f"tunnel -> {nnz / steady / 1e9:.4f} G edges/s "
        f"(per-hop traffic ~{2 * n * d * 4 / 1e9:.1f} GB vs the 1-D "
        f"layout's 10.7 GB)"
    )


def main_2d_null(n=2_400_000, avg_deg=25, d=100, part_edges=6 << 20,
                 src_blocks="auto", hops=4, cache_dir="./data/ooc2d_cache"):
    """2-D compute-only control (VERDICT r3 #5): the identical per-cell
    step chain with H2D/D2H skipped bounds the 2-D path's non-transfer
    overhead the way round 3 bounded the 1-D path at 0.574 s/hop.  Also
    times the layout cache: cold build+save vs warm load."""
    from sgl_tpu.datasets.synthetic import random_power_law_graph
    from sgl_tpu.graph import symmetric_normalized_weights_host
    from sgl_tpu.kernels import prepare_out_of_core_2d, spmm_out_of_core_2d

    t0 = time.time()
    g = random_power_law_graph(n, avg_deg, d, seed=0, pad_multiple=1 << 20)
    adj = symmetric_normalized_weights_host(g)
    t_graph = time.time() - t0
    t0 = time.time()
    oc = prepare_out_of_core_2d(
        adj, max_edges_per_part=part_edges, src_blocks=src_blocks,
        feat_dim=d, cache_dir=cache_dir,
    )
    t_cold = time.time() - t0
    t0 = time.time()
    oc = prepare_out_of_core_2d(
        adj, max_edges_per_part=part_edges, src_blocks=src_blocks,
        feat_dim=d, cache_dir=cache_dir,
    )
    t_warm = time.time() - t0
    x = np.asarray(g.x)
    nnz = int(np.sum(np.asarray(adj.w) != 0))
    print(
        f"graph build {t_graph:.1f}s; layout cold(+save) {t_cold:.1f}s, "
        f"WARM LOAD {t_warm:.1f}s; {oc.num_parts} parts x {oc.num_blocks} "
        f"blocks, {nnz} edges"
    )
    times = []
    for k in range(1, hops + 1):
        t_h = time.time()
        spmm_out_of_core_2d(oc, x, null_transfer=True)
        times.append(time.time() - t_h)
        print(f"null hop {k}: {times[-1]:.2f}s")
    steady = min(times[1:]) if len(times) > 1 else times[0]
    print(
        f"2-D COMPUTE-ONLY steady: {steady:.2f} s/hop -> "
        f"{nnz / steady / 1e9:.4f} G edges/s (no H2D/D2H; edge arrays "
        f"device-cached after hop 1)"
    )


if __name__ == "__main__":
    if "--2d-null" in sys.argv:
        main_2d_null()
    elif "--2d" in sys.argv:
        main_2d()
    elif "--small" in sys.argv:
        main(n=500_000, avg_deg=20, d=100, part_edges=6 << 20)
    else:
        main()
