"""Host-side feasibility study for a 2-D (dst-tile x src-block) IN-HBM
SpMM layout (VERDICT r3 next #1) — exact padded-slot accounting on the
real bench graph, BEFORE building a kernel.

Design under test: replace the XLA per-row gather (measured issue-rate
bound, ~3.5 ns/row, docs/PERFORMANCE.md) with a Pallas kernel whose x
input is streamed per-chunk as a (sb, D) VMEM block selected by a
scalar-prefetched block id, and whose in-kernel src access is a one-hot
MXU matmul ``(chunk x sb) @ (sb x D)``.  Cost per edge SLOT is then
``(sb + TILE_R) * D * 2`` flops — sb from the src one-hot, TILE_R from
the existing dst one-hot — paid on every slot including padding.

The fight is density vs flops: big sb -> denser cells (less padding) but
linearly more MXU work per slot; small sb -> cheap slots but a 200k-node
graph fragments into near-empty cells.  This script computes the exact
slot counts per (sb, chunk) and converts them to a time model anchored
on MEASURED rates from the existing kernel:

* MXU one-hot rate: the production kernel's dst one-hot measures
  ~0.17 ns per slot per (128x512)@(512x128) pass -> ~193 Tflop/s.
* x-block streaming: each (tile, block) cell transition re-DMAs the
  (sb, D) block -> cells * sb*D*bytes at 819 GB/s.
* Baseline to beat: the measured production stage (gather path) —
  11.1 ms f32 / ~8.4 ms bf16 on the same remainder edges.

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python dev/exp_spmm2d_layout.py
"""

import numpy as np

TILE_R = 128
D = 128
MXU_TFLOPS = 193e12  # measured on the production kernel's dst one-hot
HBM_BPS = 819e9


def main():
    from sgl_tpu.datasets.synthetic import random_power_law_graph
    from sgl_tpu.graph import symmetric_normalized_weights
    from sgl_tpu.kernels.pallas_spmm import split_extras

    g = random_power_law_graph(200_000, 25, 128, seed=0)
    adj = symmetric_normalized_weights(g)
    src = np.asarray(adj.src)
    dst = np.asarray(adj.dst)
    w = np.asarray(adj.w)
    keep = w != 0
    src, dst, w = src[keep], dst[keep], w[keep]
    n = adj.num_nodes
    e_all = src.shape[0]

    # identical split to production: what stays is the gather-path remainder
    src, dst, w, diag, hub_ids, hub_m = split_extras(src, dst, w, n)
    e_rest = src.shape[0]
    print(f"graph: N={n}, E={e_all}, remainder after diag/hub={e_rest} "
          f"({100*e_rest/e_all:.1f}%), hubs={0 if hub_ids is None else len(hub_ids)}")
    gather_ns = 3.5
    base_ms = e_rest * gather_ns * 1e-6
    print(f"gather-path production baseline @3.5ns/row: {base_ms:.2f} ms")

    n_tiles = -(-n // TILE_R)
    tile_of = dst // TILE_R

    for sb in (256, 512, 1024, 2048, 4096):
        n_blocks = -(-n // sb)
        block_of = src // sb
        cell = tile_of.astype(np.int64) * n_blocks + block_of
        counts = np.bincount(cell, minlength=n_tiles * n_blocks)
        nz = counts[counts > 0]
        for chunk in (32, 64, 128, 256, 512):
            slots = int((((nz + chunk - 1) // chunk) * chunk).sum())
            # every tile needs >= 1 chunk so its out block is written
            tiles_touched = np.unique(tile_of).shape[0]
            slots += (n_tiles - tiles_touched) * chunk
            pad = slots / e_rest
            flops = slots * (sb + TILE_R) * D * 2
            t_mxu = flops / MXU_TFLOPS
            # x-block re-DMA per cell transition (tile-major order:
            # consecutive chunks in one cell share the block)
            t_hbm = len(nz) * sb * D * 4 / HBM_BPS
            t_model = max(t_mxu, t_hbm) * 1e3
            verdict = "WIN " if t_model < base_ms else "lose"
            print(
                f"sb={sb:5d} chunk={chunk:4d}: cells={len(nz):8d} "
                f"mean_fill={e_rest/len(nz):7.1f} pad={pad:6.2f}x "
                f"mxu={t_mxu*1e3:7.2f}ms xdma={t_hbm*1e3:7.2f}ms "
                f"-> {t_model:7.2f}ms  {verdict}"
            )


if __name__ == "__main__":
    main()
