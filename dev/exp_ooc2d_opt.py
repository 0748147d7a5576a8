"""Round-5 attack on the 2-D out-of-core COMPUTE bound (VERDICT r4 #1).

Round 4 measured the 2-D path's compute-only steady state at 1.99 s/hop
at the products config — ~18.6 ns/slot vs the 3.7-5.8 ns/slot the same
kernel does in HBM, leaving the papers100M-regime design compute-bound
(PCIe transfer is only ~1.1 s/hop).  Two suspects, both testable:

1. **Gather de-fusion**: `_ooc_step_2d` adds the accumulator to the
   Pallas output inside one jit — the single-chip scan measured 26→74
   ms/hop from exactly this pattern (CLAUDE.md XLA quirk).  The `split`
   step mode moves mask+accumulate into a second dispatch so the
   gather → hi/lo-write pipeline compiles clean.
2. **(tile_rows, chunk) never applied to the cells**: the 2-D layout was
   fixed at 128-row tiles and chunk 128 (the 270 ns/chunk overhead term
   ≈ 2.1 ns/slot by itself); wider output blocks cut per-cell tile
   round-up and let bigger chunks pay.

Stage A (host, seconds): padded-slot counts for a (tile_rows, chunk)
candidate grid via pure bincounts — no layout build.  The fitted in-HBM
cost model (2.9 + 0.33·tr/128 + 270/chunk ns/slot) ranks them.
Stage B (chip): build the top candidates (layout cache keeps re-runs
warm) and measure null-transfer steady state fused vs split.

Run on the TPU (default env, nothing else running):

    python dev/exp_ooc2d_opt.py            # stage A table + stage B on top picks
    python dev/exp_ooc2d_opt.py --counts   # stage A only (CPU-fast)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = 2_400_000
AVG_DEG = 25
D = 100
PART_EDGES = 6 << 20
CACHE = "./data/ooc2d_cache"


def build_graph():
    from sgl_tpu.datasets.synthetic import random_power_law_graph
    from sgl_tpu.graph import symmetric_normalized_weights_host

    t0 = time.time()
    g = random_power_law_graph(N, AVG_DEG, D, seed=0, pad_multiple=1 << 20)
    adj = symmetric_normalized_weights_host(g)
    print(f"graph: {time.time() - t0:.1f}s to build")
    return g, adj


def slot_counts(adj, src_blocks, chunk, tile_rows):
    """Mirror prepare_out_of_core_2d's padded-slot accounting without
    building any edge arrays (bincounts only)."""
    src = np.asarray(adj.src, np.int64)
    dst = np.asarray(adj.dst, np.int64)
    w = np.asarray(adj.w, np.float32)
    keep = w != 0
    src, dst = src[keep], dst[keep]
    loop = src == dst
    src, dst = src[~loop], dst[~loop]  # split_diag default
    n = adj.num_nodes
    tr = tile_rows
    k = src_blocks
    sb = ((-(-n // k)) + 127) // 128 * 128
    n_tiles_total = -(-n // tr)
    tile_of = dst // tr
    tile_counts = np.bincount(tile_of, minlength=n_tiles_total)
    cum = np.cumsum(tile_counts)
    n_parts = max(-(-int(cum[-1]) // PART_EDGES), 1)
    targets = np.linspace(0, cum[-1], n_parts + 1)[1:-1]
    bounds = sorted(set([0] + np.searchsorted(cum, targets).tolist()
                        + [n_tiles_total]))
    n_parts = len(bounds) - 1
    n_tiles = max(hi - lo for lo, hi in zip(bounds[:-1], bounds[1:]))
    part_of = np.searchsorted(np.asarray(bounds[1:]), tile_of, side="right")
    block_of = src // sb
    # per (part, block, local tile) counts -> chunk round-up -> per-cell
    # padded sum -> power-of-two size class
    t_lo = np.asarray([bounds[p] for p in range(n_parts)])
    loc_tile = tile_of - t_lo[part_of]
    flat = (part_of * k + block_of) * n_tiles + loc_tile
    cnt = np.bincount(flat, minlength=n_parts * k * n_tiles).reshape(
        n_parts * k, n_tiles
    )
    padded = np.where(cnt > 0, ((cnt + chunk - 1) // chunk) * chunk, 0)
    cell_sums = padded.sum(axis=1)
    slots = 0
    classes = set()
    for s in cell_sums:
        if s == 0:
            continue
        c_real = max(int(s) // chunk, 1)
        c_cell = 1 << (c_real - 1).bit_length()
        slots += c_cell * chunk
        classes.add(c_cell)
    real = src.shape[0]
    return slots, real, n_parts, len(classes)


def stage_a(adj):
    print("\n== stage A: slot counts + modeled compute (host only) ==")
    print(f"{'(blocks, chunk, tr)':<24}{'pad':>7}{'classes':>8}"
          f"{'parts':>6}{'modeled s/hop':>14}")
    rows = []
    for k in (8, 4):
        for tr in (128, 256, 512, 1024):
            for chunk in (128, 256, 512):
                slots, real, n_parts, n_cls = slot_counts(adj, k, chunk, tr)
                ns = 2.9 + 0.33 * (tr / 128) + 270.0 / chunk
                t = slots * ns * 1e-9
                rows.append(((k, chunk, tr), slots / real, n_cls, n_parts, t))
                print(f"{str((k, chunk, tr)):<24}{slots / real:>7.2f}"
                      f"{n_cls:>8}{n_parts:>6}{t:>14.3f}")
    rows.sort(key=lambda r: r[-1])
    return rows


def measure(adj, x, nnz, src_blocks, chunk, tile_rows, modes=("fused", "split"),
            hops=4):
    from sgl_tpu.kernels import prepare_out_of_core_2d, spmm_out_of_core_2d

    t0 = time.time()
    oc = prepare_out_of_core_2d(
        adj, max_edges_per_part=PART_EDGES, src_blocks=src_blocks,
        chunk=chunk, tile_rows=tile_rows, cache_dir=CACHE,
    )
    print(f"  layout ({src_blocks} blk, chunk {chunk}, tr {tile_rows}): "
          f"{time.time() - t0:.1f}s (cache {CACHE})")
    out = {}
    for mode in modes:
        times = []
        for i in range(hops):
            t_h = time.time()
            spmm_out_of_core_2d(oc, x, null_transfer=True, step_mode=mode)
            times.append(time.time() - t_h)
        steady = min(times[1:]) if len(times) > 1 else times[0]
        out[mode] = steady
        print(f"  {mode:<6} null-transfer steady: {steady:.3f} s/hop "
              f"({nnz / steady / 1e9:.4f} G edges/s; hops "
              f"{' '.join(f'{t:.2f}' for t in times)})")
    # free device edge cache between layouts (HBM is 16 GB)
    oc._dev_edges.clear()
    oc._dev_ws.clear()
    return out


def main():
    g, adj = build_graph()
    rows = stage_a(adj)
    if "--counts" in sys.argv:
        return
    x = np.asarray(g.x)
    nnz = int(np.sum(np.asarray(adj.w) != 0))
    print(f"\n== stage B: chip, null-transfer ({nnz} edges) ==")
    print("baseline (round-4 defaults):")
    measure(adj, x, nnz, 8, 128, 128)
    done = {(8, 128, 128)}
    for cfg, pad, _cls, _parts, modeled in rows[:3]:
        if cfg in done:
            continue
        done.add(cfg)
        k, chunk, tr = cfg
        print(f"candidate {cfg} (pad {pad:.2f}x, modeled {modeled:.3f}):")
        measure(adj, x, nnz, k, chunk, tr)


if __name__ == "__main__":
    main()
