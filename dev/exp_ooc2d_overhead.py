"""Decompose the 2-D out-of-core hop's ~1.4 s/hop layout-independent
overhead (round-5 finding: measured hop ~= modeled compute + constant).

Suspects, each timed on the real chip against the cached (4, 256, 256)
products layout:

  a) per-cell DISPATCH cost: same cell re-dispatched back to back with one
     trailing sync (slope between 2- and 12-call batches) vs the cell's
     in-jit compute time (k-chain scan inside ONE jit);
  b) accumulator creation: jnp.zeros((n_rows, d_pad)) per part per hop;
  c) the end-of-hop sync itself.

Run on the TPU (default env, nothing else running):

    python dev/exp_ooc2d_overhead.py
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
CFG = dict(src_blocks=4, chunk=256, tile_rows=256)


def main():
    import jax
    import jax.numpy as jnp

    from sgl_tpu.datasets.synthetic import random_power_law_graph
    from sgl_tpu.graph import symmetric_normalized_weights_host
    from sgl_tpu.kernels import prepare_out_of_core_2d
    from sgl_tpu.kernels.spmm_ooc import _ooc_cell_2d

    g = random_power_law_graph(N, AVG_DEG, D, seed=0, pad_multiple=1 << 20)
    adj = symmetric_normalized_weights_host(g)
    oc = prepare_out_of_core_2d(
        adj, max_edges_per_part=PART_EDGES, cache_dir=CACHE, **CFG
    )
    x = np.asarray(g.x)
    sb = oc.block_rows
    xw = jnp.asarray(np.pad(x[:sb], ((0, max(0, sb - x[:sb].shape[0])), (0, 0))))

    # pick the largest cell
    cells = [
        (p, b, s.src.shape[0])
        for p, row in enumerate(oc.parts)
        for b, s in enumerate(row)
        if s.n_edges
    ]
    cells.sort(key=lambda t: -t[2])
    sizes = {}
    for p, b, e_b in cells:
        sizes.setdefault(e_b, []).append((p, b))
    print("size classes:", {k: len(v) for k, v in sizes.items()})

    p0, b0, e_b0 = cells[0]
    s = oc.parts[p0][b0]
    edges = (jnp.asarray(s.src), jnp.asarray(s.dst), jnp.asarray(s.w),
             jnp.asarray(s.chunk_tile))

    def sync(v):
        np.asarray(v[:1, :1])

    # (a) per-cell dispatch: N back-to-back dispatches, one sync
    def dispatched(k):
        out = None
        t0 = time.perf_counter()
        for _ in range(k):
            out = _ooc_cell_2d(*edges, xw, n_rows=oc.n_rows,
                               tile_r=oc.tile_rows)
        sync(out)
        return time.perf_counter() - t0

    dispatched(2)  # warm compile
    t2 = min(dispatched(2) for _ in range(3))
    t12 = min(dispatched(12) for _ in range(3))
    per_call = (t12 - t2) / 10
    print(f"(a) per-cell dispatched: {per_call*1e3:.1f} ms/call "
          f"(largest cell, e_b={e_b0})")

    # same cell k times INSIDE one jit: the pure compute floor
    def chain(k):
        def run(xx):
            def body(c, _):
                out = _ooc_cell_2d(*edges, xx + c * 0, n_rows=oc.n_rows,
                                   tile_r=oc.tile_rows)
                return out[0, 0], None
            acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
            return acc
        return jax.jit(run)

    f2, f12 = chain(2), chain(12)
    float(f2(xw)); float(f12(xw))
    c2 = min(min((time.perf_counter() - t0
                  for t0 in [time.perf_counter()]
                  if float(f2(xw)) is not None) or [0], default=0) for _ in [0])
    # simpler timing
    def timeit(f):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); float(f(xw)); ts.append(time.perf_counter() - t0)
        return min(ts)
    c2, c12 = timeit(f2), timeit(f12)
    per_compute = (c12 - c2) / 10
    print(f"    in-jit chained:      {per_compute*1e3:.1f} ms/call -> "
          f"dispatch overhead {max(per_call-per_compute,0)*1e3:.1f} ms/cell")

    # (b) accumulator zeros
    def zeros_round(k):
        zs = [jnp.zeros((oc.n_rows, 128), jnp.float32) for _ in range(k)]
        np.asarray(zs[-1][:1, :1])
    zeros_round(2)
    t0 = time.perf_counter(); zeros_round(2); tz2 = time.perf_counter() - t0
    t0 = time.perf_counter(); zeros_round(12); tz12 = time.perf_counter() - t0
    print(f"(b) jnp.zeros acc: {(tz12-tz2)/10*1e3:.1f} ms each "
          f"(n_rows={oc.n_rows}; {oc.num_parts} parts/hop)")

    # (c) bare sync
    t0 = time.perf_counter(); sync(xw); print(f"(c) bare 1-elem fetch: "
          f"{(time.perf_counter()-t0)*1e3:.1f} ms")

    # totals at this layout
    n_cells = len(cells)
    print(f"cells/hop={n_cells}; dispatch-extrapolated "
          f"{n_cells*per_call:.2f} s/hop vs measured 1.63")


if __name__ == "__main__":
    main()
