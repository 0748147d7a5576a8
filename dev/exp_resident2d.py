"""In-HBM huge-graph A/B: streaming scan (gathers from the full feature
array — above the gather-rate cliff at products scale) vs the
device-resident 2-D executor (gathers from <=100 MB block slices).

Run each arm in its own process (both peak near the 16 GB HBM at the
products config; holding one arm's buffers while the other runs OOMs):

    python dev/exp_resident2d.py streaming float32
    python dev/exp_resident2d.py resident float32
    python dev/exp_resident2d.py streaming bfloat16
    python dev/exp_resident2d.py resident bfloat16
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


def main():
    import jax
    import jax.numpy as jnp

    from sgl_tpu.datasets.synthetic import random_power_law_graph
    from sgl_tpu.graph import symmetric_normalized_weights_host
    from sgl_tpu.kernels import (
        prepare_chunked_parts,
        prepare_out_of_core_2d,
        spmm_pallas_2d_resident,
        spmm_pallas_streaming,
    )

    g = random_power_law_graph(N, AVG_DEG, D, seed=0, pad_multiple=1 << 20)
    adj = symmetric_normalized_weights_host(g)
    nnz = int(np.sum(np.asarray(adj.w) != 0))
    x32 = jnp.asarray(np.asarray(g.x))

    def hops(fn, x, k):
        h = x
        t0 = time.perf_counter()
        for _ in range(k):
            h = fn(h)
        np.asarray(h[:1, :1])  # real sync
        return time.perf_counter() - t0, h

    def steady(fn, x, label):
        hops(fn, x, 1)  # compile + warm
        t2 = min(hops(fn, x, 2)[0] for _ in range(2))
        t6 = min(hops(fn, x, 6)[0] for _ in range(2))
        per = (t6 - t2) / 4
        print(f"{label}: {per:.3f} s/hop ({nnz / per / 1e9:.4f} G edges/s)",
              flush=True)
        return per

    arm = sys.argv[1] if len(sys.argv) > 1 else "streaming"
    dtype = sys.argv[2] if len(sys.argv) > 2 else "float32"
    x = x32 if dtype == "float32" else x32.astype(jnp.bfloat16)
    del x32
    print(f"== {arm} {dtype} ==", flush=True)
    if arm == "streaming":
        t0 = time.time()
        bundle = prepare_chunked_parts(adj, max_edges_per_part=PART_EDGES)
        print(f"streaming layout: {time.time() - t0:.1f}s", flush=True)
        steady(lambda h: spmm_pallas_streaming(bundle, h), x,
               f"streaming {dtype} (full-x gather)")
    else:
        t0 = time.time()
        oc = prepare_out_of_core_2d(
            adj, max_edges_per_part=PART_EDGES, feat_dim=D,
            feat_dtype=dtype, cache_dir=CACHE,
        )
        print(f"2-D layout ({oc.num_blocks} blocks, tr={oc.tile_rows}): "
              f"{time.time() - t0:.1f}s", flush=True)
        steady(lambda h: spmm_pallas_2d_resident(oc, h), x,
               f"resident 2-D {dtype} (sliced gather)")


if __name__ == "__main__":
    main()
