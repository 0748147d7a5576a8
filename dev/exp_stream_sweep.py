"""Sweep max_edges_per_part for the streaming SpMM at products scale.
Run on the TPU (default env): PYTHONPATH=. python dev/exp_stream_sweep.py
"""
import sys, time
import numpy as np

sys.path.insert(0, ".")


def main(n=2_400_000, avg_deg=25, d=100, hops=3):
    import jax.numpy as jnp
    from sgl_tpu.datasets.synthetic import random_power_law_graph
    from sgl_tpu.graph import symmetric_normalized_weights_host
    from sgl_tpu.kernels import prepare_chunked_parts, spmm_pallas_streaming

    t0 = time.time()
    g = random_power_law_graph(n, avg_deg, d, seed=0, pad_multiple=1 << 20)
    adj = symmetric_normalized_weights_host(g)
    nnz = int(np.sum(np.asarray(adj.w) != 0))
    print(f"graph {nnz} nnz ({time.time()-t0:.0f}s build)", flush=True)
    x = jnp.asarray(g.x)

    for pe_name, pe in [("4M", 4 << 20), ("6M", 6 << 20), ("8M", 8 << 20)]:
        t0 = time.time()
        bundle = prepare_chunked_parts(adj, max_edges_per_part=pe)
        stk = bundle[0]
        slots = int(stk.w.size)
        real = int(np.count_nonzero(np.asarray(stk.w)))
        print(f"[{pe_name}] {stk.num_parts} parts, {slots/max(real,1):.2f}x padding "
              f"({time.time()-t0:.0f}s partition)", flush=True)
        times = []
        h = x
        try:
            for k in range(hops):
                t_h = time.time()
                h = spmm_pallas_streaming(bundle, h)
                h.block_until_ready()
                times.append(time.time() - t_h)
            steady = min(times[1:])
            print(f"[{pe_name}] steady {steady:.2f}s/hop -> {nnz/steady/1e9:.3f} G edges/s",
                  flush=True)
        except Exception as e:
            print(f"[{pe_name}] FAILED: {type(e).__name__}: {e}", flush=True)
        del bundle, h


if __name__ == "__main__":
    main()
