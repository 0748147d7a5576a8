"""Decompose the streaming scan's ~1.8-2 ms/part overhead (VERDICT r4 #6).

bench.py measures streaming x~5 at 20.3 ms/hop vs 13.9 single-part on
the 5.2M-edge graph.  Suspects, each an ablation of _streaming_scan's
per-part machinery, all measured in the production hop-chained shape
(fori_loop over hops, like bench.py):

  full      - the production scan (dynamic y windows + valid-row select)
  nowhere   - drop the valid-row select (correctness-breaking; times it)
  unroll    - python-unrolled part loop with STATIC y windows
              (y.at[off:off+rows].add) instead of scan + dynamic slices
  single    - single-part reference on the same graph

Run on the TPU (default env, nothing else running):

    python dev/exp_stream_parts.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n=200_000, avg_deg=25, d=128, part_edges=1 << 20):
    import jax
    import jax.numpy as jnp

    from sgl_tpu.datasets.synthetic import random_power_law_graph
    from sgl_tpu.graph import symmetric_normalized_weights
    from sgl_tpu.kernels import prepare_chunked, prepare_chunked_parts, spmm_pallas
    from sgl_tpu.kernels.pallas_spmm import TILE_R, _round_up, _segment_reduce_mxu

    g = random_power_law_graph(n, avg_deg, d, seed=0)
    adj = symmetric_normalized_weights(g)
    x = jnp.asarray(np.asarray(g.x))
    nnz = int(np.sum(np.asarray(adj.w) != 0))

    bundle = prepare_chunked_parts(adj, max_edges_per_part=part_edges)
    stk, num_nodes, max_tiles, extras = bundle
    n_rows = max_tiles * TILE_R
    n_parts = stk.num_parts
    print(f"{n_parts} parts, n_rows={n_rows}", flush=True)

    d_pad = _round_up(d, 128)
    n_total = _round_up(num_nodes, TILE_R) + n_rows
    row_ids = jnp.arange(n_rows, dtype=jnp.int32)

    def scan_hop(xh, mode):
        xp = jnp.pad(xh, ((0, 0), (0, d_pad - d))) if d_pad != d else xh
        xp = xp.astype(jnp.float32)

        def body(y, part):
            src, dst, w, ct, off, valid = part
            msgs = jnp.take(xp, src, axis=0) * w[:, None]
            hi = msgs.astype(jnp.bfloat16)
            lo = (msgs - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            out = _segment_reduce_mxu(hi, lo, dst, ct, num_nodes=n_rows)
            if mode != "nowhere":
                out = jnp.where((row_ids < valid)[:, None], out, 0.0)
            cur = jax.lax.dynamic_slice(y, (off, 0), (n_rows, d_pad))
            return jax.lax.dynamic_update_slice(y, cur + out, (off, 0)), None

        y0 = jnp.zeros((n_total, d_pad), jnp.float32)
        if mode == "unroll":
            y = y0
            offs = list(stk.tile_offset)
            valids = list(stk.valid_rows)
            for i in range(n_parts):
                msgs = jnp.take(xp, stk.src[i], axis=0) * stk.w[i][:, None]
                hi = msgs.astype(jnp.bfloat16)
                lo = (msgs - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                out = _segment_reduce_mxu(
                    hi, lo, stk.dst[i], stk.chunk_tile[i], num_nodes=n_rows)
                v = valids[i]
                o = offs[i]
                y = y.at[o:o + v].add(out[:v])
            return y[:num_nodes, :d]
        y, _ = jax.lax.scan(
            body, y0,
            (stk.src, stk.dst, stk.w, stk.chunk_tile,
             jnp.asarray(stk.tile_offset, jnp.int32),
             jnp.asarray(stk.valid_rows, jnp.int32)),
        )
        return y[:num_nodes, :d]

    chunked = prepare_chunked(adj, split_diag=False, hub_k=0)

    def make(mode, k):
        if mode == "single":
            @jax.jit
            def f(xx):
                return jax.lax.fori_loop(
                    0, k,
                    lambda i, y: spmm_pallas(chunked, y), xx)[0, 0]
            return f

        @jax.jit
        def f(xx):
            return jax.lax.fori_loop(
                0, k, lambda i, y: scan_hop(y, mode), xx)[0, 0]
        return f

    def timed(f, iters=3):
        float(f(x))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(f(x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    k1, k2 = 2, 6
    for mode in ("single", "full", "nowhere", "unroll"):
        f1, f2 = make(mode, k1), make(mode, k2)
        t = (timed(f2) - timed(f1)) / (k2 - k1)
        print(f"{mode:>8}: {t*1e3:6.2f} ms/hop "
              f"({nnz / t / 1e9:.3f} G edges/s)", flush=True)


if __name__ == "__main__":
    main()
