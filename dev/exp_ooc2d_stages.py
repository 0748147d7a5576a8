"""Stage decomposition of one large 2-D OOC cell (round 5).

The biggest cell (e_b=8.4M slots) measures 15.5 ns/slot in-jit — 3-4x the
in-HBM per-slot cost.  Which stage: the Pallas one-hot kernel at this
(n_rows, tile_r) shape, or the message production (gather + xw + hi/lo)?
All arrays are passed as jit ARGUMENTS (closure capture would embed GBs of
constants into the program and ship them through the tunnel per compile).

    python dev/exp_ooc2d_stages.py
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
    import functools

    import jax
    import jax.numpy as jnp

    from sgl_tpu.datasets.synthetic import random_power_law_graph
    from sgl_tpu.graph import symmetric_normalized_weights_host
    from sgl_tpu.kernels import prepare_out_of_core_2d
    from sgl_tpu.kernels.pallas_spmm import _segment_reduce_mxu

    g = random_power_law_graph(N, AVG_DEG, D, seed=0, pad_multiple=1 << 20)
    adj = symmetric_normalized_weights_host(g)
    oc = prepare_out_of_core_2d(
        adj, max_edges_per_part=PART_EDGES, cache_dir=CACHE, **CFG
    )
    x = np.asarray(g.x)
    sb = oc.block_rows
    xw_h = x[:sb]
    if xw_h.shape[0] < sb:
        xw_h = np.pad(xw_h, ((0, sb - xw_h.shape[0]), (0, 0)))
    xw = jnp.asarray(np.pad(xw_h, ((0, 0), (0, 128 - D))))

    cells = [
        (p, b, s.src.shape[0])
        for p, row in enumerate(oc.parts)
        for b, s in enumerate(row)
        if s.n_edges
    ]
    cells.sort(key=lambda t: -t[2])
    p0, b0, e_b = cells[0]
    s = oc.parts[p0][b0]
    src = jnp.asarray(s.src)
    dst = jnp.asarray(s.dst)
    w = jnp.asarray(s.w)
    ct = jnp.asarray(s.chunk_tile)
    n_rows = oc.n_rows
    tile_r = oc.tile_rows
    print(f"cell: e_b={e_b}, chunks={s.chunk_tile.shape[0]}, "
          f"n_rows={n_rows}, tile_r={tile_r}", flush=True)

    def slope(fn, args, ks=(2, 8)):
        for k in ks:
            float(fn(k, *args))
        def t(k):
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(fn(k, *args))
                ts.append(time.perf_counter() - t0)
            return min(ts)
        t1, t2 = t(ks[0]), t(ks[1])
        return (t2 - t1) / (ks[1] - ks[0])

    # (i) kernel only
    @functools.partial(jax.jit, static_argnums=0)
    def kernel_only(k, hi, lo, dst, ct):
        def body(c, _):
            out = _segment_reduce_mxu(hi, lo, dst, ct, num_nodes=n_rows,
                                      tile_r=tile_r)
            return c + out[0, 0], None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
        return acc

    msgs = (jnp.take(xw, src, axis=0) * w[:, None]).astype(jnp.float32)
    hi = msgs.astype(jnp.bfloat16)
    lo = (msgs - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    del msgs
    tk = slope(kernel_only, (hi, lo, dst, ct))
    print(f"(i) kernel-only: {tk*1e3:.1f} ms = {tk/e_b*1e9:.2f} ns/slot",
          flush=True)
    del hi, lo

    # (ii) production only (gather + xw + hi/lo cast; tiny consumer)
    @functools.partial(jax.jit, static_argnums=0)
    def prod_only(k, xw, src, w):
        def body(c, _):
            m = (jnp.take(xw, src, axis=0).astype(jnp.float32)
                 * (w + c * 1e-30)[:, None])
            h = m.astype(jnp.bfloat16)
            l = (m - h.astype(jnp.float32)).astype(jnp.bfloat16)
            return (h[0, 0].astype(jnp.float32)
                    + l[0, 0].astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
        return acc

    tp = slope(prod_only, (xw, src, w))
    print(f"(ii) production-only: {tp*1e3:.1f} ms = {tp/e_b*1e9:.2f} ns/slot",
          flush=True)

    # (iii) full cell
    @functools.partial(jax.jit, static_argnums=0)
    def full_cell(k, xw, src, dst, w, ct):
        def body(c, _):
            m = (jnp.take(xw, src, axis=0).astype(jnp.float32)
                 * (w + c * 1e-30)[:, None])
            h = m.astype(jnp.bfloat16)
            l = (m - h.astype(jnp.float32)).astype(jnp.bfloat16)
            out = _segment_reduce_mxu(h, l, dst, ct, num_nodes=n_rows,
                                      tile_r=tile_r)
            return out[0, 0], None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
        return acc

    tf = slope(full_cell, (xw, src, dst, w, ct))
    print(f"(iii) full cell: {tf*1e3:.1f} ms = {tf/e_b*1e9:.2f} ns/slot",
          flush=True)

    # (iv) bf16 single-pass
    @functools.partial(jax.jit, static_argnums=0)
    def full_bf16(k, xb, src, dst, w, ct):
        def body(c, _):
            m = jnp.take(xb, src, axis=0).astype(jnp.float32) * (
                w + c * 1e-30)[:, None]
            h = m.astype(jnp.bfloat16)
            out = _segment_reduce_mxu(h, None, dst, ct, num_nodes=n_rows,
                                      tile_r=tile_r)
            return out[0, 0], None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
        return acc

    xb = xw.astype(jnp.bfloat16)
    tb = slope(full_bf16, (xb, src, dst, w, ct))
    print(f"(iv) full cell bf16 single-pass: {tb*1e3:.1f} ms = "
          f"{tb/e_b*1e9:.2f} ns/slot", flush=True)


if __name__ == "__main__":
    main()
