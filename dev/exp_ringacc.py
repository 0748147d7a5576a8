"""A/B the ring hop's ACCUMULATION form on the real chip.

`dev/exp_ringwork.py` times the bucket pipeline with a scalar carry — it
deliberately excludes the per-bucket `y = y + out` window traffic, which
is exactly what the round-5 aliased accumulator changes.  This harness
emulates ONE device's hop (P buckets of its layout row, real f32 window
carry, no ppermute) two ways:

  old:  out = _segment_reduce_mxu(...);  y = y + out   (+ the empty-tile
        select the mask path needed)
  new:  y = _segment_reduce_mxu_acc(..., y, 0)         (aliased output)

Run on the TPU (default env, nothing else running):

    python dev/exp_ringacc.py            # P=8,16
    python dev/exp_ringacc.py --p 32
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(n=100_000, avg_deg=25, d=128, plist=(8, 16)):
    import warnings

    import jax
    import jax.numpy as jnp

    from sgl_tpu.datasets.synthetic import random_power_law_graph
    from sgl_tpu.graph import symmetric_normalized_weights
    from sgl_tpu.kernels.pallas_spmm import (
        _round_up,
        _segment_reduce_mxu,
        _segment_reduce_mxu_acc,
    )
    from sgl_tpu.parallel.spmm_dist import partition_adj_chunked

    g = random_power_law_graph(n, avg_deg, d, seed=0)
    adj = symmetric_normalized_weights(g)
    x = jnp.asarray(g.x)
    d_pad = _round_up(d, 128)

    def device_hop_chain(dadj, k, form):
        p = dadj.num_partitions
        e_b = dadj.src.shape[-1]
        c_max = dadj.chunk_tile.shape[-1]
        # device 0's layout row: the P buckets it reduces per hop
        src = dadj.src.reshape(p, p, e_b)[0]
        dst = dadj.dst.reshape(p, p, e_b)[0]
        w = dadj.w.reshape(p, p, e_b)[0]
        ct = dadj.chunk_tile.reshape(p, p, c_max)[0]
        block = dadj.block
        tile_r = dadj.tile_rows
        n_pad_r = -(-block // tile_r) * tile_r

        def run(xx):
            xb = jnp.pad(
                xx[:block], ((0, max(block - xx.shape[0], 0)), (0, d_pad - d))
            )

            def hop(y_in, _):
                y = jnp.zeros((n_pad_r, d_pad), jnp.float32)

                def bkt(y, i):
                    msgs = (
                        jnp.take(xb + y_in * 0, jnp.take(src, i, axis=0), axis=0)
                        .astype(jnp.float32)
                        * jnp.take(w, i, axis=0)[:, None]
                    )
                    hi = msgs.astype(jnp.bfloat16)
                    lo = (msgs - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                    dsti = jnp.take(dst, i, axis=0)
                    cti = jnp.take(ct, i, axis=0)
                    if form == "acc":
                        y = _segment_reduce_mxu_acc(
                            hi, lo, dsti, cti, y,
                            jnp.zeros((1,), jnp.int32), tile_r=tile_r,
                        )
                    else:
                        out = _segment_reduce_mxu(
                            hi, lo, dsti, cti, num_nodes=n_pad_r,
                            tile_r=tile_r,
                        )
                        y = y + out
                    return y, None

                y, _ = jax.lax.scan(
                    bkt, y, jnp.arange(p, dtype=jnp.int32)
                )
                # feed the hop result forward like the production carry
                return y[:block].astype(xx.dtype) * 1e-10, None

            y, _ = jax.lax.scan(hop, xx[:block], None, length=k)
            return y[0, 0]

        return jax.jit(run)

    def timed(fn, iters=2):
        float(fn(x))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(fn(x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for p in plist:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            dadj = partition_adj_chunked(adj, p, feat_dim=d)
        k1, k2 = 8, 56
        fns = {
            form: {k: device_hop_chain(dadj, k, form) for k in (k1, k2)}
            for form in ("old", "acc")
        }
        best = {form: np.inf for form in fns}
        for _ in range(3):
            for form, fk in fns.items():
                t = (timed(fk[k2]) - timed(fk[k1])) / (k2 - k1)
                best[form] = min(best[form], t)
        log(
            f"P={p} R={dadj.tile_rows} e_b={dadj.w.shape[-1]}: "
            f"old {best['old']*1e3:.2f} ms/hop-row  "
            f"acc {best['acc']*1e3:.2f} ms/hop-row  "
            f"({best['old']/best['acc']:.2f}x)"
        )


if __name__ == "__main__":
    args = sys.argv[1:]
    if args[:1] == ["--p"]:
        main(plist=(int(args[1]),))
    else:
        main()
