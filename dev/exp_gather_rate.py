"""Characterize the XLA row-gather rate vs source-array size and index
distribution (round 5: the 2-D OOC cell's production pipeline measures
14 ns/row where the 100k-node bench context measures ~2-3.5 ns/row).

    python dev/exp_gather_rate.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

def main():
    import jax
    import jax.numpy as jnp

    E = 1 << 22  # 4.2M gathers

    @functools.partial(jax.jit, static_argnums=0)
    def prod(k, xw, src, w):
        def body(c, _):
            m = (jnp.take(xw, src, axis=0).astype(jnp.float32)
                 * (w + c * 1e-30)[:, None])
            h = m.astype(jnp.bfloat16)
            l = (m - h.astype(jnp.float32)).astype(jnp.bfloat16)
            return (h[0, 0].astype(jnp.float32)
                    + l[0, 0].astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
        return acc

    def slope(xw, src, w, ks=(2, 8)):
        for k in ks:
            float(prod(k, xw, src, w))
        def t(k):
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(prod(k, xw, src, w))
                ts.append(time.perf_counter() - t0)
            return min(ts)
        return (t(ks[1]) - t(ks[0])) / (ks[1] - ks[0])

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.random(E).astype(np.float32))
    for n_rows in (1 << 16, 1 << 17, 1 << 18, 600_064, 1 << 21):
        xw = jnp.asarray(rng.normal(size=(n_rows, 128)).astype(np.float32))
        uni = jnp.asarray(rng.integers(0, n_rows, E).astype(np.int32))
        # zipf-flavored skew: squash uniform^3 toward low ids
        zf = jnp.asarray((
            (rng.random(E) ** 3) * n_rows).astype(np.int32))
        sorted_uni = jnp.asarray(np.sort(np.asarray(uni)))
        for name, src in (("uniform", uni), ("skewed", zf),
                          ("sorted", sorted_uni)):
            t = slope(xw, src, w)
            print(f"rows={n_rows:>8} ({n_rows*512/1e6:6.0f} MB) {name:>8}: "
                  f"{t/E*1e9:6.2f} ns/row", flush=True)
        del xw


if __name__ == "__main__":
    main()
