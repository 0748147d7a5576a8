"""Pin the gather-rate cliff boundary (round 5): operand-size sweep at
fine granularity, f32 vs bf16 rows (is the threshold bytes or rows?).

    python dev/exp_gather_cliff.py
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

    E = 1 << 22

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
    for rows, dt in [
        (150_016, np.float32),   # 77 MB
        (180_096, np.float32),   # 92 MB
        (200_064, np.float32),   # 102 MB
        (230_016, np.float32),   # 118 MB
        (262_144, 'bfloat16'),  # 67 MB in bf16
        (400_000, 'bfloat16'),  # 102 MB in bf16
        (524_288, 'bfloat16'),  # 134 MB in bf16
    ]:
        import ml_dtypes
        npdt = np.dtype(dt) if dt != "bfloat16" else np.dtype(ml_dtypes.bfloat16)
        xw = jnp.asarray(rng.normal(size=(rows, 128)).astype(npdt))
        uni = jnp.asarray(rng.integers(0, rows, E).astype(np.int32))
        t = slope(xw, uni, w)
        mb = rows * 128 * np.dtype(npdt).itemsize / 1e6
        print(f"rows={rows:>8} {np.dtype(npdt).name:>9} ({mb:6.0f} MB): "
              f"{t/E*1e9:6.2f} ns/row", flush=True)
        del xw


if __name__ == "__main__":
    main()
