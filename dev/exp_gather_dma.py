"""Measure the in-kernel per-row DMA gather rate (VERDICT r4 next #5).

The single-chip hop's dominant term is the message HBM round-trip: XLA's
row gather reads ``x[src]`` (~3.5 ns/row measured, payload-independent),
writes the weighted bf16 messages to HBM, and the Pallas kernel reads
them back — 3x the minimum traffic.  True fusion means the kernel
gathers rows itself (``make_async_copy`` per row from an HBM-resident
``x`` into VMEM scratch), which lives or dies on the **DMA issue rate**:
at 512 rows per chunk, even 0.2 us per descriptor is 100 us/chunk vs the
~1.8 us the XLA gather spends.

This experiment times a minimal gather-only kernel — grid over chunks,
src ids streamed into SMEM per chunk, a fori_loop issuing one row DMA per
edge slot into scratch, wait-all, then a trivial reduce so nothing is
dead-code-eliminated — and reports ns/row.  Decision rule: if ns/row ≫
3.5, in-kernel gather is falsified for the production pipeline and the
message round-trip stands as the cost of doing the gather at XLA's rate.

Run on the TPU (default env, nothing else running):

    python dev/exp_gather_dma.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(src_ref, x_ref, out_ref, scratch, sems, *, chunk, n_flight):
    """One grid step = one chunk: DMA chunk rows of x (HBM) into scratch
    (VMEM) with ``n_flight`` outstanding copies, then accumulate their sum
    into the output block (so the gather is observable)."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def issue(i):
        return pltpu.make_async_copy(
            x_ref.at[src_ref[0, 0, i]], scratch.at[i], sems.at[i % n_flight]
        )

    def body(i, _):
        # wait for the copy n_flight back before reusing its semaphore
        @pl.when(i >= n_flight)
        def _():
            issue(i - n_flight).wait()

        issue(i).start()
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)

    def drain(i, _):
        issue(i).wait()
        return 0

    jax.lax.fori_loop(max(chunk - n_flight, 0), chunk, drain, 0)
    out_ref[:] += jnp.sum(scratch[:], axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("chunk", "n_flight"))
def gather_dma(src, x, chunk: int, n_flight: int):
    e = src.shape[0]
    n_chunks = e // chunk
    d = x.shape[1]
    kernel = functools.partial(_gather_kernel, chunk=chunk, n_flight=n_flight)
    return pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            # (1, 1, chunk): the last two dims must be (equal to the
            # array dim, divisible by 128) for the SMEM block mapping
            pl.BlockSpec((1, 1, chunk), lambda c: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM
        ],
        out_specs=pl.BlockSpec((1, d), lambda c: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((chunk, d), jnp.float32),
            pltpu.SemaphoreType.DMA((n_flight,)),
        ],
    )(src.reshape(n_chunks, 1, chunk), x)


def main():
    n, d = 1 << 20, 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    print(f"x: {n} rows x {d} f32 ({x.nbytes / 1e6:.0f} MB, HBM-resident)")
    for e_log, chunk, n_flight in [
        (18, 512, 8), (18, 512, 16), (18, 512, 32),
        (18, 1024, 32), (20, 512, 16),
    ]:
        e = 1 << e_log
        src = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
        out = gather_dma(src, x, chunk, n_flight)  # compile
        out.block_until_ready()
        # slope timing across repeat counts cancels dispatch latency
        def run(k):
            t0 = time.time()
            r = None
            for _ in range(k):
                r = gather_dma(src, x, chunk, n_flight)
            np.asarray(r[:1, :1])  # real sync through the tunnel
            return time.time() - t0

        t_lo = min(run(2) for _ in range(3))
        t_hi = min(run(6) for _ in range(3))
        per_row = (t_hi - t_lo) / 4 / e
        print(
            f"E=2^{e_log} chunk={chunk} n_flight={n_flight}: "
            f"{per_row * 1e9:7.2f} ns/row "
            f"({e / ((t_hi - t_lo) / 4) / 1e6:8.1f} M rows/s; "
            f"XLA gather reference ~3.5 ns/row)"
        )


if __name__ == "__main__":
    main()
