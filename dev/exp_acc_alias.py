"""Probe: input_output_aliases index convention under PrefetchScalarGridSpec.

A tiny accumulate-into-output kernel: out block = acc block + sum of chunk
contributions.  We try aliasing with the acc operand indexed both WITH and
WITHOUT counting the scalar-prefetch args, and report which convention the
current JAX accepts / computes correctly (interpret mode on CPU; re-run on
chip without --interpret for the lowered path).
"""
import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(ct_ref, off_ref, dst_ref, hi_ref, acc_ref, out_ref):
    c = pl.program_id(0)
    tile = ct_ref[c]
    is_first = jnp.logical_or(c == 0, ct_ref[jnp.maximum(c - 1, 0)] != tile)

    @pl.when(is_first)
    def _():
        out_ref[:] = acc_ref[:]

    chunk = dst_ref.shape[-1]
    tile_r = out_ref.shape[0]
    local = dst_ref[0] - tile * tile_r
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_r, chunk), 0)
    onehot = (local == rows).astype(jnp.bfloat16)
    out_ref[:] += jax.lax.dot_general(
        onehot, hi_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("interpret", "alias_idx"))
def run(ct, off, dst3, hi3, acc, interpret=True, alias_idx=4):
    n_chunks, _, chunk = dst3.shape
    d = hi3.shape[-1]
    tile_r = 128
    msg_spec = pl.BlockSpec((1, chunk, d), lambda c, ct, off: (c, 0, 0))
    out_map = lambda c, ct, off: (ct[c] + off[0], 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 1, chunk), lambda c, ct, off: (c, 0, 0)),
            msg_spec,
            pl.BlockSpec((tile_r, d), out_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, d), out_map, memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(acc.shape, jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        input_output_aliases={alias_idx: 0},
    )(ct, off, dst3, hi3, acc)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-interpret", action="store_true")
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    chunk, d, n_chunks, n_tiles = 64, 128, 6, 3
    total_tiles = 8
    ct = jnp.asarray(np.sort(rng.integers(0, n_tiles, n_chunks)).astype(np.int32))
    dst = rng.integers(0, 128, (n_chunks, 1, chunk)).astype(np.int32)
    dst = dst + np.asarray(ct)[:, None, None] * 128
    hi = rng.normal(size=(n_chunks, chunk, d)).astype(np.float32).astype(jnp.bfloat16)
    acc = rng.normal(size=(total_tiles * 128, d)).astype(np.float32)
    off = jnp.asarray([2], jnp.int32)

    expect = acc.copy()
    for c in range(n_chunks):
        for e in range(chunk):
            expect[int(dst[c, 0, e]) + 2 * 128] += np.asarray(
                hi[c, e], np.float32
            )

    for alias_idx in (4, 2):
        try:
            y = np.asarray(
                run(ct, off, jnp.asarray(dst), hi, jnp.asarray(acc),
                    interpret=not args.no_interpret, alias_idx=alias_idx)
            )
            err = np.abs(y - expect).max() / (np.abs(expect).max() + 1e-9)
            print(f"alias_idx={alias_idx}: rel_err={err:.2e} "
                  f"{'OK' if err < 5e-2 else 'WRONG'}")
        except Exception as e:  # noqa: BLE001
            print(f"alias_idx={alias_idx}: FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
