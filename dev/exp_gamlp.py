"""Scratch experiment: GAMLP full-batch train-step variants (not packaged).

Run ALONE on the real chip:  timeout 900 python dev/exp_gamlp.py
Uses the interleaved min-slope methodology from dev/exp_spmm.py.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sync(out):
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    import jax.numpy as jnp

    return float(jnp.ravel(leaves[0])[0])


def timed(fn, iters=2, reduce=np.min):
    _sync(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn())
        ts.append(time.perf_counter() - t0)
    return float(reduce(ts))


def main():
    import jax
    import jax.numpy as jnp

    from sgl_tpu.datasets.synthetic import random_power_law_graph
    from sgl_tpu.models.homo import GAMLP
    from sgl_tpu.tasks.utils import (
        TrainState,
        adam_l2,
        init_train_state,
        weighted_cross_entropy,
    )

    log("devices:", jax.devices())
    n, d, classes, hops = 100_000, 128, 64, 3
    g = random_power_law_graph(n, 20, d, num_classes=classes, seed=1)
    labels = jnp.asarray(np.asarray(g.y), jnp.int32)
    w = jnp.ones(n, jnp.float32)
    idx = jnp.arange(n)
    rng = jax.random.PRNGKey(0)
    tx = adam_l2(0.1, 5e-5)

    def build(compute_dtype, dropout=0.5, rbg=False, node_major=True):
        from sgl_tpu.models.base import SGAPNet

        model = GAMLP(
            hops, d, classes, hidden_dim=512, num_layers=3,
            compute_dtype=compute_dtype, dropout=dropout,
        )
        model.node_major = node_major
        model.preprocess(g, g.x)
        params = model.init(rng, idx[:2])
        r = jax.random.key(0, impl="rbg") if rbg else rng  # typed key keeps impl
        state = init_train_state(r, params, tx)
        net = model.net
        feats = model.batch_input(idx)
        return net, state, feats

    def make_step(net, donate):
        def step(state, feats, labels, w):
            rng, dropout_rng = jax.random.split(state.rng)

            def objective(params):
                logits = net.apply(
                    params, feats, train=True, rngs={"dropout": dropout_rng}
                )
                return weighted_cross_entropy(logits, labels, w)

            loss, grads = jax.value_and_grad(objective)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = __import__("optax").apply_updates(state.params, updates)
            return TrainState(params, opt_state, rng), loss

        return jax.jit(step, donate_argnums=(0,) if donate else ())

    def make_fwd(net):
        @jax.jit
        def fwd(params, feats):
            return net.apply(params, feats, train=False)

        return fwd

    cases = {}
    for name, dt in [("f32", None), ("bf16", jnp.bfloat16)]:
        net, state, feats = build(dt, rbg=True, node_major=True)
        cases[f"step/{name}+nm"] = ("step", make_step(net, False), state, feats)
        cases[f"fwd/{name}+nm"] = ("fwd", make_fwd(net), state, feats)
        net, state, feats = build(dt, rbg=True, node_major=False)
        cases[f"step/{name}+hm"] = ("step", make_step(net, False), state, feats)
        cases[f"fwd/{name}+hm"] = ("fwd", make_fwd(net), state, feats)

    def runner(kind, fn, state, feats, k):
        if kind == "step":
            def run():
                s = state
                loss = None
                for _ in range(k):
                    s, loss = fn(s, feats, labels, w)
                return loss
            return run
        def run():
            out = None
            for _ in range(k):
                out = fn(state.params, feats)
            return out
        return run

    k1, k2 = 4, 12
    best = {name: np.inf for name in cases}
    for rnd in range(3):
        for name, (kind, fn, state, feats) in cases.items():
            t1 = timed(runner(kind, fn, state, feats, k1))
            t2 = timed(runner(kind, fn, state, feats, k2))
            best[name] = min(best[name], (t2 - t1) / (k2 - k1))
        log(f"-- round {rnd} done")
    for name, per in best.items():
        if np.isfinite(per):
            log(f"{name}: {per*1e3:.2f} ms -> {1/per:.1f} it/s")


if __name__ == "__main__":
    main()
