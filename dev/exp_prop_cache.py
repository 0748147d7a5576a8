"""Measure the NAS propagation-cache win on the chip (VERDICT r2 next #7).

A 20-trial random search (identical trial sequence with and without the
cache — RandomSearch ignores history, so the comparison is controlled)
over a power-law graph large enough that per-trial propagation is real
work.  The reference recomputes the full SGAP precompute inside every
trial (``sgl/search/auto_search.py:26``); ``search/prop_cache.py`` shares
hop stacks across trials (prefix slice + suffix extension), so the total
SpMM work across the search collapses to one propagation at the deepest
requested hop count per operator config.

Run on the TPU (default env, nothing else running):

    python dev/exp_prop_cache.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class _DuckDS:
    """Minimal dataset view over a synthetic Graph (random split)."""

    def __init__(self, g, seed=0, train=0.6, val=0.2):
        rng = np.random.default_rng(seed)
        n = g.num_nodes
        perm = rng.permutation(n)
        n_tr, n_va = int(n * train), int(n * val)
        self.graph = g
        self.x = g.x
        self.y = g.y
        self.train_idx = perm[:n_tr]
        self.val_idx = perm[n_tr:n_tr + n_va]
        self.test_idx = perm[n_tr + n_va:]
        self.num_features = g.num_features
        self.num_classes = g.num_classes
        self.num_node = n


def main(cache_on: bool, n=200_000, deg=15, d=64, trials=20, seed=0):
    """One NAS run (fresh process per configuration — jit caches warm up
    in-process, so ON-after-OFF in one process flatters the cache; run

        SGL_TPU_COMPILE_CACHE=0 python dev/exp_prop_cache.py --cache off
        SGL_TPU_COMPILE_CACHE=0 python dev/exp_prop_cache.py --cache on

    with the persistent compile cache disabled for the controlled pair,
    and repeat WITH the compile cache to measure its own win)."""
    from sgl_tpu.datasets.synthetic import random_power_law_graph
    from sgl_tpu.search.search_config import ConfigManager
    from sgl_tpu.search.smbo import run_nas

    g = random_power_law_graph(n, deg, d, num_classes=16, seed=0)
    ds = _DuckDS(g)
    print(f"graph: {g.num_nodes} nodes, {g.num_edges} edges, d={d}")

    cm = ConfigManager(arch=[3, 1, 0, 2, 0, 0, 0])
    cm._setParameters(
        ds, None, 64, epochs=5, lr=0.01, wd=5e-5, restarts=1,
        prop_cache=cache_on,
    )
    t0 = time.time()
    hist = run_nas(cm, max_runs=trials, optimizer="random", seed=seed,
                   verbose=False)
    dt = time.time() - t0
    pre_hops = sum(t.config["prop_steps"] for t in hist.trials)
    best = hist.best_accuracy_trial
    if cache_on:
        computed = cm._prop_cache.hops_computed
        extra = (
            f"hits {cm._prop_cache.hits}, misses {cm._prop_cache.misses}"
        )
    else:
        computed = pre_hops
        extra = "one full propagate per trial"
    print(
        f"RESULT cache={'on' if cache_on else 'off'} wall_s={dt:.1f} "
        f"pre_hops_requested={pre_hops} spmm_hops_computed={computed} "
        f"best_acc={-float(best.objs[0]):.4f} ({extra})"
    )


if __name__ == "__main__":
    on = "on" in sys.argv[sys.argv.index("--cache") + 1] if "--cache" in sys.argv else True
    n_trials = (
        int(sys.argv[sys.argv.index("--trials") + 1])
        if "--trials" in sys.argv
        else 20
    )
    main(cache_on=on, trials=n_trials)
