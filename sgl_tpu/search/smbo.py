"""Built-in multi-objective search drivers.

The reference depends on OpenBox's SMBO (``examples/test_nas.py:14-33``);
this environment has no OpenBox, so the same NAS loop runs on built-in
optimizers behind one interface:

* ``RandomSearch`` — Sobol-free uniform sampling (the baseline every SMBO
  paper compares to);
* ``EvolutionarySearch`` — regularized-evolution-style: mutate a random
  coordinate of a Pareto-front parent; empirically strong for small integer
  spaces like the 7-dim PaSca space.

Both track the Pareto front of the ``(-acc, time)`` objective pair, the same
multi-objective formulation as the reference (``search_config.py:46-48``).
``run_nas`` picks OpenBox automatically when importable.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import numpy as np

from sgl_tpu.search.search_config import ARCH_KEYS, ConfigManager


@dataclass
class Trial:
    config: Dict[str, int]
    objs: np.ndarray  # [-acc, time]
    elapsed: float


@dataclass
class History:
    trials: List[Trial] = field(default_factory=list)

    def add(self, config, objs, elapsed):
        self.trials.append(Trial(dict(config), np.asarray(objs), elapsed))

    def pareto_front(self) -> List[Trial]:
        front = []
        for t in self.trials:
            dominated = any(
                (o.objs <= t.objs).all() and (o.objs < t.objs).any()
                for o in self.trials
            )
            if not dominated:
                front.append(t)
        return front

    @property
    def best_accuracy_trial(self) -> Optional[Trial]:
        if not self.trials:
            return None
        return min(self.trials, key=lambda t: t.objs[0])

    def summary(self) -> str:
        best = self.best_accuracy_trial
        lines = [f"{len(self.trials)} trials, pareto front size {len(self.pareto_front())}"]
        if best is not None:
            lines.append(
                f"best acc {-best.objs[0]:.4f} (time {best.objs[1]:.3f}s) @ {best.config}"
            )
        return "\n".join(lines)


class RandomSearch:
    def __init__(self, configer: ConfigManager, seed: int = 0):
        self.configer = configer
        self.rng = np.random.default_rng(seed)

    def suggest(self, history: History) -> Dict[str, int]:
        return self.configer.sample(self.rng)


class EvolutionarySearch:
    """Mutate one coordinate of a random Pareto-front parent."""

    def __init__(self, configer: ConfigManager, seed: int = 0, init_random: int = 5):
        self.configer = configer
        self.rng = np.random.default_rng(seed)
        self.init_random = init_random

    def suggest(self, history: History) -> Dict[str, int]:
        if len(history.trials) < self.init_random:
            return self.configer.sample(self.rng)
        front = history.pareto_front()
        parent = front[int(self.rng.integers(len(front)))].config
        child = dict(parent)
        key = ARCH_KEYS[int(self.rng.integers(len(ARCH_KEYS)))]
        lo, hi = self.configer.ranges[key]
        child[key] = int(self.rng.integers(lo, hi + 1))
        return child


def run_sha(
    configer: ConfigManager,
    n_configs: int = 27,
    eta: int = 3,
    min_epochs: int = 10,
    seed: int = 0,
    verbose: bool = True,
    objective: Optional[Callable] = None,
) -> History:
    """Successive-halving NAS (beyond the reference, whose SMBO trains every
    sampled architecture at the full epoch budget).

    Rung 0 trains ``n_configs`` random architectures for ``min_epochs``
    epochs; each subsequent rung keeps the top ``1/eta`` by accuracy and
    multiplies the epoch budget by ``eta``.  Total compute is
    ``O(n_configs · min_epochs · log_eta(n_configs))`` — for equal wall
    clock this evaluates ~``eta×`` more architectures than flat search,
    which matters when each trial re-runs the SGAP precompute.

    ``objective(config, epochs=...)`` defaults to the configer's
    ``_configFunction`` with its epoch budget overridden per rung.
    """
    rng = np.random.default_rng(seed)
    if objective is None:
        def objective(config, epochs):
            saved = configer._epochs
            configer._epochs = epochs
            try:
                return configer._configFunction(config)
            finally:
                configer._epochs = saved

    history = History()
    configs = [configer.sample(rng) for _ in range(n_configs)]
    epochs = min_epochs
    rung = 0
    while configs:
        scored = []
        for config in configs:
            t0 = time.time()
            result = objective(config, epochs=epochs)
            elapsed = time.time() - t0
            history.add(config, result["objs"], elapsed)
            scored.append((result["objs"][0], config))
            if verbose:
                objs = history.trials[-1].objs
                print(
                    f"rung {rung} ({epochs} epochs): acc={-objs[0]:.4f} "
                    f"time={objs[1]:.3f}s config={config}"
                )
        if len(configs) == 1:
            break
        scored.sort(key=lambda t: t[0])  # objs[0] = -acc: best first
        configs = [c for _, c in scored[: max(len(configs) // eta, 1)]]
        epochs *= eta
        rung += 1
    return history


def run_nas(
    configer: ConfigManager,
    max_runs: int,
    optimizer: str = "auto",
    seed: int = 0,
    verbose: bool = True,
    objective: Optional[Callable] = None,
) -> History:
    """NAS driver: OpenBox SMBO when installed and requested, else built-ins.

    ``objective`` defaults to ``configer._configFunction``.
    """
    objective = objective or configer._configFunction
    if optimizer == "auto":
        try:
            import openbox  # noqa: F401

            optimizer = "openbox"
        except ImportError:
            optimizer = "evolution"

    if optimizer == "openbox":
        from openbox.optimizer.generic_smbo import SMBO  # type: ignore

        bo = SMBO(
            objective,
            configer._configSpace(),
            num_objs=2,
            num_constraints=0,
            max_runs=max_runs,
            surrogate_type="prf",
            acq_type="ehvi",
            acq_optimizer_type="local_random",
            initial_runs=2 * (len(ARCH_KEYS) + 1),
            init_strategy="sobol",
            ref_point=[-1, 0.00001],
            task_id="sgl_tpu_nas",
            random_state=seed,
        )
        return bo.run()

    sugg = (
        RandomSearch(configer, seed)
        if optimizer == "random"
        else EvolutionarySearch(configer, seed)
    )
    history = History()
    for i in range(max_runs):
        config = sugg.suggest(history)
        t0 = time.time()
        result = objective(config)
        history.add(config, result["objs"], time.time() - t0)
        if verbose:
            objs = history.trials[-1].objs
            print(
                f"trial {i + 1}/{max_runs}: acc={-objs[0]:.4f} "
                f"time={objs[1]:.3f}s config={config}"
            )
    return history
