"""Cross-trial propagation cache for NAS (beyond reference).

The reference re-runs the full SGAP precompute inside every NAS trial
(``sgl/search/auto_search.py:26`` called from the objective at
``sgl/search/search_config.py:42``): up to 3500 trials each pay a k-hop
SpMM over the whole graph, even though trials sharing a (graph-op type,
r, alpha) propagate the *same linear operator* and differ only in hop
count.  On TPU that redundancy is pure HBM/MXU waste, so the cache makes
propagation a search-wide resource:

* **Hop-prefix reuse** — ``A^k x`` for ``k <= K_cached`` is a slice of the
  cached ``(K_cached+1, N, D)`` stack.
* **Suffix extension** — deeper requests propagate from the cached last
  hop (linearity: ``A^(c+j) x = A^j (A^c x)``), so total SpMM work across
  an entire search equals ONE propagation at the deepest hop count
  requested per operator config.

Objective-time semantics: the NAS objective is ``(-acc, preprocess +
inference time)`` (``search_config.py:46-48``).  On a cache hit the
returned preprocess time is *estimated* as measured-seconds-per-hop ×
hops, so the time objective keeps ranking deeper architectures as more
expensive while the search loop itself skips the redundant recompute.

Memory: one ``(K_max+1, N, D)`` stack per distinct operator config.  For
searches over huge graphs cap it by passing ``max_entries`` or disable
via ``ConfigManager._setParameters(..., prop_cache=False)``.
"""

from __future__ import annotations

import copy
import hashlib
import time
import weakref
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _op_config_key(op) -> Tuple:
    """Scalar attributes of a graph op, excluding hop count (prop_steps
    does not change the operator, only how many times it is applied)."""
    items = []
    for k, v in sorted(vars(op).items()):
        if k == "prop_steps" or k.startswith("_"):
            continue
        if isinstance(v, (int, float, str, bool, type(None))):
            items.append((k, v))
        elif isinstance(v, (np.ndarray, jnp.ndarray)):
            # arrays hash by content: repr truncates beyond ~1000 elements,
            # so two large arrays differing only in the elided middle would
            # collide — the exact failure this guard exists to prevent
            a = np.asarray(v)
            digest = hashlib.sha1(np.ascontiguousarray(a).tobytes()).hexdigest()
            items.append((k, "ndarray", a.shape, str(a.dtype), digest))
        else:
            # other non-scalar config (list, callable, ...): repr-based
            # fallback so differently-configured ops never silently
            # collide (current ops only carry scalars; this is the guard)
            items.append((k, type(v).__name__, repr(v)))
    return (type(op).__name__, tuple(items))


class PropagationCache:
    """Shares k-hop propagation stacks across NAS trials.

    ``hops_for(graph, x, op, dtype)`` returns ``(hops, est_seconds)``
    where ``hops`` is the ``(op.prop_steps+1, N, D)`` stack bit-identical
    to ``op.propagate(graph, x)`` and ``est_seconds`` is the amortized
    preprocess-time estimate for the NAS objective.
    """

    def __init__(self, max_entries: int = 8):
        self._entries: Dict[Tuple, Dict[str, Any]] = {}
        self._max_entries = max_entries
        # stats (exposed for tests / logging)
        self.hits = 0
        self.misses = 0
        self.hops_computed = 0

    def _key(self, graph, x, op, dtype) -> Tuple:
        # x identity is part of the key: SGAPModel.preprocess exposes a
        # public x= argument, so two calls on the same graph may propagate
        # different feature matrices
        return (
            id(graph), id(x), _op_config_key(op),
            jnp.dtype(dtype or jnp.float32).name,
        )

    def hops_for(
        self, graph, x, op, dtype=None
    ) -> Tuple[jnp.ndarray, float]:
        k = op.prop_steps
        key = self._key(graph, x, op, dtype)
        ent = self._entries.get(key)
        if ent is not None and (
            ent["graph_ref"]() is not graph or ent["x"] is not x
        ):
            # id() was recycled after the old graph/x died — stale entry
            del self._entries[key]
            ent = None

        if ent is None:
            self.misses += 1
            xj = jnp.asarray(x, dtype) if dtype is not None else x
            t0 = time.time()
            hops = op.propagate(graph, xj)
            jax.block_until_ready(hops)
            elapsed = time.time() - t0
            self.hops_computed += k
            if len(self._entries) >= self._max_entries:
                self._entries.pop(next(iter(self._entries)))
            # keep a copy of the op so its normalized-adjacency cache is
            # reused by later suffix extensions (adj is prop_steps-free)
            self._entries[key] = {
                "graph_ref": weakref.ref(graph),
                # strong ref: guards id-recycling for x (jax arrays don't
                # reliably support weakref) and costs no more than one
                # cached hop slice
                "x": x,
                "op": copy.copy(op),
                "hops": hops,
                "per_hop_s": elapsed / max(k, 1),
            }
            return hops, elapsed

        self.hits += 1
        cached: jnp.ndarray = ent["hops"]
        k_cached = int(cached.shape[0]) - 1
        if k <= k_cached:
            return cached[: k + 1], ent["per_hop_s"] * k

        # extend from the cached deepest hop; drop the extension's hop 0
        # (it IS the cached last hop)
        ext = copy.copy(ent["op"])
        ext.prop_steps = k - k_cached
        t0 = time.time()
        more = ext.propagate(graph, cached[-1])
        jax.block_until_ready(more)
        elapsed = time.time() - t0
        self.hops_computed += k - k_cached
        hops = jnp.concatenate([cached, more[1:]], axis=0)
        ent["op"] = ext  # now holds a warm adjacency cache
        ent["hops"] = hops
        ent["per_hop_s"] = (
            ent["per_hop_s"] * k_cached + elapsed
        ) / k  # blend old + new measurements
        return hops, ent["per_hop_s"] * k
