"""Persistent XLA compilation cache.

NAS wall-clock in this framework is dominated by jit compiles, not
propagation: a 20-trial search over the 7-int arch space compiles a fresh
train/eval/logits program for every distinct (prop_steps, message op,
num_layers) shape — measured ~54 min for 20 trials on the dev chip where
total SpMM work is ~6 s (dev/exp_prop_cache.py).  The reference has no
analog (torch eager pays no compile).  Enabling JAX's persistent cache
makes every repeated architecture — across trials AND processes — load
its executable from disk instead of recompiling.

Enabled automatically on import of ``sgl_tpu`` unless
``SGL_TPU_COMPILE_CACHE=0``; set ``SGL_TPU_COMPILE_CACHE=<dir>`` to
choose the location (default ``~/.cache/sgl_tpu/xla``).
"""

from __future__ import annotations

import hashlib
import os


def _host_fingerprint() -> str:
    """Short digest of the host CPU's feature set.

    XLA:CPU persists AOT-compiled code whose cache key does NOT include
    the compiling machine's CPU features — a cache written on an
    AVX-512/AMX host and read on a lesser one loads with
    "Machine type ... doesn't match" errors and can SIGILL (observed in
    this repo's CI environment, where the home directory travels across
    heterogeneous hosts).  Scoping the cache directory by a feature
    digest makes cross-machine reuse structurally impossible."""
    try:
        import platform

        bits = platform.machine()
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith("flags"):
                        bits += " " + " ".join(sorted(line.split()[2:]))
                        break
        except OSError:
            pass
        return hashlib.sha1(bits.encode()).hexdigest()[:10]
    except Exception:
        return "unknown"


_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "sgl_tpu", "xla-" + _host_fingerprint()
)


def enable_compilation_cache(cache_dir: str | None = None) -> bool:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Safe to call before or after other jax imports (config keys exist
    since jax 0.4.x); returns False when disabled via env or on any
    error (old jax, read-only filesystem) — never raises."""
    env = os.environ.get("SGL_TPU_COMPILE_CACHE", "")
    if env == "0":
        return False
    cache_dir = cache_dir or (env if env not in ("", "1") else _DEFAULT_DIR)
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache even fast compiles: NAS fans over many small programs
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception:
        return False
