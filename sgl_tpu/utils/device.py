"""Device helpers — the analog of the reference's ``GpuWithMaxFreeMem``
(``sgl/utils/auto_choose_gpu.py:31``): pick a TPU device by free HBM."""

from __future__ import annotations

from typing import Optional

import jax


def device_with_max_free_mem() -> jax.Device:
    """Pick the device with the most free memory (falls back to device 0
    when memory stats are unavailable, e.g. on CPU)."""
    best, best_free = None, -1
    for d in jax.devices():
        try:
            stats = d.memory_stats()
            free = stats.get("bytes_limit", 0) - stats.get("bytes_in_use", 0)
        except Exception:
            free = 0
        if free > best_free:
            best, best_free = d, free
    return best or jax.devices()[0]


# reference-style alias
GpuWithMaxFreeMem = device_with_max_free_mem


def default_backend() -> str:
    return jax.default_backend()


def num_devices(platform: Optional[str] = None) -> int:
    return len(jax.devices(platform) if platform else jax.devices())
