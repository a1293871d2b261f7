"""Profiling and device telemetry.

Replaces the reference's observability gaps (SURVEY.md §5): hand-rolled
wall-clock timers only, NVML VRAM polling commented out
(``utils_smi.py``, call sites ``main.py:114``), no torch.profiler.

- :class:`DeviceMemory` — the ``NVIDIA_SMI`` equivalent over
  ``jax.local_devices()[i].memory_stats()`` (HBM bytes in use / limit).
- :func:`trace` — context manager around ``jax.profiler`` trace capture
  (view with TensorBoard / xprof).
- :class:`StepTimer` — per-step wall timing with a *real* device fence: on
  tunneled TPU transports, ``block_until_ready`` acks at enqueue, so the
  fence reads one scalar from the device (D2H) instead.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax
import numpy as np


class DeviceMemory:
    """HBM telemetry per device (the reference's ``NVIDIA_SMI`` surface:
    total / used / free, in GB)."""

    def __init__(self, device_id: int = 0) -> None:
        self.device = jax.local_devices()[device_id]

    def stats(self) -> Dict[str, float]:
        stats = self.device.memory_stats() or {}
        limit = stats.get("bytes_limit", 0)
        used = stats.get("bytes_in_use", 0)
        gb = 1024 ** 3
        return {
            "total_gb": limit / gb,
            "used_gb": used / gb,
            "free_gb": max(limit - used, 0) / gb,
            "peak_gb": stats.get("peak_bytes_in_use", 0) / gb,
        }

    def get_str(self) -> str:
        s = self.stats()
        return (f"hbm[{s['used_gb']:.2f}/{s['total_gb']:.2f}GB "
                f"peak {s['peak_gb']:.2f}GB]")


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/vitx_trace") -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def fence(x) -> None:
    """Force completion of device work feeding ``x`` via a D2H read."""
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if hasattr(leaf, "ravel")
                              else leaf))


class StepTimer:
    """Rolling step timer with device fencing; reports steps/s and ms/step."""

    def __init__(self, window: int = 50) -> None:
        self.window = window
        self.times: list = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, fence_on=None) -> float:
        if fence_on is not None:
            fence(fence_on)
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    @property
    def ms_per_step(self) -> float:
        return 1e3 * float(np.median(self.times)) if self.times else 0.0

    def get_str(self) -> str:
        return f"step[{self.ms_per_step:.1f}ms]"
