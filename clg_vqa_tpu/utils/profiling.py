"""Profiling/observability — the aux subsystem the reference lacks
(SURVEY.md §5: tensorboardX scalars only). Provides:

 - ``trace(logdir)``: context manager around jax.profiler (XProf/TensorBoard
   trace of device execution)
 - ``StepTimer``: wall-clock step timing with warmup skipping + percentile
   summary
 - ``device_memory_stats()``: live HBM usage per device
"""
from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: list[float] = []
        self._n = 0
        self._t = None

    def __enter__(self):
        self._t = time.perf_counter()
        return self

    def __exit__(self, *a):
        dt = time.perf_counter() - self._t
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)

    def summary(self) -> dict:
        if not self.times:
            return {"n": 0}
        t = np.asarray(self.times)
        return {"n": len(t), "mean_ms": float(t.mean() * 1e3),
                "p50_ms": float(np.percentile(t, 50) * 1e3),
                "p95_ms": float(np.percentile(t, 95) * 1e3)}


def device_memory_stats() -> list[dict]:
    out = []
    for d in jax.devices():
        try:
            s = d.memory_stats()
            out.append({"device": str(d),
                        "bytes_in_use": s.get("bytes_in_use"),
                        "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                        "bytes_limit": s.get("bytes_limit")})
        except Exception:
            out.append({"device": str(d)})
    return out
