"""Profiling / observability utilities.

The reference's tracing is ad-hoc (`@time_cost` decorator, Time_counter FPS
meter, MemTracker — SURVEY.md §5). TPU-native equivalents here:
- `device_timer`: wall-time of jitted calls with a checksum-forced barrier
  (block_until_ready alone is not reliable on remote-tunneled platforms)
- `trace_to`: context manager around jax.profiler for xprof traces
- `FpsMeter`: streaming FPS/latency meter for host loops
- `log_compile_time`: one-shot compile-vs-steady diagnostic
- `device_memory_stats`: per-device HBM usage
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def force(x) -> float:
    """Barrier that provably completes device work: tiny host fetch of a
    checksum over the output pytree."""
    leaves = [l for l in jax.tree_util.tree_leaves(x)
              if hasattr(l, "dtype")]
    s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
    return float(s)


def device_timer(fn: Callable, *args, iters: int = 10,
                 warmup: int = 2) -> Dict[str, float]:
    for _ in range(warmup):
        force(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        force(fn(*args))
        times.append(time.perf_counter() - t0)
    t = np.asarray(times)
    return {"p50_ms": float(np.median(t) * 1e3),
            "mean_ms": float(t.mean() * 1e3),
            "p90_ms": float(np.percentile(t, 90) * 1e3)}


@contextlib.contextmanager
def trace_to(log_dir: str):
    """jax.profiler trace (view with xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class FpsMeter:
    """Streaming FPS meter (reference Time_counter,
    `romp/lib/utils/demo_utils.py:73`)."""

    def __init__(self, window: int = 100):
        self.window = window
        self._stamps: List[float] = []

    def tick(self):
        self._stamps.append(time.perf_counter())
        if len(self._stamps) > self.window:
            self._stamps.pop(0)

    @property
    def fps(self) -> float:
        if len(self._stamps) < 2:
            return 0.0
        dt = self._stamps[-1] - self._stamps[0]
        return (len(self._stamps) - 1) / dt if dt > 0 else 0.0


def log_compile_time(fn: Callable, *args) -> Dict[str, float]:
    t0 = time.perf_counter()
    force(fn(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    force(fn(*args))
    steady_s = time.perf_counter() - t0
    return {"compile_s": compile_s, "steady_ms": steady_s * 1e3}


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    out = {}
    for d in jax.devices():
        try:
            ms = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use_mb": ms.get("bytes_in_use", 0) / 2**20,
                "peak_bytes_mb": ms.get("peak_bytes_in_use", 0) / 2**20,
            }
        except Exception:
            out[str(d)] = {}
    return out


def init_seeds(seed: int):
    """Determinism controls (reference init_seeds,
    `romp/lib/utils/train_utils.py:220`): numpy + a returned JAX key (JAX
    RNG is explicitly keyed; XLA:TPU is deterministic by default)."""
    np.random.seed(seed)
    import random

    random.seed(seed)
    return jax.random.PRNGKey(seed)
