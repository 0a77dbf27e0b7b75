"""Profiling and timing helpers (the reference has none; SURVEY §5).

Use `trace(logdir)` around a training/inference region to capture a
TensorBoard-viewable XLA trace, and `Timer` for block_until_ready-accurate
wall timings.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context; view with TensorBoard's profile plugin."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer that forces device completion via host transfer.

    On the tunneled axon TPU platform, block_until_ready may return before
    execution completes; converting (a small slice of) the result to numpy
    is the reliable sync.
    """

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def measure(self, sync_value=None):
        t0 = time.time()
        yield
        if sync_value is not None:
            np.asarray(jax.tree.leaves(sync_value)[0]).ravel()[:1]
        self.times.append(time.time() - t0)

    @property
    def best(self) -> float:
        return min(self.times)

    @property
    def mean(self) -> float:
        return float(np.mean(self.times))


def benchmark(fn: Callable, *args, warmup: int = 1, iters: int = 3) -> dict:
    """Run fn (returning jax arrays) with warmup; report wall stats."""
    for _ in range(warmup):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
    times = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        times.append(time.time() - t0)
    return {'best_s': min(times), 'mean_s': float(np.mean(times)),
            'times': times}


def enable_compilation_cache(path: Optional[str] = None) -> None:
    """Persist XLA compilations across processes.

    Decode/train programs here compile in tens of seconds; the cache makes
    every run after the first start instantly. Safe to call repeatedly.
    """
    import os
    if path is None:
        path = os.path.join(os.path.expanduser('~'), '.cache',
                            'mr_mt3_tpu', 'xla')
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass


def honor_platform_env() -> None:
    """Apply JAX_PLATFORMS from the environment via jax.config.

    The axon TPU plugin in this image ignores the JAX_PLATFORMS env var
    (tests/conftest.py documents the same workaround), so a CLI launched
    with JAX_PLATFORMS=cpu would still tunnel to the TPU. Calling this
    before any backend-initializing work makes the env var authoritative.
    """
    import os
    platforms = os.environ.get('JAX_PLATFORMS', '').strip()
    if platforms:
        try:
            jax.config.update('jax_platforms', platforms)
        except Exception:
            pass
