"""Shared helpers for the benchmark scripts (bench.py, benchmarks/*).

Timing on the tunneled axon TPU has two traps these helpers encode:
  * model.init on device costs tens of seconds — zero-init the parameter
    pytree from eval_shape instead (zero weights also make argmax emit a
    non-EOS token forever = exact worst-case decode length);
  * block_until_ready can return early on this platform — sync by pulling
    a leaf to the host.
"""

from __future__ import annotations

import time

import numpy as np


def zero_variables(model):
    """Zero parameter pytree for `model` without touching the device."""
    import jax
    import jax.numpy as jnp

    from mr_mt3_tpu.utils.builders import param_shapes
    return {'params': jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                                   param_shapes(model))}


def time_best(fn, make_args, reps: int = 3) -> float:
    """Best-of-reps wall time of fn(*make_args()), host-transfer synced."""
    return time_stats(fn, make_args, reps=reps)['min']


def time_stats(fn, make_args, reps: int = 3) -> dict:
    """Wall-time stats of fn(*make_args()) over reps runs, host-synced.

    The shared TPU tunnel shows ~15% run-to-run variance (PERF.md), so a
    single best-of-N hides regressions; the median with a recorded spread
    makes rounds comparable. Returns {'median','min','max','spread','reps'}
    where spread = (max - min) / median.
    """
    import jax
    args = make_args()
    np.asarray(jax.tree.leaves(fn(*args))[0])  # compile + first exec
    times = []
    for _ in range(reps):
        args = make_args()
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        times.append(time.time() - t0)
    med = float(np.median(times))
    return {'median': med, 'min': float(min(times)),
            'max': float(max(times)),
            'spread': float((max(times) - min(times)) / med) if med else 0.0,
            'reps': reps}


def time_stats_stable(fn, make_args, reps: int = 3,
                      spread_target: float = 0.05,
                      max_reps: int = 24) -> dict:
    """time_stats with one adaptive retry when the spread is noisy.

    The tunnel's tail latencies occasionally contaminate a small sample
    (BENCH_r04 recorded 12.45% spread at n=6 on one tier); when the
    first sample's spread exceeds spread_target, re-measure once with
    double the reps (capped at max_reps) and report whichever sample has
    the smaller spread, with 'total_reps' recording the full cost."""
    stats = time_stats(fn, make_args, reps=reps)
    total = reps
    if stats['spread'] > spread_target and reps < max_reps:
        retry = time_stats(fn, make_args, reps=min(2 * reps, max_reps))
        total += retry['reps']
        if retry['spread'] < stats['spread']:
            stats = retry
    stats['total_reps'] = total
    return stats
