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
