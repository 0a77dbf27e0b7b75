"""Backend detection shared by the Pallas ops.

Every TPU kernel in this package falls back to interpret mode when the
default backend is not a TPU (slow but correct — the CPU test suite
depends on it); this is the one place that check lives.
"""

import jax


def on_tpu() -> bool:
    try:
        return jax.default_backend() == 'tpu'
    except Exception:  # pragma: no cover
        return False
