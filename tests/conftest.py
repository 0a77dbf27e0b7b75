"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The axon TPU plugin in this image ignores the JAX_PLATFORMS environment
variable, so forcing CPU requires jax.config.update after import. Without
this, every tiny test op round-trips through the TPU tunnel (~seconds each).
Multi-chip sharding tests use the 8 virtual CPU devices; the driver's dryrun
validates the same code path.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
# Deterministic, fp32 matmuls on CPU for parity tests.
os.environ.setdefault('JAX_DEFAULT_MATMUL_PRECISION', 'float32')

import jax

jax.config.update('jax_platforms', 'cpu')
