"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Environment must be set before jax is imported anywhere, so this lives at the
top of conftest. Multi-chip sharding tests use the 8 virtual CPU devices; the
driver's dryrun validates the same code path.
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
# Deterministic, fp32 matmuls on CPU for parity tests.
os.environ.setdefault('JAX_DEFAULT_MATMUL_PRECISION', 'float32')
