"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding paths are exercised on a virtual CPU mesh
(xla_force_host_platform_device_count), as real multi-chip TPU hardware is
not available in CI.  Must run before any JAX computation.
"""

import os

os.environ['XLA_FLAGS'] = (
    os.environ.get('XLA_FLAGS', '')
    + ' --xla_force_host_platform_device_count=8'
)

import jax

jax.config.update('jax_platforms', 'cpu')
# allow float64 in numerical-accuracy tests (framework default stays fp32)
jax.config.update('jax_enable_x64', True)
