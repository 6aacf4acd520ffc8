"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding (corona13_tpu.parallel) is validated on host devices;
the driver separately dry-run-compiles the multi-chip path and benchmarks
on real TPU hardware.
"""

import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
# drop the axon TPU plugin from the import path entirely: when the device
# tunnel is wedged, even plugin *discovery* blocks forever, freezing
# CPU-only test runs
sys.path[:] = [p for p in sys.path if '.axon_site' not in p]
os.environ['PYTHONPATH'] = ':'.join(
    p for p in os.environ.get('PYTHONPATH', '').split(':')
    if '.axon_site' not in p)
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# the axon TPU plugin registers itself regardless of JAX_PLATFORMS; pin the
# default device to host CPU so tests never go through the device tunnel
try:
    jax.config.update('jax_default_device', jax.devices('cpu')[0])
except RuntimeError:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope='session')
def cornell():
    from corona13_tpu import testing
    return testing.cornell_scene(sphere='diffuse')


@pytest.fixture(scope='session')
def cornell_dielectric():
    from corona13_tpu import testing
    return testing.cornell_scene(sphere='dielectric')
