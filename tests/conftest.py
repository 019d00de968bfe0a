"""
Test configuration: force the JAX CPU backend with 8 virtual devices so that
multi-chip sharding paths compile and execute hermetically without TPU hardware.
Must run before the first `import jax` anywhere in the test session.
"""
import os
import sys

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_PLATFORMS', 'cpu')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The environment may pre-register an accelerator platform (e.g. a tunneled TPU)
# via sitecustomize; force the CPU backend explicitly so tests are hermetic and the
# 8-device virtual mesh is available.
jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
