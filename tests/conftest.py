"""Test configuration: force an 8-virtual-device CPU mesh before jax inits.

The container's sitecustomize pins JAX_PLATFORMS=axon (the real TPU tunnel);
tests run on CPU with 8 virtual devices so sharding paths are exercised
without hardware.  This must execute before any jax backend initialization.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import modimizer_tpu  # noqa: E402,F401  (enables x64)
