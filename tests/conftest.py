"""Test harness: force an 8-device virtual CPU platform so sharding/pjit
paths are exercised without TPU hardware (SURVEY.md §4).

The ambient environment pins JAX_PLATFORMS=axon (remote TPU tunnel); tests
must override it unconditionally — this file is imported before any test
module imports jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
