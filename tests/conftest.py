"""Test harness: run the suite on an 8-device virtual CPU platform so
sharding/pjit paths are exercised without TPU hardware (SURVEY.md §4).

The ambient environment (PYTHONPATH=/root/.axon_site) installs a
sitecustomize that registers a remote-TPU "axon" JAX backend at
interpreter start and monkeypatches backend selection, so mutating
JAX_PLATFORMS here (after interpreter start) is silently ignored and the
suite would land on the real TPU. The only robust fix is to re-exec
pytest in a sanitized environment before jax is imported. The exec
happens in pytest_configure with global capture stopped, so the child's
output reaches the real stdout.

Set MTT_TEST_TPU=1 to intentionally run on the ambient (TPU) backend —
then only tests marked ``@pytest.mark.tpu`` run; on CPU those are
skipped.
"""

import os
import sys

import pytest

_ON_TPU = os.environ.get("MTT_TEST_TPU") == "1"


def pytest_configure(config):
    if _ON_TPU or os.environ.get("MTT_TEST_SANITIZED") == "1":
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    env = dict(os.environ)
    env["MTT_TEST_SANITIZED"] = "1"
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("JAX_PLATFORM_NAME", None)
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest", *sys.argv[1:]], env)


def pytest_report_header(config):
    import jax
    # persistent compile cache: the suite is dominated by XLA CPU compiles
    # of repeated tiny models; cache hits cut the wall time across runs
    from mtt_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    return (f"jax backend: {jax.default_backend()} "
            f"({len(jax.devices())} devices)"
            + (" [TPU hardware run]" if _ON_TPU else " [sanitized CPU]"))


def pytest_collection_modifyitems(config, items):
    if _ON_TPU:
        skip = pytest.mark.skip(
            reason="non-TPU test skipped in MTT_TEST_TPU=1 hardware run")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = pytest.mark.skip(
            reason="requires TPU hardware (run with MTT_TEST_TPU=1)")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)
