"""Test configuration: force CPU with 8 virtual devices BEFORE jax init.

This is the standard JAX substitute for multi-chip testing without a real
cluster (SURVEY.md §4): sharding/mesh tests run against an 8-device CPU
mesh exactly as they would over a v5e-8 ICI mesh.

The environment may boot a real TPU backend at interpreter start (an
'axon' sitecustomize registers the PJRT plugin before any test code runs),
which in-process env changes cannot undo. In that case the whole pytest
run is re-executed once in a scrubbed child environment, with pytest's
global capture suspended so the child's output streams through.
"""

import os
import sys

_NEEDS_REEXEC = (
    os.environ.get("PALLAS_AXON_POOL_IPS") or os.environ.get("JAX_PLATFORMS") == "axon"
) and os.environ.get("_BASD_TEST_REEXEC") != "1"

if not _NEEDS_REEXEC:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ.setdefault("JAX_ENABLE_X64", "0")

import pytest  # noqa: E402


def pytest_configure(config):
    if not _NEEDS_REEXEC:
        return
    import subprocess

    env = dict(os.environ)
    env["_BASD_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    ret = subprocess.run([sys.executable, "-m", "pytest", *sys.argv[1:]], env=env)
    os._exit(ret.returncode)


@pytest.fixture(scope="session")
def devices8():
    import jax

    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs[:8]
