"""Hermetic test configuration.

Tests run on CPU with 8 virtual devices so mesh/sharding tests exercise real
multi-device SPMD partitioning without TPU hardware (the "fake backend" tier
the reference lacks — SURVEY.md §4). The runtime ``jax_platforms`` update
overrides any TPU/axon plugin the host environment auto-registers at
interpreter startup.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective" not in flags:
    # 8 virtual device threads on a small host can legitimately take longer
    # than XLA:CPU's default 40 s rendezvous termination timeout (each
    # "device" runs sequentially on the same cores); the default aborts the
    # whole process (F rendezvous.cc:127 "Exiting to ensure a consistent
    # program state"). Raise both rendezvous timeouts for the hermetic suite.
    flags += (
        " --xla_cpu_collective_timeout_seconds=600"
        " --xla_cpu_collective_call_terminate_timeout_seconds=600"
    )
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8


import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled-program memory between test modules.

    The suite compiles hundreds of programs in one process; on small hosts
    the accumulated executables have intermittently crashed the XLA CPU
    client late in the run. Clearing per module keeps the high-water mark
    bounded (each module recompiles only its own programs).
    """
    yield
    jax.clear_caches()
    gc.collect()
