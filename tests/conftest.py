"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (the way the reference's proptests
sweep ``num_threads``, reference README.md:146-155): real TPU hardware is
reserved for bench runs. This must run before any JAX backend
initialization — the axon sitecustomize forces ``jax_platforms="axon,cpu"``,
so we override via jax.config, not env vars.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert devs[0].platform == "cpu"
    return devs
