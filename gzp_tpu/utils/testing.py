"""Shared helpers for forcing the CPU backend in scripts/tests."""

from __future__ import annotations

import os


def force_cpu_backend(num_devices: int = 8) -> None:
    """Force JAX onto ``num_devices`` virtual CPU devices.

    Must be called before the first JAX backend initialization. Overrides
    the axon sitecustomize's ``jax_platforms="axon,cpu"`` selection.
    """
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={num_devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
