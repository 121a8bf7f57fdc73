"""Shared helpers for forcing the CPU backend in scripts/tests."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "/root/repo/.jax_cache") -> None:
    """Enable JAX's persistent compilation cache.

    Essential on axon-tunneled TPUs: remote compiles take minutes, cache
    hits milliseconds. Call before any jit compilation.
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


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
