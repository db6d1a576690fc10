"""Root conftest: force the CPU backend with 8 virtual devices BEFORE any
backend is initialized. Tests validate multi-chip sharding on the virtual
mesh; TPU execution is exercised by bench.py / __graft_entry__.py.

Note: this image's sitecustomize imports jax and registers the 'axon' TPU
plugin at interpreter startup, so plain env vars are too late — we must go
through jax.config (safe as long as no backend has been initialized yet).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
