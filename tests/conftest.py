"""Test configuration: run everything on a virtual 8-device CPU mesh.

A site .pth pre-imports jaxlib at interpreter startup, so jax's config
snapshots JAX_PLATFORMS (=axon, the TPU tunnel) from the shell before any
test code runs; mutating os.environ is too late.  jax.config.update works
any time before backend init.  XLA_FLAGS is read at backend creation, so
the env route still works for the device count.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
