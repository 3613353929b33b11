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
# Tests must NOT share the repo's persistent compilation cache: XLA:CPU
# AOT entries are machine-feature-specific, and entries written by a
# different host (the repo cache survives across rounds/machines) load
# with "machine type doesn't match" warnings and can miscompute
# (observed: +prefer-no-gather mismatch flipping a parity test).  Use a
# per-boot /tmp cache instead — same-session reruns stay warm, nothing
# leaks across machines, and the TPU's .jax_cache is never touched by
# pytest.
os.environ.setdefault("MYSLAM_JAX_CACHE", "/tmp/myslam_jax_cache_cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
