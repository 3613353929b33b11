"""myslam_tpu: a TPU-native dense RGB-D SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of ESLAM
(reference: /root/reference, Apache-2.0): joint neural tracking + mapping
over a tri-plane signed-distance-field scene representation, with
volumetric SDF rendering, windowed bundle adjustment, mesh extraction and
full evaluation tooling.

Design stance (not a port):
  * Functional state: the scene map, poses and optimizer states are pytrees
    threaded through jitted step functions (no shared-memory processes).
  * Static shapes everywhere: ray batches are masked, never filtered.
  * Optimization loops run as lax.scan inside a single jit per frame.
  * Scale-out via jax.sharding.Mesh + shard_map (ray-batch data parallelism
    with psum of map gradients; plane atlases replicated or spatially
    sharded).
"""

import jax as _jax

# Camera/pose math must not silently round through bf16 on the MXU; the
# framework's matmuls are tiny (16-wide decoder MLPs, 4x4 pose products),
# so full-f32 precision costs nothing while gathers dominate the profile.
_jax.config.update("jax_default_matmul_precision", "float32")

__version__ = "0.1.0"

