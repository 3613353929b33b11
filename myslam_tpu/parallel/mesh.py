"""Device-mesh helpers for multi-chip scale-out.

The reference has no multi-device story (SURVEY §2.2/§5.8: two OS
processes sharing one GPU).  Here scale-out is native jax.sharding:

  * ``dp`` axis: ray batches are sharded across chips; map/pose params
    stay replicated and XLA turns the batch-gradient reduction into a
    psum over ICI — mapping is embarrassingly ray-parallel.
  * (planned) ``map`` axis: spatial sharding of the plane atlases with
    halo exchange for bilinear reads at block edges.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def ray_dp_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
