"""Tri-plane scene representation as fused feature atlases.

The reference allocates 12 separate 2-D feature planes — {sdf, color} x
{coarse, fine} x {xy, xz, yz} — and bilinearly samples each with
F.grid_sample (reference: src/ESLAM.py:175-218, src/networks/decoders.py:64-85).

TPU-native redesign: all planes of one field (sdf or color) are packed
row-major into a single channels-last **atlas** of shape (sum_HW, C).
A point sample then becomes ONE gather of 4*3*n_levels rows from the atlas
(plus a tiny weighted reduction), instead of 12 separate grid_sample
launches — one big coalesced HBM gather that XLA pipelines well, and the
natural unit for Pallas kernels and for sharding (the atlas is a single
leaf in the optimizer/pjit pytree).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# Orientation axis pairs: (u-axis, v-axis) of each plane; u indexes the
# plane's W (fast) dimension, v indexes H.  Order matches the reference's
# (xy, xz, yz) with shapes xy=(ny,nx), xz=(nz,nx), yz=(nz,ny)
# (reference src/ESLAM.py:199-203, src/networks/decoders.py:79-81).
ORIENTATIONS = ((0, 1), (0, 2), (1, 2))


@dataclass(frozen=True)
class PlaneLayout:
    """Static geometry of a plane atlas: per-level, per-orientation shapes.

    shapes[level][orientation] = (H, W); offsets give each plane's first
    row in the fused atlas.
    """

    shapes: tuple  # ((H, W), (H, W), (H, W)) per level
    offsets: tuple  # matching row offsets into the atlas
    total_rows: int
    c_dim: int

    @property
    def n_levels(self) -> int:
        return len(self.shapes)


def make_layout(bound, resolutions, c_dim: int) -> PlaneLayout:
    """Build a PlaneLayout from scene bound and per-level resolutions.

    bound: (3, 2) array-like; resolutions: [coarse, fine] in meters.
    Grid sizing matches the reference (truncating int division of the
    axis length, axes x/z swapped: src/ESLAM.py:198-203).
    """
    bound = np.asarray(bound)
    xyz_len = (bound[:, 1] - bound[:, 0]).tolist()
    shapes, offsets = [], []
    off = 0
    for res in resolutions:
        nx, ny, nz = (int(l / res) for l in xyz_len)
        level_shapes = ((ny, nx), (nz, nx), (nz, ny))
        level_offsets = []
        for (h, w) in level_shapes:
            level_offsets.append(off)
            off += h * w
        shapes.append(level_shapes)
        offsets.append(tuple(level_offsets))
    return PlaneLayout(
        shapes=tuple(shapes), offsets=tuple(offsets), total_rows=off, c_dim=c_dim
    )


class MapState(struct.PyTreeNode):
    """The complete differentiable scene state, as a single pytree.

    Replaces the reference's shared-memory plane lists + decoder module
    (src/ESLAM.py:88-118): a MapState is passed into and returned from
    jitted tracking/mapping steps; snapshot exchange is a pytree copy.
    """

    sdf_atlas: jnp.ndarray  # (S_sdf, C) fused SDF feature planes
    color_atlas: jnp.ndarray  # (S_color, C) fused color feature planes
    decoder: dict  # MLP params + beta (see models/decoders.py)


def init_map_state(
    key: jax.Array,
    sdf_layout: PlaneLayout,
    color_layout: PlaneLayout,
    decoder_params: dict,
    std: float = 0.01,
    dtype=jnp.float32,
) -> MapState:
    """Allocate atlases ~ N(0, std^2) (reference src/ESLAM.py:201-210)."""
    k1, k2 = jax.random.split(key)
    sdf = std * jax.random.normal(
        k1, (sdf_layout.total_rows, sdf_layout.c_dim), dtype
    )
    col = std * jax.random.normal(
        k2, (color_layout.total_rows, color_layout.c_dim), dtype
    )
    return MapState(sdf_atlas=sdf, color_atlas=col, decoder=decoder_params)
