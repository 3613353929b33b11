"""Fused tri-plane bilinear sampling from a feature atlas.

Semantics are exactly those of the reference's per-plane
``F.grid_sample(..., mode='bilinear', padding_mode='border',
align_corners=True)`` followed by per-level summation over the three
orientations and concatenation across levels
(reference src/networks/decoders.py:64-85):

  * align_corners=True: pixel coord = (coord_norm + 1)/2 * (size - 1)
  * border padding: coords clamped to [0, size-1] — which also zeroes the
    coordinate gradient outside the border, like the CUDA kernel.

TPU-native: the 4 corners x 3 orientations x L levels lookups for each
point are computed as a SINGLE row-gather from the fused atlas, followed
by one weighted segment reduction.  Both the atlas gradient (scatter-add)
and the coordinate gradient (for pose optimization) fall out of XLA
autodiff of this formulation.
"""

from __future__ import annotations

import jax.numpy as jnp

from myslam_tpu.models.planes import ORIENTATIONS, PlaneLayout


def _corner_indices_weights(p_nor: jnp.ndarray, layout: PlaneLayout):
    """Row indices into the atlas and bilinear weights for each point.

    p_nor: (N, 3) coords in [-1, 1].
    Returns idx (N, L*12) int32, w (N, L*12) float32, ordered
    [level][orientation][corner].
    """
    idx_parts = []
    w_parts = []
    for lvl in range(layout.n_levels):
        for ori, (au, av) in enumerate(ORIENTATIONS):
            H, W = layout.shapes[lvl][ori]
            off = layout.offsets[lvl][ori]
            u = p_nor[:, au]
            v = p_nor[:, av]
            x = jnp.clip((u + 1.0) * 0.5 * (W - 1), 0.0, W - 1)
            y = jnp.clip((v + 1.0) * 0.5 * (H - 1), 0.0, H - 1)
            x0f = jnp.floor(x)
            y0f = jnp.floor(y)
            wx = x - x0f
            wy = y - y0f
            x0 = x0f.astype(jnp.int32)
            y0 = y0f.astype(jnp.int32)
            x1 = jnp.minimum(x0 + 1, W - 1)
            y1 = jnp.minimum(y0 + 1, H - 1)
            base = off + y0 * W
            base1 = off + y1 * W
            idx_parts.append(jnp.stack(
                [base + x0, base + x1, base1 + x0, base1 + x1], axis=-1))
            w_parts.append(jnp.stack(
                [(1 - wy) * (1 - wx), (1 - wy) * wx, wy * (1 - wx), wy * wx],
                axis=-1))
    idx = jnp.concatenate(idx_parts, axis=-1)
    w = jnp.concatenate(w_parts, axis=-1)
    return idx, w


def sample_atlas(
    atlas: jnp.ndarray, layout: PlaneLayout, p_nor: jnp.ndarray
) -> jnp.ndarray:
    """Sample the fused plane atlas at normalized points.

    atlas: (S, C); p_nor: (N, 3) in [-1, 1].
    Returns (N, L*C): per-level orientation-summed features, concatenated
    coarse-to-fine (reference src/networks/decoders.py:77-83).
    """
    n = p_nor.shape[0]
    L = layout.n_levels
    idx, w = _corner_indices_weights(p_nor, layout)  # (N, L*12)
    gathered = jnp.take(atlas, idx.reshape(-1), axis=0)  # (N*L*12, C)
    gathered = gathered.reshape(n, L * 12, -1)
    weighted = gathered * w[..., None].astype(atlas.dtype)
    # Sum the 12 rows (4 corners x 3 orientations) of each level.
    feat = weighted.reshape(n, L, 12, -1).sum(axis=2)
    return feat.reshape(n, -1)
