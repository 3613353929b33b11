"""SDF -> alpha -> transmittance compositing along rays.

Reference math (src/utils/Renderer.py:140-153):
    alpha = 1 - exp(-beta * sigmoid(-beta * sdf))
    w_i   = alpha_i * prod_{j<i} (1 - alpha_j + 1e-10)
    depth = sum w_i z_i ; rgb = sum w_i c_i
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sdf2alpha(sdf: jnp.ndarray, beta) -> jnp.ndarray:
    """Reference src/utils/Renderer.py:149-153."""
    return 1.0 - jnp.exp(-beta * jax.nn.sigmoid(-sdf * beta))


def composite_weights(alpha: jnp.ndarray) -> jnp.ndarray:
    """Volumetric rendering weights from per-sample alphas.

    alpha: (..., N).  Exclusive cumulative product of (1 - alpha + 1e-10)
    along the sample axis (reference src/utils/Renderer.py:141-142).
    """
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate(
        [jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1
    )
    return alpha * trans


def composite(
    alpha: jnp.ndarray, z_vals: jnp.ndarray, rgb: jnp.ndarray
):
    """Composite depth and color. alpha, z_vals: (R, N); rgb: (R, N, 3)."""
    w = composite_weights(alpha)
    depth = jnp.sum(w * z_vals, axis=-1)
    color = jnp.sum(w[..., None] * rgb, axis=-2)
    return depth, color, w


def composite_topk(alpha, z_vals, pts, rgb_at, k: int):
    """Top-K color compositing (the TPU extension behind
    ``SceneGeometry.color_topk``; single source of truth — used by both
    renderer.render_core and the kf-sharded BA's inline renderer).

    Depth composites over ALL samples; color is queried (``rgb_at``:
    (M, 3) world points -> (M, 3) rgb) only at the K highest-weight
    samples per ray — weights are surface-peaked, so the K rows capture
    the composited color while skipping ~(N-K)/N of the color-atlas
    gather/scatter traffic, the largest cost of a mapping iteration.

    alpha, z_vals: (..., N); pts: (..., N, 3).  Returns (depth, color).
    """
    w = composite_weights(alpha)
    _, top_idx = jax.lax.top_k(jax.lax.stop_gradient(w), k)  # (..., K)
    pts_k = jnp.take_along_axis(pts, top_idx[..., None], axis=-2)
    rgb_k = rgb_at(pts_k.reshape(-1, 3)).reshape(top_idx.shape + (3,))
    w_k = jnp.take_along_axis(w, top_idx, axis=-1)
    depth = jnp.sum(w * z_vals, axis=-1)
    color = jnp.sum(w_k[..., None] * rgb_k, axis=-2)
    return depth, color
