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
