"""Ray/pixel sampling: stratified + depth-guided z values, CDF inversion.

Re-derivations of the reference's samplers with explicit PRNG keys and
static shapes (reference: src/common.py:41-77, 101-139;
src/utils/Renderer.py:46-61, 85-134).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def perturb_z_vals(key: jax.Array, z_vals: jnp.ndarray) -> jnp.ndarray:
    """Stratified jitter within inter-sample intervals.

    Reference src/utils/Renderer.py:46-61.
    """
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
    lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
    t_rand = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
    return lower + (upper - lower) * t_rand


def depth_guided_z_vals(
    key: jax.Array,
    gt_depth: jnp.ndarray,
    truncation: float,
    n_stratified: int,
    n_importance: int,
    perturb: bool,
) -> jnp.ndarray:
    """Per-ray z values for rays with valid depth.

    n_importance "surface" samples in [d - 1.5*trunc, d + 1.5*trunc] plus
    n_stratified "free-space" samples in [0, 1.2*d], sorted and optionally
    jittered.  Reference src/utils/Renderer.py:90-105.

    gt_depth: (N,).  Returns (N, n_stratified + n_importance).
    """
    t_surf = jnp.linspace(0.0, 1.0, n_importance)
    t_uni = jnp.linspace(0.0, 1.0, n_stratified)
    d = gt_depth[:, None]
    z_surface = d - 1.5 * truncation + 3.0 * truncation * t_surf[None, :]
    z_free = 1.2 * d * t_uni[None, :]
    z = jnp.sort(jnp.concatenate([z_free, z_surface], axis=-1), axis=-1)
    if perturb:
        z = perturb_z_vals(key, z)
    return z


def uniform_z_vals(
    key: jax.Array,
    far: jnp.ndarray,
    n_stratified: int,
    perturb: bool,
    near: float = 0.0,
) -> jnp.ndarray:
    """Uniform z values from near to per-ray far (bbox exit + 0.01).

    Reference src/utils/Renderer.py:108-121.  far: (N,).
    """
    t_uni = jnp.linspace(0.0, 1.0, n_stratified)
    z = near * (1.0 - t_uni)[None, :] + far[:, None] * t_uni[None, :]
    if perturb:
        z = perturb_z_vals(key, z)
    return z


def sample_pdf(
    key: jax.Array,
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    det: bool = False,
    u: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Inverse-CDF importance sampling (NeRF hierarchical sampling).

    Deliberately keeps the reference's quirk of NOT normalizing the pdf
    (reference src/common.py:46-48 overwrites the normalized pdf with the
    raw weights), so the cdf may end below/above 1; uniform samples beyond
    the final cdf value land in the last bin.

    bins: (N, M+1), weights: (N, M).  Returns (N, n_samples).
    ``u`` overrides the uniform draws (testing).
    """
    cdf = jnp.cumsum(weights, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (N, M+1)

    if u is None:
        if det:
            u = jnp.linspace(0.0, 1.0, n_samples)
            u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
        else:
            u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,))

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, below, axis=-1)
    bins_above = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def sample_pixels(
    key: jax.Array,
    n: int,
    h0: int,
    h1: int,
    w0: int,
    w1: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Uniformly sample n pixel coords (i=col, j=row) from [h0,h1)x[w0,w1).

    Functional analog of reference src/common.py:101-139 (which flattens a
    meshgrid and draws randint indices — equivalent to independent row/col
    draws).  Returns float32 (i, j) each of shape (n,).
    """
    kj, ki = jax.random.split(key)
    j = jax.random.randint(kj, (n,), h0, h1).astype(jnp.float32)
    i = jax.random.randint(ki, (n,), w0, w1).astype(jnp.float32)
    return i, j


def gather_pixels(
    image: jnp.ndarray, i: jnp.ndarray, j: jnp.ndarray
) -> jnp.ndarray:
    """Gather image values at integer pixel coords (i=col, j=row).

    image: (H, W) or (H, W, C); i, j: (N,) float or int.
    """
    jj = j.astype(jnp.int32)
    ii = i.astype(jnp.int32)
    return image[jj, ii]
