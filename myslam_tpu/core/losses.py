"""Masked SLAM losses: SDF free-space/center/tail, color, depth.

The reference filters rays with boolean masks and takes plain means over
the surviving subsets (src/Tracker.py:114-148,193-204;
src/Mapper.py:110-144,337-346).  JAX needs static shapes, so every loss
here is a masked sum divided by the masked count — numerically identical
to the reference's subset means.
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of x over elements where mask is True; 0 if mask is empty."""
    m = mask.astype(x.dtype)
    cnt = jnp.sum(m)
    return jnp.sum(x * m) / jnp.maximum(cnt, 1.0)


def sdf_losses(
    sdf: jnp.ndarray,
    z_vals: jnp.ndarray,
    gt_depth: jnp.ndarray,
    ray_mask: jnp.ndarray,
    truncation: float,
    w_fs: float,
    w_center: float,
    w_tail: float,
    mean_fn=masked_mean,
) -> jnp.ndarray:
    """Weighted free-space + center + tail SDF losses.

    sdf, z_vals: (R, N); gt_depth: (R,); ray_mask: (R,) bool of rays that
    participate.  Reference src/Tracker.py:114-148 — sample-region masks
    partition each ray by z relative to gt depth:
      front:  z < d - trunc          -> push sdf to +1
      center: |z - d| < 0.4 * trunc  -> z + sdf*trunc ≈ d
      tail:   remaining band          -> same target, lower weight
    """
    d = gt_depth[:, None]
    rm = ray_mask[:, None]
    front = (z_vals < d - truncation) & rm
    back = (z_vals > d + truncation) & rm
    center = (z_vals > d - 0.4 * truncation) & (z_vals < d + 0.4 * truncation) & rm
    tail = (~front) & (~back) & (~center) & rm

    fs_loss = mean_fn(jnp.square(sdf - 1.0), front)
    est = z_vals + sdf * truncation
    center_loss = mean_fn(jnp.square(est - d), center)
    tail_loss = mean_fn(jnp.square(est - d), tail)
    return w_fs * fs_loss + w_center * center_loss + w_tail * tail_loss


def color_loss(
    gt_color: jnp.ndarray, color: jnp.ndarray, ray_mask: jnp.ndarray,
    mean_fn=masked_mean,
) -> jnp.ndarray:
    """Masked mean squared color error; gt/color: (R, 3), mask: (R,)."""
    sq = jnp.square(gt_color - color)
    return mean_fn(sq, jnp.broadcast_to(ray_mask[:, None], sq.shape))


def depth_loss(
    gt_depth: jnp.ndarray, depth: jnp.ndarray, ray_mask: jnp.ndarray,
    mean_fn=masked_mean,
) -> jnp.ndarray:
    """Masked mean squared depth error; (R,) each."""
    return mean_fn(jnp.square(gt_depth - depth), ray_mask)


def masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median of x over mask, with torch.median's lower-middle convention.

    torch.median over n elements returns sorted[(n-1)//2] (the smaller of
    the two middle values for even n) — reference src/Tracker.py:194.
    Empty mask yields +inf (which then empties downstream masks).
    """
    n = jnp.sum(mask.astype(jnp.int32))
    vals = jnp.where(mask, x, jnp.inf)
    vals = jnp.sort(vals)
    idx = jnp.maximum(n - 1, 0) // 2
    return vals[idx]
