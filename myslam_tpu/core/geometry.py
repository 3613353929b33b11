"""Ray generation, AABB intersection, coordinate normalization, projection.

Pure-jnp re-derivations of the reference's camera/geometry math
(reference: src/common.py:87-153, 183-218; src/Tracker.py:175-182;
src/Mapper.py:184-199).  Camera convention: right-handed, camera looks
along -z, x flipped in projection (dirs = [(i-cx)/fx, -(j-cy)/fy, -1]).
All functions are functional and jit/vmap-safe with static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_dirs(i: jnp.ndarray, j: jnp.ndarray, fx, fy, cx, cy) -> jnp.ndarray:
    """Camera-frame ray directions for pixel coords (i=column/u, j=row/v).

    Reference src/common.py:92.  Returns (..., 3).
    """
    return jnp.stack(
        [(i - cx) / fx, -(j - cy) / fy, -jnp.ones_like(i)], axis=-1
    )


def rays_from_uv(
    i: jnp.ndarray, j: jnp.ndarray, c2w: jnp.ndarray, fx, fy, cx, cy
):
    """World-frame rays for pixel coords under pose(s) c2w.

    i, j: (...,) pixel coords; c2w: (..., 4, 4) (broadcastable with i).
    Returns rays_o, rays_d of shape (..., 3).
    Reference src/common.py:87-99.
    """
    dirs = pixel_dirs(i, j, fx, fy, cx, cy)  # (..., 3)
    rays_d = jnp.einsum("...ij,...j->...i", c2w[..., :3, :3], dirs)
    rays_o = jnp.broadcast_to(c2w[..., :3, 3], rays_d.shape)
    return rays_o, rays_d


def rays_full_image(H: int, W: int, fx, fy, cx, cy, c2w: jnp.ndarray):
    """Rays for every pixel of an HxW image. Reference src/common.py:183-201.

    Returns rays_o, rays_d of shape (H, W, 3).
    """
    j, i = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    return rays_from_uv(i, j, c2w, fx, fy, cx, cy)


def normalize_3d_coordinate(p: jnp.ndarray, bound: jnp.ndarray) -> jnp.ndarray:
    """Normalize world points into [-1, 1]^3 against the scene bound.

    p: (..., 3); bound: (3, 2) [min, max] per axis.
    Reference src/common.py:204-218 (functional — no in-place mutation).
    """
    lo = bound[:, 0]
    hi = bound[:, 1]
    return (p - lo) / (hi - lo) * 2.0 - 1.0


def ray_aabb_exit_t(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                    bound: jnp.ndarray) -> jnp.ndarray:
    """Distance along each ray to its *last* axis-plane crossing of the AABB.

    Matches the reference's pre-filter quantity
    ``min over axes of max over {lo,hi} of (bound - o)/d``
    (reference src/Tracker.py:175-182, src/Mapper.py:322-328): the t at
    which the ray exits the bound if it starts inside.
    rays_o, rays_d: (N, 3); bound: (3, 2).  Returns (N,).
    """
    t = (bound[None, :, :] - rays_o[:, :, None]) / rays_d[:, :, None]  # (N,3,2)
    return jnp.min(jnp.max(t, axis=2), axis=1)


def project_points(
    pts: jnp.ndarray, w2c: jnp.ndarray, fx, fy, cx, cy
):
    """Project world points into a camera; reference src/Mapper.py:184-199.

    pts: (..., 3); w2c: (..., 4, 4) broadcastable.
    Returns (u, v, z_cam): pixel coords and camera-frame z (negative when
    the point is in front of the camera under the -z convention).
    The x-axis flip of the camera frame is applied before the pinhole
    projection, mirroring the reference.
    """
    R = w2c[..., :3, :3]
    t = w2c[..., :3, 3]
    cam = jnp.einsum("...ij,...j->...i", R, pts) + t
    x = -cam[..., 0]
    y = cam[..., 1]
    z = cam[..., 2]
    zs = z + jnp.where(z >= 0, 1e-5, 1e-5)  # match reference's +1e-5 guard
    u = (fx * x + cx * z) / zs
    v = (fy * y + cy * z) / zs
    return u, v, z


def invert_pose(c2w: jnp.ndarray) -> jnp.ndarray:
    """Invert rigid transforms (..., 4, 4) analytically."""
    R = c2w[..., :3, :3]
    t = c2w[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    t_new = -jnp.einsum("...ij,...j->...i", Rt, t)
    top = jnp.concatenate([Rt, t_new[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0]), c2w.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)
