"""Quaternion <-> rotation-matrix conversions and 7-dof camera poses.

Replaces the reference's pytorch3d dependency (reference: src/common.py:25,
155-181).  Conventions match pytorch3d so that pose optimization behaves
identically:

  * quaternions are (w, x, y, z), real part first;
  * ``quaternion_to_matrix`` rescales by 2/|q|^2, so non-unit quaternions
    (which arise mid-optimization) still produce proper rotations and the
    gradient includes the normalization term;
  * camera poses are 7-vectors [qw, qx, qy, qz, tx, ty, tz] ("RT" order,
    reference src/common.py:155).
"""

from __future__ import annotations

import jax.numpy as jnp


def quaternion_to_matrix(quat: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation matrix.

    Uses the 2/|q|^2 scaling (pytorch3d semantics) so the output is a valid
    rotation for any non-zero quaternion.
    """
    w, x, y, z = jnp.moveaxis(quat, -1, 0)
    two_s = 2.0 / jnp.sum(quat * quat, axis=-1)
    o = jnp.stack(
        [
            1 - two_s * (y * y + z * z),
            two_s * (x * y - z * w),
            two_s * (x * z + y * w),
            two_s * (x * y + z * w),
            1 - two_s * (x * x + z * z),
            two_s * (y * z - x * w),
            two_s * (x * z - y * w),
            two_s * (y * z + x * w),
            1 - two_s * (x * x + y * y),
        ],
        axis=-1,
    )
    return o.reshape(quat.shape[:-1] + (3, 3))


def matrix_to_quaternion(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation matrix -> (..., 4) wxyz quaternion.

    Branch-selected Shepperd method: evaluates the four candidate
    parameterizations and picks the numerically dominant one, like
    pytorch3d's ``matrix_to_quaternion``.  Only used outside gradient paths
    (pose bookkeeping), matching the reference's usage.
    """
    m00 = m[..., 0, 0]
    m11 = m[..., 1, 1]
    m22 = m[..., 2, 2]
    m01, m02 = m[..., 0, 1], m[..., 0, 2]
    m10, m12 = m[..., 1, 0], m[..., 1, 2]
    m20, m21 = m[..., 2, 0], m[..., 2, 1]

    # Squared magnitudes (times 4) of each component.
    q_abs_sq = jnp.stack(
        [
            1.0 + m00 + m11 + m22,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ],
        axis=-1,
    )
    q_abs = jnp.sqrt(jnp.maximum(q_abs_sq, 0.0))

    # Candidate quaternions, one per dominant component (unnormalized by
    # the 2*q_abs[best] divisor, applied after selection).
    cand_w = jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    cand_x = jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1)
    cand_y = jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1)
    cand_z = jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # (..., 4, 4)

    denom = 2.0 * jnp.maximum(q_abs, 1e-8)[..., None]
    cands = cands / denom

    best = jnp.argmax(q_abs_sq, axis=-1)
    return jnp.take_along_axis(cands, best[..., None, None], axis=-2).squeeze(-2)


def matrix_to_cam_pose(c2w: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) -> (..., 7) [quat(wxyz), t] (reference src/common.py:155)."""
    return jnp.concatenate(
        [matrix_to_quaternion(c2w[..., :3, :3]), c2w[..., :3, 3]], axis=-1
    )


def cam_pose_to_matrix(pose: jnp.ndarray) -> jnp.ndarray:
    """(..., 7) [quat, t] -> (..., 4, 4) (reference src/common.py:169)."""
    rot = quaternion_to_matrix(pose[..., :4])
    bottom_shape = pose.shape[:-1] + (1, 4)
    bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0]), bottom_shape)
    top = jnp.concatenate([rot, pose[..., 4:, None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)
