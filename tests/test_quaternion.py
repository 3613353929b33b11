import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from myslam_tpu.core.quaternion import (
    cam_pose_to_matrix,
    matrix_to_cam_pose,
    matrix_to_quaternion,
    quaternion_to_matrix,
)


def random_rotations(n, seed=0):
    rng = np.random.default_rng(seed)
    return Rotation.random(n, random_state=rng).as_matrix().astype(np.float32)


def test_quaternion_to_matrix_matches_scipy():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(64, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    ours = np.asarray(quaternion_to_matrix(jnp.asarray(q)))
    # scipy uses xyzw ordering
    theirs = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_quaternion_to_matrix_non_unit_is_rotation():
    # pytorch3d semantics: 2/|q|^2 scaling keeps output a proper rotation
    rng = np.random.default_rng(2)
    q = rng.normal(size=(32, 4)).astype(np.float32) * 3.0
    m = np.asarray(quaternion_to_matrix(jnp.asarray(q)))
    eye = np.einsum("bij,bkj->bik", m, m)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-4)
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-4)


def test_matrix_quaternion_roundtrip():
    m = random_rotations(128)
    q = matrix_to_quaternion(jnp.asarray(m))
    m2 = np.asarray(quaternion_to_matrix(q))
    np.testing.assert_allclose(m2, m, atol=1e-5)


def test_roundtrip_near_180_degrees():
    # Stress branches of the Shepperd method
    for axis in np.eye(3):
        r = Rotation.from_rotvec(axis * (np.pi - 1e-3)).as_matrix()
        q = matrix_to_quaternion(jnp.asarray(r, dtype=jnp.float32))
        m2 = np.asarray(quaternion_to_matrix(q))
        np.testing.assert_allclose(m2, r, atol=1e-4)


def test_cam_pose_matrix_roundtrip():
    m = np.tile(np.eye(4, dtype=np.float32), (16, 1, 1))
    m[:, :3, :3] = random_rotations(16, seed=3)
    rng = np.random.default_rng(4)
    m[:, :3, 3] = rng.normal(size=(16, 3)).astype(np.float32)
    pose = matrix_to_cam_pose(jnp.asarray(m))
    assert pose.shape == (16, 7)
    m2 = np.asarray(cam_pose_to_matrix(pose))
    np.testing.assert_allclose(m2, m, atol=1e-5)


def test_cam_pose_to_matrix_differentiable():
    pose = jnp.array([1.0, 0.01, -0.02, 0.03, 0.5, -0.2, 1.0])

    def f(p):
        return jnp.sum(cam_pose_to_matrix(p) ** 2)

    g = jax.grad(f)(pose)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).sum() > 0
