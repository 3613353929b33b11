import jax.numpy as jnp
import numpy as np

from myslam_tpu.core.geometry import (
    invert_pose,
    normalize_3d_coordinate,
    project_points,
    ray_aabb_exit_t,
    rays_from_uv,
    rays_full_image,
)
from myslam_tpu.core.quaternion import quaternion_to_matrix


def sample_pose(seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = np.asarray(quaternion_to_matrix(jnp.asarray(q, jnp.float32)))
    m[:3, 3] = rng.normal(size=3)
    return m


def test_rays_from_uv_camera_convention():
    # identity pose: dirs = [(i-cx)/fx, -(j-cy)/fy, -1]
    c2w = jnp.eye(4)[None]
    i = jnp.array([10.0, 50.0])
    j = jnp.array([20.0, 5.0])
    o, d = rays_from_uv(i, j, c2w[:, None][0], 100.0, 100.0, 32.0, 24.0)
    np.testing.assert_allclose(np.asarray(o), 0.0, atol=1e-7)
    expected = np.stack(
        [
            (np.array([10.0, 50.0]) - 32.0) / 100.0,
            -(np.array([20.0, 5.0]) - 24.0) / 100.0,
            [-1.0, -1.0],
        ],
        axis=-1,
    )
    np.testing.assert_allclose(np.asarray(d), expected, atol=1e-6)


def test_rays_rotate_with_pose():
    c2w = jnp.asarray(sample_pose(1))
    i = jnp.array([40.0])
    j = jnp.array([30.0])
    o, d = rays_from_uv(i, j, c2w, 80.0, 80.0, 40.0, 30.0)
    # center pixel -> direction is -z column of rotation
    np.testing.assert_allclose(
        np.asarray(d[0]), -np.asarray(c2w[:3, 2]), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(o[0]), np.asarray(c2w[:3, 3]), atol=1e-6)


def test_rays_full_image_matches_pointwise():
    c2w = jnp.asarray(sample_pose(2))
    H, W = 6, 8
    o, d = rays_full_image(H, W, 50.0, 55.0, 4.0, 3.0, c2w)
    assert o.shape == (H, W, 3) and d.shape == (H, W, 3)
    o2, d2 = rays_from_uv(
        jnp.array([5.0]), jnp.array([2.0]), c2w, 50.0, 55.0, 4.0, 3.0
    )
    np.testing.assert_allclose(np.asarray(d[2, 5]), np.asarray(d2[0]), atol=1e-6)


def test_normalize_roundtrip():
    bound = jnp.array([[-2.0, 4.0], [0.0, 3.0], [-1.0, 1.0]])
    p = jnp.array([[-2.0, 0.0, -1.0], [4.0, 3.0, 1.0], [1.0, 1.5, 0.0]])
    n = normalize_3d_coordinate(p, bound)
    np.testing.assert_allclose(
        np.asarray(n), [[-1, -1, -1], [1, 1, 1], [0, 0, 0]], atol=1e-6
    )


def test_ray_aabb_exit_t():
    bound = jnp.array([[0.0, 2.0], [0.0, 2.0], [0.0, 2.0]])
    o = jnp.array([[1.0, 1.0, 1.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    t = ray_aabb_exit_t(o, d, bound)
    np.testing.assert_allclose(np.asarray(t), [1.0], atol=1e-6)
    # diagonal ray
    d2 = jnp.array([[1.0, 1.0, 1.0]])
    t2 = ray_aabb_exit_t(o, d2, bound)
    np.testing.assert_allclose(np.asarray(t2), [1.0], atol=1e-6)


def test_project_points_inverts_rays():
    c2w = jnp.asarray(sample_pose(3))
    fx, fy, cx, cy = 60.0, 62.0, 33.0, 21.0
    i = jnp.array([10.0, 55.0, 33.0])
    j = jnp.array([5.0, 40.0, 21.0])
    o, d = rays_from_uv(i, j, c2w, fx, fy, cx, cy)
    pts = o + 2.5 * d  # points along rays
    w2c = invert_pose(c2w)
    u, v, z = project_points(pts, w2c, fx, fy, cx, cy)
    np.testing.assert_allclose(np.asarray(u), np.asarray(i), atol=1e-3)
    np.testing.assert_allclose(np.asarray(v), np.asarray(j), atol=1e-3)
    assert np.all(np.asarray(z) < 0)  # in front of camera => negative z


def test_invert_pose():
    c2w = jnp.asarray(sample_pose(4))
    prod = np.asarray(invert_pose(c2w) @ c2w)
    np.testing.assert_allclose(prod, np.eye(4), atol=1e-5)
