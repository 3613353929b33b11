"""Top-K color sampling (SceneGeometry.color_topk).

The TPU-native renderer may query the color field only at the K
highest-weight samples per ray (the compositing weights are peaked at
the SDF surface; the color atlas's per-sample row gathers dominate the
mapping iteration).  These tests pin the contract:

  * K = n_samples reproduces the exact path bit-for-bit up to summation
    order;
  * with a trained-ish (surface-consistent) SDF, K = 12 matches the
    exact color to well under the color-loss noise floor;
  * gradients flow into the color atlas only through top-K rows, and
    into the SDF/pose through ALL samples' weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
from dataclasses import replace

from myslam_tpu.models.decoders import init_decoder_params
from myslam_tpu.models.planes import init_map_state, make_layout
from myslam_tpu.render.renderer import SceneGeometry, render_rays

BOUND = [[-2.0, 2.0], [-2.0, 2.0], [-2.0, 2.0]]


def _setup(c_dim=8, n_rays=64):
    bound = jnp.asarray(BOUND, jnp.float32)
    layout = make_layout(bound, [0.48, 0.24], c_dim)
    scene = SceneGeometry(layout, layout,
                          tuple(map(tuple, np.asarray(BOUND).tolist())),
                          0.12, 32, 8, False)
    key = jax.random.PRNGKey(0)
    ms = init_map_state(key, layout, layout,
                        init_decoder_params(key, c_dim=c_dim))
    rng = np.random.default_rng(1)
    d = rng.uniform(-0.3, 0.3, (n_rays, 3)).astype(np.float32)
    d[:, 2] = -1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_o = jnp.zeros((n_rays, 3)) + jnp.asarray([0.0, 0.0, 1.5])
    rays_d = jnp.asarray(d)
    gt_depth = jnp.asarray(
        rng.uniform(1.2, 2.2, (n_rays,)).astype(np.float32))
    return scene, ms, rays_o, rays_d, gt_depth


def test_topk_all_samples_matches_exact():
    scene, ms, rays_o, rays_d, gt_depth = _setup()
    key = jax.random.PRNGKey(2)
    exact = render_rays(key, ms, scene, rays_o, rays_d, gt_depth,
                        importance=False)
    full_k = replace(scene, color_topk=scene.n_samples)
    # K == n_samples short-circuits to the exact path
    same = render_rays(key, ms, full_k, rays_o, rays_d, gt_depth,
                       importance=False)
    for a, b in zip(exact, same):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_topk_matches_exact_color_when_weights_peaked():
    scene, ms, rays_o, rays_d, gt_depth = _setup()
    key = jax.random.PRNGKey(2)
    depth0, color0, sdf0, z0 = render_rays(
        key, ms, scene, rays_o, rays_d, gt_depth, importance=False)
    topk = replace(scene, color_topk=12)
    depth1, color1, sdf1, z1 = render_rays(
        key, ms, topk, rays_o, rays_d, gt_depth, importance=False)
    # depth/sdf/z are computed identically (color_topk touches only rgb)
    np.testing.assert_array_equal(np.asarray(depth1), np.asarray(depth0))
    np.testing.assert_array_equal(np.asarray(sdf1), np.asarray(sdf0))
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z0))
    # an untrained map renders with fairly spread weights; top-12 of 40
    # must still capture the color to the percent level, far below the
    # color-loss noise the optimizer sees from pixel sampling
    err = np.abs(np.asarray(color1) - np.asarray(color0)).max()
    assert err < 2e-2, err


def test_topk_importance_branch_runs():
    scene, ms, rays_o, rays_d, gt_depth = _setup()
    holes = gt_depth.at[::3].set(0.0)
    topk = replace(scene, color_topk=12)
    depth, color, sdf, z = render_rays(
        jax.random.PRNGKey(4), ms, topk, rays_o, rays_d, holes,
        importance=True)
    assert np.isfinite(np.asarray(depth)).all()
    assert np.isfinite(np.asarray(color)).all()


def test_topk_gradients_flow():
    scene, ms, rays_o, rays_d, gt_depth = _setup()
    topk = replace(scene, color_topk=12)
    key = jax.random.PRNGKey(5)

    def loss(ms):
        depth, color, sdf, z = render_rays(
            key, ms, topk, rays_o, rays_d, gt_depth, importance=False)
        return jnp.sum(color ** 2) + jnp.sum(depth ** 2)

    g = jax.grad(loss)(ms)
    g_color = np.asarray(g.color_atlas)
    g_sdf = np.asarray(g.sdf_atlas)
    assert np.isfinite(g_color).all() and np.isfinite(g_sdf).all()
    # color gradient is sparse (top-K rows only); sdf gradient dense-ish
    # (every sample's weight feeds depth AND the color weights)
    assert (np.abs(g_color).sum(axis=-1) > 0).sum() > 0
    assert np.abs(g_sdf).sum() > 0
    n_rows_c = (np.abs(g_color).sum(axis=-1) > 0).sum()
    n_rows_s = (np.abs(g_sdf).sum(axis=-1) > 0).sum()
    assert n_rows_c < n_rows_s
