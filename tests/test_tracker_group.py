"""The fused group tracker must reproduce per-frame tracking semantics.

make_group_tracker fuses the every_frame group of tracked frames into one
scan.  Its result must equal running the per-frame optimization core
sequentially with the same chaining: quads packed once, pose init by
constant-speed extrapolation from the previous two results, per-frame key
= fold_in(group key, frame index).
"""

import jax
import jax.numpy as jnp
import numpy as np

from myslam_tpu.engine.camera import Camera
from myslam_tpu.engine.tracker import (
    _pack_tracking_quads,
    make_group_tracker,
    make_track_core,
)
from myslam_tpu.models.decoders import init_decoder_params
from myslam_tpu.models.planes import init_map_state, make_layout
from myslam_tpu.core.quaternion import cam_pose_to_matrix, matrix_to_cam_pose
from myslam_tpu.render.renderer import SceneGeometry


def _tiny_setup():
    bound = np.array([[-1, 1], [-1, 1], [-1, 1]], np.float32)
    c_dim = 8
    sdf_layout = make_layout(bound, [0.5, 0.25], c_dim)
    color_layout = make_layout(bound, [0.5, 0.25], c_dim)
    scene = SceneGeometry(
        sdf_layout=sdf_layout, color_layout=color_layout,
        bound=tuple(map(tuple, bound.tolist())), truncation=0.1,
        n_stratified=6, n_importance=2, perturb=False)
    key = jax.random.PRNGKey(0)
    kd, km = jax.random.split(key)
    ms = init_map_state(
        km, sdf_layout, color_layout, init_decoder_params(kd, c_dim=c_dim))
    cam = Camera(H=24, W=32, fx=20.0, fy=20.0, cx=15.5, cy=11.5)
    cfg = {"tracking": {
        "pixels": 64, "iters": 3, "w_color": 5.0, "w_depth": 1.0,
        "w_sdf_fs": 10.0, "w_sdf_center": 200.0, "w_sdf_tail": 50.0,
        "lr_T": 0.001, "lr_R": 0.001, "const_speed_assumption": True,
        "map_bf16": False,
    }}
    return cfg, scene, cam, ms


def test_group_tracker_matches_sequential_core():
    cfg, scene, cam, ms = _tiny_setup()
    G, iters, n_px = 4, 3, 64
    rng = np.random.default_rng(0)

    est = np.tile(np.eye(4, dtype=np.float32), (10, 1, 1))
    est[0, :3, 3] = [0.01, 0.0, 0.0]  # distinct prev poses
    est_dev = jnp.asarray(est)

    px_i = rng.integers(2, cam.W - 2, (G, iters, n_px)).astype(np.uint16)
    px_j = rng.integers(2, cam.H - 2, (G, iters, n_px)).astype(np.uint16)
    px_color = rng.integers(0, 255, (G, iters, n_px, 3)).astype(np.uint8)
    px_depth = rng.uniform(0.3, 1.2, (G, iters, n_px)).astype(np.float32)
    key = jax.random.PRNGKey(7)
    idx0 = 1

    group = make_group_tracker(cfg, scene, cam, G)
    est_out, c2ws, lf, lb, _ = group(
        ms, jnp.asarray(est), jnp.int32(idx0), jnp.asarray(px_i),
        jnp.asarray(px_j), jnp.asarray(px_color), jnp.asarray(px_depth), key)

    # reference: sequential per-frame core with explicit chaining
    core = make_track_core(cfg, scene, cam)
    quads = _pack_tracking_quads(ms, scene, False)
    prev = matrix_to_cam_pose(est_dev[idx0 - 1][None])[0]
    prev_prev = prev  # idx0 == 1: no two predecessors
    ref_poses = []
    for g in range(G):
        pose_init = 2.0 * prev - prev_prev
        best, losses, _ = core(
            ms, quads, pose_init, jnp.asarray(px_i[g]), jnp.asarray(px_j[g]),
            jnp.asarray(px_color[g]), jnp.asarray(px_depth[g]),
            jax.random.fold_in(key, idx0 + g))
        ref_poses.append(best)
        np.testing.assert_allclose(
            np.asarray(lf[g]), np.asarray(losses[0]), rtol=2e-5)
        prev_prev = prev
        prev = best

    ref_c2ws = cam_pose_to_matrix(jnp.stack(ref_poses))
    np.testing.assert_allclose(
        np.asarray(c2ws), np.asarray(ref_c2ws), atol=1e-5)
    # trajectory write-back at idx0..idx0+G-1, untouched elsewhere
    np.testing.assert_allclose(
        np.asarray(est_out[idx0:idx0 + G]), np.asarray(ref_c2ws), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(est_out[0]), est[0])
    np.testing.assert_array_equal(
        np.asarray(est_out[idx0 + G:]), est[idx0 + G:])
