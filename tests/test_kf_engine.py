"""Keyframe-partitioned PRODUCT mapper: fused frame contract on a kf mesh.

The kf path cannot be bitwise-parity-tested against the replicated mapper
(its ray budget is drawn per shard from owned slots — a different, equally
valid stochastic BA), so these tests assert the things that must hold
exactly: finite decreasing losses, cross-shard replication of every
replicated output, correct admission into sharded imagery, and both pose
solvers running.
"""

import copy
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from myslam_tpu.engine.camera import Camera
from myslam_tpu.engine.keyframes import make_window_selector
from myslam_tpu.models.decoders import init_decoder_params
from myslam_tpu.models.planes import make_layout, init_map_state
from myslam_tpu.parallel.distributed_ba import make_kf_frame_mapper
from myslam_tpu.render.renderer import SceneGeometry
from myslam_tpu.utils.config import DEFAULT_CONFIG, load_config

BOUND = [[-1.9, 7.94], [-2.2, 4.52], [-2.5, 2.54]]
C_DIM = 8
N_SHARDS = 4
CAPACITY = 8  # divisible by N_SHARDS


@pytest.fixture
def setup():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(
        os.path.join(repo, "configs", "Synthetic", "room_smoke.yaml"),
        DEFAULT_CONFIG)
    cfg = copy.deepcopy(cfg)
    cfg["mapping"]["pixels"] = 128
    cam = Camera(H=40, W=56, fx=30.0, fy=30.0, cx=27.5, cy=19.5)
    bound = np.asarray(BOUND, np.float32)
    layout = make_layout(jnp.asarray(bound), [0.48, 0.24], C_DIM)
    scene = SceneGeometry(layout, layout,
                          tuple(map(tuple, bound.tolist())),
                          0.12, 8, 4, True)
    key = jax.random.PRNGKey(3)
    ms = init_map_state(key, layout, layout,
                        init_decoder_params(key, c_dim=C_DIM))

    scratch = CAPACITY - 1
    w_max = 5
    rng = np.random.default_rng(0)
    center = bound.mean(axis=1)

    def pose(dt):
        c = np.eye(4, dtype=np.float32)
        c[:3, 3] = center + dt
        return c

    kf_est = np.stack([pose(rng.normal(scale=0.02, size=3))
                       for _ in range(CAPACITY)]).astype(np.float32)
    kf_gt = kf_est.copy()
    colors = rng.uniform(
        0, 1, (CAPACITY, cam.H, cam.W, 3)).astype(np.float16)
    depths = rng.uniform(0.8, 1.6, (CAPACITY, cam.H, cam.W)).astype(
        np.float32)
    depths[:, 5:12, 7:20] = 0.0  # depth holes -> importance branch live

    color_u8 = (rng.uniform(0, 1, (cam.H, cam.W, 3)) * 255).astype(np.uint8)
    depth = rng.uniform(0.8, 1.6, (cam.H, cam.W)).astype(np.float32)
    depth[20:30, 30:45] = 0.0
    q = 60000.0 / depth.max()
    depth_u16 = (depth * q).astype(np.uint16)
    inv_q = 1.0 / q

    n_img = 8
    est_dev = np.tile(np.eye(4, dtype=np.float32), (n_img, 1, 1))
    est_dev[5] = pose(np.array([0.01, -0.02, 0.005], np.float32))

    selector = make_window_selector(cam, CAPACITY, window_size=3,
                                    w_max=w_max, scratch_slot=scratch)
    mesh = Mesh(np.array(jax.devices()[:N_SHARDS]), ("kf",))
    sh = NamedSharding(mesh, P("kf"))
    colors_s = jax.device_put(jnp.asarray(colors), sh)
    depths_s = jax.device_put(jnp.asarray(depths), sh)
    return (cfg, cam, scene, ms, scratch, w_max, selector, mesh,
            kf_est, kf_gt, colors_s, depths_s, color_u8, depth_u16,
            inv_q, est_dev)


@pytest.mark.parametrize("solver", ["adam", "schur"])
def test_kf_frame_mapper_runs_and_replicates(setup, solver):
    (cfg, cam, scene, ms, scratch, w_max, selector, mesh,
     kf_est, kf_gt, colors_s, depths_s, color_u8, depth_u16, inv_q,
     est_dev) = setup

    mapper = make_kf_frame_mapper(
        cfg, scene, cam, selector, w_max, scratch, mesh,
        importance=True, pose_solver=solver)
    opt_buf = mapper.jit_init(
        {"map": jax.tree_util.tree_map(jnp.copy, ms),
         "poses": jnp.zeros((w_max, 7), jnp.float32)})
    (ms_out, _, est_out, kfe_out, kfg_out, kfc_out, kfd_out,
     losses) = mapper(
        jax.tree_util.tree_map(jnp.copy, ms), opt_buf,
        jnp.asarray(est_dev), jnp.asarray(kf_est), jnp.asarray(kf_gt),
        colors_s, depths_s, jnp.asarray(color_u8),
        jnp.asarray(depth_u16), inv_q, jnp.asarray(est_dev[5]),
        5, 3, jax.random.PRNGKey(11),
        iters=8, lr_factor=1.0, joint_opt=True, admit=True)

    losses = np.asarray(losses)
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses

    # every nominally-replicated output is bitwise identical across shards
    for arr in (ms_out.sdf_atlas, ms_out.color_atlas, est_out, kfe_out):
        shards = [np.asarray(s.data) for s in arr.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)

    # admission: scratch imagery landed in slot 3 of the SHARDED buffers
    exp_depth = np.asarray(depth_u16, np.float32) * inv_q
    np.testing.assert_allclose(np.asarray(kfd_out[3]), exp_depth, rtol=1e-6)
    exp_color = (np.asarray(color_u8, np.float32) / 255.0).astype(np.float16)
    np.testing.assert_array_equal(np.asarray(kfc_out[3]), exp_color)
    # imagery buffers kept their kf sharding (donated through the jit)
    assert len(kfd_out.addressable_shards) == N_SHARDS

    # poses: masked window slots moved, frozen ones (mask 0) did not
    assert not np.allclose(np.asarray(est_out[5]), est_dev[5])
